package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for X84 mergeable HLL sketch partials. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("union of arbitrary-split partials equals the whole-pass sketch exactly") {
    val rnd = new scala.util.Random(19)
    val df = (1 to 20000).map(_ => (rnd.nextInt(40), rnd.nextInt(3000).toLong))
      .toDF("split", "uid")
    // 40-way split, every uid in many splits: merge must not double-count.
    val merged = df.groupBy("split").agg(hll_sketch_agg(col("uid")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head.getLong(0)
    val whole = df.agg(hll_sketch_estimate(hll_sketch_agg(col("uid"))).as("est"))
      .head.getLong(0)
    assert(merged == whole, s"merged $merged != whole $whole")
  }

  test("estimate lands within 10% of exact on the fixture scale") {
    val df = (1L to 5000L).map(i => (i * 7919L) % 1237L).toDF("uid")
    val est = df.agg(hll_sketch_estimate(hll_sketch_agg(col("uid")))).head.getLong(0)
    val exact = df.distinct().count()
    assert(math.abs(est - exact) <= exact / 10,
      s"estimate $est too far from exact $exact")
  }

  test("q_hll_partials asserts its own properties (both booleans true)") {
    val out = Sketches.queries("q_hll_partials")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("merge_lossless"), s"merge not lossless: $r")
      assert(r.getAs[Boolean]("approx_ok"), s"estimate out of bound: $r")
    }
  }

  test("CMS estimate never undercounts, for EVERY key (X90 guarantee)") {
    val ev = graft.sources.Tables.events(spark, sf).select("user_id")
    val sketch = Sketches.cmsBuild(ev, "user_id")
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
    val bad = Sketches.cmsEstimate(sketch, exact.select("user_id"), "user_id")
      .join(exact, "user_id")
      .where(col("cms_est") < col("n"))
      .count()
    assert(bad == 0, s"$bad keys undercounted")
  }

  test("CMS split sketches sum elementwise to the whole sketch (mergeability)") {
    val df = (1L to 4000L).map(i => ((i * 131) % 97, i % 2)).toDF("k", "half")
    val whole = Sketches.cmsBuild(df, "k")
      .select("j", "b", "cnt").as[(Int, Long, Long)].collect()
      .map { case (j, b, c) => ((j, b), c) }.toMap
    val summed = Seq(0L, 1L)
      .map(h => Sketches.cmsBuild(df.where(col("half") === h), "k"))
      .map(_.select("j", "b", "cnt").as[(Int, Long, Long)].collect()
        .map { case (j, b, c) => ((j, b), c) }.toMap)
      .reduce((m1, m2) => (m1.keySet ++ m2.keySet)
        .map(k => k -> (m1.getOrElse(k, 0L) + m2.getOrElse(k, 0L))).toMap)
    assert(whole == summed)
  }

  test("CMS point estimate on a hand-checked tiny multiset") {
    val df = Seq("a", "a", "a", "b", "c", "c").toDF("k")
    val got = Sketches.cmsEstimate(Sketches.cmsBuild(df, "k"),
        df.distinct(), "k")
      .as[(String, Long)].collect().toMap
    // d=4 rows over w=512 buckets with 3 keys: collisions are possible in
    // principle but the estimate is still lower-bounded by the true count
    assert(got("a") >= 3 && got("b") >= 1 && got("c") >= 2)
    assert(got.values.forall(_ <= 6))
  }
}
