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
}
