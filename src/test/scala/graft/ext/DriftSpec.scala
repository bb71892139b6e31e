package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X157 corpus drift: hand-computed chi-square goldens, zero-drift
  * balance, symmetry, and the integral-division exactness contract.
  */
class DriftSpec extends SparkSpec {

  private def run(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = graft.util.Scratch.dir("drift_spec")
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Drift.queries("q_corpus_drift")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  test("drift: hand-computed 2x2 chi-square golden") {
    // A (doc 0): x x x y   B (doc 1): y y y x
    // a_x=3 b_x=1 NA=4 NB=4 N=8; diff = 3·4−1·4 = 8
    // χ² = 8·64 / (4·4·4·4) = 2.0 → 20000 in 1e-4 units; y symmetric
    val got = run(Seq(0L -> "x x x y", 1L -> "y y y x"))
    assert(got === Seq(("x", 3L, 1L, 20000L), ("y", 1L, 3L, 20000L)))
  }

  test("drift: proportionally balanced tokens score exactly zero") {
    val got = run(Seq(0L -> "x y x y", 1L -> "x y y x"))
    assert(got.forall(_._4 === 0L))
  }

  test("drift: score is symmetric in the slice labels") {
    // swapping which slice holds which text permutes (cnt_a, cnt_b) but
    // must leave every chi2 unchanged
    val g1 = run(Seq(0L -> "x x z", 1L -> "z z y")).map(r => (r._1, r._4)).toMap
    val g2 = run(Seq(1L -> "x x z", 0L -> "z z y")).map(r => (r._1, r._4)).toMap
    assert(g1 === g2)
  }

  test("drift: floor of the scaled statistic, not a float round") {
    // A: x y, B: y y → a_x=1 b_x=0 NA=2 NB=2 N=4; diff=2
    // χ²·1e4 = 4·4·1e4 / (2·2·1·3) = 160000/12 = 13333.33… → floor 13333
    val got = run(Seq(0L -> "x y", 1L -> "y y")).map(r => r._1 -> r._4).toMap
    assert(got("x") === 13333L)
  }
}
