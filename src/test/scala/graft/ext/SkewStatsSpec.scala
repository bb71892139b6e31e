package graft.ext

import graft.SparkSpec

/** X62 key-skew diagnostics: exactness of the windowless rank (round-8
  * verdict ask #5 — the per-key count table must never pass through a
  * SinglePartition WindowExec, even a k-row one) plus tie/edge handling.
  */
class SkewStatsSpec extends SparkSpec {
  import spark.implicits._

  private val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++
    Seq.fill(30)("c") ++ Seq.fill(10)("d") ++ Seq("e")).toDF("k")

  test("top-k ranks by frequency, ties broken by key; frac sums the table") {
    val got = SkewStats.topSkewedKeys(df, "k", 3).orderBy("rank")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq(("a", 1, 50L, 50.0 / 121),
      ("b", 2, 30L, 30.0 / 121), ("c", 3, 30L, 30.0 / 121)))
  }

  test("k larger than the key domain returns every key, ranks dense") {
    val got = SkewStats.topSkewedKeys(df, "k", 99).orderBy("rank")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(got.toSeq === Seq("a", "b", "c", "d", "e").zipWithIndex
      .map { case (k, i) => (k, i + 1) })
  }

  test("plan pin: no SinglePartition window anywhere (ranking is join-shaped)") {
    val q = SkewStats.topSkewedKeys(df, "k", 3)
    q.collect()
    // AQE's toString echoes the initial plan below the final one — pin
    // only what actually executed
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Window"), s"rank must not plan a WindowExec:\n$plan")
    // the ONLY SinglePartition allowed is the scalar `total` aggregate
    // (its input is #shuffle-partitions partial rows, not data) — the
    // key-sized count table itself must never funnel through one
    assert("SinglePartition".r.findAllIn(plan).size <= 1,
      s"only the scalar total may single-partition:\n$plan")
  }
}
