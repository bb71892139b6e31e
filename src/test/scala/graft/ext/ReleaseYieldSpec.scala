package graft.ext

import graft.SparkSpec

/** X254 composed yield funnel: monotone shrink through the doc stages,
  * every stage cuts something on the fixture, pack arithmetic closes.
  */
class ReleaseYieldSpec extends SparkSpec {

  test("X254 release yield: stages shrink monotonically, each cut is live, packs close") {
    val rows = ReleaseYield.queries("q_release_yield")(spark, sf).collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[Long]("n_units"),
        r.getAs[Long]("sum_tokens"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(
      "0_raw", "1_quality", "2_dedup", "3_budget", "4_packed"))
    val Seq(raw, qual, dedup, budget, packed) = rows.toSeq
    // doc stages shrink monotonically, and every cut removes something
    assert(raw._2 > qual._2 && qual._2 > dedup._2 && dedup._2 > budget._2,
      s"a stage cut nothing: ${rows.mkString(", ")}")
    assert(raw._3 > qual._3 && qual._3 > dedup._3 && dedup._3 > budget._3)
    // the budget stage honors the 40%-of-survivor-mass contract (X45
    // inclusion rule: bounded overshoot by one doc's tokens)
    val bar = dedup._3 * Selection.budgetNum / Selection.budgetDen
    assert(budget._3 >= bar && budget._3 < bar + Scrub.funnelMaxTok,
      s"budget mass ${budget._3} vs bar $bar")
    // packing conserves tokens; contiguous packs overflow by at most one
    // doc (X45's rule: a doc joins the pack its cum_before falls in), so
    // n_packs = (total − last_doc_tokens) div cap + 1 ∈
    //   [(total − maxDoc) div cap + 1, total div cap + 1]
    assert(packed._3 == budget._3)
    val lo = (budget._3 - Scrub.funnelMaxTok) / Packing.capacity + 1
    val hi = budget._3 / Packing.capacity + 1
    assert(packed._2 >= lo && packed._2 <= hi,
      s"pack count ${packed._2} outside [$lo, $hi]")
  }
}
