package graft.ext

import graft.SparkSpec
import graft.sources.Tables

/** X239 UniMax allocation and X241 source-overlap matrix: cap/budget
  * invariants with both waterfill branches firing, and the overlap
  * matrix replayed brute-force from the raw corpus.
  */
class MixtureSpec extends SparkSpec {

  test("X239 unimax: caps respected, budget exactly spent or everyone capped, both branches fire") {
    val rows = Mixture.queries("q_unimax")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("sum_tokens"),
        r.getAs[Long]("cap_tokens"), r.getAs[Long]("alloc_tokens"),
        r.getAs[Long]("epochs_permille")))
    assert(rows.nonEmpty)
    val budget =
      rows.map(_._2).sum * Mixture.budgetNum / Mixture.budgetDen
    rows.foreach { case (src, s, cap, a, perm) =>
      assert(cap == s * Mixture.capPermille / 1000, s"$src cap arithmetic")
      assert(a <= cap, s"$src allocated over its repetition cap")
      assert(perm <= Mixture.capPermille, s"$src epochs over cap")
    }
    val spent = rows.map(_._4).sum
    assert(spent <= budget)
    // waterfill exhausts the budget unless every source is capped
    val capped = rows.count { case (_, _, cap, a, _) => a == cap }
    assert(spent == budget || capped == rows.length,
      s"left $budget - $spent = ${budget - spent} unspent with uncapped sources")
    assert(capped > 0 && capped < rows.length,
      s"fixture should fire both branches (capped=$capped of ${rows.length})")
  }

  test("X241 source overlap: matrix equals a local brute-force replay of shared shingle counts") {
    val got = Mixture.queries("q_source_overlap")(spark, sf).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("n_shared"), r.getAs[Long]("jac_permille"))).toMap
    // brute-force: per-source distinct 4-gram shingle sets from raw text
    val bySource = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
      .map { case (src, docs) =>
        src -> docs.flatMap { case (_, text) =>
          text.toLowerCase.split("\\s+").filter(_.nonEmpty)
            .sliding(Dedup.shingleLen).filter(_.length == Dedup.shingleLen)
            .map(_.mkString(" "))
        }.toSet
      }
    val expect = (for {
      a <- bySource.keys; b <- bySource.keys if a < b
      shared = (bySource(a) intersect bySource(b)).size.toLong if shared > 0
    } yield (a, b) -> (shared,
      shared * 1000 / (bySource(a).size + bySource(b).size - shared))).toMap
    assert(got == expect, s"matrix mismatch: got ${got.size} pairs, expected ${expect.size}")
    assert(got.nonEmpty, "fixture sources should share at least one shingle")
  }
}
