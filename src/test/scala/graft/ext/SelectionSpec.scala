package graft.ext

import graft.SparkSpec
import graft.sources.Tables

/** X240 budgeted selection: the per-source manifest equals a local
  * replay of the fluent-first greedy cut, and the token mass brackets
  * the budget (inclusion rule: overshoot < one doc).
  */
class SelectionSpec extends SparkSpec {

  test("X240 budget select: output equals the local replay; token mass brackets the budget") {
    val got = Selection.queries("q_budget_select")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_sel"), r.getAs[Long]("sel_tokens"),
          r.getAs[Long]("sum_ids"))).toMap
    // local replay of the whole contract
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val toks = r.getString(2).toLowerCase.split("\\s+").filter(_.nonEmpty)
        val permille =
          toks.count(TextAnalysis.stopwords.contains) * 1000L /
            math.max(toks.length, 1)
        (r.getLong(0), r.getString(1), toks.length.toLong, permille)
      }
    val total = docs.map(_._3).sum
    val budget = total * Selection.budgetNum / Selection.budgetDen
    var cum = 0L
    val selected = docs
      .sortBy { case (id, _, _, p) => (1000L - p, id) }
      .takeWhile { case (_, _, n, _) =>
        val in = cum < budget; cum += n; in
      }
    val expect = selected.groupBy(_._2).map { case (src, rs) =>
      src -> (rs.length.toLong, rs.map(_._3).sum, rs.map(_._1).sum)
    }
    assert(got == expect)
    // B <= selected tokens < B + max single doc (the X45 inclusion rule)
    val selTok = got.values.map(_._2).sum
    assert(selTok >= budget && selTok < budget + docs.map(_._3).max,
      s"selected $selTok vs budget $budget")
  }
}
