package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** X245 corpus datacard: one-pass per-source release card — conservation
  * vs the raw corpus plus a local replay of one source's row.
  */
class ProfileSpec extends SparkSpec {

  test("X245 datacard: conserves the corpus and matches a local per-source replay") {
    val rows = Profile.queries("q_datacard")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"),
          r.getAs[Long]("n_langs"), r.getAs[Long]("n_empty"),
          r.getAs[Long]("sum_stop_permille"), r.getAs[Long]("n_dup_docs")))
      .toMap
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select("source", "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.values.map(_._1).sum == docs.length)
    // local replay of the lexicographically first source's card
    val src = rows.keys.min
    val mine = docs.filter(_._1 == src)
    val toks = mine.map(d =>
      d._3.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val expect = (
      mine.length.toLong,
      toks.map(_.length.toLong).sum,
      mine.map(_._2).distinct.length.toLong,
      toks.count(_.isEmpty).toLong,
      toks.map(t => t.count(TextAnalysis.stopwords.contains) * 1000L /
        math.max(t.length, 1)).sum,
      (mine.length - mine.map(_._3).distinct.length).toLong)
    assert(rows(src) == expect, s"datacard row for $src diverges")
  }
}
