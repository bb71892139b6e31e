package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextNorm

/** X42–X44 pins beyond the hash gate: golden redactions, NFC composition
  * through the native expression (including codegen), and sampling
  * determinism/stratification.
  */
class ScrubSpec extends SparkSpec {
  import spark.implicits._

  test("scrub: golden redaction of email, ip, and phone in one pass") {
    val out = Seq("Write bob.smith+x@corp.example.org from 192.168.1.77 or +44-20-7946-0958 ok")
      .toDF("t").select(Scrub.scrubPii(col("t")).as("s")).head.getString(0)
    assert(out == "Write [EMAIL] from [IP] or [PHONE] ok")
  }

  test("scrub: plain digit runs shorter than phones and bare domains survive") {
    val out = Seq("order 12345 at example.org room 10-b")
      .toDF("t").select(Scrub.scrubPii(col("t")).as("s")).head.getString(0)
    assert(out == "order 12345 at example.org room 10-b")
  }

  test("nfc_norm: composes combining marks, identity on composed text, null-safe") {
    val df = Seq(
      (1, "cafe\u0301"),  // e + combining acute, decomposed
      (2, "caf\u00e9"),   // already composed
      (3, null: String))
      .toDF("id", "t")
      .select(col("id"), TextNorm.nfc_norm(col("t")).as("n"),
        length(TextNorm.nfc_norm(col("t"))).as("len"))
      .orderBy("id").collect()
    assert(df(0).getString(1) == "caf\u00e9" && df(0).getInt(2) == 4)
    assert(df(1).getString(1) == "caf\u00e9")
    assert(df(2).isNullAt(1))
  }

  test("nfc_norm: stays inside whole-stage codegen") {
    // a range source, not a local Seq: ConvertToLocalRelation would
    // evaluate a constant projection at optimization time and leave no
    // executed stage to inspect
    val df = spark.range(3).select(
      TextNorm.nfc_norm(concat(lit("a\u0301"), col("id").cast("string"))).as("n"))
    val rows = df.collect().map(_.getString(0)).sorted
    assert(rows.head == "\u00e10") // composed \u00e1 + "0"
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expression fell out of codegen:\n$plan")
  }

  test("stratified sample: deterministic across re-runs and really stratified") {
    val a = Scrub.queries("q_stratified_sample")(spark, sf).collect().map(_.toString)
    val b = Scrub.queries("q_stratified_sample")(spark, sf).collect().map(_.toString)
    assert(a.sameElements(b))
    val byLang = Scrub.queries("q_stratified_sample")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // en kept at ~60%, others at their configured rates (md5 buckets are
    // uniform enough at fixture size for a wide corridor)
    val (enDocs, enKept) = byLang("en")
    assert(enKept > enDocs * 4 / 10 && enKept < enDocs * 8 / 10)
    byLang.filterKeys(k => k != "en" && k != "fr").values.foreach { case (n, kept) =>
      assert(kept < n * 3 / 10, s"else-rate class kept $kept of $n")
    }
  }

  test("X247 filter funnel: verdicts partition the corpus, attribution matches a local replay") {
    val rows = Scrub.queries("q_filter_funnel")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("verdict")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_ids"))).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // every doc lands in exactly one verdict bucket
    assert(rows.values.map(_._1).sum == docs.length)
    // local replay of the rule ladder, first-failing wins
    val expect = docs.groupBy { case (id, src, text) =>
      val tk = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val stop = tk.count(TextAnalysis.stopwords.contains)
      val v =
        if (tk.length < Scrub.funnelMinTok) "1_too_short"
        else if (tk.length > Scrub.funnelMaxTok) "2_too_long"
        else if (stop * 16 < tk.length) "3_low_fluency"
        else if ((tk.length - tk.distinct.length).toLong * 1000 >
          tk.length.toLong * Scrub.funnelRepPermille) "4_repetitive"
        else "5_kept"
      (src, v)
    }.map { case (k, ds) => k -> (ds.length.toLong, ds.map(_._1).sum) }
    assert(rows == expect)
    // the fixture exercises the whole ladder
    val verdicts = rows.keys.map(_._2).toSet
    assert(verdicts == Set("1_too_short", "2_too_long", "3_low_fluency",
      "4_repetitive", "5_kept"), s"missing verdicts: $verdicts")
  }
}
