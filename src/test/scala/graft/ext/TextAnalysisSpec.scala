package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  private def onText(text: String) = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("tokenizer drops empties and lowercases") {
    val row = onText("  The  QUICK   fox ")
      .select(TextAnalysis.tokens(col("text")).as("t")).head()
    assert(row.getSeq[String](0) == Seq("the", "quick", "fox"))
  }

  test("rolling hash matches a hand-computed polynomial") {
    // norm("Ab  c") = "ab c"; fp = ((((7*31+97)*31+98)*31+32)*31+99) mod 1e9+7
    val expected = Seq(97L, 98L, 32L, 99L).foldLeft(7L)((a, c) => (a * 31 + c) % 1000000007L)
    val got = onText("Ab  c")
      .select(aggregate(
        transform(split(TextAnalysis.normText(col("text")), ""), c => ascii(c).cast("long")),
        lit(7L), (acc, c) => (acc * 31L + c) % 1000000007L).as("fp"))
      .head().getLong(0)
    assert(got == expected)
  }

  test("quality metrics are exact integer counts") {
    val r: Row = TextAnalysis.queries("q_text_quality")(spark, sf)
      .where(col("doc_id") === 0).head()
    val nTokens = r.getAs[Long]("n_tokens")
    val nDistinct = r.getAs[Long]("n_distinct")
    assert(nTokens > 0 && nDistinct > 0 && nDistinct <= nTokens)
    assert(r.getAs[Long]("max_tok_len") >= 1)
  }

  test("lang id votes markers with deterministic tie-break") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat of a hat"),   // en markers: the, of, a → en
      (2L, "der die das"),        // de markers → de
      (3L, "xyz qqq zzz"),        // no markers → und
      (4L, "the der"),            // tie 1-1 → lexicographic first: de
    ).toDF("doc_id", "text")
    val byId = TextAnalysis.queries("q_lang_id")(spark, sf) // touch fixture path
    assert(byId.columns.contains("predicted_lang"))
    val out = df.select(
      (col("doc_id") +: TextAnalysis.langMarkers.map { case (l, ws) =>
        size(filter(TextAnalysis.tokens(col("text")),
          t => array_contains(lit(ws.toArray), t))).cast("long").as(s"n_$l")
      }): _*)
    val langs = TextAnalysis.langMarkers.map(_._1)
    val mx = greatest(langs.map(l => col(s"n_$l")): _*)
    val pred = langs.foldRight(lit("und")) { (l, els) =>
      when(col(s"n_$l") === mx && mx > 0, lit(l)).otherwise(els)
    }
    val got = out.withColumn("p", pred).orderBy("doc_id")
      .select("p").as[String].collect().toSeq
    assert(got == Seq("en", "de", "und", "de"))
  }

  test("X233 lang-mix: a half-English half-German doc flags mixed; monolingual and unscored docs don't") {
    import spark.implicits._
    val dir = graft.util.Scratch.dir("langmix_golden")
    // 10-token spans: doc 1 = one English span + one German span (mixed);
    // doc 2 = two English spans (consistent); doc 3 = no markers at all
    val en = "the cat sat of a mat and the dog is" // 10 tokens, en markers
    val de = "der hund und die katze nicht der die und das" // 10, de markers
    Seq((1L, s"$en $de", "src1"), (2L, s"$en $en", "src1"),
      (3L, "lorem ipsum dolor sit amet foo bar baz qux corge", "src2"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.queries("q_lang_mix")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_mixed"),
          r.getAs[Long]("sum_scored"), r.getAs[Long]("sum_agree"))).toMap
    // src1: 2 docs, exactly the bilingual one mixed. Doc 1's majority is
    // de (10 German markers vs 5 English across the doc), so its English
    // span is the one scored disagreement; 4 scored spans total
    assert(rows("src1")._1 == 2 && rows("src1")._2 == 1, rows.toString)
    assert(rows("src1")._3 == rows("src1")._4 + 1,
      "exactly one scored span disagrees with its doc majority")
    // src2: unscored doc — never mixed
    assert(rows("src2") == ((1L, 0L, 0L, 0L)), rows.toString)
  }

  test("token counts: bpe regex splits punctuation that whitespace keeps") {
    import spark.implicits._
    val df = Seq((1L, "don't stop me-now 42x")).toDF("doc_id", "text")
    val r = df.select(
      size(TextAnalysis.tokens(col("text"))).as("ws"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("bpe")).head()
    assert(r.getAs[Int]("ws") == 4)
    // don / ' / t / stop / me / - / now / 42 / x
    assert(r.getAs[Int]("bpe") == 9)
  }

  test("X246 vocab growth: curve is monotone, lands on the true vocabulary, tiles the corpus") {
    val rows = TextAnalysis.queries("q_vocab_growth")(spark, sf).collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_new_tokens"), r.getAs[Long]("cum_vocab")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 9L))
    // deciles tile the corpus near-evenly (ntile arithmetic: ±1)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    assert(rows.map(_._2).sum == docs.length)
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    // cum_vocab is the running sum of n_new and ends at the true vocab
    rows.foldLeft(0L) { case (acc, (_, _, nn, cum)) =>
      assert(cum == acc + nn); cum
    }
    val vocab = docs.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .distinct.length.toLong
    assert(rows.last._4 == vocab, s"curve must land on |V| = $vocab")
    // growth: the first decile discovers the most new tokens on this corpus
    assert(rows.head._3 >= rows.last._3)
  }
}
