package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Benchmark decontamination (X53): flag training documents that share any
  * n-gram with a held-out evaluation set — the standard guard against
  * test-set leakage into a training corpus (GPT-3 §C used 13-grams,
  * PaLM/Llama 8–10; the principle is n-gram overlap against the benchmark).
  *
  * Fixture contract: the "benchmark" is the deterministic slice
  * `doc_id % 97 = 0` of `documents` (≈1%); every other doc is training. We
  * use 4-grams — on this fixture's small synthetic vocabulary a 4-gram
  * collision is as rare as an 8-gram collision on real text (measured: 8 of
  * 494 train docs flagged at sf0.01), so the operator exercises the real
  * sparse-overlap regime. `ngramN` is a parameter; the plan shape is
  * n-independent.
  *
  * Scale shape: the eval side is tiny by definition (a benchmark, not a
  * corpus) — its distinct n-gram set builds in one combinable
  * `distinct` and BROADCASTS to the train side, so the train-side scan
  * explodes its own n-grams, probes the broadcast hash table (a broadcast
  * semi/left join — no shuffle of the 100 TB side), and re-aggregates by
  * `doc_id`, which is combinable map-side because exploded rows of a doc
  * stay in their input partition. The only wide exchange is the final
  * orderBy (hash-gate determinism, not production). At real scale the
  * broadcast set would be n-gram *hashes* (8 bytes each) rather than
  * strings; here the join key stays the string so the DuckDB oracle is
  * hash-function-independent.
  *
  * Reference scope: extension surface (builder prompt; SURVEY §2 X53).
  */
object Decontam {
  type Q = (SparkSession, String) => DataFrame

  /** N-gram order for overlap detection (see scaling note above). */
  val ngramN = 4

  /** Modulus defining the eval slice of the fixture corpus. */
  val evalMod = 97

  /** Per-train-doc contamination report against `eval`'s n-gram set.
    * Both inputs are `(doc_id, text)`-shaped; output is one row per train
    * doc with at least `ngramN` tokens.
    */
  def contamination(train: DataFrame, eval: DataFrame, n: Int = ngramN): DataFrame = {
    def docNgrams(df: DataFrame): DataFrame =
      df.select(col("doc_id"),
          array_distinct(Repetition.ngrams(TextAnalysis.tokens(col("text")), n)).as("ngs"))
        .where(size(col("ngs")) > 0)

    val evalNgrams = docNgrams(eval)
      .select(explode(col("ngs")).as("g")).distinct()

    docNgrams(train)
      .select(col("doc_id"), size(col("ngs")).cast("long").as("n_ngrams"), explode(col("ngs")).as("g"))
      .join(broadcast(evalNgrams.withColumn("hit", lit(1L))), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(
        first("n_ngrams").as("n_ngrams"),
        coalesce(sum("hit"), lit(0L)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  val queries: Map[String, Q] = Map(
    "q_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      contamination(
        docs.where(col("doc_id") % evalMod =!= 0),
        docs.where(col("doc_id") % evalMod === 0))
        .orderBy("doc_id")
    }),
  )

  import TextAnalysis.toksSql

  val oracles: Map[String, String] = Map(
    "q_decontaminate" ->
      s"""WITH ng AS (
         |  SELECT doc_id,
         |         list_distinct(list_transform(range(1, len(tk) - ${ngramN - 2}),
         |           i -> array_to_string(list_slice(tk, i, i + ${ngramN - 1}), ' '))) AS ngs
         |  FROM (SELECT doc_id, $toksSql AS tk FROM documents)
         |),
         |ev AS (
         |  SELECT DISTINCT unnest(ngs) AS g FROM ng WHERE doc_id % $evalMod = 0
         |),
         |tr AS (
         |  SELECT doc_id, len(ngs) AS n_ngrams, unnest(ngs) AS g
         |  FROM ng WHERE doc_id % $evalMod <> 0 AND len(ngs) > 0
         |)
         |SELECT tr.doc_id,
         |  CAST(any_value(tr.n_ngrams) AS BIGINT) AS n_ngrams,
         |  CAST(count(ev.g) AS BIGINT) AS n_overlap,
         |  count(ev.g) > 0 AS contaminated
         |FROM tr LEFT JOIN ev ON tr.g = ev.g
         |GROUP BY tr.doc_id
         |ORDER BY tr.doc_id""".stripMargin,
  )
}
