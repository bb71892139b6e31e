package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sequence packing for training-batch assembly (X45): assign documents to
  * fixed token-capacity packs — the step that turns a cleaned corpus into
  * context-window-sized training examples.
  *
  * Packing discipline: CONTIGUOUS CHUNKING in deterministic (lang, doc_id)
  * order — a doc joins the pack its cumulative token offset falls in
  * (`cum_before DIV capacity`). This is the cheap, shuffle-light variant
  * real pipelines run (a pack can overfill by at most its last doc's
  * tokens, which batch assembly handles by truncation/continuation);
  * first-fit-decreasing bin packing would need an inherently sequential
  * scan per bin and buys little when docs ≪ capacity. The assignment is a
  * pure function of (ordering key, token counts): re-runs and backfills
  * give identical packs, like X35/X44.
  *
  * Scale shape: one window (running sum) per language partition over a
  * (lang, doc_id) sort — at 100 TB this is a range-partitioned sort the
  * shuffle already provides, then per-row arithmetic; the final groupBy
  * is combinable. No driver state, no iteration.
  */
object Packing {
  type Q = (SparkSession, String) => DataFrame

  /** Tokens per pack. Fixture-sized here; a real run passes its model's
    * context length — the plan shape is capacity-independent.
    */
  val capacity = 256L

  /** Per-doc pack assignment: `pack_id` within each language. */
  def packed(docs: DataFrame, cap: Long = capacity): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("lang"), col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("pack_id", expr(s"cum_before DIV $cap"))
  }

  val queries: Map[String, Q] = Map(
    // Pack manifest: docs/tokens per pack plus the id range, the exact
    // thing a batch loader consumes. The oracle recomputes the running
    // sum and integer division over the same whitespace tokenization.
    "q_seq_pack" -> ((s, d) =>
      packed(Tables.documents(s, d))
        .groupBy("lang", "pack_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").as("pack_tokens"),
          min("doc_id").as("first_doc"),
          max("doc_id").as("last_doc"))
        .orderBy("lang", "pack_id")),

    // X50: retrieval-side chunking — sliding token windows (chunkSize
    // tokens, chunkStride apart → fixed overlap for boundary-context
    // retention, the standard RAG chunker) with STABLE (doc_id,
    // chunk_idx) identity: the id contract an index needs for
    // incremental re-embedding. Pure per-row explode over the shared
    // tokenization, no shuffle; chunk text pinned byte-exact via md5.
    "q_doc_chunks" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
        .where(size(col("tk")) > 0)
        .withColumn("last_w", expr(s"(size(tk) - 1) DIV $chunkStride"))
        .select(col("doc_id"), col("tk"),
          posexplode(sequence(lit(0), col("last_w"))))
        .select(col("doc_id"),
          col("col").cast("long").as("chunk_idx"),
          slice(col("tk"), col("col") * chunkStride + 1, lit(chunkSize)).as("ch"))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("ch")).cast("long").as("chunk_tokens"),
          md5(array_join(col("ch"), " ")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")),
  )

  /** RAG chunk geometry: 32-token windows every 24 tokens (8 overlap). */
  val chunkSize = 32
  val chunkStride = 24

  val oracles: Map[String, String] = Map(
    "q_seq_pack" ->
      s"""SELECT lang, pack_id,
         |  count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
         |  min(doc_id) AS first_doc,
         |  max(doc_id) AS last_doc
         |FROM (
         |  SELECT lang, doc_id, n_tokens,
         |    CAST(coalesce(sum(n_tokens) OVER (
         |      PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      // $capacity AS pack_id
         |  FROM (SELECT lang, doc_id,
         |          CAST(len(${TextAnalysis.toksSql}) AS BIGINT) AS n_tokens
         |        FROM documents))
         |GROUP BY lang, pack_id
         |ORDER BY lang, pack_id""".stripMargin,
    "q_doc_chunks" ->
      s"""SELECT doc_id, CAST(w AS BIGINT) AS chunk_idx,
         |       CAST(len(ch) AS BIGINT) AS chunk_tokens,
         |       md5(array_to_string(ch, ' ')) AS chunk_md5
         |FROM (
         |  SELECT doc_id, w,
         |    list_slice(tk, w * $chunkStride + 1, w * $chunkStride + $chunkSize) AS ch
         |  FROM (SELECT doc_id, tk, unnest(range(0, (len(tk) - 1) // $chunkStride + 1)) AS w
         |        FROM (SELECT doc_id, ${TextAnalysis.toksSql} AS tk FROM documents)
         |        WHERE len(tk) > 0))
         |ORDER BY doc_id, chunk_idx""".stripMargin,
  )
}
