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
  *
  * Also hosts the other example-assembly transforms: X50 RAG chunking
  * and X236 fill-in-the-middle (both pure per-row explode/arithmetic
  * over the shared tokenization — embarrassingly parallel at any scale).
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

    // X236: fill-in-the-middle example assembly — the FIM transform
    // (OpenAI FIM / StarCoder data prep) distilled to its
    // data-engineering core: split each document's token list at two
    // DETERMINISTIC cut points (salted md5 of the doc id — reruns and
    // backfills rebuild byte-identical examples, no stored RNG state)
    // and re-render in PSM order (<PRE> prefix <SUF> suffix <MID>
    // middle), the layout that teaches an autoregressive model to
    // infill. Cut-point contract: prefix ≥ 1, middle ≥ 1, suffix ≥ 1
    // token (degenerate empty spans teach nothing), so only docs with
    // ≥ 3 tokens transform. Pure per-row arithmetic over the shared
    // tokenization — no shuffle, no corpus self-join; the rendered
    // example is pinned byte-exact via md5.
    "q_fim" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
        .withColumn("n", size(col("tk")).cast("long"))
        .where(col("n") >= 3)
        .withColumn("c1", lit(1L) + saltedH40("fim1", col("doc_id")) % (col("n") - 2))
        .withColumn("m", lit(1L) + saltedH40("fim2", col("doc_id")) % (col("n") - col("c1") - 1))
        .select(col("doc_id"),
          col("c1").as("n_pre"),
          col("m").as("n_mid"),
          (col("n") - col("c1") - col("m")).as("n_suf"),
          md5(concat(
            lit("<PRE>"), array_join(slice(col("tk"), lit(1), col("c1").cast("int")), " "),
            lit("<SUF>"), array_join(
              slice(col("tk"), (col("c1") + col("m") + 1).cast("int"),
                (col("n") - col("c1") - col("m")).cast("int")), " "),
            lit("<MID>"), array_join(
              slice(col("tk"), (col("c1") + 1).cast("int"), col("m").cast("int")), " ")))
            .as("fim_md5"))
        .orderBy("doc_id")),

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

  /** 40-bit md5 prefix of `salt:id` — the X136/X228 deterministic-choice
    * hash (nonnegative, so `%` agrees between Spark and DuckDB).
    */
  private def saltedH40(salt: String, id: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit(s"$salt:"), id.cast("string"))), 1, 10), 16, 10)
      .cast("long")

  private def saltedH40Sql(salt: String) =
    s"CAST(('0x' || substr(md5('$salt:' || CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT)"

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
    "q_fim" ->
      s"""SELECT doc_id,
         |       c1 AS n_pre, m AS n_mid, n - c1 - m AS n_suf,
         |       md5('<PRE>' || array_to_string(list_slice(tk, 1, c1), ' ') ||
         |           '<SUF>' || array_to_string(list_slice(tk, c1 + m + 1, n), ' ') ||
         |           '<MID>' || array_to_string(list_slice(tk, c1 + 1, c1 + m), ' ')) AS fim_md5
         |FROM (
         |  SELECT doc_id, tk, n, c1,
         |         1 + ${saltedH40Sql("fim2")} % (n - c1 - 1) AS m
         |  FROM (
         |    SELECT doc_id, tk, n,
         |           1 + ${saltedH40Sql("fim1")} % (n - 2) AS c1
         |    FROM (SELECT doc_id, ${TextAnalysis.toksSql} AS tk,
         |                 CAST(len(${TextAnalysis.toksSql}) AS BIGINT) AS n
         |          FROM documents)
         |    WHERE n >= 3))
         |ORDER BY doc_id""".stripMargin,

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
