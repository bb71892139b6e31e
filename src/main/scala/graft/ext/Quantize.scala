package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Int8 scalar quantization of embedding vectors (X46) — the memory-
  * bandwidth lever of large-scale ANN: 4 bytes/dim float32 → 1 byte/dim
  * codes (plus one float scale per vector) cuts the scan volume of the
  * rerank/search tiers 4×, which at 100 TB of embeddings is the
  * difference between a bandwidth-bound and a compute-bound scan.
  *
  * Scheme: symmetric per-vector quantization — `code_i = trunc(x_i /
  * max|x| · 127)`, reconstruction `code_i · max|x| / 127`, absolute error
  * ≤ max|x|/127 per dimension (pinned in QuantizeSpec). All per-row
  * column expressions (no shuffle, no UDF); the double arithmetic is
  * written with the IDENTICAL operation order in the DuckDB oracle, so
  * the hash pins cross-engine IEEE bit-agreement of the whole pipeline,
  * not just "roughly similar codes".
  */
object Quantize {
  type Q = (SparkSession, String) => DataFrame

  /** Per-vector max|x| (double); the quantization scale is maxAbs/127. */
  def maxAbs(emb: Column): Column =
    array_max(transform(emb, x => abs(x.cast("double"))))

  /** Int codes in [-127, 127]; the all-zero vector quantizes to zeros
    * (guarding the 0/0 NaN).
    */
  def codes(emb: Column): Column = {
    val m = maxAbs(emb)
    when(m === 0d, transform(emb, _ => lit(0L)))
      .otherwise(transform(emb, x =>
        (x.cast("double") / m * 127d).cast("long")))
  }

  val queries: Map[String, Q] = Map(
    // Quantization manifest per vector: dimension count and the code
    // stream's sum/extrema — enough to pin every code value's sign,
    // truncation, and scale handling against the oracle's recomputation.
    "q_embed_quant" -> ((s, d) => {
      val c = codes(col("embedding"))
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        aggregate(c, lit(0L), (acc, x) => acc + x).as("sum_codes"),
        array_min(c).as("min_code"),
        array_max(c).as("max_code"))
        .orderBy("vec_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    // trunc() before the BIGINT cast: DuckDB CAST(double AS BIGINT)
    // ROUNDS where Spark's cast truncates — the explicit trunc aligns
    // them (toward zero in both engines).
    "q_embed_quant" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS n_dims,
        |  CAST(list_sum(codes) AS BIGINT) AS sum_codes,
        |  CAST(list_min(codes) AS BIGINT) AS min_code,
        |  CAST(list_max(codes) AS BIGINT) AS max_code
        |FROM (
        |  SELECT vec_id,
        |    embedding,
        |    CASE WHEN m = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |         ELSE list_transform(embedding,
        |                x -> CAST(trunc(CAST(x AS DOUBLE) / m * 127) AS BIGINT)) END AS codes
        |  FROM (SELECT vec_id, embedding,
        |          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
        |        FROM embeddings))
        |ORDER BY vec_id""".stripMargin,
  )
}
