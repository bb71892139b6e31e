package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Temperature-balanced corpus resampling (X56): derive per-language keep
  * rates from the corpus's own language distribution and subsample so the
  * training mix follows `p_l^α` (α = 0.5 here) instead of the raw crawl
  * skew — the standard multilingual rebalancing knob (mBERT/XLM-R exponent
  * sampling; unlike X44's caller-supplied rates, the rates are COMPUTED
  * from corpus statistics).
  *
  * With keep-rate k_l ∝ q_l / p_l and q_l ∝ p_l^α, the normalization that
  * never oversamples is k_l = (n_min / n_l)^(1-α) — the smallest language
  * is kept whole and larger ones are thinned toward it. At α = 0.5 this is
  * `sqrt(n_min / n_l)`: sqrt and the power-of-two division in the hash
  * bucket are both correctly-rounded IEEE ops, so Spark and the oracle
  * agree bit-for-bit with no DECIMAL detour.
  *
  * Scale shape: one combinable count per language (a #langs-row table),
  * broadcast back; membership is then a pure per-row function of
  * (doc_id, rate) — md5-uniform in [0,1) vs the rate, the X35/X44
  * deterministic-sampling mechanism, so re-runs and backfills keep
  * identical documents. The corpus side never shuffles except the final
  * vocab-sized report aggregate.
  */
object Temperature {
  type Q = (SparkSession, String) => DataFrame

  /** md5-derived uniform in [0,1): first 8 hex chars / 2^32 (exact). */
  def hashUniform(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)

  /** Per-language keep rates `sqrt(n_min / n_l)` for `docs`. */
  def keepRates(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_total"))
    val nMin = counts.agg(min("n_total").as("n_min"))
    counts.crossJoin(broadcast(nMin))
      .select(col("lang"), col("n_total"),
        sqrt(col("n_min").cast("double") / col("n_total").cast("double"))
          .as("keep_rate"))
  }

  /** Docs annotated with their sampling decision. */
  def resample(docs: DataFrame): DataFrame =
    docs.join(broadcast(keepRates(docs)), Seq("lang"))
      .withColumn("kept", hashUniform(col("doc_id")) < col("keep_rate"))

  val queries: Map[String, Q] = Map(
    // Per-language report: rate, kept count, and the sum of kept ids —
    // membership is pinned, not just cardinality.
    "q_temperature_sample" -> ((s, d) =>
      resample(Tables.documents(s, d))
        .groupBy("lang")
        .agg(
          first("n_total").as("n_total"),
          first("keep_rate").as("keep_rate"),
          count(when(col("kept"), 1)).as("n_sampled"),
          sum(when(col("kept"), col("doc_id"))).cast("long").as("sum_kept_ids"))
        .orderBy("lang")),
  )

  val oracles: Map[String, String] = Map(
    "q_temperature_sample" ->
      """WITH counts AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_total FROM documents GROUP BY 1
        |),
        |rates AS (
        |  SELECT lang, n_total,
        |    sqrt(CAST((SELECT min(n_total) FROM counts) AS DOUBLE)
        |         / CAST(n_total AS DOUBLE)) AS keep_rate
        |  FROM counts
        |)
        |SELECT d.lang,
        |  any_value(r.n_total) AS n_total,
        |  any_value(r.keep_rate) AS keep_rate,
        |  count(CASE WHEN CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE)
        |                 / 4294967296.0 < r.keep_rate THEN 1 END) AS n_sampled,
        |  CAST(sum(CASE WHEN CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE)
        |                 / 4294967296.0 < r.keep_rate THEN d.doc_id END) AS BIGINT) AS sum_kept_ids
        |FROM documents d JOIN rates r ON d.lang = r.lang
        |GROUP BY d.lang
        |ORDER BY d.lang""".stripMargin,
  )
}
