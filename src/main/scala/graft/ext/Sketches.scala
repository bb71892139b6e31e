package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Mergeable HLL sketch partials (X84) — incremental distinct counting,
  * the Iceberg/Delta "theta/HLL in the manifest" trick: materialize a
  * KB-sized Apache DataSketches HLL per partition/snapshot/day at write
  * time, and answer `COUNT(DISTINCT …)` over ANY window of them by
  * merging sketches — no rescan of the data, ever.
  *
  * Why this matters at 100 TB: exact distinct over a sliding 30-day
  * window re-shuffles 30 days of keys every day; sketch partials make it
  * a union of 30 KB-sized blobs — the same partial-aggregate shape as
  * X44's incremental counts/sums, extended to the one aggregate that is
  * NOT naively combinable. Spark 4 ships the DataSketches HLL natively
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`, all
  * codegen-adjacent imperative aggregates with map-side partials), so
  * the operator is pure built-ins — no UDAF.
  *
  * Correctness contract (the E5/X7 pattern for sketch operators):
  *  - MERGEABILITY is exact and hash-pinned: the estimate from unioned
  *    per-split partials must EQUAL the single-pass whole-data sketch
  *    estimate (`merge_lossless` — DataSketches HLL union of same-lgK
  *    sketches is deterministic), asserted as a real boolean on the
  *    Spark side and a literal TRUE in the oracle, so a regression
  *    breaks the hash.
  *  - ACCURACY is bounded per engine: each engine checks its own sketch
  *    against its own exact count (±10%, generous vs the ~1.6% HLL
  *    standard error at default lgK=12), like E5.
  *  - The EXACT count rides along for the value-level hash compare.
  */
object Sketches {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Distinct users per event type, computed three ways: exact, one
    // whole-pass sketch, and a union of per-half sketch partials (the
    // "per-snapshot sketches merged at query time" path). The halves
    // split on event_id parity — an adversarial split where every user
    // appears in both halves, so a broken union double-counts nothing
    // only if merging is genuinely lossless.
    "q_hll_partials" -> ((s, d) => {
      val e = events(s, d).select("event_type", "user_id", "event_id")
      val partials = e
        .withColumn("half", (col("event_id") % 2).cast("int"))
        .groupBy("event_type", "half")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = partials
        .groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))
      val whole = e.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_whole"),
          countDistinct(col("user_id")).as("n_exact"))
      merged.join(whole, Seq("event_type"))
        .select(col("event_type"), col("n_exact"),
          (col("est_merged") === col("est_whole")).as("merge_lossless"),
          (abs(col("est_merged") - col("n_exact")) <= col("n_exact") * 0.1)
            .as("approx_ok"))
        .orderBy("event_type")
    }),
  )

  val oracles: Map[String, String] = Map(
    // merge_lossless is the Spark-side mergeability assertion (TRUE here:
    // DuckDB cannot merge Spark's sketches, it pins that the property
    // held); approx_ok is each engine's own sketch vs its own exact
    // count, the E5 pattern.
    "q_hll_partials" ->
      """SELECT event_type,
        |       COUNT(DISTINCT user_id) AS n_exact,
        |       TRUE AS merge_lossless,
        |       ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
        |         <= COUNT(DISTINCT user_id) * 0.1 AS approx_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
