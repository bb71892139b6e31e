package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** X167: Version-keyed query result cache — the Snowflake result-cache /
  * materialized-query shape with CONTENT-ADDRESSED invalidation: a cached
  * result is keyed by (query tag, the latest committed VERSION of every
  * input table), so staleness is structurally impossible — any commit to
  * any input changes the key, and the stale entry is simply never looked
  * up again (X61-style vacuum reclaims it later). This is what makes
  * repeated dashboard/report queries over slowly-committing tables cost
  * one metadata read instead of a recompute — and it only works because
  * X39 gives tables a VERSION to key on (a plain directory of parquet
  * has no cheap content address).
  *
  * Entry layout: `_results/<tag>/k<v1>_<v2>…/data` + a marker file
  * written LAST — a crash mid-write leaves no marker and the next call
  * recomputes over it (mode=overwrite). Concurrent fillers both compute
  * the same deterministic result and the second overwrite is benign.
  * The cache stores result ROWS, not row order — callers re-impose
  * ordering after the read (the same contract as any parquet round-trip).
  */
object ResultCache {
  type Q = (SparkSession, String) => DataFrame

  /** Serve `tag` from the cache under `root` if an entry exists for the
    * CURRENT versions of `inputs`; otherwise compute, store, and serve.
    */
  def cached(spark: SparkSession, root: String, tag: String, inputs: Seq[String])(
      compute: => DataFrame): DataFrame = {
    require(tag.matches("[A-Za-z0-9._-]+"), s"illegal cache tag '$tag'")
    val key = inputs.map(d =>
      ManifestTable.latestVersion(spark, d).getOrElse(0)).mkString("k", "_", "")
    val dir = s"$root/_results/$tag/$key"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(dir, "_RESULT_COMMITTED")
    if (!fs.exists(marker)) {
      compute.write.mode("overwrite").parquet(s"$dir/data")
      fs.create(marker, true).close() // commit point: marker last
    }
    spark.read.parquet(s"$dir/data")
  }

  val queries: Map[String, Q] = Map(
    // A two-version orders table (even keys committed, odd keys
    // appended) with a per-status aggregate cached at BOTH versions:
    // the v1 entry is served from cache on the repeat call (spec pins
    // the compute runs once), the append invalidates by construction —
    // the v2 key is new, so the second state recomputes over the full
    // table. Output = both cached states, which the oracle rebuilds
    // from the raw slices.
    "q_result_cache" -> ((s, d) => {
      val root = graft.util.FixtureCache.dir("result_cache", d) { root =>
        val o = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
        ManifestTable.commit(o.where(col("o_orderkey") % 2 === 0), s"$root/t",
          20250601, 900)
        def agg() = ManifestTable.readLatest(s, s"$root/t")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            graft.util.Exact.dsum(col("o_totalprice")).as("sum_price"))
        // v1: fill + a repeat call that must serve from the entry
        cached(s, root, "status_agg", Seq(s"$root/t"))(agg()).count()
        cached(s, root, "status_agg", Seq(s"$root/t"))(agg()).count()
        ManifestTable.appendRetrying(Tables.orders(s, d)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .where(col("o_orderkey") % 2 =!= 0), s"$root/t", 20250601, 930)
        cached(s, root, "status_agg", Seq(s"$root/t"))(agg()).count()
      }
      def entry(state: String, versions: String) =
        s.read.parquet(s"$root/_results/status_agg/$versions/data")
          .withColumn("state", lit(state))
      entry("v1", "k1").unionByName(entry("v2", "k2"))
        .select("state", "o_orderstatus", "n", "sum_price")
        .orderBy("state", "o_orderstatus")
    }))

  val oracles: Map[String, String] = Map(
    "q_result_cache" ->
      """SELECT * FROM (
        |  SELECT 'v1' AS state, o_orderstatus, count(*) AS n,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_orderstatus
        |  UNION ALL
        |  SELECT 'v2', o_orderstatus, count(*),
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |  FROM orders GROUP BY o_orderstatus
        |) ORDER BY state, o_orderstatus""".stripMargin)
}
