package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Exact.dsum

/** Change feed across manifest versions (X75) — the Delta CDF / Iceberg
  * incremental-read shape: expose WHAT CHANGED between committed versions
  * as consumable rows, so a downstream copy syncs by reading the feed
  * instead of re-diffing full snapshots (the reference's consumers get
  * this only for the one hand-diffed table pair,
  * `scripts/script_api_apify_to_spark.py:238-257`; here every X39 table
  * has it for free).
  *
  * Each step `v → v+1` is one [[SnapshotDiff.diff]] (a single full-outer
  * join), tagged with its version bounds. Because [[ManifestTable
  * .readVersion]] applies X64 deletion vectors, a DELETE COMMIT surfaces
  * its tombstoned rows as `deleted` feed rows with no data file rewritten
  * — and an X64 [[DeleteVectors.materialize]] commit, which changes bytes
  * but not content, produces NO feed rows: compaction is invisible to
  * consumers, exactly the contract.
  *
  * Scale shape: an incremental consumer reads ONE step per sync (one
  * join); the multi-step union is the backfill path and unions
  * independent joins. At real scale, append-mostly tables skip the join
  * entirely for versions whose manifest marks pure appends — the manifest
  * already carries the file lists to detect that.
  */
object ChangeFeed {

  /** `added`/`deleted` rows for every step in `(fromV, toV]`, tagged
    * `(from_version, to_version)`.
    */
  def changeFeed(spark: SparkSession, dir: String, fromV: Int, toV: Int,
      keys: Seq[String]): DataFrame = {
    require(fromV < toV, s"empty feed range [$fromV, $toV]")
    (fromV until toV).map { v =>
      SnapshotDiff.diff(
        ManifestTable.readVersion(spark, dir, v + 1),
        ManifestTable.readVersion(spark, dir, v), keys)
        .withColumn("from_version", lit(v))
        .withColumn("to_version", lit(v + 1))
    }.reduce(_ unionByName _)
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Over the X64 fixture timeline (v1 full commit, v2/v3 delete commits,
    // v4 materialize): the feed must show each delete commit's rows as
    // `deleted`, nothing as `added`, and NO rows at all for the
    // materialize step — the oracle recomputes every step from the
    // predicates.
    "q_change_feed" -> ((s, d) => {
      val dir = DeleteVectors.fixtureDir(s, d) // shared X64 timeline
      changeFeed(s, dir, 1, 4, Seq("o_orderkey"))
        .groupBy("from_version", "to_version", "change")
        .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_total"))
        .orderBy("from_version", "change")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_change_feed" ->
      """SELECT * FROM (
        |  SELECT 1 AS from_version, 2 AS to_version, 'deleted' AS change,
        |         count(*) AS n_rows,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |  FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT 2, 3, 'deleted', count(*),
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |  FROM orders WHERE o_orderkey % 7 = 3
        |    AND NOT (o_orderstatus = 'F' AND o_orderkey % 5 = 0)
        |) ORDER BY from_version, change""".stripMargin,
  )
}
