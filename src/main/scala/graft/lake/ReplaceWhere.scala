package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** X172 — predicate-scoped replacement (`replaceWhere` / dynamic partition
  * overwrite) as ONE manifest commit.
  *
  * The idempotent daily-reload primitive every lakehouse ships (Delta's
  * `option("replaceWhere", …)`, Spark's dynamic partition overwrite,
  * Iceberg's overwrite-by-filter): atomically replace EXACTLY the rows
  * matching a predicate with a new batch, leaving every other row — and,
  * at scale, every other FILE — untouched. Re-running a failed daily load
  * converges instead of duplicating, which is why orchestrators retry it
  * blindly (reference behavior: the hourly Airflow DAG re-runs whole task
  * instances on failure, `airflow/dags/apify_dag.py:70-90`).
  *
  * Mechanics on top of the existing primitives — nothing new to trust:
  *
  *   - the X57 zone-map sidecar decides, per file, whether its `[lo, hi]`
  *     range on the predicate column can intersect the replaced band:
  *     provably-disjoint files are RETAINED BY REFERENCE (their paths and
  *     their stats entries carry over verbatim — zero bytes rewritten,
  *     which on a range-clustered layout makes the reload cost ∝ the
  *     replaced band, never the table);
  *   - boundary files that straddle the band rewrite only their SURVIVING
  *     rows (predicate-false and predicate-NULL rows — SQL three-valued
  *     logic: a NULL never "matches", so it must never be deleted);
  *   - the new batch is VALIDATED row-by-row against the predicate before
  *     anything stages: a single out-of-band row refuses the whole commit
  *     (Delta's replaceWhere contract) — otherwise a retried load could
  *     silently leak rows into partitions it did not claim;
  *   - one `commitManifest` (op = "replace_where") publishes retained ++
  *     rewritten ++ new together with a merged stats sidecar, so the next
  *     band read prunes just as well as before; X64 tombstones survive on
  *     retained files (rewritten files bake their subtraction in at read).
  *
  * Files WITHOUT a stats entry are rewritten, never retained — the X57
  * absence-degrades rule: no evidence of disjointness means the file must
  * be read, or a stale sidecar could resurrect replaced rows.
  *
  * Single-shot optimistic commit (version = latest+1, the manifest rename
  * refuses a lost race) — the daily-reload writer is one job by contract;
  * concurrent appends should retry around it like X96 writers.
  */
object ReplaceWhere {

  /** Replace rows of `dir` with `column` in `[lo, hi]` by `newData`,
    * committed atomically as the next version. Returns that version.
    */
  def replaceWhere(spark: SparkSession, dir: String, column: String,
      lo: Long, hi: Long, newData: DataFrame, date: Int, time: Int,
      statsCols: Seq[String]): Int = {
    val pred: Column = col(column) >= lo && col(column) <= hi
    val matches: Column = coalesce(pred, lit(false)) // NULL never matches

    val bad = newData.where(!matches).limit(1).count()
    require(bad == 0L,
      s"replaceWhere: new data contains rows outside $column in [$lo, $hi] — " +
        "refusing the whole commit (predicate-scoped writes must stay in band)")

    val snap = ManifestTable.snapshots(spark, dir).lastOption.getOrElse(
      throw new NoSuchElementException(s"no committed version at $dir"))
    val stats = ZoneMap.fileStats(spark, dir, snap.version).getOrElse(Nil)
    val byFile = stats.map(s => s.file -> s).toMap
    val (retained, rewrite) = snap.files.partition { f =>
      byFile.get(f).exists(s =>
        s.lo.contains(column) && (s.hi(column) < lo || s.lo(column) > hi))
    }

    // Surviving rows of the straddling files: tombstones applied, then
    // everything the predicate does NOT claim (false or NULL).
    val residual =
      if (rewrite.isEmpty) None
      else Some(DeleteVectors.applyTo(spark, dir, snap,
        Tables.cachedScan(spark, rewrite.map(f => s"$dir/$f"))).where(!matches))

    val version = snap.version + 1
    val stagedResidual = residual match {
      case None => Nil
      case Some(r) => ManifestTable.stageDataFiles(r, dir)
    }
    val stagedNew = ManifestTable.stageDataFiles(newData, dir)
    val staged = stagedResidual ++ stagedNew
    val newStats =
      if (staged.isEmpty) Nil
      else ZoneMap.statsFor(spark, dir, staged, statsCols, Nil)

    ZoneMap.writeStatsSidecar(spark, dir, version,
      retained.flatMap(byFile.get) ++ newStats)
    ManifestTable.commitManifest(spark, dir, version, date, time,
      retained ++ staged, deletes = snap.deletes, op = "replace_where")
    version
  }

  type Q = (SparkSession, String) => DataFrame

  /** Orders range-clustered on o_custkey; the middle custkey band is
    * reloaded with a recomputed batch (statuses force-closed, totals
    * re-priced) — the daily-partition-reload shape. The oracle rebuilds
    * the same final state from the raw table: out-of-band rows verbatim,
    * in-band rows re-derived.
    */
  val queries: Map[String, Q] = Map(
    "q_replace_where" -> ((s, d) => {
      val dir = graft.util.FixtureCache.dir("replace_where", d) { dir =>
        val o = Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        val hiKey = o.agg(max("o_custkey")).head.getAs[Number](0).longValue()
        val (lo, hi) = (hiKey / 4, hiKey / 2)
        ZoneMap.commitWithStats(
          o.repartitionByRange(8, col("o_custkey")), dir, 20250801, 900,
          Seq("o_custkey"))
        val reload = o
          .where(col("o_custkey").between(lo, hi))
          // ×2 is a power-of-two multiply — bit-exact on BOTH engines
          .withColumn("o_totalprice", col("o_totalprice") * 2)
          .withColumn("o_orderstatus", lit("F"))
        replaceWhere(s, dir, "o_custkey", lo, hi, reload, 20250802, 900,
          statsCols = Seq("o_custkey"))
      }
      ManifestTable.readLatest(s, dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          graft.util.Exact.dsum(col("o_totalprice")).as("sum_total"),
          min("o_custkey").as("min_ck"), max("o_custkey").as("max_ck"))
        .orderBy("o_orderstatus")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_replace_where" ->
      """WITH b AS (SELECT CAST(max(o_custkey) // 4 AS BIGINT) AS lo,
        |                  CAST(max(o_custkey) // 2 AS BIGINT) AS hi FROM orders),
        |final AS (
        |  SELECT o_custkey, o_totalprice, o_orderstatus FROM orders, b
        |  WHERE o_custkey < b.lo OR o_custkey > b.hi
        |  UNION ALL
        |  SELECT o_custkey, o_totalprice * 2 AS o_totalprice,
        |         'F' AS o_orderstatus
        |  FROM orders, b WHERE o_custkey BETWEEN b.lo AND b.hi)
        |SELECT o_orderstatus, count(*) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
        |  min(o_custkey) AS min_ck, max(o_custkey) AS max_ck
        |FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
