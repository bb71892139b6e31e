package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.lake.Layout
import graft.lake.Layout.TableRef
import graft.lake.SnapshotDiff
import graft.ml.Gender
import graft.sinks.{Elastic, Jdbc}
import graft.sources.Ingest

/** The reference's WHOLE hourly job as one composed, re-runnable function
  * (X40) — every stage already exists as an individually-oracled operator;
  * this proves they compose.
  *
  * Reference shape, per hourly run:
  *   1. per account: GET payload → land verbatim raw.json
  *      (`scripts/script_api_apify_to_spark.py:100-137`) → normalize to
  *      (username, full_name) (`:144-165`) → gender-enrich (`:174-178`) →
  *      write formatted (append, `:194`) + usage (`:208`) layers → snapshot
  *      diff vs the previous run of the SAME day (`:214-257`) → append the
  *      scored table to Postgres (`:282-294`).
  *   2. aggregate: union ALL of the day's usage snapshots per account
  *      (a glob over the date's time subdirs, `airflow/dags/apify_dag.py:132-148`) into
  *      `final_aggregated`, union the day's comparatif snapshots into
  *      `final_comparatif` (`:154-168`), write both (`:175-196`), then
  *      optionally diff the aggregate against an older global snapshot —
  *      tags `added_global`/`deleted_global` (`:198-213`) — and append
  *      both aggregates to Postgres (`:216-246`).
  *   3. index both aggregates to Elasticsearch keyed by username
  *      (`apify_dag.py:289-318`).
  *
  * Spark-native deltas (semantics kept, physics fixed):
  *   - every lake write goes through [[Layout.overwriteSnapshot]] (dynamic
  *     partition overwrite), so re-running a failed run — the DAG's retry
  *     mode, `apify_dag.py:38-39` — replaces exactly that run's partition
  *     instead of appending duplicates (PipelineSpec pins this);
  *   - the JDBC append is made retry-idempotent the same way: each run's
  *     rows carry (run_date, run_time) and a re-run deletes-then-appends
  *     its own stamp ([[Jdbc.deleteWhere]]) — the reference would
  *     double-insert;
  *   - the per-day glob loop becomes one partition-pruned scan
  *     (`run_date = d AND run_time <= t` over partition values);
  *   - the "older global snapshot" (a hardcoded path in the reference,
  *     `apify_dag.py:41,198`) generalizes to the latest `final_aggregated`
  *     snapshot strictly before the current run, ACROSS days
  *     ([[Layout.snapshotAsOf]]) — day one has none, so the global diff is
  *     skipped exactly like the reference's missing-path branch.
  *
  * At 100 TB: per-account work is embarrassingly parallel (the
  * orchestrator fans out accounts); within one account every stage is a
  * partition-local scan, a broadcast join (gender dict), or a single
  * keyed shuffle (the diff) — no driver-side data moves except the raw
  * landing, which is the ingest adapter's contract (SURVEY §2 S1).
  */
object Pipeline {

  /** Lake root + optional sinks. `keys` is the diff identity — the
    * reference's `(username, full_name)` composite
    * (`script_api_apify_to_spark.py:242`).
    */
  case class Config(
      root: String,
      group: String = "apify",
      keys: Seq[String] = Seq("username", "full_name"),
      jdbc: Option[Jdbc.JdbcConfig] = None,
      es: Option[Elastic.EsConfig] = None)

  /** The explicit raw-layer contract (`script_api_apify_to_spark.py:161-164`). */
  val contract: StructType = StructType.fromDDL("username STRING, full_name STRING")

  /** The scored-table data columns (the reference's 4-column select, `:239-240`). */
  val dataCols: Seq[String] =
    Seq("username", "full_name", "predicted_gender", "confidence")

  def formattedRef(cfg: Config, account: String): TableRef =
    TableRef(cfg.root, Layout.formattedLayer, cfg.group, account)
  def usageRef(cfg: Config, account: String): TableRef =
    TableRef(cfg.root, Layout.usageLayer, cfg.group, account)
  def comparatifRef(cfg: Config, account: String): TableRef =
    TableRef(cfg.root, Layout.usageLayer, cfg.group, s"${account}_comparatif")
  def aggregatedRef(cfg: Config): TableRef =
    TableRef(cfg.root, Layout.combinedLayer, cfg.group, "final_aggregated")
  def comparatifAggRef(cfg: Config): TableRef =
    TableRef(cfg.root, Layout.combinedLayer, cfg.group, "final_comparatif")
  def globalCompRef(cfg: Config): TableRef =
    TableRef(cfg.root, Layout.combinedLayer, cfg.group, "final_global_comparatif")

  private def exists(spark: SparkSession, ref: TableRef): Boolean = {
    val p = new org.apache.hadoop.fs.Path(ref.dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** One hourly run over already-fetched payloads (account → verbatim JSON
    * body; the HTTP GET itself is [[Ingest.fetchJson]], exercised in
    * IngestSpec — separating fetch from processing is what makes the run
    * re-runnable at all). Idempotent: re-invoking with the same
    * (date, time, payloads) leaves every table byte-identical.
    */
  def runHourly(spark: SparkSession, cfg: Config, date: Int, time: Int,
      payloads: Seq[(String, String)]): Unit = {

    // ---- stage 1: per-account ingest → enrich → layers → diff → JDBC.
    // Accounts run CONCURRENTLY, mirroring the reference's Airflow dynamic
    // task mapping (one spark-submit per account in parallel,
    // `apify_dag.py:83-91,336`); every table below is account-scoped, so
    // the jobs share nothing but the SparkSession (which is thread-safe).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val accountRuns = payloads.map { case (account, payload) => Future {
      runAccount(spark, cfg, date, time, account, payload)
    }}
    accountRuns.foreach(Await.result(_, Duration.Inf))
    runAggregate(spark, cfg, date, time, payloads.map(_._1))
  }

  /** Stage 1 for ONE account — the body of the reference's mapped
    * `run_single_script` task (`apify_dag.py:83-91`): land the verbatim
    * payload, normalize to the contract, gender-enrich, commit the
    * formatted + usage layers, diff against the same-day previous run,
    * and append to JDBC. Idempotent (overwrite snapshots +
    * delete-own-stamp JDBC), so a [[Scheduler]] retry re-running it after
    * a mid-task crash converges to the no-failure state.
    */
  def runAccount(spark: SparkSession, cfg: Config, date: Int, time: Int,
      account: String, payload: String): Unit = {
    Ingest.landRaw(payload, cfg.root, cfg.group, account, date)
    val raw = Layout.rawFile(TableRef(cfg.root, Layout.rawLayer, cfg.group, account), date)
    val contracted = Ingest.toContract(Ingest.normalize(spark, raw), contract)
    // cache: the scored table feeds 2-3 sinks and the diff's current
    // side; without it each action re-parses (and re-INFERS — multiLine
    // JSON inference is a full extra file pass) the raw payload
    val scored = Gender.withGender(spark, contracted)
      .select(dataCols.map(col): _*)
      .cache()
    try {
      Layout.overwriteSnapshot(scored, formattedRef(cfg, account), date, time)
      Layout.overwriteSnapshot(scored, usageRef(cfg, account), date, time)

      // same-DAY previous run only — the reference's discovery loop lists
      // the current date's usage dir (`script_api_apify_to_spark.py:218-234`)
      Layout.previousRunTime(spark, usageRef(cfg, account), date, time).foreach { pt =>
        // current side = the rows just committed at (date, time) — the
        // cached df, not a read-back (identical by the overwrite contract)
        val prev = Layout.snapshotAt(spark, usageRef(cfg, account), date, pt)
          .select(dataCols.map(col): _*)
        val d = SnapshotDiff.diff(scored, prev, cfg.keys)
        Layout.overwriteSnapshot(d, comparatifRef(cfg, account), date, time)
      }

      cfg.jdbc.foreach { j =>
        appendRunIdempotent(scored, j, account, date, time)
      }
    } finally scored.unpersist()
  }

  /** Stages 2–3 — the reference's `aggregate_results` + ES indexing tasks
    * (`apify_dag.py:132-246,289-318`): union the day's snapshots across
    * accounts, global diff, and fan out to JDBC/ES. Reads the lake (not
    * payloads), so a retry after any partial stage-2 write converges.
    */
  def runAggregate(spark: SparkSession, cfg: Config, date: Int, time: Int,
      accounts: Seq[String]): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global

    // ---- stage 2: cross-account aggregation over the DAY's snapshots
    val agg = accounts.map { account =>
      Layout.snapshots(spark, usageRef(cfg, account))
        .where(col(Layout.runDateCol) === date && col(Layout.runTimeCol) <= time)
        .select(dataCols.map(col): _*)
        .withColumn("username_scraped", lit(account))
    }.reduce(_ unionByName _).cache() // feeds its write + global diff + sinks
    agg.count() // materialize once before the concurrent consumers below

    val compParts = accounts.collect {
      case account if exists(spark, comparatifRef(cfg, account)) =>
        Layout.snapshots(spark, comparatifRef(cfg, account))
          .where(col(Layout.runDateCol) === date && col(Layout.runTimeCol) <= time)
          .select((dataCols :+ "change").map(col): _*)
          .withColumn("username_scraped", lit(account))
    }
    val compAgg = compParts.reduceOption(_ unionByName _)

    // the previous-aggregate lookup runs BEFORE this run's aggregate write
    // so no reader ever lists the table mid-write (re-runs aside, the
    // current partition doesn't exist yet; the time bound excludes it
    // either way) — then the three stage-2 writes, which share no tables,
    // commit concurrently
    val prevAgg = // on the first run ever, the aggregate table has no dir yet
      if (exists(spark, aggregatedRef(cfg)))
        Layout.snapshotAsOf(spark, aggregatedRef(cfg), date, time - 1)
      else None
    val stage2 = Seq(
      Future { Layout.overwriteSnapshot(agg, aggregatedRef(cfg), date, time) },
      Future {
        compAgg.foreach(c => Layout.overwriteSnapshot(c, comparatifAggRef(cfg), date, time))
      },
      Future {
        // ---- stage 2b: global diff vs the latest aggregate before this run
        prevAgg.foreach { case (pd, pt) =>
          val aggCols = dataCols :+ "username_scraped"
          val old = Layout.snapshotAt(spark, aggregatedRef(cfg), pd, pt)
            .select(aggCols.map(col): _*)
          // current side = the aggregate being committed (cached above)
          val g = SnapshotDiff.diff(agg, old, cfg.keys, "added_global", "deleted_global")
          Layout.overwriteSnapshot(g, globalCompRef(cfg), date, time)
        }
      })
    stage2.foreach(Await.result(_, Duration.Inf))

    // ---- stage 2c/3: aggregates to Postgres-shaped JDBC + Elasticsearch
    cfg.jdbc.foreach { j =>
      appendRunIdempotent(agg, j, "final_aggregated_usage", date, time)
      compAgg.foreach(c => appendRunIdempotent(c, j, "final_comparatif_usage", date, time))
    }
    cfg.es.foreach { e =>
      Elastic.bulkIndexKeyed(agg, e, Elastic.aggregatedIndex)
      compAgg.foreach(c => Elastic.bulkIndexKeyed(c, e, Elastic.comparatifIndex))
    }
    agg.unpersist()
  }

  /** Retry-idempotent JDBC append: rows carry the run stamp, and a re-run
    * first deletes its own stamp's rows. The reference plain-appends, so
    * an Airflow retry (`apify_dag.py:38-39`) double-inserts — same
    * semantics on the happy path, fixed physics on the retry path.
    */
  private def appendRunIdempotent(df: DataFrame, j: Jdbc.JdbcConfig,
      table: String, date: Int, time: Int): Unit = {
    Jdbc.deleteWhere(j, table,
      s""""${Layout.runDateCol}" = $date AND "${Layout.runTimeCol}" = $time""")
    Jdbc.append(
      df.withColumn(Layout.runDateCol, lit(date))
        .withColumn(Layout.runTimeCol, lit(time)),
      j, table)
  }
}
