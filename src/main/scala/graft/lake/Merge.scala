package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** MERGE INTO-style keyed upsert (extension X31) — the lake-side
  * equivalent of the reference's Elasticsearch doc-id upsert
  * (`es.mapping.id = username`, `airflow/dags/apify_dag.py:289-318`): the
  * reference gets idempotent re-runs only at the ES sink; a lake user
  * needs the same "updates win, everything else survives" semantics on
  * the parquet tables themselves.
  *
  * Semantics: rows of `updates` REPLACE same-key rows of `base` whole-row
  * (a NULL in an update column overwrites — this is MERGE, not
  * per-column coalesce); unmatched base rows survive; unmatched updates
  * insert; updates flagged in `deleteCol` remove the key (a no-op when
  * the key is absent).
  *
  * Scale notes (100 TB): one full-outer join on the key — each side
  * shuffles once, same plan shape as [[SnapshotDiff.diff]]; with base
  * written bucketed by the key the merge is shuffle-free on the big side,
  * and the usual deployment writes the result as a new snapshot partition
  * ([[Layout.overwriteSnapshot]]) so re-runs stay idempotent.
  */
object Merge {
  type Q = (SparkSession, String) => DataFrame

  private val uMark = "__merge_upd_marker"

  /** Apply `updates` to `base` by `keys`. `updates` must carry every
    * column of `base`; extra update-side columns (e.g. the delete flag)
    * are dropped from the output.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
      deleteCol: Option[String] = None): DataFrame = {
    require(base.columns.forall(updates.columns.contains),
      "updates must carry every base column")
    require(!base.columns.contains(uMark), "base collides with internal marker")
    // MERGE INTO raises when the source matches a target row more than
    // once; a duplicate-keyed update here would silently fan the base row
    // out into several output rows, corrupting the key invariant (the
    // double-delivered-feed case). One aggregate over the (small) update
    // side is the price of failing loudly instead.
    val dupKeys = updates.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).where(col("__n") > 1).limit(1).count()
    require(dupKeys == 0,
      s"updates contain multiple rows for one (${keys.mkString(", ")}) key — " +
        "MERGE requires unique source keys; dedupe the updates first")
    val u = updates.withColumn(uMark, lit(1))
    val joined = base.join(u, keys, "full_outer")
    val undeleted = deleteCol match {
      case Some(dc) => joined.where(col(uMark).isNull || !coalesce(u(dc), lit(false)))
      case None => joined
    }
    val outCols = base.columns.map { n =>
      if (keys.contains(n)) col(n) // using-join emits the coalesced key
      else when(col(uMark).isNotNull, u(n)).otherwise(base(n)).as(n)
    }
    undeleted.select(outCols.toIndexedSeq: _*)
  }

  val queries: Map[String, Q] = Map(
    // All four paths load-bearing: base drops %10 keys, updates touch %3
    // keys — so %3∧%10 keys INSERT, other %3 keys UPDATE (name/balance
    // rewritten), %13-flagged updates DELETE (or no-op when absent), and
    // everything else passes through untouched.
    "q_merge_upsert" -> ((s, d) => {
      val base = Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal")
        .where(col("c_custkey") % 10 =!= 0)
      val updates = Tables.customer(s, d)
        .where(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"),
          concat(col("c_name"), lit("_v2")).as("c_name"),
          (col("c_acctbal") + 100).as("c_acctbal"),
          (col("c_custkey") % 13 === 0).as("is_deleted"))
      upsert(base, updates, Seq("c_custkey"), deleteCol = Some("is_deleted"))
        .orderBy("c_custkey")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_merge_upsert" ->
      """WITH base AS (
        |  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 10 <> 0),
        |upd AS (
        |  SELECT c_custkey, c_name || '_v2' AS c_name, c_acctbal + 100 AS c_acctbal,
        |         c_custkey % 13 = 0 AS is_deleted
        |  FROM customer WHERE c_custkey % 3 = 0)
        |SELECT coalesce(b.c_custkey, u.c_custkey) AS c_custkey,
        |       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE b.c_name END AS c_name,
        |       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE b.c_acctbal END AS c_acctbal
        |FROM base b FULL JOIN upd u ON b.c_custkey = u.c_custkey
        |WHERE u.c_custkey IS NULL OR NOT u.is_deleted
        |ORDER BY c_custkey""".stripMargin,
  )
}
