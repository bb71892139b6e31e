package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Snapshot change-data capture — the reference's flagship dataflow.
  *
  * Reference semantics (`scripts/script_api_apify_to_spark.py:238-248`):
  * given the current snapshot and the previous snapshot of the same table,
  * rows present only in current are tagged `added`, rows present only in
  * previous are tagged `deleted`, via two left-anti joins on a composite
  * equi-key plus `unionByName`. Notable fidelity points (SURVEY §5, FIXTURES §2):
  *   - duplicate key pairs within one snapshot are NOT deduplicated;
  *   - NULL key columns never match (SQL null semantics), so a row with a
  *     NULL key shows up as both added and deleted.
  *
  * Scale notes (100 TB): the composed `diff` runs as ONE full-outer join
  * on the key — each input shuffles exactly once, and the matched rows
  * stream through the join's filter without materializing. The literal
  * two-anti-join formulation (J1/J2 exposed below for operator fidelity)
  * would shuffle each input twice — and its exchanges can NOT be reused
  * across the branches, because the anti-join build sides carry extra
  * null-key filters that make the subplans differ (pinned in PlanSpec).
  * Catalyst still broadcasts the smaller side when it fits; for repeated
  * hourly diffs at scale, write snapshots bucketed by the key to make the
  * diff shuffle-free.
  */
object SnapshotDiff {

  /** J1 + J2 + U1 composed (reference `:242-248`), as a single full-outer
    * join: a key-group present only in `cur` is `added`, only in `prev` is
    * `deleted`, both-sides rows drop. Equivalent to the two anti-joins +
    * union for every fidelity case (duplicate keys: m×n matched pairs all
    * drop, unmatched dups all survive; NULL keys never match, so those
    * rows surface on both sides) — the golden fixtures in SnapshotDiffSpec
    * pin this.
    */
  def diff(cur: DataFrame, prev: DataFrame, keys: Seq[String],
           addedTag: String = "added", deletedTag: String = "deleted"): DataFrame = {
    requireDiffable(cur, prev)
    val c = cur.withColumn(cMark, lit(1))
    val p = prev.withColumn(pMark, lit(1))
    val outCols = cur.columns.map { n =>
      if (keys.contains(n)) col(n) else coalesce(c(n), p(n)).as(n)
    } :+ when(col(pMark).isNull, lit(addedTag)).otherwise(lit(deletedTag)).as("change")
    c.join(p, keys, "full_outer")
      .where(col(cMark).isNull || col(pMark).isNull)
      .select(outCols.toIndexedSeq: _*)
  }

  // improbable marker names, and an explicit contract check: the output
  // grows a `change` column, so an input that already has one (e.g. a
  // prior diff result) would otherwise silently produce a duplicate
  private val cMark = "__diff_cur_marker"
  private val pMark = "__diff_prev_marker"
  private def requireDiffable(cur: DataFrame, prev: DataFrame): Unit =
    Seq(cur, prev).foreach { df =>
      require(!df.columns.contains("change"),
        "diff input already carries a 'change' column — rename it first")
      require(!df.columns.contains(cMark) && !df.columns.contains(pMark),
        "diff input collides with internal marker columns")
    }

  /** Update-aware keyed diff (the X183 CDC shape): like [[diff]], but a
    * key present on BOTH sides with any non-key column changed emits its
    * delete+insert pair (`deleted` carrying the old values, `added` the
    * new) instead of vanishing as "matched". Non-key columns compare
    * null-safely, so NULL→value and value→NULL both surface. Same single
    * key-shuffle full-outer join; the two projections reuse its exchange.
    * Keys must be row-unique per side (the [[diff]] contract) — duplicate
    * key groups join-multiply here exactly as they mis-pair there.
    */
  def diffCdc(cur: DataFrame, prev: DataFrame, keys: Seq[String]): DataFrame = {
    requireDiffable(cur, prev)
    val c = cur.withColumn(cMark, lit(1))
    val p = prev.withColumn(pMark, lit(1))
    val nonKey = cur.columns.filterNot(keys.contains)
    val differs = nonKey.map(n => !(c(n) <=> p(n)))
      .reduceOption(_ || _).getOrElse(lit(false))
    val joined = c.join(p, keys, "full_outer")
    def side(mark: String, otherMark: String, pick: String => Column,
        tag: String): DataFrame =
      joined.where(col(mark).isNotNull && (col(otherMark).isNull || differs))
        .select(cur.columns.map { n =>
          (if (keys.contains(n)) col(n) else pick(n)).as(n)
        }.toIndexedSeq :+ lit(tag).as("change"): _*)
    side(cMark, pMark, c(_), "added")
      .unionByName(side(pMark, cMark, p(_), "deleted"))
  }

  /** Null-safe variant of [[diff]]: keys compare with `<=>` so NULL = NULL
    * matches. The reference inherits SQL null semantics from its anti-joins
    * (a NULL-keyed row double-tags as both added and deleted — SURVEY §2
    * D1, pinned in SnapshotDiffSpec's golden fixture); this variant is the
    * conscious alternative for pipelines where NULL is a legitimate key
    * value. Same single full-outer join shape and shuffle count.
    */
  def diffNullSafe(cur: DataFrame, prev: DataFrame, keys: Seq[String],
      addedTag: String = "added", deletedTag: String = "deleted"): DataFrame = {
    requireDiffable(cur, prev)
    val c = cur.withColumn(cMark, lit(1))
    val p = prev.withColumn(pMark, lit(1))
    val cond = keys.map(k => c(k) <=> p(k)).reduce(_ && _)
    // only unmatched rows survive the filter, so coalescing the two sides
    // always picks the one present row's value (keys included: the join
    // condition is explicit, so key columns exist on both sides here)
    val outCols = cur.columns.map(n => coalesce(c(n), p(n)).as(n)) :+
      when(col(pMark).isNull, lit(addedTag)).otherwise(lit(deletedTag)).as("change")
    c.join(p, cond, "full_outer")
      .where(col(cMark).isNull || col(pMark).isNull)
      .select(outCols.toIndexedSeq: _*)
  }

  /** CDC APPLY — the inverse of [[diff]] (X49): reconstruct the current
    * snapshot from the previous one plus the change table, which is
    * exactly what a downstream consumer of the reference's Postgres-landed
    * diff tables does to maintain its own copy without re-reading full
    * snapshots. `cur == applyDiff(prev, diff(cur, prev, keys), keys)`
    * EXACTLY when keys are row-unique within each snapshot (the
    * reference's model: the composite key IS the row identity); NULL-key
    * rows reconstruct exactly too, because [[diff]] always re-emits them
    * on both sides and the delete step below matches null-safely.
    * Duplicate-key groups are the documented limit: matched groups drop
    * from the diff, so their multiplicities are not representable in
    * change rows (SnapshotDiffSpec pins the contract).
    *
    * One null-safe anti join + one union — same shuffle class as the diff
    * that produced the input.
    */
  def applyDiff(prev: DataFrame, changes: DataFrame, keys: Seq[String]): DataFrame = {
    val dataCols = prev.columns.toSeq
    val delKeys = changes.where(col("change") === "deleted")
      .select(keys.map(col): _*)
      .toDF(keys.map(k => s"__del_$k"): _*)
    val addedRows = changes.where(col("change") === "added")
      .select(dataCols.map(col): _*)
    val cond = keys.map(k => prev(k) <=> delKeys(s"__del_$k")).reduce(_ && _)
    prev.join(delKeys, cond, "left_anti").unionByName(addedRows)
  }

  /** J1 alone: rows in `cur` missing from `prev` (reference `:242-244`). */
  def added(cur: DataFrame, prev: DataFrame, keys: Seq[String]): DataFrame =
    cur.join(prev, keys, "left_anti").withColumn("change", lit("added"))

  /** J2 alone: rows in `prev` missing from `cur` (reference `:245-247`). */
  def deleted(cur: DataFrame, prev: DataFrame, keys: Seq[String]): DataFrame =
    prev.join(cur, keys, "left_anti").withColumn("change", lit("deleted"))

  // --- Deterministic snapshot pair synthesized from `customer`, so the
  // --- DuckDB oracle can derive the identical inputs with plain SQL.

  private def custKey: Column = col("c_custkey")

  /** "Current" snapshot: the customer table projected to the diff schema. */
  def synthCurrent(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal")

  /** "Previous" snapshot: drop every 10th customer (those become `added`)
    * and rename every 7th (old name becomes `deleted`, new one `added` —
    * composite-key semantics).
    */
  def synthPrevious(s: SparkSession, d: String): DataFrame =
    synthCurrent(s, d)
      .where(custKey % 10 =!= 0)
      .withColumn("c_name",
        when(custKey % 7 === 0, concat(col("c_name"), lit("_v0")))
          .otherwise(col("c_name")))

  val diffKeys: Seq[String] = Seq("c_custkey", "c_name")

  /** Shared oracle CTE prelude deriving the same snapshot pair in SQL. */
  val oracleCtes: String =
    """WITH cur AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
      |prev AS (SELECT c_custkey,
      |               CASE WHEN c_custkey % 7 = 0 THEN c_name || '_v0' ELSE c_name END AS c_name,
      |               c_acctbal
      |        FROM customer WHERE c_custkey % 10 <> 0),
      |added AS (SELECT cur.c_custkey, cur.c_name, cur.c_acctbal, 'added' AS change FROM cur
      |          WHERE NOT EXISTS (SELECT 1 FROM prev
      |                            WHERE prev.c_custkey = cur.c_custkey AND prev.c_name = cur.c_name)),
      |deleted AS (SELECT prev.c_custkey, prev.c_name, prev.c_acctbal, 'deleted' AS change FROM prev
      |            WHERE NOT EXISTS (SELECT 1 FROM cur
      |                              WHERE cur.c_custkey = prev.c_custkey AND cur.c_name = prev.c_name))
      |""".stripMargin
}
