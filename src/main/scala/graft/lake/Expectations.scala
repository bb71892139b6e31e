package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Commit-time data-quality expectations (X76) — the DLT-expectations /
  * Delta CHECK-constraint shape: declare row-level predicates a snapshot
  * must satisfy, evaluate them all in ONE combinable aggregate pass, and
  * REFUSE the commit when violations exceed the budget — bad data never
  * becomes a committed version, readers never see it, and the rejected
  * write leaves nothing behind (the check runs before staging, so X39's
  * crash-safety story is untouched).
  *
  * The reference has the inverse of this: `try/except`-and-continue
  * around every stage (`scripts/script_api_apify_to_spark.py:227-232`) —
  * failures degrade to log lines and the bad snapshot still lands.
  *
  * Scale shape: all rules evaluate in one map-side-combined aggregate
  * (`sum(violates ? 1 : 0)` per rule) over a single scan — adding a rule
  * adds a column, not a pass. Rules are SQL boolean expressions, so they
  * stay inside whole-stage codegen.
  */
object Expectations {

  /** A named row-level expectation: `predicate` must hold for every row
    * (violations are rows where it is false or NULL — NULL is a failure,
    * like SQL CHECK's treatment of unknown under `ENFORCED`… stricter,
    * actually: we gate training data, unknown is bad).
    */
  case class Rule(name: String, predicate: String)

  /** Violation counts per rule, from one aggregate pass. */
  def evaluate(df: DataFrame, rules: Seq[Rule]): Map[String, Long] = {
    require(rules.nonEmpty, "no rules given")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    val aggs = rules.map(r =>
      sum(when(coalesce(expr(r.predicate), lit(false)), 0L).otherwise(1L))
        .as(r.name))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    rules.map(r => r.name -> row.getAs[Long](r.name)).toMap
  }

  /** Commit `df` as the next version ONLY if every rule's violations are
    * within `maxViolations`; otherwise throw with the per-rule report and
    * stage nothing. Returns the committed version.
    */
  def commitChecked(df: DataFrame, dir: String, date: Int, time: Int,
      rules: Seq[Rule], maxViolations: Long = 0L): Int = {
    val report = evaluate(df, rules)
    val bad = report.filter(_._2 > maxViolations)
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"expectations failed (budget $maxViolations): " +
          bad.toSeq.sortBy(_._1).map { case (n, v) => s"$n=$v" }.mkString(", "))
    ManifestTable.commit(df, dir, date, time)
  }

  /** The rules' conjunction as one codegen'd boolean column — NULL is a
    * violation, matching [[evaluate]]'s counting exactly.
    */
  private def passes(rules: Seq[Rule]): org.apache.spark.sql.Column =
    rules.map(r => coalesce(expr(r.predicate), lit(false))).reduce(_ && _)

  /** Quarantine mode (X107 — DLT's "expect or drop" with a dead-letter
    * table): instead of refusing the whole commit, rows failing ANY rule
    * route to `<table>_quarantine` — tagged with the names of the rules
    * they broke, for replay after upstream fixes — and the clean rows
    * commit to `table`. BOTH tables land in ONE X99 catalog transaction,
    * so no reader cut ever sees clean data without its quarantine ledger
    * (or vice versa). Cost: the rules evaluate as one codegen'd boolean
    * per side of a single split — two scans of the input (or one plus a
    * cached exchange under AQE), no extra shuffle beyond the writes.
    * Returns (catalog version, clean rows, quarantined rows).
    */
  def commitQuarantined(spark: SparkSession, root: String, table: String,
      df: DataFrame, date: Int, time: Int,
      rules: Seq[Rule]): (Int, Long, Long) = {
    require(rules.nonEmpty, "no rules given")
    val ok = passes(rules)
    val clean = df.where(ok)
    val broken = rules.map(r =>
      when(coalesce(expr(r.predicate), lit(false)), null)
        .otherwise(lit(r.name)))
    val quarantined = df.where(!ok)
      .withColumn("_violated",
        array_join(array_compact(array(broken: _*)), ","))
    val cv = Catalog.transact(spark, root, date, time, Seq(
      table -> clean,
      s"${table}_quarantine" -> quarantined))
    (cv,
      Catalog.readTable(spark, root, table).count(),
      Catalog.readTable(spark, root, s"${table}_quarantine").count())
  }

  type Q = (SparkSession, String) => DataFrame

  /** The fixture rule set over orders: three holding expectations and one
    * deliberately violated by the data (shippriority-like status gate).
    */
  val fixtureRules: Seq[Rule] = Seq(
    Rule("key_present", "o_orderkey IS NOT NULL"),
    Rule("price_positive", "o_totalprice > 0"),
    Rule("status_known", "o_orderstatus IN ('F', 'O', 'P')"),
    Rule("no_partial", "o_orderstatus <> 'P'")) // violated: P rows exist

  val queries: Map[String, Q] = Map(
    // The evaluation report itself is the query: per-rule violation
    // counts over orders, recomputed by the oracle with the same
    // predicates. The refuse/land commit behavior is pinned in
    // ExpectationsSpec (it is filesystem state, not a result set).
    "q_expectations" -> ((s, d) => {
      import s.implicits._
      val report = evaluate(
        Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice"),
        fixtureRules)
      fixtureRules.map(r => (r.name, report(r.name))).toDF("rule", "n_violations")
        .orderBy("rule")
    }),
    // Quarantine mode (X107): clean rows and the tagged dead-letter table
    // land in one catalog transaction; the oracle rebuilds both sides
    // from the rules' predicates (the fixture's P rows violate exactly
    // no_partial, so their tag is that one rule name).
    "q_quarantine" -> ((s, d) => {
      import graft.util.Exact.dsum
      val root = graft.util.FixtureCache.dir("quarantine_fx", d) { root =>
        commitQuarantined(s, root, "orders_gold",
          Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice"),
          20250801, 900, fixtureRules)
      }
      val clean = Catalog.readTable(s, root, "orders_gold")
        .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_total"))
        .select(lit("clean").as("side"), lit("").as("violated"),
          col("n_rows"), col("sum_total"))
      val quar = Catalog.readTable(s, root, "orders_gold_quarantine")
        .groupBy(col("_violated").as("violated"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice")).as("sum_total"))
        .select(lit("quarantine").as("side"), col("violated"),
          col("n_rows"), col("sum_total"))
      clean.unionByName(quar).orderBy("side", "violated")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_expectations" ->
      """SELECT * FROM (
        |  SELECT 'key_present' AS rule,
        |         CAST(sum(CASE WHEN o_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_violations
        |  FROM orders
        |  UNION ALL
        |  SELECT 'price_positive',
        |         CAST(sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'status_known',
        |         CAST(sum(CASE WHEN o_orderstatus IN ('F', 'O', 'P') THEN 0 ELSE 1 END) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'no_partial',
        |         CAST(sum(CASE WHEN o_orderstatus <> 'P' THEN 0 ELSE 1 END) AS BIGINT) FROM orders
        |) ORDER BY rule""".stripMargin,
    "q_quarantine" ->
      """SELECT * FROM (
        |  SELECT 'clean' AS side, '' AS violated, count(*) AS n_rows,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |  FROM orders
        |  WHERE o_orderkey IS NOT NULL AND o_totalprice > 0
        |    AND o_orderstatus IN ('F', 'O', 'P') AND o_orderstatus <> 'P'
        |  UNION ALL
        |  SELECT 'quarantine', 'no_partial', count(*),
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |  FROM orders WHERE NOT (o_orderkey IS NOT NULL AND o_totalprice > 0
        |    AND o_orderstatus IN ('F', 'O', 'P') AND o_orderstatus <> 'P')
        |) ORDER BY side, violated""".stripMargin,
  )
}
