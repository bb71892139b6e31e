package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scalable dense surrogate ids (X77): assign `1..n` in key order without
  * the plan every naive implementation writes —
  * `row_number() OVER (ORDER BY key)` — whose empty PARTITION BY collapses
  * the whole table into ONE partition (Spark even warns); at 100 TB that
  * executor simply dies. The same trap hides in global NTILE bucketing and
  * "add an index column" requests.
  *
  * The scale shape: EXPLICIT range buckets from approximate quantiles of
  * the key (a sketch pass; `repartitionByRange` would re-SAMPLE split
  * points on every execution of the plan, so the count pass and the
  * numbering pass could disagree about who lives where), a RANGE-LOCAL
  * row_number (each window partition = one bucket, no collapse), plus
  * per-bucket row counts — a driver-sized `#buckets`-row aggregate —
  * cumulated into offsets and broadcast back.
  * `id = bucket offset + local index`. Two passes over the data buy
  * unbounded parallelism; the RDD `zipWithIndex` does the same dance one
  * level lower.
  *
  * Requires a unique numeric `orderCol` (ties straddling a bucket
  * boundary would make the order, and thus the ids, nondeterministic).
  */
object DenseId {

  def assign(df: DataFrame, orderCol: String, parts: Int): DataFrame = {
    require(parts > 0)
    // deterministic split points: a quantile sketch of the key (values
    // land verbatim from the data, so bucket predicates compare exactly)
    val splits = df.stat
      .approxQuantile(orderCol, (1 until parts).map(_.toDouble / parts).toArray, 0.001)
      .distinct.sorted
    val pidExpr = splits.foldLeft(lit(0)) { (acc, sp) =>
      acc + when(col(orderCol) > lit(sp), 1).otherwise(0)
    }
    val withPid = df.withColumn("__pid", pidExpr)
    // per-bucket counts: #buckets rows, driver-sized by construction
    val counts = withPid.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 to splits.length).scanLeft(0L)((acc, p) =>
      acc + counts.getOrElse(p, 0L)).init
    val spark = df.sparkSession
    import spark.implicits._
    val offsetsDf = offsets.zipWithIndex
      .map { case (off, pid) => (pid, off) }.toDF("__pid", "__offset")
    val w = Window.partitionBy("__pid").orderBy(orderCol) // bucket-local
    withPid
      .join(broadcast(offsetsDf), Seq("__pid"))
      .withColumn("rid", col("__offset") + row_number().over(w))
      .drop("__pid", "__offset")
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Dense ids over customer by key: the answer IS row_number's — but the
    // plan is the parallel one (no single-partition exchange, pinned in
    // DenseIdSpec).
    "q_dense_ids" -> ((s, d) => {
      val c = Tables.customer(s, d).select("c_custkey", "c_acctbal")
      assign(c, "c_custkey", 8)
        .select(col("c_custkey"), col("rid").cast("long").as("rid"))
        .orderBy("c_custkey")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_dense_ids" ->
      """SELECT c_custkey,
        |       row_number() OVER (ORDER BY c_custkey) AS rid
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
  )
}
