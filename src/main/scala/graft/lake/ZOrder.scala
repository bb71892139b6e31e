package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Z-order (Morton) clustering for multi-dimensional data skipping (X48)
  * — the other half of lake maintenance beside compaction (X32): rewrite
  * a table so per-file min/max statistics are selective on SEVERAL
  * columns at once. A linear sort makes skipping perfect on its leading
  * column and useless on every other; interleaving the bits of the
  * columns' normalized ranks bounds every file to a small hyper-rectangle
  * of the value space, so a predicate on ANY clustered column prunes most
  * files (the standard warehouse OPTIMIZE ZORDER BY).
  *
  * Spark-native shape: the z-value is a pure column expression (bit
  * interleave of two 16-bit normalized buckets — shifts/masks, fully
  * codegen'd), the layout is `repartitionByRange(zv)` +
  * `sortWithinPartitions(zv)` — one range shuffle, the same cost class as
  * the linear sort it replaces. Normalization bounds come from one
  * min/max aggregate (driver-side scalars; at production scale, catalog
  * stats).
  */
object ZOrder {
  type Q = (SparkSession, String) => DataFrame

  val bits = 16

  /** Bucket a numeric column to [0, 2^bits) given its min/max. */
  private def bucket(c: Column, lo: Double, hi: Double): Column = {
    val span = if (hi > lo) hi - lo else 1.0
    least(lit((1 << bits) - 1),
      floor((c.cast("double") - lit(lo)) / lit(span) * lit(1 << bits)).cast("long"))
  }

  /** Morton interleave of two bucketed columns: x in even bit positions,
    * y in odd — a fold of shifts and masks, all inside codegen.
    */
  def zValue(x: Column, y: Column): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Rewrite `df` z-ordered on two numeric columns into `nFiles` files at
    * `dir`. Returns the (lo, hi) bounds used per column.
    */
  def writeZOrdered(df: DataFrame, dir: String, c1: String, c2: String,
      nFiles: Int): ((Double, Double), (Double, Double)) = {
    val r = df.agg(
      min(col(c1).cast("double")), max(col(c1).cast("double")),
      min(col(c2).cast("double")), max(col(c2).cast("double"))).first()
    val (lo1, hi1, lo2, hi2) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val zv = zValue(bucket(col(c1), lo1, hi1), bucket(col(c2), lo2, hi2))
    df.withColumn("__zv", zv)
      .repartitionByRange(nFiles, col("__zv"))
      .sortWithinPartitions("__zv")
      .drop("__zv")
      .write.mode("overwrite").parquet(dir)
    ((lo1, hi1), (lo2, hi2))
  }

  /** Per-file fraction of each dimension's span covered — the skipping
    * quality metric ZOrderSpec compares against a linear sort (smaller
    * product = tighter hyper-rectangle = more files pruned per filter).
    */
  def fileLocality(spark: SparkSession, dir: String, c1: String,
      c2: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(
        min(col(c1)).as("min1"), max(col(c1)).as("max1"),
        min(col(c2)).as("min2"), max(col(c2)).as("max2"))

  val queries: Map[String, Q] = Map(
    // Clustering must be invisible to readers: the z-ordered rewrite of
    // orders returns exactly the table (plain-scan oracle, like X32's
    // compaction). The skipping benefit itself is pinned in ZOrderSpec,
    // where layouts are compared file-by-file.
    "q_zorder_roundtrip" -> ((s, d) => {
      val dir = graft.util.Scratch.dir("zorder")
      writeZOrdered(
        Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice"),
        dir, "o_custkey", "o_totalprice", 16)
      s.read.parquet(dir).orderBy("o_orderkey")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_zorder_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
  )
}
