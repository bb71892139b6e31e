package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic, group-aware train/val/test splits (extension X35) —
  * the assignment step every training-data pipeline runs last. Two
  * properties matter and both are pinned:
  *  - DETERMINISTIC: the split is a pure function of the key (md5-based),
  *    not of a seed, partitioning, or row order — re-runs, backfills, and
  *    incremental appends land every row in the same split;
  *  - GROUP-AWARE: keying by a GROUP column (user, document source)
  *    puts all of a group's rows in one split, preventing leakage of a
  *    user's behavior from train into eval.
  *
  * Shape: one per-row expression (md5 → 32-bit prefix → mod 100 → CASE
  * chain), no shuffle, no driver state — embarrassingly parallel at any
  * scale.
  */
object Split {
  type Q = (SparkSession, String) => DataFrame

  /** Bucket in [0, 100) as a pure function of the key's string form. */
  def hashBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"), lit(100))

  /** Append a `split` column assigning each row by `keyCol`'s hash
    * bucket; `splits` are (name, percent) with percents summing to 100.
    * Rows sharing a key always share a split.
    */
  def assignSplits(df: DataFrame, keyCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      "split percents must sum to 100")
    require(splits.forall(_._2 > 0), "split percents must be positive")
    val h = hashBucket(col(keyCol))
    val uppers = splits.map(_._2).scanLeft(0)(_ + _).tail // cumulative bounds
    val assign = splits.zip(uppers).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), els) => when(h < hi, lit(name)).otherwise(els)
    }
    df.withColumn("split", assign)
  }

  val standardSplits: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10)

  val queries: Map[String, Q] = Map(
    // Events split BY USER (group-aware): the oracle recomputes the same
    // md5-bucket assignment in SQL and must agree on every per-split
    // event count AND distinct-user count — bucket-boundary or
    // hash-mismatch bugs break both.
    "q_split_assign" -> ((s, d) =>
      assignSplits(Tables.events(s, d), "user_id", standardSplits)
        .groupBy("split")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("split")),
  )

  val oracles: Map[String, String] = Map(
    "q_split_assign" ->
      """SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
        |       count(*) AS n_events,
        |       count(DISTINCT user_id) AS n_users
        |FROM (SELECT user_id,
        |             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS h
        |      FROM events)
        |GROUP BY 1 ORDER BY split""".stripMargin,
  )
}
