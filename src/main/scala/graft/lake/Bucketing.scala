package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed snapshot storage — the shuffle-free tier of the snapshot diff
  * (SURVEY §2 U1 scale note, SnapshotDiff Scaladoc).
  *
  * The hourly diff joins two full snapshots on the same key every run. At
  * 100 TB that's two complete shuffles per hour — unless the snapshots are
  * WRITTEN pre-partitioned by the key. Spark's bucketing does exactly
  * that: `bucketBy(n, keys).sortBy(keys)` persists hash-clustered,
  * sorted-within-bucket files plus catalog metadata; a later join between
  * two tables bucketed the same way satisfies the join's distribution
  * requirement from the SCAN, so the sort-merge join runs with ZERO
  * exchanges (pinned in BucketingSpec). The hourly pipeline pays a
  * one-time clustered write per snapshot instead of two shuffles per
  * diff — and the write itself replaces a shuffle the plain append would
  * not have needed only if downstream diffs happen (they do, hourly).
  *
  * Bucket count is a layout contract: both sides must agree (as both
  * sides of an hourly diff naturally do when produced by this writer).
  */
object Bucketing {

  val defaultBuckets = 8

  /** Persist one snapshot bucketed + sorted by `keys` as a catalog table
    * (bucketing metadata lives in the catalog, so this is `saveAsTable`,
    * not a path write).
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int = defaultBuckets): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Diff two bucketed snapshot tables — same semantics as
    * [[SnapshotDiff.diff]], but the full-outer join consumes the buckets'
    * clustering and shuffles nothing.
    */
  def diffBucketed(s: SparkSession, curTable: String, prevTable: String,
      keys: Seq[String]): DataFrame =
    SnapshotDiff.diff(s.table(curTable), s.table(prevTable), keys)
}
