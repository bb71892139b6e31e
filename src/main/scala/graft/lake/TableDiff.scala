package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-checksum table diff — anti-entropy verification (X71): decide
  * whether two copies of a table diverge (cross-region replica, a rebuilt
  * snapshot vs its source, a lake table vs its JDBC-landed twin) without
  * shipping either table, then row-diff ONLY where they disagree. The
  * one-level Merkle/anti-entropy scheme every replicated store runs
  * (Cassandra repair, DynamoDB global tables).
  *
  * Phase 1: both sides aggregate `(count, bit_xor(xxhash64(whole row)))`
  * per key-hash bucket — combinable, order-independent (XOR), overflow-free
  * (no ANSI sum trap), shipping `nBuckets` rows however big the table is.
  * Phase 2: only buckets whose fingerprints differ are re-scanned (the
  * bucket predicate pushes to the scan), and those rows run the null-safe
  * whole-row diff ([[SnapshotDiff.diffNullSafe]] with every column as the
  * key): value corruption surfaces as deleted+added of the two row
  * versions.
  *
  * Bucketing uses the LOGICAL key, so a value-corrupted row lands in the
  * same bucket on both sides (one bucket flagged, not two); a key-mutated
  * row flags both its buckets and both versions surface. Identical tables
  * cost exactly two aggregate scans and touch zero rows in phase 2 —
  * pinned in TableDiffSpec. Limits (documented, same as X49): XOR cancels
  * PAIRS of identical extra rows within one bucket, which the row count
  * catches unless the multiset differs by moving duplicates BETWEEN equal
  * rows — multiplicity beyond presence is out of contract for
  * [[SnapshotDiff.diffNullSafe]] too.
  */
object TableDiff {

  private def bucketOf(keys: Seq[String], nBuckets: Int) =
    pmod(xxhash64(keys.map(col): _*), lit(nBuckets))

  /** Phase 1 aggregate: `(bucket, n rows, xor of row hashes)`. */
  def bucketChecksums(df: DataFrame, keys: Seq[String], nBuckets: Int): DataFrame = {
    require(nBuckets > 0)
    df.withColumn("__bucket", bucketOf(keys, nBuckets))
      .groupBy("__bucket")
      .agg(count(lit(1)).as("__n"),
        expr(s"bit_xor(xxhash64(${df.columns.map(c => s"`$c`").mkString(", ")}))")
          .as("__xor"))
  }

  /** Buckets whose `(count, xor)` fingerprints differ — driver-sized by
    * construction (≤ nBuckets rows per side).
    */
  def divergentBuckets(a: DataFrame, b: DataFrame, keys: Seq[String],
      nBuckets: Int): Seq[Long] = {
    require(a.columns.toSeq == b.columns.toSeq,
      s"schemas differ: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val ca = bucketChecksums(a, keys, nBuckets).toDF("__bucket", "na", "xa")
    val cb = bucketChecksums(b, keys, nBuckets).toDF("__bucket", "nb", "xb")
    ca.join(cb, Seq("__bucket"), "full_outer")
      .where(!(col("na") <=> col("nb")) || !(col("xa") <=> col("xb")))
      .select("__bucket").collect().map(_.getLong(0)).toSeq.sorted
  }

  /** The full anti-entropy pass: `(row-level diff, buckets re-scanned)`.
    * Identical tables return an empty frame without scanning any row in
    * phase 2.
    */
  def diffDivergent(a: DataFrame, b: DataFrame, keys: Seq[String],
      nBuckets: Int): (DataFrame, Seq[Long]) = {
    val bad = divergentBuckets(a, b, keys, nBuckets)
    val allCols = a.columns.toSeq
    if (bad.isEmpty)
      (SnapshotDiff.diffNullSafe(a.limit(0), b.limit(0), allCols), bad)
    else {
      val hit = bucketOf(keys, nBuckets).isin(bad.map(Long.box): _*)
      (SnapshotDiff.diffNullSafe(a.where(hit), b.where(hit), allCols), bad)
    }
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // The synth snapshot pair diffed via checksums: phase 1 flags the
    // divergent buckets, phase 2 row-diffs only those — and the answer
    // must be EXACTLY the flagship q_snapshot_diff's (same oracle): on
    // this pair every (key)-matched row is value-identical, so the
    // whole-row diff coincides with the key diff.
    "q_table_diff" -> ((s, d) => {
      val (diffed, _) = diffDivergent(
        SnapshotDiff.synthCurrent(s, d), SnapshotDiff.synthPrevious(s, d),
        SnapshotDiff.diffKeys, nBuckets = 64)
      diffed.orderBy("change", "c_custkey", "c_name")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_table_diff" ->
      (SnapshotDiff.oracleCtes +
        """SELECT * FROM (SELECT * FROM added UNION ALL SELECT * FROM deleted)
          |ORDER BY change, c_custkey, c_name""".stripMargin),
  )
}
