package graft.lake

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** X160: the `files` metadata subtable — Iceberg's `table.files` /
  * Delta's `DESCRIBE DETAIL` per-file view, derived from manifests,
  * zone-map sidecars (X57/X69/X78) and deletion-vector deltas (X64)
  * WITHOUT opening a single data file.
  *
  * The operational questions this answers at 100 TB — "how many files,
  * how big, what key ranges, how much MOR debt has accumulated?" — are
  * exactly the inputs to compaction (X32), clustering (X48/X106) and
  * materialize (X64) decisions, and the table costs the same for a
  * 100 MB table as a 100 TB one: manifests + sidecars are metadata,
  * tombstone deltas are proportional to deleted rows, never to data.
  *
  * Stats resolution: per file, the NEWEST sidecar at any version ≤ the
  * requested one wins (appends carry parent stats forward, so this is
  * normally the version's own sidecar; delete commits write none and
  * inherit). Files without stats surface NULL rows/bounds — absence
  * degrades to "unknown", never to a wrong number (the X57 rule).
  */
object MetaTables {

  val filesSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("rows", LongType, nullable = true),
    StructField("lo", MapType(StringType, LongType), nullable = true),
    StructField("hi", MapType(StringType, LongType), nullable = true),
    StructField("slo", MapType(StringType, StringType), nullable = true),
    StructField("shi", MapType(StringType, StringType), nullable = true),
    StructField("tombstones", LongType, nullable = false)))

  /** The per-file view of `version` (default: latest). One row per live
    * data file: sidecar stats (NULL when no sidecar covers the file) and
    * the file's tombstone count from the version's DV delta.
    */
  def filesTable(spark: SparkSession, dir: String, version: Option[Int] = None): DataFrame = {
    val snaps = ManifestTable.snapshots(spark, dir)
    require(snaps.nonEmpty, s"graft: no committed versions at $dir")
    val snap = version match {
      case Some(v) => snaps.find(_.version == v).getOrElse(
        throw new NoSuchElementException(s"graft: no version $v at $dir"))
      case None => snaps.last
    }
    // newest sidecar ≤ version wins per file (fold in ascending order)
    val stats: Map[String, ZoneMap.FileStats] =
      (1 to snap.version).foldLeft(Map.empty[String, ZoneMap.FileStats]) { (acc, v) =>
        acc ++ ZoneMap.fileStats(spark, dir, v).getOrElse(Nil).map(s => s.file -> s)
      }
    // MOR debt: tombstones per file from the cumulative DV delta —
    // proportional to deleted rows, the only non-metadata input
    val tomb: Map[String, Long] =
      if (snap.deletes.isEmpty) Map.empty
      else spark.read.parquet(snap.deletes.map(f => s"$dir/$f"): _*)
        .groupBy("file").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = snap.files.sorted.map { f =>
      val s = stats.get(f)
      Row(f,
        s.map(_.rows).filter(_ >= 0).map(java.lang.Long.valueOf).orNull,
        s.map(_.lo).orNull, s.map(_.hi).orNull,
        s.map(_.slo).orNull, s.map(_.shi).orNull,
        tomb.getOrElse(f, 0L))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), filesSchema)
  }
}
