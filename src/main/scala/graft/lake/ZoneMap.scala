package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.sources.Tables
import graft.util.Exact.dsum

/** File-level zone maps on manifest commits (X57): per-file min/max column
  * statistics captured at write time into a sidecar next to the X39
  * manifest, so a reader can prune data files from the MANIFEST alone —
  * no directory listing (X39 already removed that) and no parquet-footer
  * round-trips, which at 100 TB / object-store latency is the difference
  * between planning in milliseconds and planning in minutes. This is the
  * stats half of what Iceberg manifests / Delta add-file entries carry;
  * X48 Z-ordering exists precisely to make these ranges tight on multiple
  * columns at once.
  *
  * Commit order: data files → stats sidecar → manifest rename. The rename
  * remains the single commit point (a crash after the sidecar but before
  * the rename leaves the version invisible, ManifestSpec semantics), and a
  * committed-with-stats version always has its sidecar.
  *
  * Stats collection is ONE combinable aggregate over the staged files
  * grouped by `_metadata.file_path` — a map-side-combined pass over data
  * the writer just produced (usually still in page cache), not a second
  * full scan of the table's history.
  *
  * Pruning is driver-side over the (tiny) sidecar, then a scan of ONLY the
  * surviving files with the predicate still applied — the zone map is an
  * optimization, never a semantics change, which is exactly what
  * `q_stats_prune`'s plain-table oracle pins.
  */
object ZoneMap {

  /** Per-file `[lo, hi]` ranges for the stat columns (values as strings;
    * numeric comparisons parse back through the column's own ordering).
    */
  case class FileStats(file: String, lo: Map[String, Long], hi: Map[String, Long])

  private def statsName(version: Int) = f"v$version%08d.stats.json"
  private def statsPath(dir: String, version: Int) =
    new Path(s"$dir/_manifests", statsName(version))

  /** Commit `df` as the next version with zone-map stats on `statsCols`
    * (long-comparable columns). Returns the committed version.
    */
  def commitWithStats(df: DataFrame, dir: String, date: Int, time: Int,
      statsCols: Seq[String]): Int = {
    val spark = df.sparkSession
    val version = ManifestTable.latestVersion(spark, dir).getOrElse(0) + 1
    val files = ManifestTable.writeDataFiles(df, dir, version)

    // One combinable aggregate pass over the files just staged.
    val staged = spark.read.parquet(f"$dir/data/v$version%08d")
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).cast("long").as(s"lo_$c"), max(col(c)).cast("long").as(s"hi_$c")))
    val rows = staged
      .groupBy(col("_metadata.file_path").as("file_path"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // one row per staged file — driver-sized by construction

    val stats = rows.map { r =>
      val name = r.getAs[String]("file_path").split('/').last
      val rel = files.find(_.endsWith(name)).getOrElse(
        throw new IllegalStateException(s"staged file $name missing from listing"))
      FileStats(rel,
        statsCols.map(c => c -> r.getAs[Long](s"lo_$c")).toMap,
        statsCols.map(c => c -> r.getAs[Long](s"hi_$c")).toMap)
    }.toSeq.sortBy(_.file)

    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val json = stats.map { s =>
      val los = s.lo.toSeq.sortBy(_._1).map { case (c, v) => s""""$c": $v""" }.mkString(", ")
      val his = s.hi.toSeq.sortBy(_._1).map { case (c, v) => s""""$c": $v""" }.mkString(", ")
      s"""{"file": "${s.file}", "lo": {$los}, "hi": {$his}}"""
    }.mkString("[", ",\n ", "]")
    val out = fs.create(statsPath(dir, version), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()

    ManifestTable.commitManifest(spark, dir, version, date, time, files)
    version
  }

  /** The sidecar for `version`, if one was written. */
  def fileStats(spark: SparkSession, dir: String, version: Int): Option[Seq[FileStats]] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = statsPath(dir, version)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    implicit val fmts: Formats = DefaultFormats
    Some(JsonMethods.parse(text).extract[Seq[FileStats]])
  }

  /** Files of `version` whose `[lo, hi]` range on `column` intersects
    * `[lo, hi]` — the driver-side prune. Falls back to ALL files when no
    * sidecar exists (stats are an optimization, never required).
    */
  def candidateFiles(spark: SparkSession, dir: String, version: Int,
      column: String, lo: Long, hi: Long): Seq[String] = {
    val all = ManifestTable.snapshots(spark, dir).find(_.version == version)
      .getOrElse(throw new NoSuchElementException(s"no version $version at $dir"))
      .files
    fileStats(spark, dir, version) match {
      case None => all
      case Some(stats) =>
        val ranged = stats.filter(s =>
          s.lo.contains(column) && s.hi(column) >= lo && s.lo(column) <= hi)
          .map(_.file)
        // Files the stats pass somehow missed stay in scope — never prune
        // on absence of evidence.
        val known = stats.map(_.file).toSet
        ranged ++ all.filterNot(known.contains)
    }
  }

  /** Read `version` with `column BETWEEN lo AND hi`, scanning only the
    * files the zone map cannot rule out. The predicate is STILL applied —
    * pruning must be invisible.
    */
  def readRange(spark: SparkSession, dir: String, version: Int,
      column: String, lo: Long, hi: Long): DataFrame = {
    val cand = candidateFiles(spark, dir, version, column, lo, hi)
    val pred: Column = col(column) >= lo && col(column) <= hi
    if (cand.isEmpty) {
      // Empty result with the right schema: scan the full version, filter.
      ManifestTable.readVersion(spark, dir, version).where(pred)
    } else {
      // X64 tombstones still subtract on the pruned scan — zone maps
      // narrow the file list, never the delete semantics
      val snap = ManifestTable.snapshots(spark, dir).find(_.version == version).get
      DeleteVectors.applyTo(spark, dir, snap,
        spark.read.parquet(cand.map(f => s"$dir/$f"): _*)).where(pred)
    }
  }

  type Q = (SparkSession, String) => DataFrame

  /** Fixture predicate: the middle fifth of the orderkey space. */
  private[lake] def keyBounds(s: SparkSession, d: String): (Long, Long) = {
    val mx = Tables.orders(s, d).agg(max("o_orderkey")).head.getLong(0)
    (2 * mx / 5, 3 * mx / 5)
  }

  val queries: Map[String, Q] = Map(
    // Range-clustered commit + zone-map-pruned range read; the oracle is
    // the plain table with the same BETWEEN — pruning must be invisible.
    "q_stats_prune" -> ((s, d) => {
      val dir = graft.util.FixtureCache.dir("zonemap_prune", d) { dir =>
        val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
          .repartitionByRange(8, col("o_orderkey"))
        commitWithStats(o, dir, 20250401, 900, Seq("o_orderkey"))
      }
      val (lo, hi) = keyBounds(s, d)
      readRange(s, dir, 1, "o_orderkey", lo, hi)
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("o_totalprice")).as("sum_total"),
          min("o_orderkey").as("min_key"),
          max("o_orderkey").as("max_key"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_stats_prune" ->
      """SELECT count(*) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
        |  min(o_orderkey) AS min_key,
        |  max(o_orderkey) AS max_key
        |FROM orders
        |WHERE o_orderkey >= (SELECT 2 * max(o_orderkey) // 5 FROM orders)
        |  AND o_orderkey <= (SELECT 3 * max(o_orderkey) // 5 FROM orders)""".stripMargin,
  )
}
