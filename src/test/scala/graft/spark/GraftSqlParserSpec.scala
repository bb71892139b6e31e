package graft.spark

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.{DeleteVectors, ManifestTable, ZoneMap}
import graft.util.Scratch

/** X181 — the maintenance SQL surface (VACUUM / OPTIMIZE / DESCRIBE
  * HISTORY) through the injected delegating parser. Pins: each statement
  * executes its lake operation with the documented result rows, plain
  * SQL still parses through the delegate (including non-HISTORY
  * DESCRIBE), malformed graft statements refuse with their usage line,
  * and a session WITHOUT the extensions keeps Spark's own refusal.
  */
class GraftSqlParserSpec extends SparkSpec {

  import spark.implicits._

  private def ext = GraftDml.extSession(spark)

  private def mkVersions(tag: String, n: Int): String = {
    val dir = Scratch.dir(tag)
    (0 until n).foreach { i =>
      val df = (i * 10L until (i + 1) * 10L).map(k => (k, k * 1.0)).toDF("k", "v")
      if (i == 0) ManifestTable.commit(df.repartition(4), dir, 20250901, 900)
      else ManifestTable.appendRetrying(df.repartition(4), dir, 20250901, 900 + i)
    }
    dir
  }

  test("VACUUM '<path>' RETAIN n VERSIONS reclaims and returns expired versions") {
    val dir = mkVersions("sqlp_vac", 4)
    val got = ext.sql(s"VACUUM '$dir' RETAIN 2 VERSIONS")
    assert(got.columns.toSeq == Seq("reclaimed_version"))
    assert(got.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val left = ManifestTable.snapshots(spark, dir).map(_.version)
    assert(left == Seq(3, 4))
    assert(ManifestTable.readLatest(spark, dir).count() == 40)
    // idempotent: nothing left to reclaim
    assert(ext.sql(s"VACUUM '$dir' RETAIN 2 VERSIONS").count() == 0)
  }

  test("OPTIMIZE bin-packs as one commit; re-run is a no-op; ZORDER BY clusters") {
    val dir = mkVersions("sqlp_opt", 3)
    assert(ManifestTable.snapshots(spark, dir).last.files.size > 1)
    val v = ext.sql(s"OPTIMIZE '$dir' AT 20250901 1000").collect()
    assert(v.map(_.getLong(0)).toSeq == Seq(4L))
    val snap = ManifestTable.snapshots(spark, dir).last
    assert(snap.files.size == 1 && snap.op == "optimize")
    assert(ManifestTable.readLatest(spark, dir).count() == 30)
    // already within budget: zero rows, nothing committed
    assert(ext.sql(s"OPTIMIZE '$dir' AT 20250901 1100").count() == 0)
    assert(ManifestTable.snapshots(spark, dir).last.version == 4)

    // ZORDER BY: a clustering commit carrying stats on both dimensions
    val zv = ext.sql(s"OPTIMIZE '$dir' ZORDER BY (k, v) AT 20250901 1200")
      .collect()(0).getLong(0)
    assert(zv == 5L)
    val stats = ZoneMap.fileStats(spark, dir, 5).get
    assert(stats.forall(s => s.lo.contains("k") && s.lo.contains("v")))
    assert(ManifestTable.readVersion(spark, dir, 5).count() == 30)
  }

  test("DESCRIBE HISTORY returns the commit log; plain DESCRIBE still delegates") {
    val dir = mkVersions("sqlp_hist", 2)
    DeleteVectors.deleteWhereRetrying(spark, dir, $"k" === 1, 20250901, 950)
    val got = ext.sql(s"DESCRIBE HISTORY '$dir'").orderBy("version").collect()
    assert(got.length == 3)
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(got(2).getLong(5) == 1L, "the DV commit carries one delete file")
    // the delegate still owns everything else
    ext.sql("SELECT 1 AS one").collect()
    (0 until 3).map(i => (i, s"s$i")).toDF("a", "b").createOrReplaceTempView("sqlp_desc_t")
    assert(spark.sql("DESCRIBE sqlp_desc_t").count() > 0)
  }

  test("X182 RESTORE: SQL rollback commits the target's content as a new version") {
    val dir = mkVersions("sqlp_restore", 2)
    // a bad replace: only a third of the rows survive
    ManifestTable.commit(
      (0L until 20L).filter(_ % 3 == 0).map(k => (k, k * 1.0)).toDF("k", "v"),
      dir, 20250901, 930)
    val got = ext.sql(s"RESTORE '$dir' TO VERSION AS OF 2 AT 20250901 1000")
      .collect()(0)
    assert((got.getLong(0), got.getLong(1)) == (2L, 4L))
    assert(ManifestTable.readLatest(spark, dir).count() == 20)
    assert(ManifestTable.snapshots(spark, dir).last.op == "restore")
    // the bad version stays time-travelable
    assert(ManifestTable.readVersion(spark, dir, 3).count() == 7)
  }

  test("X182 CLONE: an independent table carrying the pinned version's content") {
    val dir = mkVersions("sqlp_clone", 2)
    val dst = Scratch.dir("sqlp_clone_dst")
    val got = ext.sql(s"CLONE '$dir' TO '$dst' VERSION AS OF 1 AT 20250901 1000")
      .collect()(0)
    assert((got.getLong(0), got.getLong(1)) == (1L, 1L))
    assert(ManifestTable.readLatest(spark, dst).count() == 10)
    // the clone is its own table: appending to it never touches the source
    ManifestTable.appendRetrying(Seq((99L, 99.0)).toDF("k", "v"), dst, 20250901, 1100)
    assert(ManifestTable.readLatest(spark, dst).count() == 11)
    assert(ManifestTable.readLatest(spark, dir).count() == 20)
  }

  test("X182 COPY INTO: exactly-once per drop, idempotent re-run returns zero rows") {
    val land = Scratch.dir("sqlp_land")
    val dir = Scratch.dir("sqlp_copy")
    (0L until 10L).map(k => (k, k * 1.0)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$land/d1")
    // non-recursive listing: move the drop up to the landing root
    val fs = new org.apache.hadoop.fs.Path(land)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$land/d1"))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(s => fs.rename(s.getPath,
        new org.apache.hadoop.fs.Path(s"$land/drop1.parquet")))
    val v1 = ext.sql(s"COPY INTO '$dir' FROM '$land' AT 20250901 900").collect()
    assert(v1.map(_.getLong(0)).toSeq == Seq(1L))
    assert(ext.sql(s"COPY INTO '$dir' FROM '$land' AT 20250901 910").count() == 0)
    assert(ManifestTable.readLatest(spark, dir).count() == 10)
    assert(ManifestTable.snapshots(spark, dir).size == 1)
  }

  test("X182 DESCRIBE DETAIL: one driver-side metadata row, exact under tombstones") {
    val dir = mkVersions("sqlp_detail", 2)
    DeleteVectors.deleteWhereRetrying(spark, dir, $"k" < 3, 20250901, 950)
    val got = ext.sql(s"DESCRIBE DETAIL '$dir'").collect()(0)
    assert(got.getLong(0) == 3L, "latest version")
    assert(got.getString(1) == "delete", "op kind")
    assert(got.getLong(2) == ManifestTable.snapshots(spark, dir).last.files.size.toLong)
    assert(got.getLong(3) == 1L, "one DV sidecar")
    assert(got.getLong(4) > 0L, "data bytes")
    assert(got.getLong(5) == 17L, "footer-exact rows minus tombstones")
  }

  test("malformed graft statements refuse with usage; plain sessions keep Spark's refusal") {
    val e1 = intercept[IllegalArgumentException](ext.sql("VACUUM no_quotes"))
    assert(e1.getMessage.contains("VACUUM '<path>'"))
    val e2 = intercept[IllegalArgumentException](
      ext.sql("OPTIMIZE '/tmp/x' ZORDER BY (only_one)"))
    assert(e2.getMessage.contains("OPTIMIZE '<path>'"))
    val e3 = intercept[IllegalArgumentException](ext.sql("DESCRIBE HISTORY t"))
    assert(e3.getMessage.contains("DESCRIBE HISTORY '<path>'"))
    val e4 = intercept[IllegalArgumentException](
      ext.sql("RESTORE '/tmp/x' VERSION 3"))
    assert(e4.getMessage.contains("RESTORE '<path>' TO VERSION AS OF"))
    val e5 = intercept[IllegalArgumentException](ext.sql("CLONE '/tmp/x'"))
    assert(e5.getMessage.contains("CLONE '<src>' TO '<dst>'"))
    val e6 = intercept[IllegalArgumentException](
      ext.sql("COPY INTO t FROM '/tmp/x'"))
    assert(e6.getMessage.contains("COPY INTO '<path>' FROM '<landing>'"))
    val e7 = intercept[IllegalArgumentException](ext.sql("DESCRIBE DETAIL t"))
    assert(e7.getMessage.contains("DESCRIBE DETAIL '<path>'"))
    // no extensions, no statement: the base session refuses VACUUM itself
    intercept[Exception](spark.sql("VACUUM '/tmp/x'"))
  }

  test("X185 ALTER TABLE: rename is metadata-only; drop+re-add never resurrects") {
    val dir = mkVersions("sqlp_alter", 1) // plain unmapped table (k, v)
    val before = ManifestTable.snapshots(spark, dir).last
    val r = ext.sql(s"ALTER TABLE '$dir' RENAME COLUMN v TO price").collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq ===
      Seq(("rename", 2L)))
    val after = ManifestTable.snapshots(spark, dir).last
    assert(after.files === before.files, "rename must be metadata-only")
    val renamed = graft.lake.ColumnMap.read(spark, dir)
    assert(renamed.columns.toSeq === Seq("k", "price"))
    assert(renamed.agg(sum("price")).head.getDouble(0) === (0 until 10).sum)
    // era-correct time travel: v1 still serves the pre-rename name
    assert(graft.lake.ColumnMap.read(spark, dir, Some(1)).columns.toSeq ===
      Seq("k", "v"))
    // drop, then re-add the same name: fresh field id, old bytes stay dark
    ext.sql(s"ALTER TABLE '$dir' DROP COLUMN price")
    ext.sql(s"ALTER TABLE '$dir' ADD COLUMN price double")
    val readd = graft.lake.ColumnMap.read(spark, dir)
    assert(readd.columns.toSeq === Seq("k", "price"))
    assert(readd.where(col("price").isNotNull).count() === 0,
      "re-added column must not resurrect dropped bytes")
  }

  test("X185 ALTER TABLE: usage refusal; unquoted names delegate to Spark") {
    val e = intercept[IllegalArgumentException](
      ext.sql("ALTER TABLE '/tmp/x' FROBNICATE COLUMN a"))
    assert(e.getMessage.contains("ALTER TABLE '<path>'"))
    val e2 = intercept[IllegalArgumentException](
      ext.sql("ALTER TABLE '/tmp/x' ADD COLUMN a notatype"))
    assert(e2.getMessage.contains("unknown column type"))
    // an unquoted table name is Spark's own ALTER TABLE — delegated, so
    // the failure is Spark's not-found analysis error, not our usage line
    val e3 = intercept[Exception](
      ext.sql("ALTER TABLE graft_no_such_tbl ADD COLUMNS (a INT)"))
    assert(!e3.getMessage.contains("graft ALTER TABLE"))
  }
}
