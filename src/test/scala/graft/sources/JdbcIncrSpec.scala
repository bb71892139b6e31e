package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.ManifestTable
import graft.sinks.Jdbc
import graft.sinks.Jdbc.JdbcConfig
import graft.util.Scratch

/** X112 incremental JDBC ingest: full first load, append-only increments,
  * version-less no-op when the source is quiet, and watermark resolution
  * that ignores crash-orphaned sidecars.
  */
class JdbcIncrSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = JdbcConfig(
    url = "jdbc:derby:memory:jincrspec;create=true",
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  test("first pull loads all, increments append, quiet source is a no-op") {
    val dir = Scratch.dir("jincr")
    Jdbc.append((1L to 5L).map(i => (i, i * 10)).toDF("wm", "v"), cfg, "inc_src")

    assert(JdbcIncr.pull(spark, cfg, "inc_src", "wm", dir, 20250601, 900).contains(1))
    assert(ManifestTable.readLatest(spark, dir).count() == 5)
    assert(JdbcIncr.committedWatermark(spark, dir).contains(5L))

    Jdbc.append((6L to 8L).map(i => (i, i * 10)).toDF("wm", "v"), cfg, "inc_src")
    assert(JdbcIncr.pull(spark, cfg, "inc_src", "wm", dir, 20250601, 1000).contains(2))
    val rows = ManifestTable.readLatest(spark, dir)
    assert(rows.count() == 8)
    // the increment appended ONLY the new rows: no row duplicated
    assert(rows.groupBy("wm").count().where(col("count") > 1).count() == 0)
    assert(JdbcIncr.committedWatermark(spark, dir).contains(8L))

    // nothing new at the source: no commit, no version, watermark holds
    assert(JdbcIncr.pull(spark, cfg, "inc_src", "wm", dir, 20250601, 1100).isEmpty)
    assert(ManifestTable.latestVersion(spark, dir).contains(2))
    assert(JdbcIncr.committedWatermark(spark, dir).contains(8L))
  }

  test("orphan sidecars above the committed latest are invisible") {
    val dir = Scratch.dir("jincr_orphan")
    Jdbc.append(Seq((1L, 10L)).toDF("wm", "v"), cfg, "inc_orph")
    JdbcIncr.pull(spark, cfg, "inc_orph", "wm", dir, 20250601, 900)

    // simulate a crash AFTER the sidecar write but BEFORE the manifest
    // commit: a v2 sidecar exists, but v2 was never committed
    val m = classOf[JdbcIncr.type].getDeclaredMethods
      .find(_.getName == "writeSidecar").get
    m.setAccessible(true)
    m.invoke(JdbcIncr, spark, dir, Int.box(2), Long.box(99L))

    // resolution ignores it: the committed watermark is still v1's
    assert(JdbcIncr.committedWatermark(spark, dir).contains(1L))
    // and the next pull re-pulls from the COMMITTED watermark
    Jdbc.append(Seq((2L, 20L)).toDF("wm", "v"), cfg, "inc_orph")
    assert(JdbcIncr.pull(spark, cfg, "inc_orph", "wm", dir, 20250601, 1000).contains(2))
    assert(ManifestTable.readLatest(spark, dir).count() == 2)
  }
}
