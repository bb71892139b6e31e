package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.{Catalog, History}
import graft.util.Scratch

/** X169 streaming SCD2: replayed batch ids are no-ops (version-log
  * idempotency), out-of-order batches refuse, and the streamed history
  * equals the batch rebuild.
  */
class StreamScd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("streamed apply equals the batch rebuild; replayed batch id is a no-op") {
    val root = Scratch.dir("sscd2_spec")
    val init = Seq((1L, ts(1), 10L, "A"), (2L, ts(2), 11L, "B"))
      .toDF("k", "t", "tie", "st")
    History.scd2Init(init, "k", "t", "tie", "st", root, 20250601, 900)
    val b0 = Seq((1L, ts(5), 20L, "B")).toDF("k", "t", "tie", "st")
    StreamScd2.applyBatch(spark, root, b0, 0L, "k", "t", "tie", "st")
    assert(Catalog.latestVersion(spark, root).get === 2)
    // the replay must not commit another cut (nor double-append runs)
    StreamScd2.applyBatch(spark, root, b0, 0L, "k", "t", "tie", "st")
    assert(Catalog.latestVersion(spark, root).get === 2)
    val all = init.unionByName(b0)
    val full = History.scd2(all, "k", Seq("t", "tie"), "st", "t")
      .select(col("k"), col("version"), col("st"), col("valid_from"), col("n_rows"))
      .orderBy("k", "version").collect().map(_.toString).toSeq
    val inc = History.scd2Read(spark, root)
      .select(col("k"), col("version"), col("state"), col("valid_from"), col("n_rows"))
      .orderBy("k", "version").collect().map(_.toString).toSeq
    assert(inc === full)
  }

  test("an out-of-order batch refuses instead of silently reopening history") {
    val root = Scratch.dir("sscd2_ooo")
    History.scd2Init(Seq((1L, ts(9), 1L, "A")).toDF("k", "t", "tie", "st"),
      "k", "t", "tie", "st", root, 20250601, 900)
    val stale = Seq((1L, ts(3), 2L, "B")).toDF("k", "t", "tie", "st")
    val e = intercept[IllegalArgumentException](
      StreamScd2.applyBatch(spark, root, stale, 0L, "k", "t", "tie", "st"))
    assert(e.getMessage.contains("late"))
    assert(Catalog.latestVersion(spark, root).get === 1, "nothing committed")
  }
}
