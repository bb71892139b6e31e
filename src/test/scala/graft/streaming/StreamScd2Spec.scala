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

  test("the strict scd2Apply API still refuses out-of-order data loudly") {
    val root = Scratch.dir("sscd2_ooo")
    History.scd2Init(Seq((1L, ts(9), 1L, "A")).toDF("k", "t", "tie", "st"),
      "k", "t", "tie", "st", root, 20250601, 900)
    val stale = Seq((1L, ts(3), 2L, "B")).toDF("k", "t", "tie", "st")
    val e = intercept[IllegalArgumentException](
      History.scd2Apply(stale, "k", "t", "tie", "st", root, 20250601, 930))
    assert(e.getMessage.contains("late"))
    assert(Catalog.latestVersion(spark, root).get === 1, "nothing committed")
  }

  test("a late batch dead-letters instead of failing the stream; reopen replay converges to the rebuild") {
    val root = Scratch.dir("sscd2_dlq")
    val init = Seq((1L, ts(9), 1L, "A"), (2L, ts(1), 2L, "X"))
      .toDF("k", "t", "tie", "st")
    History.scd2Init(init, "k", "t", "tie", "st", root, 20250601, 900)
    // batch 0: key 1 carries a LATE row (ts3 < absorbed ts9) plus an
    // in-order one — the whole key-1 slice must quarantine (applying
    // just the in-order suffix would close runs the reopen then has to
    // tombstone); key 2 is clean and applies
    val b0 = Seq((1L, ts(3), 3L, "B"), (1L, ts(12), 4L, "C"),
      (2L, ts(5), 5L, "Y")).toDF("k", "t", "tie", "st")
    StreamScd2.applyBatch(spark, root, b0, 0L, "k", "t", "tie", "st")
    assert(Catalog.latestVersion(spark, root).get === 2,
      "the stream continued — one cut for batch 0")
    val q = Catalog.readTable(spark, root, "quarantine")
    assert(q.select("k").distinct().collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(q.count() === 2, "the late key's WHOLE batch slice quarantines")
    val cur = History.scd2Read(spark, root)
    assert(cur.where(col("k") === 2L).count() === 2, "clean key applied (X then Y)")
    assert(cur.where(col("k") === 1L).count() === 1, "late key untouched")
    // a replay of the same batch id is still a no-op (exactly-once intact)
    StreamScd2.applyBatch(spark, root, b0, 0L, "k", "t", "tie", "st")
    assert(Catalog.latestVersion(spark, root).get === 2)
    // remediation: X170 reopen with the quarantined key's COMPLETE history
    val k1All = Seq((1L, ts(9), 1L, "A"), (1L, ts(3), 3L, "B"),
      (1L, ts(12), 4L, "C")).toDF("k", "t", "tie", "st")
    History.scd2Reopen(k1All, "k", "t", "tie", "st", root, 20250601, 1000)
    val full = History.scd2(init.unionByName(b0), "k", Seq("t", "tie"), "st", "t")
      .select(col("k"), col("version"), col("st"), col("valid_from"), col("n_rows"))
      .orderBy("k", "version").collect().map(_.toString).toSeq
    val inc = History.scd2Read(spark, root)
      .select(col("k"), col("version"), col("state"), col("valid_from"), col("n_rows"))
      .orderBy("k", "version").collect().map(_.toString).toSeq
    assert(inc === full, "reopen replay of the dead letters equals the full rebuild")
  }

  test("a clean batch through the quarantining apply commits the identical cut shape (no quarantine table)") {
    val root = Scratch.dir("sscd2_clean")
    History.scd2Init(Seq((1L, ts(1), 1L, "A")).toDF("k", "t", "tie", "st"),
      "k", "t", "tie", "st", root, 20250601, 900)
    val (v, nq) = History.scd2ApplyOrQuarantine(
      Seq((1L, ts(5), 2L, "B")).toDF("k", "t", "tie", "st"),
      "k", "t", "tie", "st", root, 20250601, 930)
    assert(v === 2 && nq === 0L)
    assert(Catalog.snapshots(spark, root).last.tables.keySet === Set("closed", "tail"),
      "a clean batch must not introduce a quarantine table into the cut")
  }
}
