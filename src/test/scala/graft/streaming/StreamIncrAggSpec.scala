package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.{IncrementalAgg, ManifestTable}
import graft.sources.Tables

/** X51 pin beyond the hash gate: foreachBatch's replay contract — a
  * re-delivered batch id must be a no-op because its manifest version
  * already exists (the version log IS the transaction log).
  */
class StreamIncrAggSpec extends SparkSpec {

  private def batch(k: Int): DataFrame =
    Tables.events(spark, sf).select("event_id", "event_type", "value")
      .where(pmod(col("event_id"), lit(3)) === k)

  private def state(dir: String): Seq[String] =
    ManifestTable.readLatest(spark, dir).collect().map(_.toString).sorted.toSeq

  test("stream-incr-agg: a replayed batch id is skipped, later batches land") {
    val dir = graft.util.Scratch.dir("sincr_replay")
    StreamIncrAgg.foldBatch(spark, dir, batch(0), 0, Seq("event_type"), "value")
    assert(ManifestTable.latestVersion(spark, dir).contains(1))
    val v1 = state(dir)

    // failure-replay of batch 0: same id, must not double-count
    StreamIncrAgg.foldBatch(spark, dir, batch(0), 0, Seq("event_type"), "value")
    assert(ManifestTable.latestVersion(spark, dir).contains(1))
    assert(state(dir) == v1)

    // the next batch still lands as version 2 with the combined totals
    StreamIncrAgg.foldBatch(spark, dir, batch(1), 1, Seq("event_type"), "value")
    assert(ManifestTable.latestVersion(spark, dir).contains(2))
    val expect = IncrementalAgg.delta(batch(0).unionByName(batch(1)),
      Seq("event_type"), "value").collect().map(_.toString).sorted.toSeq
    assert(state(dir) == expect)
  }
}
