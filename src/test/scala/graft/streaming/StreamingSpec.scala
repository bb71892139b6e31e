package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}

import graft.SparkSpec

class StreamingSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("streaming snapshot diff emits exactly the batch diff") {
    val streamed = StreamDiff.queries("q_stream_diff")(spark, sf)
    val batch = graft.ops.Core.queries("q_snapshot_diff")(spark, sf)
    assert(rows(streamed) == rows(batch))
  }

  test("streaming sessionize (flatMapGroupsWithState, 2 micro-batches) ≡ batch tier") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"))
    // split into two snapshot files by time so sessions cross the batch
    // boundary and exercise state carry-over
    val cut = ev.agg(expr("percentile(cast(ts as long), 0.5)")).head().getDouble(0).toLong
    val dir = Files.createTempDirectory("graft_sess").toFile.getAbsolutePath
    val t0 = System.currentTimeMillis() - 120000
    StreamDiff.writeSnapshotFile(
      ev.where(col("ts").cast("long") <= cut), s"$dir/in/part_1.parquet", t0)
    StreamDiff.writeSnapshotFile(
      ev.where(col("ts").cast("long") > cut), s"$dir/in/part_2.parquet", t0 + 60000)

    val sink = s"sessions_${System.nanoTime()}"
    val q = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/in")
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        Sessionize.sessionizeGroup _)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/chk")
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(sink)
      .start()
    q.awaitTermination()

    // latest snapshot per (user, session): a session extended in batch 2
    // re-emits with a higher n_events
    val streamed = spark.table(sink)
      .groupBy("user_id", "session_seq")
      .agg(max(struct(col("n_events"), col("t_start"), col("t_end"))).as("x"))
      .select(col("user_id"), col("session_seq"),
        col("x.n_events"), col("x.t_start"), col("x.t_end"))
      .orderBy("user_id", "session_seq")
    val batch = Sessionize.queries("q_sessionize")(spark, sf)
    assert(rows(streamed) == rows(batch))
  }
}
