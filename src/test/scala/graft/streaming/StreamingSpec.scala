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

  test("stream-stream join ≡ batch join, with load-bearing cross-batch matches") {
    import spark.implicits._
    val streamed = StreamJoin.queries("q_stream_join")(spark, sf)
      .select("a_id", "b_id")
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"))
      .where(col("user_id") % 4 === 0) // same scope as the query fixture
    val a = ev.where(col("event_id") % 2 === 0).alias("a")
    val b = ev.where(col("event_id") % 2 === 1).alias("b")
    val batch = a.join(b, expr(StreamJoin.joinCondSql))
      .select(col("a.event_id").as("a_id"), col("b.event_id").as("b_id"))
      .orderBy("a_id", "b_id")
    assert(rows(streamed) == rows(batch))
    assert(rows(batch).nonEmpty)
    // the fixture cuts the files at the midpoint of a matching pair with
    // distinct timestamps; if such a pair exists, a match is GUARANTEED to
    // straddle the micro-batch boundary, making cross-batch state
    // load-bearing — assert the guaranteed-straddle path was available
    val straddleable = a.join(b, expr(StreamJoin.joinCondSql))
      .where(col("a.ts").cast("long") < col("b.ts").cast("long"))
      .count()
    assert(straddleable > 0, "no pair with distinct timestamps — fixture too weak")
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
    // re-emits with a higher n_events; tombstones (n_events = 0) retract
    // orphaned seqs and are filtered after compaction
    val streamed = spark.table(sink)
      .groupBy("user_id", "session_seq")
      .agg(max(struct(col("n_events"), col("t_start"), col("t_end"))).as("x"))
      .select(col("user_id"), col("session_seq"),
        col("x.n_events"), col("x.t_start"), col("x.t_end"))
      .where(col("n_events") > 0)
      .orderBy("user_id", "session_seq")
    val batch = Sessionize.queries("q_sessionize")(spark, sf)
    assert(rows(streamed) == rows(batch))
  }

  test("X74 session_window boundary: exactly-gap merges, one past the gap breaks — both tiers agree") {
    import spark.implicits._
    val h = 3600L * 1000
    def ts(msec: Long) = new java.sql.Timestamp(msec)
    // user 1: events exactly 12 h apart (the gap); user 2: 12 h + 1 s apart
    val ev = Seq((1L, 1L, ts(0), 1.0), (1L, 2L, ts(12 * h), 1.0),
      (2L, 3L, ts(0), 1.0), (2L, 4L, ts(12 * h + 1000), 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    val native = ev.groupBy(col("user_id"), session_window(col("ts"), Sessionize.gap))
      .count().groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(native == Map(1L -> 1L, 2L -> 2L),
      "session_window merges at exactly gap, breaks strictly past it")
    // the custom tier draws the identical boundary (`>` break)
    val custom = Sessionize.sessionizeBatch(ev.select("user_id", "event_id", "ts"))
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(custom == native)
  }

  test("interval-merge sessionizer is order-independent and never buffers events") {
    import org.apache.spark.sql.streaming.TestGroupState
    val rnd = new scala.util.Random(7)
    val hourUs = 3600L * 1000000
    (1 to 20).foreach { trial =>
      // random event times clustered so both merges and breaks occur
      val times = (1 to 60).map(_ =>
        rnd.nextInt(8) * 20 * hourUs + rnd.nextInt(6) * hourUs).distinct
      // ground truth: sort + gap-break (the batch tier's definition)
      val expected = times.sorted.foldLeft(List.empty[(Long, Long, Long)]) {
        case (acc, t) => acc match {
          case (s0, e0, n0) :: rest if t - e0 <= 12L * 3600 * 1000000 =>
            (s0, t, n0 + 1) :: rest
          case _ => (t, t, 1L) :: acc
        }
      }.reverse
      // feed the SHUFFLED events through the state machine in two batches
      val shuffled = rnd.shuffle(times)
      val (b1, b2) = shuffled.splitAt(shuffled.length / 2)
      def ev(ts: Long) = SessEvent(1L, ts, new java.sql.Timestamp(ts / 1000))
      import org.apache.spark.api.java.Optional
      val st1 = TestGroupState.create[Sessionize.SessState](
        Optional.empty(), org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
        0L, Optional.empty(), hasTimedOut = false)
      Sessionize.sessionizeGroup(1L, b1.iterator.map(ev), st1).toList
      val st2 = TestGroupState.create[Sessionize.SessState](
        Optional.of(st1.get), org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
        0L, Optional.empty(), hasTimedOut = false)
      val out = Sessionize.sessionizeGroup(1L, b2.iterator.map(ev), st2).toList
      val got = out.filter(_.n_events > 0)
        .map(s => (s.t_start.getTime * 1000, s.t_end.getTime * 1000, s.n_events))
      assert(got == expected, s"trial $trial: order dependence — got $got expected $expected")
      assert(out.filter(_.n_events > 0).map(_.session_seq) == (1L to got.length).toList)
    }
  }

  test("a bridging late event retracts the orphaned session_seq with a tombstone") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val hourUs = 3600L * 1000000
    def ev(us: Long) = SessEvent(1L, us, new java.sql.Timestamp(us / 1000))
    val st1 = TestGroupState.create[Sessionize.SessState](
      Optional.empty(), GroupStateTimeout.NoTimeout(), 0L, Optional.empty(),
      hasTimedOut = false)
    // batch 1: two events 20h apart (> 12h gap) → sessions 1 and 2
    val out1 = Sessionize.sessionizeGroup(1L,
      Iterator(ev(0), ev(20 * hourUs)), st1).toList
    assert(out1.map(s => (s.session_seq, s.n_events)) == List((1L, 1L), (2L, 1L)))
    // batch 2: a late event at 10h bridges both sessions into one —
    // seq 1 re-emits merged, seq 2 is retracted with n_events = 0
    val st2 = TestGroupState.create[Sessionize.SessState](
      Optional.of(st1.get), GroupStateTimeout.NoTimeout(), 0L, Optional.empty(),
      hasTimedOut = false)
    val out2 = Sessionize.sessionizeGroup(1L, Iterator(ev(10 * hourUs)), st2).toList
    assert(out2.map(s => (s.session_seq, s.n_events)) == List((1L, 3L), (2L, 0L)))
  }
}
