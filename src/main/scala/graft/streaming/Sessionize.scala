package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

import graft.sources.Tables._

/** One event inside a session (streaming-side input record). */
case class SessEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp)

/** A closed session (both tiers' output record). */
case class Session(
    user_id: Long,
    session_seq: Long,
    n_events: Long,
    t_start: java.sql.Timestamp,
    t_end: java.sql.Timestamp)

/** Gap-based sessionization of the events stream (north-star E6 extension;
  * the reference emulates time-series behavior with an hourly cron, SURVEY
  * §1.1).
  *
  * Two tiers with identical semantics (equivalence is property-tested):
  *  - batch: lag() gap-break + running-sum session ids — two window passes
  *    over ONE user_id shuffle, fully codegen, oracle-checkable in SQL.
  *  - streaming: `flatMapGroupsWithState` holding per-user
  *    (session_seq, last_ts, t_start, n) state — the shape that handles an
  *    unbounded stream where a user's events span many micro-batches.
  *
  * Scale notes: both tiers shuffle once by user_id. The batch tier's state
  * is implicit in the sort; the streaming tier's state store is
  * RocksDB-backed per executor at scale and watermark-evicted.
  */
object Sessionize {

  /** Session gap: events of one user separated by more than this belong to
    * different sessions (12 h fits the fixture's ~7 h median inter-event
    * gap — sessions average several events, and breaks are common).
    */
  val gap = "12 hours"
  private val gapUs = 12L * 3600 * 1000000

  /** Full-precision epoch micros (Timestamp.getTime alone truncates to ms —
    * the batch tier compares full timestamps, so the streaming tier must
    * too, or boundary gaps diverge between tiers).
    */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  private def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000)
    t.setNanos((us % 1000000).toInt * 1000)
    t
  }

  /** Batch tier: deterministic session assignment via window functions. */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr(s"INTERVAL $gap"), 1).otherwise(0))
      .withColumn("session_seq",
        sum("brk").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("t_start"), max("ts").as("t_end"))
  }

  /** Streaming tier: per-user session state machine. Events arrive in batch
    * order within a group; state carries the open session across
    * micro-batches and emits a closed session per gap break.
    */
  def sessionizeGroup(
      userId: Long,
      events: Iterator[SessEvent],
      state: GroupState[(Long, Long, Long, Long)] // (seq, startMs, lastMs, n)
  ): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var (seq, start, last, n) =
      state.getOption.getOrElse((0L, Long.MinValue, Long.MinValue, 0L))
    val out = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = micros(e.ts)
      if (n == 0L || t - last > gapUs) {
        if (n > 0L) out += Session(userId, seq, n, toTs(start), toTs(last))
        seq += 1; start = t; n = 0L
      }
      last = t; n += 1
    }
    // Emit the still-open session as a SNAPSHOT at every batch boundary:
    // downstream reads the latest emission per (user_id, session_seq), so a
    // session extended by a later batch simply re-emits with higher counts.
    // (With an unbounded stream + watermark, closing would instead hang off
    // an event-time timeout; snapshot emission keeps AvailableNow runs over
    // finite fixtures complete without one.)
    if (n > 0L) out += Session(userId, seq, n, toTs(start), toTs(last))
    state.update((seq, start, last, n))
    out.result().iterator
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_sessionize" -> ((s, d) =>
      sessionizeBatch(events(s, d))
        .orderBy("user_id", "session_seq")),
  )

  val oracles: Map[String, String] = Map(
    "q_sessionize" ->
      """SELECT user_id, session_seq, count(*) AS n_events,
        |       CAST(min(ts) AS TIMESTAMP) AS t_start, CAST(max(ts) AS TIMESTAMP) AS t_end
        |FROM (
        |  SELECT user_id, ts,
        |         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM (
        |    SELECT user_id, event_id, ts,
        |           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |                  OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                       + INTERVAL 12 HOUR
        |                THEN 1 ELSE 0 END AS brk
        |    FROM events))
        |GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
  )
}
