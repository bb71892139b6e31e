package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X89 stream-stream left-outer join: full batch equivalence including
  * null-extended rows, and the null set is exactly the unmatched a-side.
  */
class StreamOuterJoinSpec extends SparkSpec {
  import spark.implicits._

  private type Row3 = (Long, Long, Option[Long])

  private lazy val streamed: Set[Row3] =
    StreamOuterJoin.queries("q_stream_outer_join")(spark, sf)
      .select("user_id", "a_id", "b_id").as[Row3].collect().toSet

  private lazy val batch: Set[Row3] = {
    val ev = StreamOuterJoin.eventsSlice(spark, sf)
    val a = ev.where(col("event_id") % 2 === 0).alias("a")
    val b = ev.where(col("event_id") % 2 === 1).alias("b")
    a.join(b, expr(StreamJoin.joinCondSql), "left_outer")
      .select(col("a.user_id").as("user_id"),
        col("a.event_id").as("a_id"), col("b.event_id").as("b_id"))
      .as[Row3].collect().toSet
  }

  test("stream output equals the batch left join, null-extended rows included") {
    assert(streamed == batch)
    assert(streamed.exists(_._3.isDefined), "expected at least one match")
    assert(streamed.exists(_._3.isEmpty), "expected at least one outer row")
  }

  test("null-extended rows are exactly the a-rows with no in-window match") {
    val matchedA = batch.collect { case (_, aId, Some(_)) => aId }
    val outerA = streamed.collect { case (_, aId, None) => aId }
    assert(outerA.intersect(matchedA).isEmpty,
      "an a-row emitted both matched and null-extended")
    // every a-side event appears exactly once as matched or outer
    val allA = StreamOuterJoin.eventsSlice(spark, sf)
      .where(col("event_id") % 2 === 0)
      .select("event_id").as[Long].collect().toSet
    assert(matchedA ++ outerA == allA, "an a-row vanished from the output")
  }

  test("no sentinel rows leak into the output") {
    assert(streamed.forall(_._1 >= 0))
  }

  test("full-outer stream join equals the batch full join, both null sides included") {
    val got = StreamOuterJoin.queries("q_stream_full_join")(spark, sf)
      .select("user_id", "a_id", "b_id")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    val ev = StreamOuterJoin.eventsSlice(spark, sf)
    val a = ev.where(col("event_id") % 2 === 0).alias("a")
    val b = ev.where(col("event_id") % 2 === 1).alias("b")
    val exp = a.join(b, expr(StreamJoin.joinCondSql), "full_outer")
      .select(coalesce(col("a.user_id"), col("b.user_id")).as("user_id"),
        col("a.event_id").as("a_id"), col("b.event_id").as("b_id"))
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(got == exp)
    assert(got.exists(r => r._2.isEmpty), "expected unmatched b rows")
    assert(got.exists(r => r._3.isEmpty), "expected unmatched a rows")
    assert(got.exists(r => r._2.isDefined && r._3.isDefined), "expected matches")
  }
}
