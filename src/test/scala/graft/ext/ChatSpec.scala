package graft.ext

import graft.SparkSpec
import graft.sources.Tables

/** X237 chat-template rendering: turn budget honored, every conversation
  * renders, and the rendered bytes match a local re-render (template,
  * role alternation, ordering) exactly.
  */
class ChatSpec extends SparkSpec {

  private lazy val out = Chat.queries("q_chat_render")(spark, sf).collect()
    .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_turns"),
      r.getAs[Long]("n_chars"), r.getAs[String]("render_md5")))

  test("X237: one example per conversation, turns = min(events, budget)") {
    val perUser = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count"))
      .toMap
    assert(out.length == perUser.size, "every conversation renders")
    out.foreach { case (u, n, _, _) =>
      assert(n == math.min(perUser(u), Chat.maxTurns.toLong),
        s"user $u turn count")
    }
  }

  test("X237: rendered bytes match a local re-render (template + role parity + order)") {
    val events = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
      .groupBy(_._1)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    out.take(5).foreach { case (u, _, nChars, hash) =>
      // microsecond-faithful order key (getTime alone drops sub-ms)
      val turns = events(u)
        .sortBy(e => (e._2.toInstant.getEpochSecond, e._2.getNanos, e._3))
        .take(Chat.maxTurns).zipWithIndex.map { case ((_, _, id, et), i) =>
          val role = if (i % 2 == 0) "user" else "assistant"
          s"<|$role|>$et#$id"
        }
      val rendered = "<|system|>graft\n" + turns.mkString("\n")
      assert(rendered.length.toLong == nChars, s"user $u char count")
      val local = md5.digest(rendered.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(local == hash, s"user $u rendered bytes diverge")
    }
  }
}
