package graft.streaming

import graft.SparkSpec
import graft.sinks.Jdbc
import graft.sinks.Jdbc.JdbcConfig

/** X58 exactly-once JDBC sink: replay skip, partial-write sweep, epoch
  * marker as the commit point.
  */
class StreamJdbcSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(db: String) = JdbcConfig(
    url = s"jdbc:derby:memory:$db;create=true",
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  private def rows(v: Int*) = v.toSeq.zipWithIndex
    .map { case (x, i) => (s"k$i", x.toLong) }.toDF("key", "n")

  test("replay of a committed batch is a no-op even with different payload") {
    val c = cfg("sj_replay")
    StreamJdbc.writeBatch(rows(10, 20), c, "t", 0L)
    // A buggy/readjusted replay must NOT land: epoch 0 already committed.
    StreamJdbc.writeBatch(rows(99), c, "t", 0L)
    val back = Jdbc.read(spark, c, "t").select("key", "n")
      .as[(String, Long)].collect().sortBy(_._1)
    assert(back.toSeq == Seq("k0" -> 10L, "k1" -> 20L))
  }

  test("partial write without its epoch marker is swept, not double-counted") {
    val c = cfg("sj_partial")
    // Simulated crash mid-append: stamped rows exist, no epoch marker.
    Jdbc.append(rows(10).withColumn("batch_id",
      org.apache.spark.sql.functions.lit(3L)), c, "t")
    assert(StreamJdbc.committedEpochs(c, "t_epochs").isEmpty)
    // The replay rewrites batch 3 from scratch.
    StreamJdbc.writeBatch(rows(10, 20), c, "t", 3L)
    val back = Jdbc.read(spark, c, "t").select("key", "n")
      .as[(String, Long)].collect().sortBy(_._1)
    assert(back.toSeq == Seq("k0" -> 10L, "k1" -> 20L))
    assert(StreamJdbc.committedEpochs(c, "t_epochs") == Set(3L))
  }

  test("distinct batch ids accumulate independently") {
    val c = cfg("sj_accum")
    StreamJdbc.writeBatch(rows(1), c, "t", 0L)
    StreamJdbc.writeBatch(rows(2), c, "t", 1L)
    val back = Jdbc.read(spark, c, "t").select("n")
      .as[Long].collect().sorted
    assert(back.toSeq == Seq(1L, 2L))
    assert(StreamJdbc.committedEpochs(c, "t_epochs") == Set(0L, 1L))
  }
}
