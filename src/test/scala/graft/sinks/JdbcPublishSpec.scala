package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.Jdbc.JdbcConfig

/** X124 atomic JDBC publish: staged swap replaces wholesale, leftovers
  * from crashed publishes are cleared, live data survives a failed swap.
  */
class JdbcPublishSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = JdbcConfig(
    url = "jdbc:derby:memory:jpubspec;create=true",
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  test("publish replaces wholesale; repeated publishes keep exactly the last") {
    Jdbc.publishAtomic((0L until 10L).map(i => (i, i)).toDF("k", "v"), cfg, "pub_t")
    assert(Jdbc.read(spark, cfg, "pub_t").count() == 10)

    Jdbc.publishAtomic((100L until 103L).map(i => (i, i)).toDF("k", "v"), cfg, "pub_t")
    val rows = Jdbc.read(spark, cfg, "pub_t").select("k").collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == Seq(100L, 101L, 102L))
    // no stage/old leftovers serve reads
    intercept[Exception](Jdbc.read(spark, cfg, "pub_t__stage").collect())
    intercept[Exception](Jdbc.read(spark, cfg, "pub_t__old").collect())
  }

  test("a crashed publish's stage leftover neither blocks nor leaks into the next") {
    Jdbc.publishAtomic(Seq((1L, 1L)).toDF("k", "v"), cfg, "pub_c")
    // simulate: a previous attempt staged rows and died before the swap
    Seq((999L, 999L)).toDF("k", "v").write.format("jdbc")
      .options(Jdbc.options(cfg, "pub_c__stage")).mode("append").save()

    Jdbc.publishAtomic(Seq((2L, 2L), (3L, 3L)).toDF("k", "v"), cfg, "pub_c")
    val rows = Jdbc.read(spark, cfg, "pub_c").select("k").collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == Seq(2L, 3L)) // the dead stage's 999 never surfaces
  }
}
