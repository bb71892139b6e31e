package graft.lake

import java.sql.Timestamp

import graft.SparkSpec

/** X54 SCD2 history: run-collapse goldens, tie-breaking, interval chaining,
  * and the one-shuffle plan pin.
  */
class HistorySpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  private val cols = Seq("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus")

  test("golden: A A B A collapses to three chained intervals") {
    val df = Seq(
      (1L, 10L, ts(1), "A"),
      (1L, 11L, ts(2), "A"),
      (1L, 12L, ts(3), "B"),
      (1L, 13L, ts(4), "A"),
    ).toDF(cols: _*)
    val out = History.scd2(df, "o_custkey", Seq("o_orderdate", "o_orderkey"),
      "o_orderstatus", "o_orderdate").orderBy("version").collect()

    assert(out.length == 3)
    assert(out.map(_.getAs[String]("o_orderstatus")).toSeq == Seq("A", "B", "A"))
    assert(out.map(_.getAs[Long]("n_rows")).toSeq == Seq(2L, 1L, 1L))
    // Each interval closes at the next run's start; the last is open.
    assert(out(0).getAs[Timestamp]("valid_from") == ts(1))
    assert(out(0).getAs[Timestamp]("valid_to") == ts(3))
    assert(out(1).getAs[Timestamp]("valid_to") == ts(4))
    assert(out(2).getAs[Timestamp]("valid_to") == null)
    assert(out.map(_.getAs[Boolean]("is_current")).toSeq == Seq(false, false, true))
  }

  test("same-date ties break on the orderkey tiebreaker deterministically") {
    val df = Seq(
      (1L, 20L, ts(1), "A"),
      (1L, 21L, ts(1), "B"), // same date, higher key → second
    ).toDF(cols: _*)
    val out = History.scd2(df, "o_custkey", Seq("o_orderdate", "o_orderkey"),
      "o_orderstatus", "o_orderdate").orderBy("version").collect()
    assert(out.map(_.getAs[String]("o_orderstatus")).toSeq == Seq("A", "B"))
  }

  test("single-state key is one current interval; keys are independent") {
    val df = Seq(
      (1L, 30L, ts(1), "A"),
      (1L, 31L, ts(5), "A"),
      (2L, 32L, ts(2), "B"),
    ).toDF(cols: _*)
    val out = History.scd2(df, "o_custkey", Seq("o_orderdate", "o_orderkey"),
      "o_orderstatus", "o_orderdate").collect()
      .map(r => r.getAs[Long]("o_custkey") -> r).toMap
    assert(out.size == 2)
    assert(out(1L).getAs[Long]("n_rows") == 2L)
    assert(out(1L).getAs[Boolean]("is_current"))
    assert(out(2L).getAs[Boolean]("is_current"))
  }

  test("plan pin: windows and aggregate share ONE exchange on the key") {
    val df = graft.sources.Tables.orders(spark, sf)
    val plan = History.scd2(df, "o_custkey", Seq("o_orderdate", "o_orderkey"),
      "o_orderstatus", "o_orderdate").queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
