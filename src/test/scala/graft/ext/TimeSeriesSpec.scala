package graft.ext

import java.sql.{Date, Timestamp}

import graft.SparkSpec

/** X55 gap-fill: dense-grid goldens, LOCF semantics, per-user span bounds. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ev(user: Long, day: Int, value: Double) =
    (user, Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), value)

  private def d(day: Int) = Date.valueOf(f"2024-01-$day%02d")

  test("golden: gaps are materialized and LOCF-filled from the last observation") {
    val events = Seq(ev(1L, 1, 5.0), ev(1L, 1, 2.5), ev(1L, 4, 7.0))
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFillDaily(events).orderBy("day").collect()

    assert(out.map(_.getAs[Date]("day")).toSeq == Seq(d(1), d(2), d(3), d(4)))
    assert(out.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 0L, 0L, 1L))
    assert(out.map(_.getAs[Boolean]("is_gap")).toSeq == Seq(false, true, true, false))
    // Day 1 sums exactly; days 2-3 carry it forward; day 4 observes anew.
    assert(out.map(_.getAs[Double]("filled_value")).toSeq == Seq(7.5, 7.5, 7.5, 7.0))
  }

  test("grid spans each user's own range, not the global calendar") {
    val events = Seq(ev(1L, 1, 1.0), ev(1L, 3, 1.0), ev(2L, 10, 2.0))
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFillDaily(events)
      .groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L)) // user 2 gets no Jan 1-9 padding
  }

  test("single-day user: no gaps, value is its own fill") {
    val out = TimeSeries.gapFillDaily(
      Seq(ev(3L, 7, 4.25)).toDF("user_id", "ts", "value")).collect()
    assert(out.length == 1)
    assert(!out.head.getAs[Boolean]("is_gap"))
    assert(out.head.getAs[Double]("filled_value") == 4.25)
  }

  // --- X162 linear interpolation ---

  private def interp(evs: Seq[(Long, Timestamp, Double)]): Seq[(Int, Boolean, Long)] =
    TimeSeries.interpolateDaily(evs.toDF("user_id", "ts", "value"))
      .orderBy("day").collect()
      .map(r => (r.getDate(r.fieldIndex("day")).toLocalDate.getDayOfMonth,
        r.getBoolean(r.fieldIndex("is_gap")), r.getLong(r.fieldIndex("interp_e6"))))
      .toSeq

  test("interpolate: exact thirds on a rising gap (X162)") {
    // 1.00 at day 1, 4.00 at day 4 → gaps at 2.00-ish thirds in 1e-6-cent units
    val out = interp(Seq(ev(1L, 1, 1.0), ev(1L, 4, 4.0)))
    assert(out === Seq(
      (1, false, 100000000L),
      (2, true, 200000000L), // 100 + floor(300·1/3) cents·1e6
      (3, true, 300000000L),
      (4, false, 400000000L)))
  }

  test("interpolate: FLOOR semantics on negative slopes (trunc would differ)") {
    // 1.00 at day 1 → 0.00 at day 4: gap day 2 = 1e8 + floor(-1e8/3)
    //  = 1e8 − 33333334 = 66666666; a trunc-division bug gives …667
    val out = interp(Seq(ev(1L, 1, 1.0), ev(1L, 4, 0.0)))
    assert(out(1) === ((2, true, 66666666L)))
    assert(out(2) === ((3, true, 33333333L)))
  }

  test("interpolate: observed days pass through untouched; no edge gaps exist") {
    val out = interp(Seq(ev(1L, 2, 5.5), ev(1L, 3, 9.0)))
    assert(out === Seq((2, false, 550000000L), (3, false, 900000000L)))
  }
}
