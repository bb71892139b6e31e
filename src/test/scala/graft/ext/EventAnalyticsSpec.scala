package graft.ext

import graft.SparkSpec
import graft.sources.Tables

/** X255 user-growth curve: new-user mass sums to the true user count,
  * the cumulative curve is monotone and bounds daily actives.
  */
class EventAnalyticsSpec extends SparkSpec {

  test("X255 user growth: curve lands on the true user count, monotone, bounds actives") {
    val rows = EventAnalytics.queries("q_user_growth")(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Date]("day"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_active"), r.getAs[Long]("n_new"),
        r.getAs[Long]("cum_users"))).sortBy(_._1.getTime)
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf).select("user_id").collect()
      .map(_.getLong(0))
    // new-user mass equals the true distinct user count
    assert(rows.map(_._4).sum == ev.distinct.length)
    assert(rows.last._5 == ev.distinct.length)
    // event mass conserved
    assert(rows.map(_._2).sum == ev.length)
    // cumulative curve is the running sum and bounds daily actives
    rows.foldLeft(0L) { case (acc, (day, _, active, nNew, cum)) =>
      assert(cum == acc + nNew)
      assert(active <= cum, s"$day: $active active vs $cum acquired")
      cum
    }
  }
}
