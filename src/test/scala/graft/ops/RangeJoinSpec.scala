package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X29: the binned point-in-interval join must equal the naive
  * between-join on every boundary case — bins are an execution detail,
  * never a semantics change.
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private val bw = 10L

  test("bin equi-join + refine equals the naive between-join, boundaries inclusive") {
    val points = Seq(0L, 9L, 10L, 15L, 19L, 20L, 25L, 99L, 100L, 101L)
      .toDF("p").withColumn("pid", monotonically_increasing_id())
    // spans within one bin, across bins, degenerate single-point, disjoint
    val intervals = Seq((1L, 0L, 9L), (2L, 5L, 25L), (3L, 20L, 20L),
      (4L, 50L, 60L), (5L, 99L, 101L)).toDF("iid", "lo", "hi")
    val binned = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", bw)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
    // sanity on the cases themselves: inclusive both ends, single-point hit
    assert(naive.exists(_._2 == 3L), "degenerate [20,20] must match point 20")
    assert(!naive.exists(_._2 == 4L), "disjoint interval must match nothing")
  }

  test("binning stays exact beyond 2^53 (epoch-nanos territory)") {
    // long/long division in Spark is Double; a mantissa-rounded bin would
    // silently drop this match — the decimal path must not
    val t = 4611686018427387904L + 1234567L // 2^62 + offset
    val points = Seq(t).toDF("p")
    val intervals = Seq((1L, t - 5L, t + 5L)).toDF("iid", "lo", "hi")
    val rows = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 1000L).count()
    assert(rows == 1, "point above 2^53 lost its interval — inexact binning")
  }

  test("no duplicate matches when an interval spans multiple bins") {
    val points = Seq(15L).toDF("p")
    val intervals = Seq((1L, 0L, 39L)).toDF("iid", "lo", "hi") // 4 bins
    val rows = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", bw).count()
    assert(rows == 1, "a point must match a spanning interval exactly once")
  }
}
