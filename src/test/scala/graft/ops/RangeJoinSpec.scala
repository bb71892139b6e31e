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

  test("X70 overlap goldens: touching endpoints match, nested match once, disjoint never") {
    val a = Seq((1L, 0L, 10L), (2L, 100L, 200L), (3L, 50L, 60L))
      .toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 10L, 20L), // touches a1's right endpoint (inclusive)
      (20L, 120L, 130L), // nested inside a2, spans many shared bins
      (30L, 61L, 70L) // 1 past a3 — disjoint
    ).toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 7L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 10L), (2L, 20L)))
  }

  test("X70: owner-bin keeps each pair exactly once, for every bin width") {
    // heavily-overlapping intervals sharing MANY bins — any double count
    // would differ between bin widths; the brute-force count is the spec
    val rnd = new scala.util.Random(5)
    val iv = (1 to 40).map { i =>
      val lo = rnd.nextInt(300).toLong; (i.toLong, lo, lo + 1 + rnd.nextInt(120))
    }
    val a = iv.filter(_._1 % 2 == 0).toDF("a_id", "a_lo", "a_hi")
    val b = iv.filter(_._1 % 2 == 1).toDF("b_id", "b_lo", "b_hi")
    val expect = (for {
      (ai, alo, ahi) <- iv if ai % 2 == 0
      (bi, blo, bhi) <- iv if bi % 2 == 1
      if alo <= bhi && blo <= ahi
    } yield (ai, bi)).toSet
    Seq(1L, 13L, 1000L).foreach { w =>
      val got = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", w)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at binWidth=$w")
      assert(got.toSet == expect, s"wrong pair set at binWidth=$w")
    }
  }

  test("X70: overlap join plans as a hash join, not a product") {
    val a = Seq((1L, 0L, 10L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((2L, 5L, 15L)).toDF("b_id", "b_lo", "b_hi")
    val plan = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"overlap join fell back to a product:\n$plan")
  }
}
