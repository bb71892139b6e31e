package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for the X80 exact grouped top-k aggregate. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // group g1: a×3, b×2, c×2, d×1 — tie between b and c broken by value
    ("g1", "a"), ("g1", "a"), ("g1", "a"),
    ("g1", "b"), ("g1", "b"), ("g1", "c"), ("g1", "c"), ("g1", "d"),
    // group g2: only one value
    ("g2", "x"),
    // group g3: all nulls — aggregate yields an empty array
    ("g3", null), ("g3", null))

  private def topk(k: Int) =
    rows.toDF("g", "v")
      .repartition(4) // force multiple partials → serialize + merge paths
      .groupBy("g")
      .agg(TopKAgg.topKByCount(col("v"), k).as("topk"))
      .select(col("g"), col("topk").cast("string").as("s"))
      .as[(String, String)].collect().toMap

  test("top-k with count-desc, value-asc tie-break; fewer than k is fine") {
    val m = topk(2)
    assert(m("g1") == "[{a, 3}, {b, 2}]")
    assert(m("g2") == "[{x, 1}]")
  }

  test("nulls don't count; all-null group yields empty array") {
    val m = topk(3)
    assert(m("g3") == "[]")
    assert(m("g1") == "[{a, 3}, {b, 2}, {c, 2}]")
  }

  test("partial aggregation is map-side: plan shows a partial ObjectHashAggregate") {
    val plan = rows.toDF("g", "v").repartition(4)
      .groupBy("g").agg(TopKAgg.topKByCount(col("v"), 2).as("topk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_topk_by_count"),
      s"expected a partial (map-side) aggregate phase in:\n$plan")
    assert(!plan.contains("Window"), "single-pass aggregate must not plan a window")
  }

  test("agrees with the two-shuffle count+window plan on skewed random data") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 5000).map { _ =>
      val g = s"g${rnd.nextInt(7)}"
      // Zipf-ish skew over a small categorical domain
      val v = s"v${math.min(rnd.nextInt(1 + rnd.nextInt(12)), 9)}"
      (g, v)
    }.toDF("g", "v")

    val got = df.groupBy("g").agg(TopKAgg.topKByCount(col("v"), 3).as("topk"))
      .select(col("g"), posexplode(col("topk")))
      .select(col("g"), col("col.item").as("v"), col("col.cnt").as("cnt"),
        (col("pos") + 1).as("rank"))
      .as[(String, String, Long, Int)].collect().toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("cnt").desc, col("v").asc)
    val exp = df.groupBy("g", "v").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .as[(String, String, Long, Int)].collect().toSet

    assert(got == exp)
  }
}
