package graft.ops

import graft.SparkSpec

/** X161 skyline: hand-computed strict-dominance goldens (ties on either
  * axis survive), brute-force agreement on the fixture, bucket-boundary
  * robustness, and the no-SinglePartition plan pin.
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def sky(pts: Seq[(Int, Double)], parts: Int = 4): Set[(Int, Double)] =
    Skyline.skyline2D(pts.toDF("x", "y"), "x", "y", parts)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSet

  test("skyline: strict dominance golden") {
    // (2,2) and (1,1) are strictly beaten by (3,3); the staircase survives
    assert(sky(Seq((1, 5.0), (2, 4.0), (3, 3.0), (2, 2.0), (1, 1.0)))
      === Set((1, 5.0), (2, 4.0), (3, 3.0)))
  }

  test("skyline: ties on either axis survive (strict two-sided dominance)") {
    // equal x: (5,1) is not dominated by (5,9) — x not strictly greater
    assert(sky(Seq((5, 1.0), (5, 9.0))) === Set((5, 1.0), (5, 9.0)))
    // equal y: (1,7) is not dominated by (4,7) — y not strictly greater;
    // (2,3) is beaten by (4,7) in both
    assert(sky(Seq((1, 7.0), (4, 7.0), (2, 3.0))) === Set((1, 7.0), (4, 7.0)))
    // exact duplicates both survive (neither strictly beats the other)
    val dup = Seq((2, 2.0), (2, 2.0), (1, 1.0))
    val rows = Skyline.skyline2D(dup.toDF("x", "y"), "x", "y", 2).collect()
    assert(rows.count(r => r.getInt(0) == 2) === 2 && rows.length === 2)
  }

  test("skyline: agreement with the quadratic NOT-EXISTS on the fixture, any bucket count") {
    val part = graft.sources.Tables.part(spark, sf)
    part.createOrReplaceTempView("part_sky")
    val brute = spark.sql(
      """SELECT p_partkey FROM part_sky a WHERE NOT EXISTS (
        |  SELECT 1 FROM part_sky b
        |  WHERE b.p_size > a.p_size AND b.p_retailprice > a.p_retailprice)"""
        .stripMargin).collect().map(_.getLong(0)).toSet
    for (parts <- Seq(1, 3, 32)) {
      val got = Skyline.skyline2D(part, "p_size", "p_retailprice", parts)
        .select("p_partkey").collect().map(_.getLong(0)).toSet
      assert(got === brute, s"parts=$parts must not change the answer")
    }
  }

  test("skyline: bucket-parallel plan — no SinglePartition window") {
    val df = Skyline.skyline2D((1 to 500).map(i => (i, (i * 7 % 101).toDouble))
      .toDF("x", "y"), "x", "y", 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), "the X77/X92 trap must stay absent")
  }

  test("skyline: degenerate single-value x keeps every y (nothing strictly greater)") {
    assert(sky(Seq((7, 1.0), (7, 5.0), (7, 3.0))) === Set((7, 1.0), (7, 5.0), (7, 3.0)))
  }
}
