package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** X48 pins beyond the roundtrip hash: the z-ordered layout really is
  * multi-dimensionally local — each file covers a small rectangle of the
  * 2-D value space, where a linear sort leaves the second dimension
  * unclustered — and the Morton expression itself is correct and
  * codegen'd.
  */
class ZOrderSpec extends SparkSpec {

  test("zorder: morton interleave of known bucket pairs") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (65535L, 0L))
    val out = spark.createDataFrame(rows).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z")).collect().map(_.getLong(0))
    // z = interleave(x even bits, y odd bits)
    assert(out.toSeq == Seq(0L, 1L, 2L, 3L, 0xEL, 0x55555555L))
  }

  test("zorder: expression stays inside whole-stage codegen") {
    val df = spark.range(8).select(
      ZOrder.zValue(col("id"), col("id") + 1).as("z"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }

  /** Files whose per-file [min, max] of `c` intersects the band — what a
    * min/max-stats reader would have to scan for `c BETWEEN lo AND hi`.
    * (Mean rectangle AREA is the wrong metric: with N files both a linear
    * sort and z-order give ~1/N — the z win is BALANCE, i.e. a band
    * filter on EITHER dimension prunes files.)
    */
  private def filesTouching(dir: String, c: String, lo: Double, hi: Double): Int = {
    ZOrder.fileLocality(spark, dir, "o_custkey", "o_totalprice").collect().count { r =>
      val (mn, mx) = c match {
        case "o_custkey" => (r.getAs[Number](1).doubleValue, r.getAs[Number](2).doubleValue)
        case _ => (r.getAs[Number](3).doubleValue, r.getAs[Number](4).doubleValue)
      }
      mx >= lo && mn <= hi
    }
  }

  test("zorder: a band filter on EITHER dimension prunes files; linear only on its sort key") {
    val base = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val zDir = graft.util.Scratch.dir("z_layout")
    ZOrder.writeZOrdered(base, zDir, "o_custkey", "o_totalprice", 16)

    val linDir = graft.util.Scratch.dir("lin_layout")
    base.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(linDir)

    // 10%-wide mid-range bands on each dimension
    val s = base.agg(min("o_custkey"), max("o_custkey"),
      min("o_totalprice"), max("o_totalprice")).first()
    def band(lo: Double, hi: Double) = (lo + 0.45 * (hi - lo), lo + 0.55 * (hi - lo))
    val (k1, k2) = band(s.getAs[Number](0).doubleValue, s.getAs[Number](1).doubleValue)
    val (p1, p2) = band(s.getAs[Number](2).doubleValue, s.getAs[Number](3).doubleValue)

    val zPrice = filesTouching(zDir, "o_totalprice", p1, p2)
    val linPrice = filesTouching(linDir, "o_totalprice", p1, p2)
    // linear: every file spans ~the full price range → no pruning at all;
    // z-order: only the files whose price quadrant overlaps the band
    assert(linPrice >= 14, s"linear layout unexpectedly pruned price: $linPrice/16")
    assert(zPrice * 2 <= linPrice,
      s"z-order should halve the price-band scan: z=$zPrice lin=$linPrice")

    // and the custkey dimension still prunes under z-order (the trade-off
    // is bounded: ≤ ~√N of the files, not all of them)
    val zKey = filesTouching(zDir, "o_custkey", k1, k2)
    assert(zKey <= 10, s"z-order lost custkey pruning entirely: $zKey/16")
  }
}
