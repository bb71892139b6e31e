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

  test("X197 zValueN: 2-col form bit-identical to the historical zValue; 3-col interleave exact") {
    import spark.implicits._
    // 2 columns: zValueN must be the SAME function (committed layouts
    // and every existing pin depend on it)
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (2L, 3L), (65535L, 0L))
    val both = rows.toDF("x", "y").select(
      ZOrder.zValue(col("x"), col("y")).as("a"),
      ZOrder.zValueN(Seq(col("x"), col("y"))).as("b")).collect()
    assert(both.forall(r => r.getLong(0) == r.getLong(1)))
    // 3 columns: column j rides bit positions 3i + j
    val tri = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (1L, 1L, 1L),
      (2L, 0L, 3L)).toDF("x", "y", "z")
      .select(ZOrder.zValueN(Seq(col("x"), col("y"), col("z"))).as("v"))
      .collect().map(_.getLong(0))
    assert(tri.toSeq == Seq(1L, 2L, 4L, 7L, 0x2CL))
  }

  test("X197 three-dim ZORDER: bands on every clustered dimension prune files") {
    import spark.implicits._
    import graft.util.Scratch
    val dir = Scratch.dir("zorder_nd_spec")
    val df = (0L until 8000L).map(i => (i, i % 97, (i * 31) % 89, i * 1.0))
      .toDF("a", "b", "c", "v").repartition(16)
    ManifestTable.commit(df, dir, 20250901, 900)
    ZOrder.optimizeN(spark, dir, Seq("a", "b", "c"), 16, 20250901, 1000)
    val stats = ZoneMap.fileStats(spark, dir, 2).get
    assert(stats.size == 16)
    // every clustered dimension must prune a narrow band to a strict
    // subset of files (the whole point of the multi-dim interleave)
    def pruned(cid: String, lo: Long, hi: Long): Int =
      stats.count(s => !(s.hi(cid) < lo || s.lo(cid) > hi))
    assert(pruned("a", 0, 500) < 16)
    assert(pruned("b", 0, 5) < 16)
    assert(pruned("c", 0, 5) < 16)
    // content preserved
    assert(ManifestTable.readLatest(spark, dir).count() == 8000)
  }

  test("X106 optimize: content-preserving commit that restores skipping") {
    val dir = graft.util.Scratch.dir("opt_commit")
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice").repartition(16)
    ManifestTable.commit(o, dir, 20250701, 900)
    DeleteVectors.deleteWhere(spark, dir, col("o_orderkey") % 9 === 4, 20250701, 1000)
    val v3 = ZOrder.optimize(spark, dir, "o_custkey", "o_orderkey", 16, 20250701, 1100)
    assert(v3 == 3)
    // content identical to the tombstoned parent, row for row
    val parent = ManifestTable.readVersion(spark, dir, 2)
    val opt = ManifestTable.readVersion(spark, dir, 3)
    assert(SnapshotDiff.diffNullSafe(opt, parent, parent.columns.toSeq).count() == 0)
    // the optimize commit carries no tombstones and 16 fresh files
    val snap = ManifestTable.snapshots(spark, dir).last
    assert(snap.op == "optimize" && snap.deletes.isEmpty && snap.files.size == 16)
    // zone maps on the new layout prune a mid-band on EITHER dimension;
    // the fragmented v1 had no stats, so its candidate set is all files
    val (loC, hiC) = {
      val r = parent.agg(min("o_custkey"), max("o_custkey")).first()
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)
    }
    val band = (loC + (hiC - loC) * 45 / 100, loC + (hiC - loC) * 55 / 100)
    val cand = ZoneMap.candidateFiles(spark, dir, 3, "o_custkey", band._1, band._2)
    assert(cand.size <= 12, s"custkey band hit ${cand.size}/16 files after optimize")
    val candK = ZoneMap.candidateFiles(spark, dir, 3, "o_orderkey", 1L, 50L)
    assert(candK.size <= 8, s"orderkey band hit ${candK.size}/16 files after optimize")
    assert(ZoneMap.candidateFiles(spark, dir, 1, "o_custkey", band._1, band._2)
      .size == ManifestTable.snapshots(spark, dir).head.files.size,
      "fragmented v1 has no stats — nothing may prune")
    // feed consumers skip the step from op metadata alone
    assert(ChangeFeed.changeFeed(spark, dir, 2, 3, Seq("o_orderkey")).count() == 0)
    // time travel to the fragmented original still works
    assert(ManifestTable.readVersion(spark, dir, 1).count() ==
      Tables.orders(spark, sf).count())
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

  test("X129 binPack: folds to budget, idempotent, under-budget no-op") {
    import spark.implicits._
    import graft.util.Scratch
    val dir = Scratch.dir("binpack_spec")
    ManifestTable.commit(
      (0L until 500L).map(i => (i, i)).toDF("k", "v").repartition(16),
      dir, 20250901, 900)
    DeleteVectors.deleteWhere(spark, dir, col("k") < 100, 20250901, 1000)

    val Some(v3) = ZOrder.binPack(spark, dir, Long.MaxValue / 4, 20250901, 1100)
    val snaps = ManifestTable.snapshots(spark, dir)
    assert(v3 == 3 && snaps.last.files.size == 1)
    assert(snaps.last.op == "optimize" && snaps.last.deletes.isEmpty)
    // content contract: identical to the tombstoned parent
    assert(ManifestTable.readLatest(spark, dir).count() == 400)
    assert(ManifestTable.readLatest(spark, dir).where(col("k") < 100).count() == 0)
    // time travel to the fragmented parent still works
    assert(ManifestTable.readVersion(spark, dir, 2).count() == 400)

    // idempotent: already at budget, nothing commits
    assert(ZOrder.binPack(spark, dir, Long.MaxValue / 4, 20250901, 1200).isEmpty)
    // onlyIfMoreThan gate: a 1-file table under the threshold no-ops
    assert(ZOrder.binPack(spark, dir, 1L, 20250901, 1300, onlyIfMoreThan = 8).isEmpty)
    assert(ManifestTable.latestVersion(spark, dir).contains(3))
  }
}
