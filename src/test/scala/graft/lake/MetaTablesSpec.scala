package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Scratch

/** X163 maintenance advisor: rule boundaries the oracle's two fixture
  * states can't probe — threshold edges, no-sidecar degradation, and the
  * sweep's violation arithmetic.
  */
class MetaTablesSpec extends SparkSpec {
  import spark.implicits._

  private def fired(dir: String, target: Long, morPct: Int = 10): Map[String, Boolean] =
    MetaTables.maintenancePlan(spark, dir, "k", target, morPct)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap

  private def mk(tag: String, parts: Int, byCol: String = "k"): String = {
    val dir = Scratch.dir(tag)
    val df = (0L until 800L).map(i => (i, (i * 37) % 800)).toDF("k", "j")
    ZoneMap.commitWithStats(df.repartitionByRange(parts, col(byCol)), dir,
      20250701, 900, statsCols = Seq("k"))
    dir
  }

  test("advisor: binpack fires exactly below half the target (boundary)") {
    val dir = mk("mt_bp", 8) // 100 rows/file
    assert(!fired(dir, target = 200)("binpack"), "avg == target/2 is NOT under")
    assert(fired(dir, target = 202)("binpack"), "avg < target/2 fires (integer halving)")
  }

  test("advisor: cluster counts sweep violations — key-ranged layout is silent, wrong-column layout fires") {
    assert(!fired(mk("mt_cl_good", 8), 10)("cluster"))
    // ranged on j: every file spans nearly the whole k domain
    assert(fired(mk("mt_cl_bad", 8, byCol = "j"), 10)("cluster"))
  }

  test("advisor: materialize fires at the debt threshold, inclusively") {
    val dir = mk("mt_mat", 4)
    // delete exactly 10% (80 of 800): >= threshold ⇒ fires
    DeleteVectors.deleteWhere(spark, dir, col("k") < 80L, 20250701, 930)
    assert(fired(dir, 10)("materialize"))
    assert(!fired(dir, 10, morPct = 11)("materialize"), "one point higher does not")
  }

  test("advisor: a table without sidecars never fires anything (unknown is not evidence)") {
    val dir = Scratch.dir("mt_nostats")
    ManifestTable.commit((0L until 100L).map(i => (i, i)).toDF("k", "j")
      .repartition(10), dir, 20250701, 900)
    val f = fired(dir, target = 1000000)
    assert(f === Map("binpack" -> false, "cluster" -> false, "materialize" -> false))
  }

  test("executor: one fold serves all fired rules; a second tick is a no-op; content preserved") {
    val dir = mk("mt_exec", 32, byCol = "j") // fragmented AND mis-clustered
    DeleteVectors.deleteWhere(spark, dir, col("k") < 100L, 20250701, 930) // 12.5% debt
    val before = ManifestTable.readLatest(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val t1 = MetaTables.maintain(spark, dir, "k", targetRows = 200, 20250701, 1000)
    assert(t1.map(_._1).toSet === Set("binpack", "cluster", "materialize"))
    assert(t1.map(_._2).distinct.size === 1, "one commit serves all rules")
    // content invisible across the fold
    val after = ManifestTable.readLatest(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before)
    // the committed op kind is 'optimize'; no tombstones survive
    assert(ManifestTable.snapshots(spark, dir).last.op === "optimize")
    assert(ManifestTable.snapshots(spark, dir).last.deletes.isEmpty)
    // idempotency: the advisor finds nothing on a maintained table
    assert(MetaTables.maintain(spark, dir, "k", 200, 20250701, 1100).isEmpty)
    assert(ManifestTable.latestVersion(spark, dir) === Some(3),
      "a no-op tick commits nothing")
    // and the maintained table is clustered: a key probe prunes files
    val cand = ZoneMap.candidateFiles(spark, dir, 3, "k", 150, 160)
    assert(cand.size < ManifestTable.snapshots(spark, dir).last.files.size)
  }

  test("executor: materialize-only state folds tombstones and re-advises clean") {
    val dir = mk("mt_exec_mat", 4) // well-clustered, well-packed on k
    DeleteVectors.deleteWhere(spark, dir, col("k") < 100L, 20250701, 930)
    val t1 = MetaTables.maintain(spark, dir, "k", targetRows = 200, 20250701, 1000)
    assert(t1.map(_._1) === Seq("materialize"))
    assert(ManifestTable.readLatest(spark, dir).count() === 700L)
    assert(MetaTables.maintain(spark, dir, "k", 200, 20250701, 1100).isEmpty)
  }
}
