package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Scratch

/** X118 RESTORE: metadata-only rollback-by-rolling-forward, DV fidelity,
  * vacuum keeping the revived files alive, and refusals.
  */
class RestoreSpec extends SparkSpec {
  import spark.implicits._

  test("restore revives the target's exact content without touching data") {
    val dir = Scratch.dir("restore_basic")
    ManifestTable.commit((0L until 20L).map(i => (i, i)).toDF("k", "v"), dir, 20250901, 900)
    ManifestTable.commit((0L until 5L).map(i => (i, -i)).toDF("k", "v"), dir, 20250901, 1000)

    val v3 = Restore.restore(spark, dir, 1, 20250901, 1100)
    assert(v3 == 3)
    val snaps = ManifestTable.snapshots(spark, dir)
    // pure metadata: the restored manifest points at v1's exact files
    assert(snaps.last.files == snaps.head.files && snaps.last.op == "restore")
    assert(ManifestTable.readLatest(spark, dir).count() == 20)
    // nothing lost: the bad middle version stays time-travelable
    assert(ManifestTable.readVersion(spark, dir, 2).count() == 5)
  }

  test("restoring a tombstone-carrying version carries its deletion vectors") {
    val dir = Scratch.dir("restore_dv")
    ManifestTable.commit((0L until 10L).map(i => (i, i)).toDF("k", "v"), dir, 20250901, 900)
    DeleteVectors.deleteWhere(spark, dir, col("k") < 4, 20250901, 1000) // v2: 6 rows
    ManifestTable.commit(Seq((99L, 99L)).toDF("k", "v"), dir, 20250901, 1100) // v3

    Restore.restore(spark, dir, 2, 20250901, 1200)
    val restored = ManifestTable.readLatest(spark, dir)
    assert(restored.count() == 6)
    assert(restored.where(col("k") < 4).count() == 0)
  }

  test("vacuum after restore keeps the revived files alive") {
    val dir = Scratch.dir("restore_vac")
    ManifestTable.commit((0L until 20L).map(i => (i, i)).toDF("k", "v"), dir, 20250901, 900)
    ManifestTable.commit((0L until 5L).map(i => (i, -i)).toDF("k", "v"), dir, 20250901, 1000)
    Restore.restore(spark, dir, 1, 20250901, 1100)

    // keepLast=2 retains v2+v3; v3 references v1's FILES, which must
    // survive even though v1 the VERSION is expired
    Vacuum.vacuum(spark, dir, keepLast = 2, stagedOrphanAgeMs = 0)
    assert(ManifestTable.readLatest(spark, dir).count() == 20)
    assert(ManifestTable.snapshots(spark, dir).map(_.version) == Seq(2, 3))
  }

  test("unknown target refuses; restoring the current head is a no-op") {
    val dir = Scratch.dir("restore_refuse")
    ManifestTable.commit(Seq((1L, 1L)).toDF("k", "v"), dir, 20250901, 900)
    intercept[NoSuchElementException](Restore.restore(spark, dir, 9, 20250901, 1000))
    assert(Restore.restore(spark, dir, 1, 20250901, 1000) == 1)
    assert(ManifestTable.latestVersion(spark, dir).contains(1))
  }
}
