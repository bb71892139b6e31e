package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Scratch

/** X120 anti-entropy repair: row-identity restored for drops, mutations,
  * and phantoms; merge-on-read write shape; identical replicas commit
  * nothing.
  */
class RepairSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")

  test("drops, mutations, and phantoms all repair to row identity") {
    val dir = Scratch.dir("repair_all")
    val src = (0L until 200L).map(i => (i, i * 10)).toDF("k", "v")
    val corrupted = src
      .where($"k" % 17 =!= 3) // drops
      .withColumn("v", when($"k" % 23 === 5, $"v" + 1).otherwise($"v")) // mutations
      .unionByName((1000L until 1005L).map(i => (i, i)).toDF("k", "v")) // phantoms
    ManifestTable.commit(corrupted, dir, 20250901, 900)

    val Some((v2, bad)) = TableDiff.repair(src, dir, keys, 32, 20250901, 1000)
    assert(v2 == 2 && bad.nonEmpty)
    val (residual, _) = TableDiff.diffDivergent(
      src, ManifestTable.readLatest(spark, dir), keys, 32)
    assert(residual.count() == 0) // row-identical again
    // the corrupted version stays time-travelable for the post-mortem
    assert(ManifestTable.readVersion(spark, dir, 1)
      .where($"k" === 1000L).count() == 1)
  }

  test("repair is merge-on-read: old files untouched, write cost = divergence") {
    val dir = Scratch.dir("repair_mor")
    val src = (0L until 100L).map(i => (i, i)).toDF("k", "v")
    ManifestTable.commit(src.where($"k" =!= 50L), dir, 20250901, 900)

    TableDiff.repair(src, dir, keys, 32, 20250901, 1000)
    val snaps = ManifestTable.snapshots(spark, dir)
    // the parent's files all carry forward (no rewrite); only staged
    // repair data was added, plus a tombstone sidecar
    assert(snaps.head.files.toSet.subsetOf(snaps.last.files.toSet))
    assert(snaps.last.deletes.nonEmpty && snaps.last.op == "repair")
    assert(ManifestTable.readLatest(spark, dir).count() == 100)
  }

  test("an identical replica commits nothing") {
    val dir = Scratch.dir("repair_noop")
    val src = (0L until 50L).map(i => (i, i)).toDF("k", "v")
    ManifestTable.commit(src, dir, 20250901, 900)
    assert(TableDiff.repair(src, dir, keys, 32, 20250901, 1000).isEmpty)
    assert(ManifestTable.latestVersion(spark, dir).contains(1))
  }
}
