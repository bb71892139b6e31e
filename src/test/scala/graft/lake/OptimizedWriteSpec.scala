package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Scratch

/** X188 — optimized writes: the AQE REBALANCE pass before the commit.
  * Pins: content identical to a naive commit, a fragmented batch lands
  * in far fewer right-sized files, append mode composes, the advisory
  * conf is restored after the write, and the writer option surface
  * (`optimizeWrite` / `targetFileBytes`) routes through the same path.
  */
class OptimizedWriteSpec extends SparkSpec {

  import spark.implicits._

  private def frag = (0 until 20000).map(i => (i.toLong, s"row_$i"))
    .toDF("k", "s").repartition(64)

  test("optimized commit: same content, far fewer files than the naive write") {
    val root = Scratch.dir("optw")
    ManifestTable.commit(frag, s"$root/naive", 20250901, 900)
    OptimizedWrite.commit(frag, s"$root/opt", 20250901, 900,
      targetBytes = 1L * 1024 * 1024)
    val naive = ManifestTable.snapshots(spark, s"$root/naive").last.files.size
    val opt = ManifestTable.snapshots(spark, s"$root/opt").last.files.size
    assert(naive == 64)
    assert(opt < naive / 4, s"expected rebalance to collapse 64 -> few, got $opt")
    // content: bit-identical row set
    val a = ManifestTable.readLatest(spark, s"$root/naive")
      .orderBy("k").collect().toSeq
    val b = ManifestTable.readLatest(spark, s"$root/opt")
      .orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("append composes; the advisory conf is restored afterwards") {
    val dir = Scratch.dir("optw_app")
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val before = spark.conf.getOption(key)
    OptimizedWrite.commit(frag.where($"k" < 10000), dir, 20250901, 900)
    OptimizedWrite.append(frag.where($"k" >= 10000), dir, 20250901, 910)
    assert(spark.conf.getOption(key) == before, "advisory conf leaked")
    assert(ManifestTable.readLatest(spark, dir).count() == 20000)
    assert(ManifestTable.snapshots(spark, dir).map(_.version) == Seq(1, 2))
  }

  test("writer option surface: optimizeWrite + targetFileBytes route the batch write") {
    val dir = Scratch.dir("optw_fmt")
    frag.write.format("graft")
      .option("optimizeWrite", "true")
      .option("targetFileBytes", (1L * 1024 * 1024).toString)
      .mode(org.apache.spark.sql.SaveMode.Overwrite).save(dir)
    val files = ManifestTable.snapshots(spark, dir).last.files.size
    assert(files < 16, s"optimizeWrite option ignored: $files files")
    assert(spark.read.format("graft").load(dir).count() == 20000)
  }

  test("constraints still validate the rebalanced staged bytes") {
    val dir = Scratch.dir("optw_con")
    OptimizedWrite.commit(frag, dir, 20250901, 900)
    Constraints.add(spark, dir, "k_nonneg", "k >= 0", 20250901, 910)
    val bad = Seq((-1L, "bad")).toDF("k", "s")
    val e = intercept[Exception](
      OptimizedWrite.append(bad, dir, 20250901, 920))
    assert(e.getMessage.contains("CHECK constraint violation"))
    assert(ManifestTable.snapshots(spark, dir).last.version == 2)
  }
}
