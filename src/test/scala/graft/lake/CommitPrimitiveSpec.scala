package graft.lake

import java.util.concurrent.atomic.AtomicInteger
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** Counting wrapper proving the seam is pluggable: same semantics as the
  * default (delegates to [[RenameCommit]]), but records every call — a
  * conditional-PUT object-store implementation slots in the same way
  * (docs/STORAGE_CONTRACT.md). Top-level class with a no-arg constructor
  * because `CommitPrimitive.active` instantiates it by class name.
  */
class CountingCommit extends CommitPrimitive {
  override def putIfAbsent(spark: SparkSession, target: Path,
      payload: Array[Byte]): Boolean = {
    CountingCommit.puts.incrementAndGet()
    RenameCommit.putIfAbsent(spark, target, payload)
  }
  override def replace(spark: SparkSession, target: Path,
      payload: Array[Byte]): Unit = {
    CountingCommit.replaces.incrementAndGet()
    RenameCommit.replace(spark, target, payload)
  }
}
object CountingCommit {
  val puts = new AtomicInteger(0)
  val replaces = new AtomicInteger(0)
}

/** The storage commit seam (docs/STORAGE_CONTRACT.md): rename-backed
  * default semantics, and conf-selected pluggability with NO caller
  * changes — the property an object-store CommitPrimitive relies on.
  */
class CommitPrimitiveSpec extends SparkSpec {
  import spark.implicits._

  private def p(dir: String, name: String) = new Path(s"$dir/$name")
  private def readBytes(path: Path): String = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  test("putIfAbsent: first committer wins, loser gets false and the winner's bytes survive") {
    val dir = graft.util.Scratch.dir("cp_put")
    val t = p(dir, "v1.json")
    assert(RenameCommit.putIfAbsent(spark, t, "winner".getBytes("UTF-8")))
    assert(!RenameCommit.putIfAbsent(spark, t, "loser".getBytes("UTF-8")))
    assert(readBytes(t) == "winner")
    // the loser's temp staging must not linger (vacuum hygiene)
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new Path(dir)).map(_.getPath.getName).toSet == Set("v1.json"))
  }

  test("replace: swaps bytes in place; a pre-existing target is not an error") {
    val dir = graft.util.Scratch.dir("cp_rep")
    val t = p(dir, "ref.json")
    RenameCommit.replace(spark, t, "old".getBytes("UTF-8"))
    RenameCommit.replace(spark, t, "new".getBytes("UTF-8"))
    assert(readBytes(t) == "new")
  }

  test("conf-selected implementation: manifest, catalog, and ref commits all route through the seam") {
    val impl0 = spark.conf.getOption(CommitPrimitive.ImplConf)
    spark.conf.set(CommitPrimitive.ImplConf, classOf[CountingCommit].getName)
    try {
      val puts0 = CountingCommit.puts.get()
      val reps0 = CountingCommit.replaces.get()
      val dir = s"${graft.util.Scratch.dir("cp_conf")}/t"
      // manifest commit → putIfAbsent
      ManifestTable.commit(Seq((1L, "a")).toDF("k", "v"), dir, 20250816, 900)
      assert(CountingCommit.puts.get() > puts0)
      // ref advance → replace
      Branches.createBranch(spark, dir, "main", 1)
      assert(CountingCommit.replaces.get() > reps0)
      // catalog cut → putIfAbsent again
      val root = graft.util.Scratch.dir("cp_cat")
      val putsBeforeCat = CountingCommit.puts.get()
      Catalog.publishCatalog(spark, root, 20250816, 901, Map("t" -> 1))
      assert(CountingCommit.puts.get() > putsBeforeCat)
      // and the committed table reads back exactly (semantics preserved)
      assert(ManifestTable.readLatest(spark, dir).as[(Long, String)]
        .collect().toSeq == Seq((1L, "a")))
    } finally {
      impl0.fold(spark.conf.unset(CommitPrimitive.ImplConf))(
        spark.conf.set(CommitPrimitive.ImplConf, _))
    }
  }
}
