package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.HiddenPartition._

/** X100: hidden partitioning — raw-column predicates must both return
  * exactly the unpartitioned rows AND prune partition directories via
  * the derived transform predicate.
  */
class HiddenPartitionSpec extends SparkSpec {

  import spark.implicits._

  private lazy val frame = (0L until 400L).map { i =>
    (i, java.sql.Timestamp.valueOf(f"2024-03-${1 + (i % 20)}%02d 10:00:00"),
      i % 37, f"u${i % 37}%03d")
  }.toDF("id", "ts", "key", "tag")

  /** Leaf files Spark actually planned to read — partition pruning is
    * driver-side, so pruned directories never reach the file list.
    */
  private def filesPlanned(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collectLeaves().flatMap {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray.map(_.filePath.toPath.toString).toSeq
      case _ => Nil
    }.toSeq

  test("each transform derives the right partition predicate and loses no rows") {
    val root = graft.util.Scratch.dir("hp_each")
    write(frame, s"$root/d", Seq(Transform("ts", "day")))
    write(frame, s"$root/b", Seq(Transform("key", "bucket", 8)))
    write(frame, s"$root/t", Seq(Transform("id", "truncate", 100)))

    // day range: 3 of 20 day-directories survive
    val dayScan = scan(spark, s"$root/d", Seq(Between("ts",
      java.sql.Timestamp.valueOf("2024-03-05 00:00:00"),
      java.sql.Timestamp.valueOf("2024-03-07 23:59:59"))))
    assert(dayScan.count() == 60)
    val dayDirs = filesPlanned(dayScan).map(_.split("/p_ts_day=")(1).take(10)).distinct
    assert(dayDirs.sorted == Seq("2024-03-05", "2024-03-06", "2024-03-07"),
      s"day pruning read $dayDirs")

    // bucket point lookup: exactly 1 of 8 bucket dirs
    val bScan = scan(spark, s"$root/b", Seq(Eq("key", 5L)))
    assert(bScan.count() == frame.where(col("key") === 5).count())
    val bDirs = filesPlanned(bScan).map(_.split("/p_key_b8=")(1).split("/")(0)).distinct
    assert(bDirs.length == 1, s"bucket lookup read $bDirs")

    // truncate band: ids 150..249 live in width-100 dirs {100, 200}
    val tScan = scan(spark, s"$root/t", Seq(Between("id", 150L, 249L)))
    assert(tScan.count() == 100)
    val tDirs = filesPlanned(tScan).map(_.split("/p_id_t100=")(1).split("/")(0)).distinct
    assert(tDirs.sorted == Seq("100", "200"), s"truncate band read $tDirs")
  }

  test("stacked transforms prune on every dimension at once; schema stays raw") {
    val root = graft.util.Scratch.dir("hp_stack")
    write(frame, root, Seq(Transform("ts", "day"), Transform("key", "bucket", 4)))
    val s2 = scan(spark, root, Seq(
      Between("ts", java.sql.Timestamp.valueOf("2024-03-05 00:00:00"),
        java.sql.Timestamp.valueOf("2024-03-06 23:59:59")),
      Eq("key", 3L)))
    val expect = frame.where(col("key") === 3 &&
      col("ts").between("2024-03-05 00:00:00", "2024-03-06 23:59:59"))
    assert(s2.select("id").as[Long].collect().toSet ==
      expect.select("id").as[Long].collect().toSet)
    assert(s2.columns.toSeq == Seq("id", "ts", "key", "tag"),
      "partition columns must stay hidden")
    val dirs = filesPlanned(s2)
    assert(dirs.forall(_.contains("p_key_b4=")), "bucket dim not in path")
    assert(dirs.map(_.split("/p_ts_day=")(1).take(10)).distinct.length == 2,
      s"day dim not pruned: $dirs")
    assert(dirs.map(_.split("/p_key_b4=")(1).split("/")(0)).distinct.length == 1,
      s"bucket dim not pruned: $dirs")
  }

  test("a range over a hash bucket derives nothing but still answers correctly") {
    val root = graft.util.Scratch.dir("hp_fallback")
    write(frame, root, Seq(Transform("key", "bucket", 8)))
    val got = scan(spark, root, Seq(Between("key", 10L, 12L)))
    assert(got.count() == frame.where(col("key").between(10, 12)).count())
    // all 8 bucket dirs are (correctly) still in the plan — hashing has
    // no monotone mapping, so pruning here would be a soundness bug
    val dirs = filesPlanned(got).map(_.split("/p_key_b8=")(1).split("/")(0)).distinct
    assert(dirs.length == 8, s"unsound bucket pruning: $dirs")
  }

  test("X103 evolution: generations prune independently, results union raw") {
    val root = graft.util.Scratch.dir("hp_evo")
    // g0: first half, day-partitioned; g1: second half after the spec
    // evolved to day+bucket; a same-spec write appends into g1
    writeEvolved(frame.where(col("id") < 200), root, Seq(Transform("ts", "day")))
    writeEvolved(frame.where(col("id") >= 200 && col("id") < 300), root,
      Seq(Transform("ts", "day"), Transform("key", "bucket", 4)))
    writeEvolved(frame.where(col("id") >= 300), root,
      Seq(Transform("ts", "day"), Transform("key", "bucket", 4)))
    assert(generationsOf(spark, root).size == 2,
      "matching spec must append into the existing generation, not fork one")

    // full scan loses nothing and stays raw-schema
    val all = scanEvolved(spark, root, Nil)
    assert(all.count() == 400)
    assert(all.columns.toSeq == Seq("id", "ts", "key", "tag"))

    // a day-range probe prunes BOTH generations' day dimension
    val dayScan = scanEvolved(spark, root, Seq(Between("ts",
      java.sql.Timestamp.valueOf("2024-03-05 00:00:00"),
      java.sql.Timestamp.valueOf("2024-03-06 23:59:59"))))
    assert(dayScan.count() == 40)
    val dayDirs = filesPlanned(dayScan)
    assert(dayDirs.nonEmpty &&
      dayDirs.map(_.split("/p_ts_day=")(1).take(10)).distinct.sorted ==
        Seq("2024-03-05", "2024-03-06"), s"evolved day pruning read $dayDirs")

    // a key point probe: g1 prunes its bucket dim; g0 (no key transform)
    // is row-filtered but never wrongly pruned
    val keyScan = scanEvolved(spark, root, Seq(Eq("key", 7L)))
    assert(keyScan.select("id").as[Long].collect().toSet ==
      frame.where(col("key") === 7).select("id").as[Long].collect().toSet)
    val g1Dirs = filesPlanned(keyScan).filter(_.contains("/g1/"))
    assert(g1Dirs.nonEmpty &&
      g1Dirs.map(_.split("/p_key_b4=")(1).split("/")(0)).distinct.length == 1,
      s"g1 bucket not pruned: $g1Dirs")
  }

  test("the spec JSON round-trips and an unknown dir fails loudly") {
    val root = graft.util.Scratch.dir("hp_spec")
    val ts = Seq(Transform("ts", "day"), Transform("key", "bucket", 16),
      Transform("id", "truncate", 1000))
    write(frame, root, ts)
    assert(transformsOf(spark, root) == ts)
    intercept[Exception](transformsOf(spark, root + "_nope"))
  }
}
