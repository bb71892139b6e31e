package graft.spark

import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Scratch
import graft.lake.ManifestTable

/** X179: SQL row-level DML (DELETE/UPDATE/MERGE) on graft tables through
  * a GENUINELY extensions-built session (GraftShim.sessionWithExtensions
  * — `withExtensions(...).getOrCreate()` on a live JVM silently ignores
  * the extensions, the round-7 ADVICE false-test trap).
  */
class GraftDmlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ext = GraftShim.sessionWithExtensions(spark,
    new graft.functions.GraftExtensions()(_))

  private def view(name: String, dir: String, opts: String = ""): Unit =
    ext.sql(s"""CREATE OR REPLACE TEMPORARY VIEW $name
               |USING graft OPTIONS (path '$dir', runDate '20250701',
               |runTime '1200'$opts)""".stripMargin)

  test("DELETE FROM lands as a deletion-vector commit: zero files rewritten") {
    val dir = Scratch.dir("dml_delete")
    (1L to 20L).map(i => (i, s"r$i")).toDF("k", "tag")
      .repartition(2).write.mode("overwrite").format("graft")
      .option("path", dir).option("runDate", "20250701").option("runTime", "900")
      .save()
    val before = ManifestTable.snapshots(spark, dir).last
    view("dml_del_v", dir)
    ext.sql("DELETE FROM dml_del_v WHERE k % 2 = 0")
    val after = ManifestTable.snapshots(spark, dir).last
    assert(after.version === before.version + 1)
    // merge-on-read: same data files, tombstones in the sidecar
    assert(after.files === before.files)
    assert(after.deletes.nonEmpty)
    val rows = ManifestTable.readLatest(spark, dir)
    assert(rows.count() === 10)
    assert(rows.agg(sum("k")).head().getLong(0) === (1L to 20L by 2).sum)
  }

  test("UPDATE rewrites only touched files; others byte-identical by path") {
    val dir = Scratch.dir("dml_update")
    val df = (1L to 100L).map(i => (i, i * 10L)).toDF("k", "v")
    graft.lake.ZoneMap.commitWithStats(
      df.repartitionByRange(4, col("k")), dir, 20250701, 900,
      statsCols = Seq("k"))
    val before = ManifestTable.snapshots(spark, dir).last
    view("dml_upd_v", dir)
    ext.sql("UPDATE dml_upd_v SET v = v + 1 WHERE k <= 10")
    val after = ManifestTable.snapshots(spark, dir).last
    // zone-mapped range layout: of 4 files only the low-k one matches —
    // the other three carry by reference, paths verbatim
    val kept = before.files.toSet.intersect(after.files.toSet)
    assert(kept.size === 3, s"expected 3 retained files, got ${kept.size}")
    val rows = ManifestTable.readLatest(spark, dir).orderBy("k").collect()
    assert(rows.length === 100)
    rows.foreach { r =>
      val (k, v) = (r.getLong(0), r.getLong(1))
      assert(v === (if (k <= 10) k * 10 + 1 else k * 10))
    }
    // the rewritten file's sidecar entry is fresh; retained entries carry
    val stats = graft.lake.ZoneMap.fileStats(spark, dir, after.version).get
    assert(stats.map(_.file).toSet === after.files.toSet)
  }

  test("UPDATE matching nothing commits nothing") {
    val dir = Scratch.dir("dml_upd_noop")
    (1L to 5L).map(i => (i, i)).toDF("k", "v").write.format("graft")
      .option("path", dir).save()
    view("dml_noop_v", dir)
    ext.sql("UPDATE dml_noop_v SET v = 0 WHERE k > 1000")
    assert(ManifestTable.latestVersion(spark, dir).contains(1))
  }

  test("MERGE: matched update + not-matched insert + cardinality refusal") {
    val dir = Scratch.dir("dml_merge")
    (1L to 10L).map(i => (i, i * 10L)).toDF("k", "v").write.format("graft")
      .option("path", dir).save()
    view("dml_merge_v", dir)
    Seq((8L, 800L), (9L, 900L), (11L, 1100L), (12L, 1200L))
      .toDF("sk", "sv").createOrReplaceTempView("dml_merge_src_local")
    // the source view lives in the EXT session (temp views are per-state)
    GraftShim.ofRows(ext, spark.table("dml_merge_src_local")
      .queryExecution.analyzed).createOrReplaceTempView("dml_merge_src")
    ext.sql(
      """MERGE INTO dml_merge_v t USING dml_merge_src s ON t.k = s.sk
        |WHEN MATCHED THEN UPDATE SET v = s.sv
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.sk, s.sv)""".stripMargin)
    val rows = ManifestTable.readLatest(spark, dir).orderBy("k").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      ((1L to 7L).map(i => (i, i * 10)) ++
        Seq((8L, 800L), (9L, 900L), (10L, 100L), (11L, 1100L), (12L, 1200L))))
    // duplicate source keys on a matched row → refuse, nothing committed
    val v = ManifestTable.latestVersion(spark, dir)
    Seq((1L, 1L), (1L, 2L)).toDF("sk", "sv")
      .createOrReplaceTempView("dml_dup_local")
    GraftShim.ofRows(ext, spark.table("dml_dup_local")
      .queryExecution.analyzed).createOrReplaceTempView("dml_dup_src")
    view("dml_merge_v", dir)
    val e = intercept[Exception] {
      ext.sql(
        """MERGE INTO dml_merge_v t USING dml_dup_src s ON t.k = s.sk
          |WHEN MATCHED THEN UPDATE SET v = s.sv""".stripMargin)
    }
    assert(e.getMessage.contains("matched multiple source rows"))
    assert(ManifestTable.latestVersion(spark, dir) === v)
  }

  test("MERGE: DELETE clause and NOT MATCHED BY SOURCE") {
    val dir = Scratch.dir("dml_merge_del")
    (1L to 6L).map(i => (i, i)).toDF("k", "v").write.format("graft")
      .option("path", dir).save()
    view("dml_mdel_v", dir)
    Seq(2L, 4L).toDF("sk").createOrReplaceTempView("dml_mdel_local")
    GraftShim.ofRows(ext, spark.table("dml_mdel_local")
      .queryExecution.analyzed).createOrReplaceTempView("dml_mdel_src")
    // matched → delete; unmatched-by-source → v = -1 (full sync shape)
    ext.sql(
      """MERGE INTO dml_mdel_v t USING dml_mdel_src s ON t.k = s.sk
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = -1""".stripMargin)
    val rows = ManifestTable.readLatest(spark, dir).orderBy("k").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq(1L, 3L, 5L, 6L).map((_, -1L)))
  }

  test("DML on a pinned (versionAsOf) view refuses; plain session lacks DML") {
    val dir = Scratch.dir("dml_pinned")
    (1L to 3L).map(i => (i, i)).toDF("k", "v").write.format("graft")
      .option("path", dir).save()
    view("dml_pin_v", dir, ", versionAsOf '1'")
    val e = intercept[Exception] {
      ext.sql("DELETE FROM dml_pin_v WHERE k = 1")
    }
    assert(e.getMessage.contains("immutable snapshot"))
    assert(ManifestTable.latestVersion(spark, dir).contains(1))
    // without the extensions, Spark's own v2-only refusal still stands —
    // the rule is the deployment requirement, not ambient magic
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW dml_plain_v
                 |USING graft OPTIONS (path '$dir')""".stripMargin)
    intercept[Exception] { spark.sql("DELETE FROM dml_plain_v WHERE k = 1") }
  }

  test("X184 table_changes TVF: keyless append range, refusals") {
    val dir = Scratch.dir("dml_tvf")
    def write(lo: Long, hi: Long, mode: String, time: String): Unit =
      (lo to hi).map(i => (i, i * 10L)).toDF("k", "v")
        .write.mode(mode).format("graft").option("path", dir)
        .option("runDate", "20250701").option("runTime", time).save()
    write(1, 5, "overwrite", "900")  // v1
    write(6, 8, "append", "1000")    // v2: append step
    // an append-only range needs no keys — metadata routing scans only
    // the appended files
    val step = ext.sql(
      s"""SELECT change, to_version, count(*) AS n, sum(k) AS sk
         |FROM table_changes('$dir', 1, 2) GROUP BY 1, 2""".stripMargin)
      .collect()
    assert(step.map(r => (r.getString(0), r.get(1).toString.toInt,
      r.getLong(2), r.getLong(3))).toSeq === Seq(("added", 2, 3L, 21L)))
    // a replace commit in range pays a keyed diff — keyless refuses, loudly
    write(1, 4, "overwrite", "1100") // v3: replace step
    val e = intercept[Exception] {
      ext.sql(s"SELECT * FROM table_changes('$dir', 2, 3)").collect()
    }
    assert(e.getMessage.contains("keys"))
    // ...and with keys the replaced rows surface as their delete+insert pairs
    val replaced = ext.sql(
      s"""SELECT change, count(*) AS n FROM table_changes('$dir', 2, 3, 'k')
         |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(replaced.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("deleted", 4L))) // keys 5..8 vanish; 1..4 identical → no pair
    // analysis-time builder: arguments must be literals
    val lit = intercept[Exception] {
      ext.sql(s"SELECT * FROM table_changes(concat('$dir', ''), 1, 2)")
    }
    assert(lit.getMessage.contains("literal"))
  }

  test("X213 table_changes stamp bounds: window resolution on distinct stamps") {
    val dir = Scratch.dir("dml_tvf_ts")
    def write(lo: Long, hi: Long, mode: String, time: String): Unit =
      (lo to hi).map(i => (i, i * 10L)).toDF("k", "v")
        .write.mode(mode).format("graft").option("path", dir)
        .option("runDate", "20250701").option("runTime", time).save()
    write(1, 5, "overwrite", "900") // v1
    write(6, 8, "append", "1000")   // v2
    write(9, 9, "append", "1100")   // v3
    // window [1000, 1000]: only v2's append flows (v1 is the base, v3 late)
    val mid = ext.sql(
      s"""SELECT change, to_version, count(*) AS n
         |FROM table_changes('$dir', 20250701, 1000, 20250701, 1000)
         |GROUP BY 1, 2""".stripMargin).collect()
    assert(mid.map(r => (r.getString(0), r.get(1).toString.toInt, r.getLong(2)))
      .toSeq === Seq(("added", 2, 3L)))
    // a window from just after v1 through the end covers both appends
    val all = ext.sql(
      s"""SELECT count(*) AS n
         |FROM table_changes('$dir', 20250701, 901, 20250701, 1100)""".stripMargin)
      .head.getLong(0)
    assert(all === 4L) // v2's three rows + v3's one
    // a from-stamp at or before the first commit refuses (no base to
    // diff against — Delta's table_changes contract)
    val e0 = intercept[Exception](ext.sql(
      s"SELECT * FROM table_changes('$dir', 20250601, 0, 20250701, 1100)").collect())
    assert(e0.getMessage.contains("no base version"))
    // a to-stamp predating the log refuses
    val e = intercept[Exception](ext.sql(
      s"SELECT * FROM table_changes('$dir', 20250701, 1000, 20250601, 0)").collect())
    assert(e.getMessage.contains("no version at or before"))
  }
}
