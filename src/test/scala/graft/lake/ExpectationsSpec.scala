package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X76 commit gates + X75 change feed: bad data never becomes a version,
  * and the feed reports exactly the content deltas.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_exp").toString

  private def rows = (1L to 50L).map(i => (i, i * 2.0)).toDF("id", "price")

  test("violating commit is refused atomically: no manifest, no staged files") {
    val dir = tmpTable()
    val rules = Seq(Expectations.Rule("price_cap", "price < 50"))
    val e = intercept[IllegalArgumentException] {
      Expectations.commitChecked(rows, dir, 20250901, 900, rules)
    }
    assert(e.getMessage.contains("price_cap=26"))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$dir/_manifests")), "manifest dir created on refusal")
    assert(!fs.exists(new Path(s"$dir/data")), "data staged despite refusal")
  }

  test("passing commit lands; a violation budget tolerates bounded dirt") {
    val dir = tmpTable()
    val clean = Seq(Expectations.Rule("pos", "price > 0"),
      Expectations.Rule("key", "id IS NOT NULL"))
    assert(Expectations.commitChecked(rows, dir, 20250901, 900, clean) == 1)
    assert(ManifestTable.readLatest(spark, dir).count() == 50)
    // 26 violations > budget 10 → refused; budget 30 → lands as v2
    val capped = Seq(Expectations.Rule("price_cap", "price < 50"))
    intercept[IllegalArgumentException] {
      Expectations.commitChecked(rows, dir, 20250901, 1000, capped, maxViolations = 10)
    }
    assert(ManifestTable.latestVersion(spark, dir).contains(1))
    assert(Expectations.commitChecked(rows, dir, 20250901, 1000, capped,
      maxViolations = 30) == 2)
  }

  test("NULL predicate results count as violations, not passes") {
    val df = Seq((1L, Some(5.0)), (2L, None)).toDF("id", "price")
    val got = Expectations.evaluate(df, Seq(Expectations.Rule("pos", "price > 0")))
    assert(got("pos") == 1L, "NULL > 0 is unknown — must count as a violation")
  }

  test("X75 change feed: delete commits surface rows, materialize is silent") {
    val dir = tmpTable()
    ManifestTable.commit((1L to 40L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(4), dir, 20250901, 900)
    DeleteVectors.deleteWhere(spark, dir, col("id") % 4 === 0, 20250901, 1000)
    DeleteVectors.materialize(spark, dir, 20250901, 1100)
    ManifestTable.commit(
      (1L to 40L).filter(i => i % 4 != 0).map(i => (i, s"v$i")).toDF("id", "v")
        .unionByName(Seq((99L, "new")).toDF("id", "v")), dir, 20250901, 1200)
    val feed = ChangeFeed.changeFeed(spark, dir, 1, 4, Seq("id"))
      .groupBy("from_version", "change").count()
      .as[(Int, String, Long)].collect().toSet
    assert(feed == Set(
      (1, "deleted", 10L), // the delete commit's tombstoned rows
      // v2 → v3 materialize: NO rows (same logical content)
      (3, "added", 1L) // the appended id 99
    ), s"unexpected feed: $feed")
  }

  test("X107 quarantine: multi-rule tags, nothing lost, one atomic cut") {
    val root = java.nio.file.Files.createTempDirectory("graft_quar").toString
    val rules = Seq(
      Expectations.Rule("id_pos", "id > 0"),
      Expectations.Rule("v_short", "length(v) <= 3"),
      Expectations.Rule("v_known", "v IS NOT NULL"))
    val df = Seq[(java.lang.Long, String)](
      (1L, "ok"), (2L, "als"), // clean
      (-3L, "bad"), // id_pos only
      (4L, "toolong"), // v_short only
      (-5L, null), // id_pos + v_known (and v_short passes NULL→fail too!)
      (6L, null) // v_known only... length(NULL) IS NULL → v_short fails too
    ).toDF("id", "v")
    val (cv, nClean, nQuar) =
      Expectations.commitQuarantined(spark, root, "t", df, 20250901, 900, rules)
    assert(cv == 1 && nClean == 2 && nQuar == 4, s"got $cv/$nClean/$nQuar")
    val quar = Catalog.readTable(spark, root, "t_quarantine")
      .select("id", "_violated").as[(Long, String)].collect().toMap
    // tags list every broken rule in declaration order; NULL predicate
    // results count as violations (the evaluate() contract)
    assert(quar == Map(
      -3L -> "id_pos",
      4L -> "v_short",
      -5L -> "id_pos,v_short,v_known",
      6L -> "v_short,v_known"), s"got $quar")
    // both sides resolve through the same catalog cut — no torn view
    assert(Catalog.snapshots(spark, root).last.tables ==
      Map("t" -> 1, "t_quarantine" -> 1))
    assert(Catalog.readTable(spark, root, "t").count() + nQuar == df.count())
  }

  test("X125 guards: duplicates and anomalous shrink refuse side-effect-free") {
    import graft.util.Scratch
    val dir = Scratch.dir("guard_spec")
    val base = (0L until 100L).map(i => (i, i)).toDF("k", "v")
    assert(Expectations.commitGuarded(base, dir, 20250901, 900,
      uniqueKeys = Seq("k"), maxShrinkPct = Some(50)) == 1)

    // duplicate keys: refused, log untouched
    val e1 = intercept[IllegalArgumentException](
      Expectations.commitGuarded(base.unionByName(base.limit(3)), dir,
        20250901, 1000, uniqueKeys = Seq("k")))
    assert(e1.getMessage.contains("unique-key"))
    // 90% shrink: refused with the evidence
    val e2 = intercept[IllegalArgumentException](
      Expectations.commitGuarded(base.limit(10), dir, 20250901, 1000,
        maxShrinkPct = Some(50)))
    assert(e2.getMessage.contains("shrink"))
    assert(ManifestTable.latestVersion(spark, dir).contains(1))

    // a tolerable shrink lands; first-commit exemption means a fresh
    // table accepts any size
    assert(Expectations.commitGuarded(base.limit(60), dir, 20250901, 1100,
      maxShrinkPct = Some(50)) == 2)
  }
}
