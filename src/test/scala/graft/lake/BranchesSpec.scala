package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X95 branches/tags: isolation both directions, tag immutability,
  * fast-forward semantics with loud divergence refusal, ref atomicity.
  */
class BranchesSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): String = {
    val dir = s"${graft.util.Scratch.dir(tag)}/t"
    ManifestTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir, 20250810, 900)
    Branches.createBranch(spark, dir, "main", 1)
    dir
  }

  test("branch commits are isolated in both directions") {
    val dir = freshTable("br_iso")
    Branches.createBranch(spark, dir, "exp", 1, Some("main"))
    Branches.commitToBranch(
      Branches.readBranch(spark, dir, "exp")
        .unionByName(Seq((3L, "c")).toDF("k", "v")), dir, "exp", 20250810, 1000)
    assert(Branches.readBranch(spark, dir, "main").count() == 2)
    assert(Branches.readBranch(spark, dir, "exp").count() == 3)
    Branches.commitToBranch(
      Branches.readBranch(spark, dir, "main")
        .unionByName(Seq((9L, "z")).toDF("k", "v")), dir, "main", 20250810, 1100)
    assert(Branches.readBranch(spark, dir, "exp").as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("tags are immutable: committing to one refuses") {
    val dir = freshTable("br_tag")
    Branches.createTag(spark, dir, "rel", 1, Some("main"))
    val e = intercept[IllegalArgumentException] {
      Branches.commitToBranch(Seq((7L, "x")).toDF("k", "v"), dir, "rel", 20250810, 1000)
    }
    assert(e.getMessage.contains("immutable"))
    assert(Branches.readBranch(spark, dir, "rel").count() == 2)
  }

  test("fast-forward advances a stale branch; divergence refuses loudly") {
    val dir = freshTable("br_ff")
    Branches.createBranch(spark, dir, "exp", 1, Some("main"))
    Branches.commitToBranch(
      Branches.readBranch(spark, dir, "exp")
        .unionByName(Seq((3L, "c")).toDF("k", "v")), dir, "exp", 20250810, 1000)
    // main hasn't moved → FF succeeds and main reads exp's content
    Branches.fastForward(spark, dir, "main", "exp")
    assert(Branches.readBranch(spark, dir, "main").count() == 3)
    // now diverge: commit to both — FF must refuse
    Branches.commitToBranch(Branches.readBranch(spark, dir, "main")
      .unionByName(Seq((4L, "d")).toDF("k", "v")), dir, "main", 20250810, 1100)
    Branches.commitToBranch(Branches.readBranch(spark, dir, "exp")
      .unionByName(Seq((5L, "e")).toDF("k", "v")), dir, "exp", 20250810, 1200)
    val e = intercept[IllegalArgumentException] {
      Branches.fastForward(spark, dir, "main", "exp")
    }
    assert(e.getMessage.contains("diverge"))
  }

  test("a torn ref write (tmp without rename) leaves the old ref served") {
    val dir = freshTable("br_crash")
    // simulate the crash: write a garbage tmp ref beside the real one
    val fs = ManifestTable.fsFor(spark, dir)
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/_refs/.main.json.tmp")
    val out = fs.create(tmp, true)
    try out.write("{corrupt".getBytes("UTF-8")) finally out.close()
    assert(Branches.readRef(spark, dir, "main").head == 1)
    assert(Branches.readBranch(spark, dir, "main").count() == 2)
  }

  test("three-way merge: disjoint edits combine, deletes propagate, source untouched") {
    val dir = freshTable("br_merge")
    Branches.createBranch(spark, dir, "exp", 1, Some("main"))
    // exp: update k=1, DELETE k=2, insert k=3
    Branches.commitToBranch(
      Seq((1L, "A"), (3L, "c")).toDF("k", "v"), dir, "exp", 20250810, 1000)
    // main: insert k=9 only (disjoint from exp's touched keys)
    Branches.commitToBranch(Branches.readBranch(spark, dir, "main")
      .unionByName(Seq((9L, "z")).toDF("k", "v")), dir, "main", 20250810, 1100)
    val ref = Branches.mergeBranches(spark, dir, "main", "exp", Seq("k"),
      20250810, 1200)
    assert(ref.lineage == Seq(1, 3, 4), "merge must commit a new version on main")
    assert(Branches.readBranch(spark, dir, "main").as[(Long, String)]
      .collect().toSet == Set((1L, "A"), (3L, "c"), (9L, "z")),
      "update + insert applied, delete of k=2 propagated, main's k=9 kept")
    // source branch untouched
    assert(Branches.readRef(spark, dir, "exp").lineage == Seq(1, 2))
    assert(Branches.readBranch(spark, dir, "exp").count() == 2)
  }

  test("three-way merge refuses when the same key changed differently on both sides") {
    val dir = freshTable("br_conflict")
    Branches.createBranch(spark, dir, "exp", 1, Some("main"))
    Branches.commitToBranch(
      Seq((1L, "EXP"), (2L, "b")).toDF("k", "v"), dir, "exp", 20250810, 1000)
    Branches.commitToBranch(
      Seq((1L, "MAIN"), (2L, "b")).toDF("k", "v"), dir, "main", 20250810, 1100)
    val e = intercept[IllegalArgumentException] {
      Branches.mergeBranches(spark, dir, "main", "exp", Seq("k"), 20250810, 1200)
    }
    assert(e.getMessage.contains("conflict"))
    // refusal is side-effect-free: both heads stand
    assert(Branches.readRef(spark, dir, "main").lineage == Seq(1, 3))
    assert(Branches.readBranch(spark, dir, "main").as[(Long, String)]
      .collect().toSet == Set((1L, "MAIN"), (2L, "b")))
  }

  test("identical both-side edits merge without conflict") {
    val dir = freshTable("br_samechange")
    Branches.createBranch(spark, dir, "exp", 1, Some("main"))
    // both branches make the SAME update to k=1; exp also inserts k=3
    Branches.commitToBranch(
      Seq((1L, "X"), (2L, "b"), (3L, "c")).toDF("k", "v"), dir, "exp", 20250810, 1000)
    Branches.commitToBranch(
      Seq((1L, "X"), (2L, "b")).toDF("k", "v"), dir, "main", 20250810, 1100)
    Branches.mergeBranches(spark, dir, "main", "exp", Seq("k"), 20250810, 1200)
    assert(Branches.readBranch(spark, dir, "main").as[(Long, String)]
      .collect().toSet == Set((1L, "X"), (2L, "b"), (3L, "c")))
  }

  test("merge fast-forwards when possible; no-ops when target is ahead") {
    val dir = freshTable("br_merge_ff")
    Branches.createBranch(spark, dir, "exp", 1, Some("main"))
    Branches.commitToBranch(Branches.readBranch(spark, dir, "exp")
      .unionByName(Seq((3L, "c")).toDF("k", "v")), dir, "exp", 20250810, 1000)
    // main behind exp → plain fast-forward, no new version
    val ff = Branches.mergeBranches(spark, dir, "main", "exp", Seq("k"),
      20250810, 1100)
    assert(ff.lineage == Seq(1, 2))
    // exp now behind main (equal lineages count as contained) → no-op
    val noop = Branches.mergeBranches(spark, dir, "exp", "main", Seq("k"),
      20250810, 1200)
    assert(noop.lineage == Seq(1, 2))
    assert(ManifestTable.latestVersion(spark, dir) == Some(2),
      "neither direction may have committed a version")
  }

  test("ref names are validated: path escapes and JSON breakers refuse") {
    val dir = freshTable("br_names")
    Seq("../evil", "a/b", "has\"quote", ".hidden", "").foreach { bad =>
      intercept[IllegalArgumentException] {
        Branches.createBranch(spark, dir, bad, 1)
      }
    }
    // the safe charset still works, including dots and dashes
    Branches.createTag(spark, dir, "rel-1.2_final", 1, Some("main"))
    assert(Branches.readRef(spark, dir, "rel-1.2_final").head == 1)
  }

  test("branch lineage supports per-branch history (head walks the chain)") {
    val dir = freshTable("br_lineage")
    Branches.createBranch(spark, dir, "exp", 1, Some("main"))
    Branches.commitToBranch(Branches.readBranch(spark, dir, "exp")
      .unionByName(Seq((3L, "c")).toDF("k", "v")), dir, "exp", 20250810, 1000)
    Branches.commitToBranch(Branches.readBranch(spark, dir, "main")
      .unionByName(Seq((9L, "z")).toDF("k", "v")), dir, "main", 20250810, 1100)
    assert(Branches.readRef(spark, dir, "exp").lineage == Seq(1, 2))
    assert(Branches.readRef(spark, dir, "main").lineage == Seq(1, 3))
    // reading an ancestor version off the lineage reproduces old content
    val prior = Branches.readRef(spark, dir, "exp").lineage.head
    assert(ManifestTable.readVersion(spark, dir, prior).count() == 2)
  }
}
