package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables
import graft.util.Scratch

/** X227 write-audit-publish: green publishes atomically, red leaves the
  * target byte-identical, staging never leaks, staged-but-unpublished
  * versions are orphans, and a concurrent target advance refuses the
  * publish (stale audit).
  */
class WapSpec extends SparkSpec {

  private val rules = Seq(
    Expectations.Rule("price_positive", "o_totalprice >= 0"),
    Expectations.Rule("key_present", "o_orderkey IS NOT NULL"))

  private def ord = Tables.orders(spark, sf)
    .select("o_orderkey", "o_custkey", "o_totalprice")

  private def freshTable(tag: String): String = {
    val dir = s"${Scratch.dir(tag)}/t"
    ManifestTable.commit(ord.where(col("o_orderkey") % 3 === 0), dir, 20250812, 900)
    Branches.createBranch(spark, dir, "main", 1)
    dir
  }

  test("green audit publishes; main readers see the staged bytes, staging ref is gone") {
    val dir = freshTable("wap_green")
    val candidate = Branches.readBranch(spark, dir, "main")
      .unionByName(ord.where(col("o_orderkey") % 3 === 1))
    val out = Wap.writeAuditPublish(candidate, dir, "main", rules, 20250812, 1000)
    assert(out.published)
    assert(out.report.values.forall(_ == 0L))
    assert(out.targetHead == out.stagedVersion)
    val main = Branches.readBranch(spark, dir, "main")
    assert(main.count() == ord.where(col("o_orderkey") % 3 <= 1).count())
    assert(Branches.listRefs(spark, dir).map(_.name) == Seq("main"))
  }

  test("red audit refuses: main byte-identical, staging dropped, staged version orphaned") {
    val dir = freshTable("wap_red")
    val headBefore = Branches.readRef(spark, dir, "main").head
    val rowsBefore = Branches.readBranch(spark, dir, "main")
      .agg(count(lit(1)), sum("o_orderkey").cast("long")).head()
    val bad = Branches.readBranch(spark, dir, "main")
      .unionByName(ord.where(col("o_orderkey") % 3 === 2)
        .withColumn("o_totalprice", -abs(col("o_totalprice"))))
    val out = Wap.writeAuditPublish(bad, dir, "main", rules, 20250812, 1000)
    assert(!out.published)
    assert(out.report("price_positive") > 0)
    assert(out.targetHead == headBefore, "a refused audit must not move the ref")
    val rowsAfter = Branches.readBranch(spark, dir, "main")
      .agg(count(lit(1)), sum("o_orderkey").cast("long")).head()
    assert(rowsAfter == rowsBefore)
    assert(Branches.listRefs(spark, dir).map(_.name) == Seq("main"),
      "staging ref must not leak")
    // the staged version EXISTS (durable, inspectable, vacuum-expirable)
    // but sits on no ref — Iceberg's stage-commit semantics
    assert(ManifestTable.latestVersion(spark, dir).contains(out.stagedVersion))
    assert(!Branches.listRefs(spark, dir).exists(_.lineage.contains(out.stagedVersion)))
  }

  test("violation budget: maxViolations tolerates bounded dirt, one over refuses") {
    val dir = freshTable("wap_budget")
    val base = Branches.readBranch(spark, dir, "main")
    val adds = ord.where(col("o_orderkey") % 3 === 2)
    val nBad = adds.count()
    val bad = base.unionByName(
      adds.withColumn("o_totalprice", -abs(col("o_totalprice"))))
    assert(Wap.writeAuditPublish(bad, dir, "main", rules, 20250812, 1000,
      maxViolations = nBad).published)
    val bad2 = Branches.readBranch(spark, dir, "main") // now contains nBad dirt
      .unionByName(adds.select(
        (col("o_orderkey") + 10000000).as("o_orderkey"), col("o_custkey"),
        (-abs(col("o_totalprice"))).as("o_totalprice")))
    assert(!Wap.writeAuditPublish(bad2, dir, "main", rules, 20250812, 1100,
      maxViolations = nBad * 2 - 1).published)
  }

  test("concurrent target advance between stage and publish refuses (stale audit)") {
    val dir = freshTable("wap_race")
    val mainHead = Branches.readRef(spark, dir, "main").head
    // simulate the race by hand: stage off main, then main advances
    Branches.createBranch(spark, dir, "wap_stale", mainHead, Some("main"))
    Branches.commitToBranch(
      Branches.readBranch(spark, dir, "wap_stale"), dir, "wap_stale", 20250812, 1000)
    Branches.commitToBranch(
      Branches.readBranch(spark, dir, "main")
        .unionByName(ord.where(col("o_orderkey") % 3 === 1)),
      dir, "main", 20250812, 1010)
    val e = intercept[IllegalArgumentException] {
      Branches.fastForward(spark, dir, "main", "wap_stale")
    }
    assert(e.getMessage.contains("diverge"))
  }
}
