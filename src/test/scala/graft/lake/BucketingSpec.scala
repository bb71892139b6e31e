package graft.lake

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  private val keys = SnapshotDiff.diffKeys

  test("bucketed snapshot diff: zero exchanges, identical answer") {
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold").map(k => k -> conf.get(k, "10485760b"))
    try {
      saved.foreach { case (k, _) => conf.set(k, "-1") }
      Bucketing.writeBucketed(SnapshotDiff.synthCurrent(spark, sf), "cur_b", keys)
      Bucketing.writeBucketed(SnapshotDiff.synthPrevious(spark, sf), "prev_b", keys)
      val diff = Bucketing.diffBucketed(spark, "cur_b", "prev_b", keys)
      val got = diff.collect().map(_.toSeq).toSet

      // same answer as the plain (shuffling) diff
      val plain = SnapshotDiff.diff(SnapshotDiff.synthCurrent(spark, sf),
        SnapshotDiff.synthPrevious(spark, sf), keys).collect().map(_.toSeq).toSet
      assert(got == plain && got.nonEmpty)

      // and the bucketed plan shuffles NOTHING: the SMJ's distribution
      // requirement is satisfied by the bucketed scans themselves
      diff.collect()
      val plan = diff.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed diff still shuffles:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan not bucketed:\n$plan")
    } finally {
      saved.foreach { case (k, v) => conf.set(k, v) }
      spark.sql("DROP TABLE IF EXISTS cur_b")
      spark.sql("DROP TABLE IF EXISTS prev_b")
    }
  }
}
