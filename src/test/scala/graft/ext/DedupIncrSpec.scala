package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.ManifestTable
import graft.util.Scratch

/** X149 pins beyond the oracled q_dedup_incr: admission is exactly-once
  * ACROSS batches (batch 2 sees batch 1's fingerprints), a retried batch
  * converges on the state (no duplicate fingerprints ever), and the
  * corpus probe keeps the state on the broadcast-probe plan (the state
  * never shuffles).
  */
class DedupIncrSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("dedup-incr: batch 2 is deduped against batch 1's admissions") {
    val root = Scratch.dir("incr2") + "/state"
    DedupIncr.initState(spark, docs(1L -> "alpha beta", 2L -> "gamma"), root, 1, 900)
    DedupIncr.admitBatch(spark, root, docs(10L -> "delta", 11L -> "ALPHA  beta"), 1, 1000)
      .collect() // batch 1: 10 new, 11 dup_of_corpus
    val d2 = DedupIncr.admitBatch(spark, root,
      docs(20L -> "Delta", 21L -> "epsilon"), 1, 1100)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // "Delta" was admitted by batch 1's doc 10 → corpus dup NOW
    assert(d2 == Map(20L -> "dup_of_corpus", 21L -> "new"))
    val state = ManifestTable.readLatest(spark, root)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(state.length == state.map(_._1).distinct.length) // fp unique
    assert(state.map(_._2).sorted.toSeq == Seq(1L, 2L, 10L, 21L))
  }

  test("dedup-incr: a retried batch converges — the fingerprint set never duplicates") {
    val root = Scratch.dir("incr_retry") + "/state"
    DedupIncr.initState(spark, docs(1L -> "aa"), root, 2, 900)
    val batch = docs(5L -> "bb", 6L -> "cc")
    DedupIncr.admitBatch(spark, root, batch, 2, 1000).collect()
    val after1 = ManifestTable.readLatest(spark, root)
      .orderBy("fp").collect().map(_.toString).toSeq
    // the crash-retry shape: the same batch runs again in full
    val retry = DedupIncr.admitBatch(spark, root, batch, 2, 1100)
      .collect().map(_.getString(2))
    assert(retry.forall(_ == "dup_of_corpus")) // its own prior admission owns the content
    val after2 = ManifestTable.readLatest(spark, root)
      .orderBy("fp").collect().map(_.toString).toSeq
    assert(after2 == after1)
  }

  test("dedup-incr: the state probe is broadcast — no sort-merge join in the plan") {
    val root = Scratch.dir("incr_plan") + "/state"
    DedupIncr.initState(spark, docs(1L -> "xx"), root, 3, 900)
    val decided = DedupIncr.admitBatch(spark, root, docs(9L -> "yy"), 3, 1000)
    val plan = decided.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
