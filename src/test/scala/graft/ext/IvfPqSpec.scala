package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Scratch

/** X178 IVF-PQ: recall vs the exact tier, the pruned hot scan (codes
  * only, no embedding bytes), incremental append under the frozen
  * quantizers, and X64 delete composition — the property pins for the
  * committed compressed index.
  */
class IvfPqSpec extends SparkSpec {

  private def corpus = graft.sources.Tables.embeddings(spark, sf)
    .select("vec_id", "embedding")

  private def queriesDf = graft.sources.Tables.embeddings(spark, sf)
    .where(col("vec_id") < Similarity.nQueries)
    .select(col("vec_id").as("qid"), col("embedding").as("qe"))

  test("recall@k vs the exact tier clears the floor; k answers per query") {
    val root = Scratch.dir("ivfpq_spec")
    IvfPq.build(spark, corpus, root, 20250801, 900)
    val got = IvfPq.search(spark, root, queriesDf, Similarity.k)
    assert(got.columns.toSeq === Seq("qid", "cand_id", "cos6", "rank"))
    val exact = graft.SparkEntry.queries("q_sim_topk")(spark, sf)
      .select("qid", "cand_id")
    val tot = exact.count()
    val hit = exact.intersect(got.select("qid", "cand_id")).count()
    val recall = hit.toDouble / tot
    assert(recall >= 0.6,
      s"IVF-PQ recall $recall under floor (IVF probes × PQ shortlist compound)")
    val perQ = got.groupBy("qid").count().select("count").distinct().collect()
    assert(perQ.map(_.getLong(0)).toSeq === Seq(Similarity.k.toLong))
  }

  test("the ADC shortlist scan reads codes, never the embedding column (pruned)") {
    val root = Scratch.dir("ivfpq_prune")
    IvfPq.build(spark, corpus, root, 20250801, 900)
    val plan = IvfPq.search(spark, root, queriesDf, Similarity.k)
      .queryExecution.executedPlan.toString
    // the lists table is scanned twice: the hot ADC pass and the
    // shortlist rerank. The hot pass's FileScan must list codes WITHOUT
    // embedding in its ReadSchema — i.e. at least one lists scan carries
    // codes but not embedding.
    val schemas = raw"ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(schemas.exists(s => s.contains("codes") && !s.contains("embedding")),
      s"no embedding-free codes scan found in:\n${schemas.mkString("\n")}")
  }

  test("append encodes under the frozen quantizers; new vectors are findable") {
    val root = Scratch.dir("ivfpq_append")
    val half = corpus.where(col("vec_id") % 2 === 0 || col("vec_id") < Similarity.nQueries)
    IvfPq.build(spark, half, root, 20250801, 900)
    val booksBefore = IvfPq.loadBooks(spark, root)
    IvfPq.append(spark, corpus.where(col("vec_id") % 2 === 1 &&
      col("vec_id") >= Similarity.nQueries), root, 20250801, 930)
    // quantizers frozen: same books object after the append's new cut
    assert(IvfPq.loadBooks(spark, root).flatten.flatten.toSeq ===
      booksBefore.flatten.flatten.toSeq)
    val got = IvfPq.search(spark, root, queriesDf, Similarity.k)
    assert(got.where(col("cand_id") % 2 === 1).count() > 0,
      "appended odd vectors must be reachable through the index")
  }

  test("X64 delete composes: a deleted vector never comes back from a probe") {
    val root = Scratch.dir("ivfpq_del")
    IvfPq.build(spark, corpus, root, 20250801, 900)
    val victim = IvfPq.search(spark, root, queriesDf, Similarity.k)
      .orderBy("qid", "rank").select("cand_id").head.getLong(0)
    IvfIndex.delete(spark, col("vec_id") === victim, root, 20250801, 930)
    val after = IvfPq.search(spark, root, queriesDf, Similarity.k)
    assert(after.where(col("cand_id") === victim).count() === 0L,
      s"deleted vector $victim still served")
    assert(after.groupBy("qid").count().select("count").distinct()
      .head.getLong(0) === Similarity.k.toLong,
      "survivors still fill k slots")
  }
}
