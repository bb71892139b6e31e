package graft.ext

import graft.SparkSpec

/** X34: hash-min connected components — golden graphs and a propagation
  * depth case.
  */
class ClustersSpec extends SparkSpec {

  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(spark, edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two components: a path and a triangle, each labeled by its min node") {
    val got = cc(Seq((5L, 3L), (3L, 9L), // path 5-3-9 → min 3
      (20L, 21L), (21L, 22L), (22L, 20L))) // triangle → min 20
    assert(got == Map(5L -> 3L, 3L -> 3L, 9L -> 3L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("min label propagates along a long path (depth > 1 per round)") {
    // path 10-9-8-...-0: every node must end at 0, which requires the
    // label to travel the full diameter
    val edges = (0L until 10L).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L to 10L).toSet)
  }

  test("isolated nodes (no edges) are not labeled; self-loops are harmless") {
    val got = cc(Seq((1L, 1L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("reliable-checkpoint mode converges on a 50-hop path graph (deep diameter)") {
    // VERDICT r3 item 4: the production mode — per-round parquet under a
    // checkpoint dir instead of executor-local blocks — exercised at the
    // worst case for label propagation: a pure path, where the min label
    // travels exactly one hop per round (50 rounds to converge).
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt")
    try {
      val edges = (0L until 50L).map(i => (i, i + 1)).toDF("a", "b")
      val got = Clusters.connectedComponents(spark, edges,
          maxIters = 60, checkpointDir = Some(dir.toString))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.keySet == (0L to 50L).toSet)
      assert(got.values.toSet == Set(0L))
      // storage is bounded: only the last two label rounds + sym remain
      val kept = new java.io.File(dir.toString).list().toSeq
        .filter(_.startsWith("labels_"))
      assert(kept.size <= 2, s"round files not pruned: $kept")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("both modes agree on the same graph") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_both")
    try {
      val edges = Seq((5L, 3L), (3L, 9L), (20L, 21L)).toDF("a", "b")
      val local = Clusters.connectedComponents(spark, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val reliable = Clusters.connectedComponents(spark, edges,
          checkpointDir = Some(dir.toString))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == reliable)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("X251 keep-best: one keeper per component, keeper is the quality argmax, membership consistent") {
    val kept = Clusters.keepBest(spark, sf).collect()
      .map(r => (r.getAs[Long]("component"), r.getAs[Long]("n_members"),
        r.getAs[Long]("kept_id"), r.getAs[Long]("kept_permille"),
        r.getAs[Boolean]("switched")))
    assert(kept.nonEmpty)
    val members = Clusters.queries("q_dedup_clusters")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component"))
    val byComp = members.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val perm = {
      val docs = graft.sources.Tables.documents(spark, sf)
        .select("doc_id", "text").collect()
      docs.map { r =>
        val tk = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
        r.getLong(0) ->
          tk.count(TextAnalysis.stopwords.contains) * 1000L / math.max(tk.length, 1)
      }.toMap
    }
    assert(kept.map(_._1).toSet == byComp.keySet, "one row per component")
    kept.foreach { case (comp, n, id, p, switched) =>
      val ms = byComp(comp)
      assert(ms.contains(id) && n == ms.size, s"component $comp membership")
      assert(p == perm(id))
      assert(p == ms.map(perm).max, s"component $comp keeper is not the argmax")
      assert(switched == (id != comp))
    }
    // the value proposition fires: some keeper differs from the min-id rule
    assert(kept.exists(_._5), "expect at least one quality-switched keeper")
  }
}
