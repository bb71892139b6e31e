package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private def topk(q: String): Map[Long, Seq[Long]] =
    Similarity.queries(q)(spark, sf)
      .orderBy("qid", "rank")
      .collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("cand_id")).toSeq)
      .toMap

  test("exact top-k: k rows per query, ranks contiguous, cosine non-increasing") {
    val rows = Similarity.queries("q_sim_topk")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == Similarity.nQueries)
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to Similarity.k))
      val cos = sorted.map(_.getAs[Double]("cos6"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(cos.forall(c => c >= -1.0 && c <= 1.0))
    }
  }

  test("LSH tier is a valid ANN: subset of corpus, self-excluded, usable recall") {
    val exact = topk("q_sim_topk")
    val approx = topk("q_sim_lsh")
    // every query must get some candidates (multi-probe makes empties
    // vanishingly unlikely with the fixed planes/fixture)
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (q, cands) => assert(!cands.contains(q)) }
    // recall@k against the exact answer — deterministic given fixed seed 42
    val recalls = exact.map { case (q, ex) =>
      val ap = approx(q).toSet
      ex.count(ap.contains).toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean recall@${Similarity.k} = $mean too low")
  }

  test("LSH candidates' cosines match the exact tier's for shared pairs") {
    val ex = Similarity.queries("q_sim_topk")(spark, sf)
      .select(col("qid"), col("cand_id"), col("cos6").as("c1"))
    val ap = Similarity.queries("q_sim_lsh")(spark, sf)
      .select(col("qid"), col("cand_id"), col("cos6").as("c2"))
    val joined = ex.join(ap, Seq("qid", "cand_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r =>
      assert(r.getAs[Double]("c1") == r.getAs[Double]("c2")))
  }

  test("IVF tier: valid ANN with usable recall and pruned candidate reads") {
    val exact = topk("q_sim_topk")
    val ivf = topk("q_sim_ivf")
    assert(ivf.keySet == exact.keySet)
    ivf.foreach { case (q, cands) => assert(!cands.contains(q)) }
    val recalls = exact.map { case (q, ex) =>
      ex.count(ivf(q).toSet.contains).toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean IVF recall@${Similarity.k} = $mean too low")
    // the coarse quantizer must actually partition: every cluster id in
    // range, and probing reads at most nProbes/k of a balanced corpus —
    // exercised through the ADAPTIVE path q_sim_ivf itself uses
    val e = graft.sources.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val (cents, nProbes) = Similarity.quantizerFor(spark, sf, e)
    assert(cents.length == Similarity.adaptiveIvfK(e.count()))
    assert(nProbes == Similarity.adaptiveProbes(cents.length))
    val sizes = Similarity.assignClusters(e, cents)
      .groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet.forall(c => c >= 0 && c < cents.length))
    assert(sizes.size > nProbes, "quantizer collapsed to too few clusters")
  }

  test("IVF candidates' cosines match the exact tier's for shared pairs") {
    val ex = Similarity.queries("q_sim_topk")(spark, sf)
      .select(col("qid"), col("cand_id"), col("cos6").as("c1"))
    val ap = Similarity.queries("q_sim_ivf")(spark, sf)
      .select(col("qid"), col("cand_id"), col("cos6").as("c2"))
    val joined = ex.join(ap, Seq("qid", "cand_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r =>
      assert(r.getAs[Double]("c1") == r.getAs[Double]("c2")))
  }

  test("IVF corpus written partitioned by cluster prunes probe reads") {
    // the scale claim in q_sim_ivf's doc: persist the corpus partitioned
    // by cluster id and a probe reads ivfProbes/ivfK of the data
    val e = graft.sources.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(spark, e)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf").toFile.getAbsolutePath
    Similarity.assignClusters(e, cents)
      .write.mode("overwrite").partitionBy("cluster").parquet(tmp)
    val probed = spark.read.parquet(tmp).where(col("cluster").isin(0, 1, 2))
    probed.collect()
    val plan = probed.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the probe predicate must land in PartitionFilters (directory-level
    // pruning), NOT as a post-scan data filter
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.isDefined, plan.take(400))
    assert(pf.get.contains("cluster"), s"probe not pruned at partition level: ${pf.get}")
  }

  test("X232 occupancy audit: sizes conserve the corpus, probe-cost moment bounded, balance margin real") {
    val r = Similarity.queries("q_ivf_balance")(spark, sf).head()
    val (nLists, nVecs, minSz, maxSz, sq) = (r.getAs[Long]("n_lists"),
      r.getAs[Long]("n_vecs"), r.getAs[Long]("min_size"),
      r.getAs[Long]("max_size"), r.getAs[Long]("probe_cost_sq"))
    val e = graft.sources.Tables.embeddings(spark, sf)
    assert(nVecs == e.count(), "every vector sits in exactly one list")
    assert(nLists == Similarity.adaptiveIvfK(e.count()),
      "no cluster emptied on the fixture")
    assert(minSz >= 1 && maxSz >= minSz)
    // Σ size² is bracketed by the balanced and degenerate extremes
    assert(sq >= nVecs * nVecs / nLists && sq <= nVecs * maxSz)
    assert(r.getAs[Boolean]("balanced_ok"),
      s"fixture quantizer unexpectedly skewed: max=$maxSz over $nLists lists")
  }

  test("bucket ids are stable and within range") {
    val b = graft.sources.Tables.embeddings(spark, sf)
      .select(Similarity.bucketOf(col("embedding")).as("b"))
      .agg(min("b"), max("b")).head()
    assert(b.getInt(0) >= 0 && b.getInt(1) < (1 << Similarity.nPlanes))
  }

  test("X72 centroid golden: fixed-point sums match hand arithmetic exactly") {
    import spark.implicits._
    // label 1: vectors (0.25, -0.5) and (0.75, 1.0) → sums (2^30, 2^29);
    // label 2: single vector (2.0, -2.0) — all exactly representable, so
    // floor(v·2^30) introduces no truncation at all here
    val df = Seq((1, Array(0.25f, -0.5f)), (1, Array(0.75f, 1.0f)),
      (2, Array(2.0f, -2.0f))).toDF("label", "embedding")
    val out = df
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(sum(floor(col("v").cast("double") * (1L << 30))).as("sum_fp"),
        count(lit(1)).as("n"))
      .orderBy("label", "dim")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val s = 1L << 30
    assert(out == Seq(
      (1, 0, s, 2L), // 0.25 + 0.75 = 1.0
      (1, 1, s / 2, 2L), // -0.5 + 1.0 = 0.5
      (2, 0, 2 * s, 1L),
      (2, 1, -2 * s, 1L)))
  }
}
