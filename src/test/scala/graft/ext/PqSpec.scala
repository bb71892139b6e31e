package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X177 product quantization: determinism, code domain/compression,
  * reconstruction usefulness, and the recall floor vs the exact tier —
  * the property pins standing in for the (impossible) value oracle,
  * the same contract shape as the LSH/IVF tiers.
  */
class PqSpec extends SparkSpec {

  private lazy val e = graft.sources.Tables.embeddings(spark, sf)
    .select("vec_id", "embedding")
  private lazy val books = Pq.train(e, "vec_id", "embedding")

  test("training is bit-reproducible: two runs give identical codebooks") {
    val again = Pq.train(e, "vec_id", "embedding")
    assert(books.flatten.flatten.toSeq === again.flatten.flatten.toSeq)
  }

  test("codes: m bytes per vector, every byte a valid centroid id") {
    val codes = e.select(col("vec_id"), Pq.encodeCol(books, col("embedding")).as("codes"))
    val n = e.count()
    assert(codes.where(size(col("codes")) === Pq.M).count() === n)
    val bad = codes.select(explode(col("codes")).as("c"))
      .where(col("c") < 0 || col("c") >= Pq.K).count()
    assert(bad === 0L, "every code byte must index a real centroid")
    // compression: m tinyints vs dim float32s
    val dim = e.select(size(col("embedding"))).head.getInt(0)
    assert(dim * 4 / Pq.M >= 16, s"expected >=16x compression, dim=$dim m=${Pq.M}")
  }

  test("codebooks beat the global mean: quantization error under per-subspace variance") {
    // reconstruction MSE (fixed-point units²) must be strictly below the
    // MSE of assigning every vector to its subspace MEAN — i.e. the
    // codebook learned something; a degenerate codebook (all centroids
    // equal) would tie the mean, not beat it
    val qv = KMeans.quantize(col("embedding"))
    val sd = books(0)(0).length
    def recon(i: Int) =
      element_at(typedLit(books(i).map(_.toSeq).toSeq),
        element_at(Pq.encodeCol(books, col("embedding")), i + 1).cast("int") + 1)
    val err = (0 until Pq.M).map(i =>
      aggregate(zip_with(slice(qv, i * sd + 1, sd), recon(i),
        (x, y) => (x - y) * (x - y)), lit(0L), (a, b) => a + b)).reduce(_ + _)
    val mse = e.select(err.as("e")).agg(avg("e")).head.getDouble(0)
    // variance around the global mean, same fixed-point units
    val moments = e.select(explode(qv).as("x"))
      .agg(avg(col("x") * col("x")).as("ex2"), avg(col("x")).as("ex")).head
    val varTotal = (moments.getDouble(0) - math.pow(moments.getDouble(1), 2)) *
      e.select(size(col("embedding"))).head.getInt(0)
    assert(mse < varTotal * 0.9,
      s"codebook mse $mse must be well under the mean-only error $varTotal")
  }

  test("recall@k vs the exact tier clears the floor; output shape matches the ANN family") {
    val exact = graft.SparkEntry.queries("q_sim_topk")(spark, sf)
      .select("qid", "cand_id")
    val pq = graft.SparkEntry.queries("q_sim_pq")(spark, sf)
    assert(pq.columns.toSeq === Seq("qid", "cand_id", "cos6", "rank"))
    val tot = exact.count()
    val hit = exact.intersect(pq.select("qid", "cand_id")).count()
    val recall = hit.toDouble / tot
    // measured 0.85 on the fixture; 0.7 leaves honest headroom without
    // letting a silent regression (wrong subspace slice, stale codes)
    // pass — codes-only ADC scores 0.50, so the floor also proves the
    // exact-rerank stage is actually wired
    assert(recall >= 0.7, s"recall@${Similarity.k} = $recall below floor")
    // every query answers with exactly k ranked candidates
    val perQ = pq.groupBy("qid").count().select("count").distinct().collect()
    assert(perQ.map(_.getLong(0)).toSeq === Seq(Similarity.k.toLong))
  }
}
