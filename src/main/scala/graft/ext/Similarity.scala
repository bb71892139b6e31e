package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.sources.Tables._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (north-star mandate E3; the reference has no vector surface).
  *
  * Two tiers:
  *  - `q_sim_topk`: exact brute force — broadcast the (small) query set
  *    against every candidate, cosine via the codegen'd native expression,
  *    per-query top-k through a ranking window. This is the oracle-checked
  *    baseline and the right plan whenever |queries|·|corpus| is scan-sized.
  *  - `q_sim_lsh`: random-hyperplane (SimHash-for-vectors) bucketing with
  *    multi-probe: a vector's bucket is the sign pattern of `nPlanes` fixed
  *    hyperplane dot products; a query probes its own bucket plus all
  *    Hamming-1 neighbors, then reranks candidates exactly. At 100 TB the
  *    bucket join replaces the full crossJoin — cost drops from |corpus| per
  *    query to |corpus|/2^nPlanes · (nPlanes+1) — and the bucketed side can
  *    be written partitioned by bucket so probes prune to single partitions.
  *    Recall is property-tested against the exact tier (SimilaritySpec).
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  val k = 5
  val nQueries = 8
  val nPlanes = 6

  /** Deterministic pseudo-random Gaussian hyperplanes (fixed seed, 64-dim —
    * the fixture embedding dimensionality). Float32, matching the embedding
    * column, so the codegen'd dot product runs on homogeneous arrays.
    */
  lazy val planes: Array[Array[Float]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(nPlanes)(Array.fill(64)(rnd.nextGaussian().toFloat))
  }

  /** Sign-pattern bucket id of an `array<float>` embedding column. Each
    * plane projection is the native codegen'd `vec_dot` against a constant
    * plane literal — the whole bucket id stays inside whole-stage codegen.
    */
  def bucketOf(emb: Column): Column =
    (0 until nPlanes).map { j =>
      when(VectorOps.dot(emb, lit(planes(j))) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  val queries: Map[String, Q] = Map(
    // Exact top-k: rank on the ROUNDED cosine (6 dp) with candidate-id
    // tie-break so ordering is reproducible across engines regardless of
    // last-ulp differences.
    "q_sim_topk" -> ((s, d) => {
      val e = embeddings(s, d).select("vec_id", "embedding")
      val q = e.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val w = Window.partitionBy("qid").orderBy(col("cos6").desc, col("cand_id").asc)
      e.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cand_id"),
          round(VectorOps.cosine(col("embedding"), col("qe")), 6).as("cos6"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= k)
        .orderBy("qid", "rank")
    }),

    // LSH tier: same output shape, candidates restricted to multi-probe
    // buckets. Non-oracle (recall < 1 by design); pinned by SimilaritySpec.
    "q_sim_lsh" -> ((s, d) => {
      val e = embeddings(s, d).select("vec_id", "embedding")
        .withColumn("bucket", bucketOf(col("embedding")))
      val q = e.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          explode(array(
            (lit(col("bucket").cast("int"))) +:
              (0 until nPlanes).map(j => col("bucket").bitwiseXOR(lit(1 << j)).cast("int")): _*))
            .as("probe"))
      e.join(broadcast(q), col("bucket") === col("probe") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cand_id"),
          round(VectorOps.cosine(col("embedding"), col("qe")), 6).as("cos6"))
        .withColumn("rank",
          row_number().over(
            Window.partitionBy("qid").orderBy(col("cos6").desc, col("cand_id").asc))
            .cast("long"))
        .where(col("rank") <= k)
        .orderBy("qid", "rank")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_sim_topk" ->
      s"""SELECT qid, cand_id, cos6, rank FROM (
         |  SELECT q.vec_id AS qid, c.vec_id AS cand_id,
         |         round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
         |                                      CAST(q.embedding AS DOUBLE[])), 6) AS cos6,
         |         row_number() OVER (
         |           PARTITION BY q.vec_id
         |           ORDER BY round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
         |                                                 CAST(q.embedding AS DOUBLE[])), 6) DESC,
         |                    c.vec_id) AS rank
         |  FROM embeddings q JOIN embeddings c
         |    ON q.vec_id < $nQueries AND c.vec_id <> q.vec_id)
         |WHERE rank <= $k ORDER BY qid, rank""".stripMargin,
  )
}
