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

  /** Upper bound of the plane pool — 2^24 buckets is enough for ~500M
    * vectors at the default occupancy target.
    */
  val maxPlanes = 24

  /** Deterministic pseudo-random Gaussian hyperplanes (fixed seed, 64-dim —
    * the fixture embedding dimensionality). Float32, matching the embedding
    * column, so the codegen'd dot product runs on homogeneous arrays.
    * One sequential draw stream ⇒ PREFIX-STABLE: `planePool.take(n)` for
    * any n ≤ [[maxPlanes]] gives the same planes regardless of how many a
    * caller uses, so growing the plane count refines buckets without
    * reshuffling the old sign bits.
    */
  lazy val planePool: Array[Array[Float]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(maxPlanes)(Array.fill(64)(rnd.nextGaussian().toFloat))
  }

  lazy val planes: Array[Array[Float]] = planePool.take(nPlanes)

  /** Hyperplane count for a corpus of `count` vectors targeting ~`target`
    * vectors per bucket: expected occupancy n/2^p stays CONSTANT as the
    * corpus grows, which keeps the within-bucket candidate join linear in
    * n instead of quadratic — the difference between a 10× corpus costing
    * 10× and costing 100×.
    */
  def adaptivePlanes(count: Long, target: Long = 32L): Int = {
    val needed = math.ceil(math.log(math.max(1.0, count.toDouble / target)) / math.log(2.0)).toInt
    math.min(maxPlanes, math.max(nPlanes, needed))
  }

  /** Sign-pattern bucket id of an `array<float>` embedding column over the
    * first `n` pool planes. Each plane projection is the native codegen'd
    * `vec_dot` against a constant plane literal — the whole bucket id stays
    * inside whole-stage codegen.
    */
  def bucketOf(emb: Column, n: Int = nPlanes): Column =
    (0 until n).map { j =>
      when(VectorOps.dot(emb, lit(planePool(j))) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  val ivfK = 16
  val ivfProbes = 3
  val ivfIters = 3

  /** Maximum coarse-quantizer size — 4096 lists indexes ~16M vectors at
    * the √n rule before list sizes grow linearly again.
    */
  val maxIvfK = 4096

  /** Centroid count for a corpus of `count` vectors: the classic IVF ~√n
    * rule (FAISS's nlist guidance), floored at [[ivfK]]. Fixed k at a
    * growing corpus makes each inverted list — and so every probe — grow
    * LINEARLY with n; √n lists keep list size AND list count balanced at
    * √n, so probe cost grows as √n instead (the same occupancy argument
    * as [[adaptivePlanes]], solved multiplicatively instead of by bit
    * depth).
    */
  def adaptiveIvfK(count: Long): Int =
    math.min(maxIvfK,
      math.max(ivfK, math.round(math.sqrt(count.toDouble)).toInt))

  /** Probe count for a `k`-list quantizer: holds the probed corpus
    * FRACTION at [[ivfProbes]]/[[ivfK]] (the recall-bearing constant) as
    * k grows — finer lists at the same probed fraction strictly improve
    * recall, because the fraction concentrates on lists nearer the query.
    */
  def adaptiveProbes(k: Int): Int =
    math.max(ivfProbes,
      math.ceil(k.toDouble * ivfProbes / ivfK).toInt)

  /** Per-corpus quantizer cache: centroids are a deterministic pure
    * function of the corpus dir (seeded by first-k ids, fixed iteration
    * count), so Lloyd's passes run once per JVM per corpus — re-running
    * them per bench invocation would time index CONSTRUCTION inside every
    * query; at scale the quantizer is built once and persisted with the
    * partitioned corpus (the IVF index file, in FAISS terms).
    */
  private val quantCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Array[Float]], Int)]()

  def quantizerFor(s: SparkSession, d: String, e: DataFrame): (Array[Array[Float]], Int) =
    quantCache.computeIfAbsent(d, _ => {
      val k = adaptiveIvfK(e.count())
      (ivfCentroids(s, e, k), adaptiveProbes(k))
    })

  /** Spherical k-means coarse quantizer for the IVF tier: Lloyd iterations
    * where every data pass is distributed (assignment = argmax of k
    * codegen'd cosines against centroid literals; update = per-dimension
    * mean via posexplode + one combinable groupBy) and only the k×dim
    * centroid table crosses the driver between iterations — the standard
    * k-means-on-Spark shape. Deterministic: seeded by the first k vectors,
    * no randomness.
    */
  def ivfCentroids(s: SparkSession, e: DataFrame,
      targetK: Int = ivfK): Array[Array[Float]] = {
    // seed with the first targetK vectors IN ID ORDER — no assumption
    // that ids are contiguous or start at zero
    var cents: Array[Array[Float]] = e.orderBy("vec_id").limit(targetK).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    require(cents.nonEmpty, "ivfCentroids: empty corpus")
    val k = cents.length // < targetK only for corpora smaller than targetK
    for (_ <- 1 to ivfIters) {
      val assigned = assignClusters(e, cents)
      val updated = assigned
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("cluster", "dim")
        .agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          val v = new Array[Float](cents(0).length)
          rows.foreach(r => v(r.getInt(1)) = r.getDouble(2).toFloat)
          c -> v
        }
      cents = Array.tabulate(k)(c => updated.getOrElse(c, cents(c)))
    }
    cents
  }

  /** Nearest-centroid assignment: k codegen'd cosines per row, argmax via
    * array_position(max) — whole pass stays in codegen.
    */
  def assignClusters(e: DataFrame, cents: Array[Array[Float]]): DataFrame = {
    val cos = array(cents.toIndexedSeq.map(c => VectorOps.cosine(col("embedding"), lit(c))): _*)
    e.withColumn("cluster",
      (array_position(cos, array_max(cos)) - 1).cast("int"))
  }

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

    // IVF tier: probes run against the COMMITTED index (round-6: the
    // quantizer + inverted lists are a durable X99 catalog artifact, not
    // per-JVM state — see IvfIndex). The fixture trains and commits the
    // ~√n adaptive index once; the query is purely index-read + probe +
    // exact rerank, surviving JVM restarts like any lake table. At 100 TB
    // the lists table IS the cluster-partitioned corpus, so a probe
    // reads ivfProbes/k of the data — the classic IVF-flat layout.
    // Non-oracle (recall < 1 by design); recall and candidate-efficiency
    // pinned by SimilaritySpec, index durability by IvfIndexSpec.
    "q_sim_ivf" -> ((s, d) => {
      val root = graft.util.FixtureCache.dir("ivf_index", d) { root =>
        IvfIndex.build(s, embeddings(s, d).select("vec_id", "embedding"),
          root, 20250801, 900)
      }
      val q = embeddings(s, d).where(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      IvfIndex.search(s, root, q, k)
    }),

    // LSH tier: same output shape, candidates restricted to multi-probe
    // buckets. Non-oracle (recall < 1 by design); pinned by SimilaritySpec.
    "q_sim_lsh" -> ((s, d) => {
      val e = embeddings(s, d).select("vec_id", "embedding")
        .withColumn("bucket", bucketOf(col("embedding")))
      val q = e.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          explode(array(
            col("bucket") +:
              (0 until nPlanes).map(j => col("bucket").bitwiseXOR(lit(1 << j))): _*))
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

    // X72: per-label elementwise centroids — class prototypes (the
    // nearest-class-mean classifier, IVF seeding, embedding-drift
    // monitoring). One posexplode → one combinable (label, dim) groupBy:
    // the shuffle carries |labels|·dim rows per map partition, never the
    // corpus. Sums are fixed-point 2⁻³⁰ units (X59's integer-exactness
    // move): float→double widens exactly, ×2³⁰ is an exact exponent
    // shift, floor → BIGINT — so the nondeterministic reduce order can't
    // wiggle the hash and no engine's double↔decimal conversion quirks
    // enter (DECIMAL-of-double rounds via scaled float math in DuckDB).
    // 2⁻³⁰ sits below float's own resolution for |v| ≥ 2⁻⁶, so the
    // quantization is invisible at embedding magnitudes.
    "q_vec_centroid" -> ((s, d) =>
      embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("label", "dim")
        .agg(count(lit(1)).as("n_vecs"),
          sum(floor(col("v").cast("double") * (1L << 30))).as("sum_fp"))
        .select(col("label"), col("dim").cast("long").as("dim"), col("n_vecs"),
          col("sum_fp"),
          (col("sum_fp").cast("double") / lit(1073741824.0) / col("n_vecs"))
            .as("mean_val"))
        .orderBy("label", "dim")),
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
    "q_vec_centroid" ->
      """SELECT label, i.i AS dim, count(*) AS n_vecs,
        |       CAST(sum(CAST(floor(CAST(embedding[i.i + 1] AS DOUBLE) * 1073741824) AS BIGINT)) AS BIGINT) AS sum_fp,
        |       CAST(sum(CAST(floor(CAST(embedding[i.i + 1] AS DOUBLE) * 1073741824) AS BIGINT)) AS DOUBLE)
        |         / 1073741824.0 / count(*) AS mean_val
        |FROM embeddings JOIN range(0, 256) i(i) ON i.i < len(embedding)
        |GROUP BY label, i.i
        |ORDER BY label, dim""".stripMargin,
  )
}
