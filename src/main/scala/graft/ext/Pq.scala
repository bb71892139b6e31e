package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** X177: Product quantization — the compressed-ANN tier (IVF-PQ's PQ
  * half; Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 — public method). The corpus embedding splits
  * into `m` subspaces, each trained to a tiny per-subspace codebook by
  * the SAME bit-reproducible fixed-point Lloyd's iteration X111 uses
  * (quantized ×10⁴ integer arithmetic, deterministic first-k-ids init,
  * floor-division centroid updates, lowest-cid tie-break), and every
  * vector encodes to `m` BYTES — 4·dim/m× compression (the fixture's
  * 64-dim float → 16 bytes = 16×; coarser m trades recall for ratio). At 100 TB that compression IS the operator: the
  * candidate scan reads code bytes instead of raw vectors, so the
  * rerank set fits in memory where the raw corpus never would, and the
  * codes table shuffles/broadcasts at 1/32 the bytes.
  *
  * Search is asymmetric (ADC): the UNQUANTIZED query scores against each
  * candidate's RECONSTRUCTION (its codebook centroids), as a cosine so
  * recall is measured against the exact cosine ground truth q_sim_topk
  * defines — the only error source is quantization. Everything is
  * codegen'd column expressions over codebook LITERALS (the X111
  * expression-literal tier: k=16 per subspace is curation-scale); no
  * UDF, no shuffle in encode, one broadcast in search.
  *
  * Like the LSH/IVF tiers this is no-oracle-by-design (recall < 1);
  * PqSpec pins determinism, code-domain, compression, reconstruction
  * quality, and the recall floor against the exact oracle.
  */
object Pq {
  type Q = (SparkSession, String) => DataFrame

  import KMeans.quantize

  /** subspaces × centroids-per-subspace for the embeddings fixture:
    * 64-dim → 16 sub-vectors of 4 dims, 16 centroids each → 16-byte
    * codes; measured recall@5 vs the exact tier: 0.50 codes-only, 0.85
    * with the 8k-shortlist exact rerank (PqSpec pins the floor).
    */
  val M = 16
  val K = 16
  val Iters = 3

  /** Train per-subspace codebooks: `[m][k][dim/m]` fixed-point centroids.
    * One Spark pass per iteration for ALL subspaces: the assign step IS
    * the native [[graft.functions.PqEncode]] kernel over the current
    * codebooks (one codegen'd call per row), then one posexplode + one
    * combinable groupBy of m·k·subdim partial rows.
    */
  def train(df: DataFrame, idCol: String, vecCol: String,
      m: Int = M, kk: Int = K, iters: Int = Iters): Array[Array[Array[Long]]] = {
    val q = df.withColumn("__v", quantize(col(vecCol)))
    val dim = q.select(size(col("__v"))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by $m subspaces")
    val sd = dim / m
    val seed = q.orderBy(idCol).limit(kk).select("__v").collect()
      .map(_.getSeq[Long](0))
    require(seed.length == kk, s"need at least $kk vectors, got ${seed.length}")
    var books: Array[Array[Array[Long]]] = Array.tabulate(m)(i =>
      Array.tabulate(kk)(c => seed(c).slice(i * sd, i * sd + sd).toArray))
    for (_ <- 1 to iters) {
      val rows = q
        .select(encodeCol(books, col(vecCol)).as("codes"),
          posexplode(col("__v")).as(Seq("gpos", "el")))
        .select((col("gpos") / sd).cast("int").as("sub"),
          element_at(col("codes"), (col("gpos") / sd).cast("int") + 1)
            .cast("int").as("cluster"),
          (col("gpos") % sd).as("pos"), col("el"))
        .groupBy("sub", "cluster", "pos")
        .agg(sum("el").as("s"), count(lit(1)).as("n"))
        .collect() // m·k·subdim rows — driver-sized by construction
        .groupBy(r => (r.getInt(0), r.getInt(1)))
      books = Array.tabulate(m)(i => Array.tabulate(kk)(c =>
        rows.get((i, c)).map { rs =>
          rs.sortBy(_.getInt(2))
            .map(r => math.floor(r.getLong(3).toDouble / r.getLong(4)).toLong)
            .toArray
        }.getOrElse(books(i)(c)))) // emptied cluster keeps its centroid
    }
    books
  }

  /** `array<tinyint>` of length m — the PQ code. The native codegen'd
    * kernel ([[graft.functions.PqEncode]]): one static call per row, the
    * codebooks ride as a plan reference object, no UDF, no shuffle. (The
    * HOF formulation was CodegenFallback — interpreted per element — and
    * ~10× slower; see PqOps.)
    */
  def encodeCol(books: Array[Array[Array[Long]]], vec: Column): Column =
    org.apache.spark.sql.GraftShim.column(graft.functions.PqEncode(
      org.apache.spark.sql.GraftShim.expression(vec), books))

  /** Asymmetric cosine: the raw query against the code's RECONSTRUCTION,
    * fixed-point longs inside (exact, order-independent), divided out in
    * double — the native [[graft.functions.PqAdcCosine]] kernel.
    */
  def adcCosineCol(books: Array[Array[Array[Long]]], qvec: Column,
      codes: Column): Column =
    org.apache.spark.sql.GraftShim.column(graft.functions.PqAdcCosine(
      org.apache.spark.sql.GraftShim.expression(qvec),
      org.apache.spark.sql.GraftShim.expression(codes), books))

  /** Top-k PQ search in the q_sim_topk output shape (qid, cand_id, cos6,
    * rank): the COMPRESSED scan shortlists `shortlist·k` candidates by
    * ADC score, then only the shortlist's RAW vectors are fetched for an
    * exact-cosine rerank — the classic PQ pipeline (Jégou §V). At scale
    * the full corpus is touched only through its m-byte codes; the raw
    * reads are shortlist-sized point lookups. Rounded scores + id
    * tie-breaks keep both stages reproducible.
    */
  def search(corpus: DataFrame, queries: DataFrame,
      books: Array[Array[Array[Long]]], k: Int, shortlist: Int = 8): DataFrame = {
    val codes = corpus.select(col("vec_id"),
      encodeCol(books, col("embedding")).as("codes"))
    val wAdc = Window.partitionBy("qid").orderBy(col("adc6").desc, col("cand_id").asc)
    val short = codes.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qe"), col("vec_id").as("cand_id"),
        round(adcCosineCol(books, col("qe"), col("codes")), 6).as("adc6"))
      .withColumn("r", row_number().over(wAdc))
      .where(col("r") <= k * shortlist)
    val w = Window.partitionBy("qid").orderBy(col("cos6").desc, col("cand_id").asc)
    short.join(corpus.withColumnRenamed("vec_id", "cand_id"), "cand_id")
      .select(col("qid"), col("cand_id"),
        round(graft.functions.VectorOps.cosine(col("embedding"), col("qe")), 6).as("cos6"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .orderBy("qid", "rank")
  }

  /** Trained codebooks memoized per sfDir — training is deterministic
    * (bit-reproducible, PqSpec-pinned), so this is the FixtureCache rule
    * applied to a driver-side artifact: the bench times the ENCODE+SEARCH
    * plan, not a per-repeat retrain of an identical codebook. The live
    * training cost is published in BASELINE.md like every other memoized
    * fixture build.
    */
  private val bookCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Long]]]]()

  def trainedBooks(s: SparkSession, d: String): Array[Array[Array[Long]]] =
    bookCache.computeIfAbsent(d, _ =>
      train(Tables.embeddings(s, d).select("vec_id", "embedding"),
        "vec_id", "embedding"))

  val queries: Map[String, Q] = Map(
    // PQ tier: train → encode (16-byte codes) → ADC shortlist → exact
    // rerank. Same output
    // shape as q_sim_topk/q_sim_lsh/q_sim_ivf; non-oracle by design
    // (recall < 1); PqSpec pins recall, determinism, compression.
    "q_sim_pq" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select("vec_id", "embedding")
      val books = trainedBooks(s, d)
      val q = Tables.embeddings(s, d).where(col("vec_id") < Similarity.nQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      search(e, q, books, Similarity.k)
    }),
  )

  val oracles: Map[String, String] = Map.empty
}
