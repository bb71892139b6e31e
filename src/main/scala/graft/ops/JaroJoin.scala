package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.StringSim
import graft.sources.Tables

/** Jaro–Winkler similarity self-join (X79) — name-variant pairing above a
  * similarity threshold, the record-linkage join the reference's Apify
  * profiles would need to reconcile display-name drift across snapshots
  * (`scripts/script_api_apify_to_spark.py:160-176` keys rows on handle
  * only; two crawls of the same person under "J. Smith" / "J Smith"
  * never reconcile there).
  *
  * Unlike X65's edit-distance-1 join, Jaro–Winkler admits NO lossless
  * equi-key blocking (a high-JW pair need not share any q-gram — e.g.
  * transposed short strings), so candidate generation uses the one bound
  * that IS sound: length. For `jw ≥ τ` with max prefix boost,
  * `j ≥ (τ - 0.4) / 0.6`, and the Jaro upper bound
  * `j ≤ (2 + min/max) / 3` forces `min/max ≥ 3j - 2`; at `τ ≥ 0.9` that
  * is `max ≤ 2·min`, so both strings land within one `⌊log₂ len⌋` bucket
  * of each other. One side keys on its bucket, the other explodes to
  * `{b-1, b, b+1}` — a plain hash equi-join whose candidates the
  * codegen'd [[graft.functions.JaroWinklerSim]] then refines in-scan.
  * Each pair meets in exactly one bucket (the left side emits one key),
  * so no dedup pass is needed.
  *
  * Scale shape: the corpus shuffles once, keyed on a length bucket;
  * within-bucket cost is quadratic per bucket, which is the honest cost
  * of a metric with no sound equi-blocking — for corpus-scale near-dup
  * the right tool is E2/X65 candidate generation with
  * [[StringSim.jaroWinkler]] applied directly as the refine scorer.
  * JaroJoinSpec pins losslessness (blocked == brute force) on
  * variable-length random strings.
  */
object JaroJoin {

  /** `⌊log₂(length)⌋` bucket — the sound blocking key for τ ≥ 0.9. */
  private def bucket(s: Column): Column =
    floor(log(2.0, greatest(length(s), lit(1)))).cast("int")

  /** All pairs `(left.idCol, right.idCol)` with
    * `jaro_winkler(a_str, b_str) ≥ tau`, as
    * `(a_id, b_id, a_str, b_str, jw)`. `selfJoin=true` keeps only
    * `a_id < b_id`. Requires `tau ≥ 0.9` — below that the length bound
    * is not lossless (see scaladoc) and the caller should generate
    * candidates with X65/E2 and refine with [[StringSim.jaroWinkler]].
    */
  def join(left: DataFrame, right: DataFrame, idCol: String, strCol: String,
      tau: Double, selfJoin: Boolean = false): DataFrame = {
    require(tau >= 0.9, s"length-band blocking is only lossless for tau >= 0.9 (got $tau)")
    val a = left.select(col(idCol).as("a_id"), col(strCol).as("a_str"),
      bucket(col(strCol)).as("bkt"))
    val b = right.select(col(idCol).as("b_id"), col(strCol).as("b_str"),
      explode(array(bucket(col(strCol)) - 1, bucket(col(strCol)),
        bucket(col(strCol)) + 1)).as("bkt"))
    val pairFilter: Column =
      if (selfJoin) col("a_id") < col("b_id") else lit(true)
    a.join(b, Seq("bkt"))
      .where(pairFilter)
      .withColumn("jw", StringSim.jaroWinkler(col("a_str"), col("b_str")))
      .where(col("jw") >= tau)
      .select("a_id", "b_id", "a_str", "b_str", "jw")
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Supplier-name self-join at τ=0.97: numeric-suffix variants under
    // the shared "Supplier#" prefix — transpositions and substitutions
    // in the digit tail, exactly the regime Winkler's prefix boost
    // weights. The oracle is the naive quadratic jaro_winkler cross
    // join — blocking must be invisible.
    "q_jaro_join" -> ((s, d) => {
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_name")
      join(sup, sup, "s_suppkey", "s_name", tau = 0.97, selfJoin = true)
        .select(col("a_id").cast("long").as("a_id"),
          col("b_id").cast("long").as("b_id"),
          round(col("jw"), 6).as("jw6"))
        .orderBy("a_id", "b_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_jaro_join" ->
      """SELECT a.s_suppkey AS a_id, b.s_suppkey AS b_id,
        |       round(jaro_winkler_similarity(a.s_name, b.s_name), 6) AS jw6
        |FROM supplier a JOIN supplier b
        |  ON a.s_suppkey < b.s_suppkey
        | AND jaro_winkler_similarity(a.s_name, b.s_name) >= 0.97
        |ORDER BY a_id, b_id""".stripMargin,
  )
}
