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
  * single-key blocking (a high-JW pair need not share any positional
  * q-gram — e.g. transposed short strings), so candidate generation
  * conjoins the two bounds that ARE sound:
  *
  *  - LENGTH. For `jw ≥ τ` with max prefix boost, `j ≥ (τ - 0.4) / 0.6`,
  *    and the Jaro upper bound `j ≤ (2 + min/max) / 3` forces
  *    `min/max ≥ 3j - 2`; at `τ ≥ 0.9` that is `max ≤ 2·min`, so both
  *    strings land within one `⌊log₂ len⌋` bucket of each other (one
  *    side keys on its bucket, the other explodes to `{b-1, b, b+1}`).
  *  - CHARACTER PREFIX FILTERING (the ppjoin/AllPairs principle). The
  *    same Jaro bound gives `m ≥ ⌈(3j₀-2)·l⌉ = ⌈(5τ-4)·l⌉` window-
  *    constrained character matches for EACH length `l`, and window
  *    matches are a sub-multiset of the plain character-multiset
  *    intersection — so under ANY common total order of characters, the
  *    two strings' sorted-character prefixes of length `l - m + 1` must
  *    share a character. Ordering by ASCENDING CORPUS FREQUENCY (one
  *    alphabet-sized aggregate, broadcast as a literal map) makes those
  *    prefixes each string's RAREST characters — which is what actually
  *    prunes: near-identical corpora segregate on their rare
  *    distinguishing characters where positional schemes (shared
  *    prefixes, uniform lengths) degenerate to all-pairs.
  *
  * Candidates = pairs agreeing on the length band AND sharing a prefix
  * character; the codegen'd [[graft.functions.JaroWinklerSim]] refines
  * in-scan after a pair-level dedup (a pair can share several rare
  * characters). All candidate generation is pure built-in expressions —
  * rank-encode each character via a literal map, `array_sort`, `slice`,
  * explode — no UDF.
  *
  * Scale shape: the corpus shuffles once, keyed on (band, rare char);
  * candidate cost tracks how concentrated the corpus is on its rare
  * characters — the honest residual for a metric with no exact
  * equi-blocking; for corpus-scale near-dup, E2/X65 candidate generation
  * with [[StringSim.jaroWinkler]] as the refine scorer remains the
  * recall-traded alternative. JaroJoinSpec pins losslessness
  * (blocked == brute force) on variable-length random strings.
  */
object JaroJoin {

  /** `⌊log₂(length)⌋` bucket — the sound length blocking key for τ ≥ 0.9. */
  private def bucket(s: Column): Column =
    floor(log(2.0, greatest(length(s), lit(1)))).cast("int")

  /** Rarest-character prefix keys of `s` under the corpus frequency
    * order `rankOf` (char → fixed-width rank string): rank-encode each
    * character, sort, keep the first `l - ⌈(5τ-4)·l⌉ + 1`, decode back
    * to the distinct characters. Pure built-in expressions.
    */
  private def prefixKeys(s: Column, rankOf: Column, tau: Double): Column = {
    val chars = filter(split(s, ""), c => length(c) > 0)
    val encoded = array_sort(transform(chars, c => concat(element_at(rankOf, c), c)))
    val pLen = (size(chars) - ceil(size(chars) * lit(5 * tau - 4)) + 1).cast("int")
    array_distinct(transform(slice(encoded, lit(1), greatest(pLen, lit(1))),
      e => substring(e, 5, 10)))
  }

  /** Corpus character→rank literal map (rank ascending by frequency,
    * char as tie-break; 4-digit zero-padded so rank strings sort like
    * the numbers). Alphabet-sized driver traffic.
    */
  private def charRanks(strs: DataFrame): Column = {
    val freqs = strs.select(explode(filter(split(col("s"), ""), c => length(c) > 0)).as("c"))
      .groupBy("c").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[String]("c"), r.getAs[Long]("n")))
      .sortBy { case (c, n) => (n, c) }
    map(freqs.zipWithIndex.flatMap { case ((c, _), i) =>
      Seq(lit(c), lit(f"$i%04d"))
    }.toIndexedSeq: _*)
  }

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
    val corpus =
      if (selfJoin || (left eq right)) left.select(col(strCol).as("s"))
      else left.select(col(strCol).as("s")).unionByName(right.select(col(strCol).as("s")))
    val rankOf = charRanks(corpus)
    val a = left.select(col(idCol).as("a_id"), col(strCol).as("a_str"),
      bucket(col(strCol)).as("bkt"),
      explode(prefixKeys(col(strCol), rankOf, tau)).as("pk"))
    val b = right.select(col(idCol).as("b_id"), col(strCol).as("b_str"),
      explode(array(bucket(col(strCol)) - 1, bucket(col(strCol)),
        bucket(col(strCol)) + 1)).as("bkt"),
      col(strCol).as("b_str2"))
      .select(col("b_id"), col("b_str"), col("bkt"),
        explode(prefixKeys(col("b_str2"), rankOf, tau)).as("pk"))
    val pairFilter: Column =
      if (selfJoin) col("a_id") < col("b_id") else lit(true)
    // Refine INLINE in the join output: a candidate pair can meet on 2-3
    // shared rare characters, but re-evaluating the codegen'd expression
    // per duplicate is far cheaper than shuffling the full candidate
    // multiset through a pair-level dedup — so dedup runs over the
    // SURVIVORS (≈ true-pair-sized), not the candidates.
    a.join(b, Seq("bkt", "pk"))
      .where(pairFilter)
      .withColumn("jw", StringSim.jaroWinkler(col("a_str"), col("b_str")))
      .where(col("jw") >= tau)
      .dropDuplicates("a_id", "b_id")
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
