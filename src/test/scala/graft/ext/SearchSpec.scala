package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** X66 inverted search + X68 LM familiarity — index path ≡ scan path,
  * posting-list invariants, and score monotonicity goldens.
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("index search ≡ corpus-scan search, for single terms and conjunctions") {
    val docs = Tables.documents(spark, sf)
    val index = Search.invertedIndex(docs).cache()
    Seq(Seq("spark"), Search.queryTerms, Seq("spark", "nosuchword")).foreach { q =>
      val viaIndex = Search.searchIndex(index, q).as[Long].collect().toSet
      val viaScan = Search.searchScan(docs, q).as[Long].collect().toSet
      assert(viaIndex == viaScan, s"index/scan disagree for $q")
    }
    index.unpersist()
  }

  test("posting lists are sorted, distinct, and df-consistent") {
    val idx = Search.invertedIndex(Tables.documents(spark, sf))
      .as[(String, Long, Seq[Long])].collect()
    assert(idx.nonEmpty)
    idx.foreach { case (term, df, postings) =>
      assert(postings == postings.sorted, s"unsorted postings for $term")
      assert(postings.distinct == postings, s"duplicate postings for $term")
      assert(df == postings.length, s"df mismatch for $term")
    }
  }

  test("conjunction of an impossible term pair is empty, not an error") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val idx = Search.invertedIndex(docs)
    assert(Search.searchIndex(idx, Seq("alpha", "gamma")).count() == 0)
    assert(Search.searchIndex(idx, Seq("beta")).as[Long].collect().toSet == Set(1L, 2L))
  }

  test("familiarity golden: repeated phrasing scores the ceiling, unique text the floor") {
    // d1+d2 share their single bigram ("a b" twice in the model), d3's is
    // unique: model = {"a b": 2, "x y": 1}, total = 3
    //   d1/d2: fam = 1e6 * 2 / (1 * 3)  = 666666
    //   d3:    fam = 1e6 * 1 / (1 * 3)  = 333333
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "x y")).toDF("doc_id", "text")
    val got = LangModel.familiarity(docs)
      .select("doc_id", "n_bigrams", "sum_cnt", "fam_ppm")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 2L, 666666L), (2L, 1L, 2L, 666666L),
      (3L, 1L, 1L, 333333L)))
  }

  test("familiarity excludes sub-2-token docs and never exceeds 10^6 ppm") {
    val docs = Tables.documents(spark, sf)
    val fam = LangModel.familiarity(docs).cache()
    val n2plus = docs.where(size(TextAnalysis.tokens(col("text"))) >= 2).count()
    assert(fam.count() == n2plus)
    val mx = fam.agg(max("fam_ppm")).head.getLong(0)
    val mn = fam.agg(min("fam_ppm")).head.getLong(0)
    assert(mx <= 1000000L && mn >= 0L)
    fam.unpersist()
  }

  test("X155 DSIR weights: target language scores above every other, around 1000‰") {
    val got = LangModel.queries("q_dsir_weights")(spark, sf)
      .groupBy("lang").agg(avg("importance_permille").as("m"))
      .as[(String, Double)].collect().toMap
    assert(got.contains("en") && got.size >= 2)
    got.filter(_._1 != "en").foreach { case (l, m) =>
      assert(got("en") > m, s"en ${got("en")} not above $l $m")
    }
    // the linear-ratio normalization centers a corpus-typical doc near
    // 1000‰ — a broken normalizer lands an order of magnitude away
    got.values.foreach(m => assert(m > 500 && m < 2000, s"mean $m off-center"))
  }

  test("X155 DSIR weights: vocab-unrolled scoring ≡ hashed scoring, bit-exact") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    val hashed = LangModel.importanceWeights(docs, col("lang") === "en")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val vocab = LangModel.vocabScores(docs,
        LangModel.vocabEstimator(docs, col("lang") === "en"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(hashed == vocab)
  }

  test("X155 DSIR weights: synthetic target skew produces strong separation") {
    import spark.implicits._
    def rep(w: String, n: Int) = Seq.fill(n)(w).mkString(" ")
    // target docs speak "aa bb", raw-only docs speak "cc dd": disjoint
    // bigram mass must push weights far apart (smoothing keeps them finite)
    val docs = ((1 to 8).map(i => (i.toLong, "t", s"${rep("aa bb", 6)}")) ++
      (9 to 16).map(i => (i.toLong, "r", s"${rep("cc dd", 6)}")))
      .toDF("doc_id", "lang", "text")
    val w = LangModel.importanceWeights(docs, col("lang") === "t")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .groupBy("lang").agg(avg("importance_permille").as("m"))
      .as[(String, Double)].collect().toMap
    assert(w("t") > 3 * w("r"), s"no separation: $w")
  }

  test("source cap keeps at most the cap per source, deterministically") {
    val q = Scrub.queries("q_source_cap")(spark, sf)
    val rows = q.select("source", "n_docs", "n_kept")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, kept) =>
      assert(kept == math.min(n, 15L), s"$src: kept=$kept of n=$n")
    }
    // determinism: identical sums of kept ids across independent runs
    val a = Scrub.queries("q_source_cap")(spark, sf).select("sum_kept_ids").as[Long].collect().toSeq
    val b = Scrub.queries("q_source_cap")(spark, sf).select("sum_kept_ids").as[Long].collect().toSeq
    assert(a == b)
  }
}
