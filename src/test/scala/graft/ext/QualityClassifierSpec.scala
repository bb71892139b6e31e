package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X201 — integer-exact token-vote quality classifier: votes are the
  * sign of the smoothed unigram log-odds, computed by hand here for a
  * toy corpus so the model (pruning, smoothing, cross-multiplication,
  * per-doc majority) is pinned token by token, not just in aggregate.
  */
class QualityClassifierSpec extends SparkSpec {

  import spark.implicits._

  // curated (pos): "good good clean", "good clean text"
  // raw    (neg):  "spam spam spam",  "spam text text"
  private lazy val docs = Seq(
    (1L, "good good clean", "cur"), (2L, "good clean text", "cur"),
    (3L, "spam spam spam", "raw"), (4L, "spam text text", "raw"))
    .toDF("doc_id", "text", "source")

  test("votes are the exact smoothed log-odds sign over the pruned vocabulary") {
    // counts: good(3,0) clean(2,0) spam(0,4) text(1,2); all ≥ minCount=3
    // except clean(2) — pruned. T_pos=4, T_neg=6 over pruned vocab, V=3.
    // vote(t) = (c_pos+1)(T_neg+V) > (c_neg+1)(T_pos+V) = 9(c_pos+1) > 7(c_neg+1)
    //   good: 9·4=36 > 7·1=7   → pos
    //   spam: 9·1=9  > 7·5=35  → neg
    //   text: 9·2=18 > 7·3=21  → neg
    val votes = QualityClassifier.trainVotes(docs, col("source") === "cur")
      .as[(String, Boolean)].collect().toMap
    assert(votes === Map("good" -> true, "spam" -> false, "text" -> false))
  }

  test("per-doc majority with ties passing; pruned tokens cast no vote") {
    val votes = QualityClassifier.trainVotes(docs, col("source") === "cur")
    val scored = QualityClassifier.score(docs, votes)
      .select("doc_id", "n_votes", "n_pos", "pass")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // doc1: good good (clean pruned) → 2/2 pos, pass
    assert(scored(1L) === ((1L, 2L, 2L, true)))
    // doc2: good text → 1/2 pos, tie passes
    assert(scored(2L) === ((2L, 2L, 1L, true)))
    // doc3: spam spam spam → 0/3, fail
    assert(scored(3L) === ((3L, 3L, 0L, false)))
    // doc4: spam text text → 0/3, fail
    assert(scored(4L) === ((4L, 3L, 0L, false)))
  }

  test("scoring broadcasts the vocabulary-sized vote table (no corpus shuffle join)") {
    val votes = QualityClassifier.trainVotes(docs, col("source") === "cur")
    val plan = QualityClassifier.score(docs, votes)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vote join must broadcast:\n$plan")
  }

  test("X234 calibration: bins conserve the serve half, gold labels genuinely mixed, masses bounded") {
    val rows = QualityClassifier.queries("q_quality_calibration")(spark, sf).collect()
    assert(rows.nonEmpty)
    val serveN = graft.sources.Tables.documents(spark, sf)
      .where(org.apache.spark.sql.functions.expr("(doc_id div 2) % 2 = 1")).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == serveN,
      "every served doc lands in exactly one bin")
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= -1 && bin <= 9)
      assert(r.getAs[Long]("n_gold_pos") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("sum_pos") <= r.getAs[Long]("sum_votes"))
      // bin membership is consistent with its score range: a bin-k doc
      // has n_pos·10 div n_votes ≥ k (k ≤ 9), so the bin's total score
      // mass can't sit entirely below the bin floor
      if (bin >= 1) assert(r.getAs[Long]("sum_pos") * 10 >=
        r.getAs[Long]("sum_votes") * bin - 9 * r.getAs[Long]("n_docs") * 10,
        r.toString)
    }
    // the gold column must carry BOTH labels or the reliability read is
    // degenerate (the round-10 fixture trap: doc parity ⟺ source parity)
    val gold = rows.map(_.getAs[Long]("n_gold_pos")).sum
    assert(gold > 0 && gold < serveN, s"gold labels degenerate: $gold/$serveN")
  }
}
