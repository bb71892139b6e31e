package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X190 — priority sampling. Pins: determinism, exact sample size, the
  * DLT threshold contract (every sampled priority ≥ τ, estimates =
  * max(w, τ) ≥ w), the ≤ n corpus degenerate case (everything sampled,
  * estimates exact), weight-proportional pull (heavy rows oversampled
  * vs uniform), and estimator sanity (the total-weight estimate from
  * the sample lands within a loose factor of the true total — the
  * unbiasedness property at one draw).
  */
class WeightedSampleSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = (1 to 2000)
    .map(i => (i.toLong, if (i % 100 == 0) 1000.0 else 1.0))
    .toDF("doc_id", "w")

  test("deterministic: two invocations draw the identical sample") {
    val a = WeightedSample.prioritySample(corpus, "w", "doc_id", 50)
      .orderBy("doc_id").collect().toSeq
    val b = WeightedSample.prioritySample(corpus, "w", "doc_id", 50)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.size == 50)
  }

  test("heavy rows dominate the sample; estimates honor the DLT contract") {
    val got = WeightedSample.prioritySample(corpus, "w", "doc_id", 50)
    val rows = got.collect()
    // 20 rows carry weight 1000 vs 1980 rows of weight 1: the heavy
    // rows are ~91% of the mass, so nearly all must be drawn
    val heavy = rows.count(_.getAs[Double]("w") == 1000.0)
    assert(heavy >= 18, s"only $heavy heavy rows sampled")
    // estimates never under-shoot the true weight
    assert(rows.forall(r => r.getAs[Double]("w_est") >= r.getAs[Double]("w")))
    // total-weight estimate within a loose factor of truth (DLT
    // unbiasedness, one draw): truth = 20*1000 + 1980 = 21980
    val est = rows.map(_.getAs[Double]("w_est")).sum
    assert(est > 21980 * 0.5 && est < 21980 * 2.0, s"estimate $est")
  }

  test("corpus smaller than n: everything sampled, estimates exact") {
    val tiny = (1 to 7).map(i => (i.toLong, i.toDouble)).toDF("doc_id", "w")
    val got = WeightedSample.prioritySample(tiny, "w", "doc_id", 50)
      .orderBy("doc_id").collect()
    assert(got.length == 7)
    assert(got.forall(r => r.getAs[Double]("w_est") == r.getAs[Double]("w")))
  }

  test("the sample plan is TakeOrdered, not a global sort") {
    val plan = WeightedSample.prioritySample(corpus, "w", "doc_id", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }
}
