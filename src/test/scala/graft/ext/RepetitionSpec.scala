package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** X52 repetition metrics + X53 decontamination: hand-computed goldens,
  * short-doc guards, and the broadcast-join plan pin.
  */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("ngrams: empty below n, sliding windows at/above n") {
    val out = docs(1L -> "a b c d", 2L -> "a b", 3L -> "a")
      .select($"doc_id", Repetition.ngrams(TextAnalysis.tokens($"text"), 3).as("ngs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L) == Seq.empty)
    assert(out(3L) == Seq.empty)
  }

  test("metrics golden: 'a a b' and an all-repeats doc") {
    val m = Repetition.metrics(docs(1L -> "a a b", 2L -> "x x x x"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    val r1 = m(1L)
    assert(r1.getAs[Long]("n_tokens") == 3L)
    assert(r1.getAs[Double]("dup_word_frac") == 1.0 / 3.0)
    // 2-grams: "a a", "a b" — both distinct.
    assert(r1.getAs[Double]("dup_2gram_frac") == 0.0)
    assert(r1.getAs[Double]("top_word_frac") == 2.0 / 3.0)
    assert(!r1.getAs[Boolean]("repetition_ok")) // top_word 0.67 > 0.2

    val r2 = m(2L)
    assert(r2.getAs[Double]("dup_word_frac") == 3.0 / 4.0)
    assert(r2.getAs[Double]("dup_2gram_frac") == 2.0 / 3.0)
    assert(r2.getAs[Double]("top_word_frac") == 1.0)
    assert(!r2.getAs[Boolean]("repetition_ok"))
  }

  test("metrics: fully distinct doc passes the gate; empty docs dropped") {
    val out = Repetition.metrics(docs(1L -> "v w x y z", 2L -> "   "))
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Boolean]("repetition_ok"))
    assert(out.head.getAs[Double]("dup_word_frac") == 0.0)
  }

  test("decontamination golden: only the doc sharing a 4-gram is flagged") {
    val eval = docs(100L -> "p q r s t")
    val train = docs(
      1L -> "z z p q r s w",  // contains eval 4-gram "p q r s"
      2L -> "p q r x s t u",  // shares only shorter overlaps
      3L -> "a b c")          // < 4 tokens → excluded entirely
    val out = Decontam.contamination(train, eval)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L).getAs[Long]("n_overlap") == 1L)
    assert(out(1L).getAs[Boolean]("contaminated"))
    assert(out(2L).getAs[Long]("n_overlap") == 0L)
    assert(!out(2L).getAs[Boolean]("contaminated"))
    assert(out(2L).getAs[Long]("n_ngrams") == 4L)
  }

  test("decontamination: repeated hits in one doc each count once per distinct n-gram") {
    val eval = docs(100L -> "p q r s")
    // Train doc contains "p q r s" twice but it is ONE distinct 4-gram;
    // the wrap-around grams ("q r s x", "s x p q", …) miss the eval set.
    val out = Decontam.contamination(docs(1L -> "p q r s x p q r s"), eval).collect()
    assert(out.head.getAs[Long]("n_overlap") == 1L)
    assert(out.head.getAs[Long]("n_ngrams") == 5L)
  }

  test("plan pin: eval n-gram set is broadcast — train side never shuffles for the join") {
    val docs01 = graft.sources.Tables.documents(spark, sf)
    val plan = Decontam.contamination(
      docs01.where($"doc_id" % 97 =!= 0), docs01.where($"doc_id" % 97 === 0))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
