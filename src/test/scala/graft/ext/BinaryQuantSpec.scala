package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X205 — binary (sign) quantization + exact Hamming search. */
class BinaryQuantSpec extends SparkSpec {

  import spark.implicits._

  test("signPack packs dimension i into bit i%64 of word i/64, exact bits") {
    // 5-dim toy: signs (+,-,+,0,+) → bits 0,2,4 set → word 0 = 0b10101
    val packed = Seq((1L, Seq(0.5f, -0.5f, 1.0f, 0.0f, 2.0f)))
      .toDF("vec_id", "embedding")
      .select(BinaryQuant.signPack("embedding").as("bits"))
      .as[Seq[Long]].head()
    assert(packed === Seq(21L), s"got $packed")
    // 130 dims → 3 words; dim 64 → word 1 bit 0, dim 129 → word 2 bit 1
    val e130 = (0 until 130).map(i =>
      if (i == 64 || i == 129 || i == 0) 1.0f else -1.0f)
    val p130 = Seq((1L, e130)).toDF("vec_id", "embedding")
      .select(BinaryQuant.signPack("embedding").as("bits"))
      .as[Seq[Long]].head()
    assert(p130 === Seq(1L, 1L, 2L), s"got $p130")
  }

  test("hamming equals the direct sign-mismatch count; 64 dims pack to one word (32x)") {
    val a = (0 until 64).map(i => if (i % 3 == 0) 1.0f else -1.0f)
    val b = (0 until 64).map(i => if (i % 5 == 0) 1.0f else -1.0f)
    val expected = (0 until 64).count(i => (i % 3 == 0) != (i % 5 == 0))
    val df = Seq((a, b)).toDF("ea", "eb")
      .select(BinaryQuant.signPack("ea").as("ba"), BinaryQuant.signPack("eb").as("bb"))
    assert(df.select(size(col("ba"))).head.getInt(0) === 1, "64 dims = 1 word")
    assert(df.select(BinaryQuant.hamming(col("ba"), col("bb"))).head.getLong(0)
      === expected.toLong)
  }

  test("pack + search are codegen'd builtins — no UDF in the plan") {
    val d = "/root/testdata/sf0.001"
    val plan = graft.SparkEntry.queries("q_sim_hamming")(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEval"), plan.take(600))
  }

  test("shortlist+rerank recall@5 vs the exact cosine tier clears the floor") {
    val d = "/root/testdata/sf0.001"
    def toSets(rows: Array[(Long, Long)]): Map[Long, Set[Long]] =
      rows.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = toSets(graft.SparkEntry.queries("q_sim_topk")(spark, d)
      .select("qid", "cand_id").as[(Long, Long)].collect())
    val hamOnly = toSets(graft.SparkEntry.queries("q_sim_hamming")(spark, d)
      .select("qid", "cand_id").as[(Long, Long)].collect())
    val e = graft.sources.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"),
        BinaryQuant.signPack("embedding").as("bits"))
    val q = e.where(col("vec_id") < Similarity.nQueries)
      .select(col("vec_id").as("qid"), col("bits").as("qbits"),
        col("embedding").as("qe"))
    // shortlist ~30% of the corpus, rerank exactly — raw reads stay
    // shortlist-sized (the PQ ADC→rerank shape at 1 bit/dim)
    val n = e.count().toInt
    val rer = toSets(BinaryQuant.searchRerank(e, q, Similarity.k, n * 3 / 10)
      .select("qid", "cand_id").as[(Long, Long)].collect())
    def recall(got: Map[Long, Set[Long]]): Double = {
      val r = exact.keys.toSeq.map(x =>
        (exact(x) intersect got.getOrElse(x, Set.empty)).size.toDouble / exact(x).size)
      r.sum / r.size
    }
    info(f"pure-hamming recall@5 = ${recall(hamOnly)}%.3f (the honest 1-bit number)")
    val rr = recall(rer)
    info(f"shortlist(30%%)+rerank recall@5 = $rr%.3f")
    // 1 bit/dim is the coarsest tier; with a 30% shortlist the rerank
    // recovers the exact answer here (measured 1.000; pure Hamming
    // 0.175) — the floor sits deliberately under the measured value to
    // absorb corpus regeneration
    assert(rr >= 0.6, f"rerank recall $rr%.3f under the binary-tier floor")
  }
}
