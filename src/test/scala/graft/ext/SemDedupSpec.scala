package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X191 — SemDeDup. Pins: exact-scaled copies (cosine 1) drop while
  * distinct directions survive, the survivor is the lowest id, dedup is
  * CLUSTER-SCOPED (a same-direction pair split across clusters is NOT
  * deduped — the documented SemDeDup trade), and the candidate join is
  * the cluster equi-join, never a cartesian.
  */
class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  private def quantized(rows: Seq[(Long, Seq[Double], Int)]) =
    rows.toDF("vec_id", "emb", "cluster")
      .withColumn("__v", KMeans.quantize(col("emb"))).drop("emb")

  test("scaled copies drop, lowest id survives, distinct directions stay") {
    val assigned = quantized(Seq(
      (1L, Seq(0.5, 0.1, 0.0), 0), // survivor (lowest id of the dup set)
      (2L, Seq(0.51, 0.102, 0.0), 0), // ~same direction -> drops
      (3L, Seq(1.0, 0.2, 0.0), 0), // exact 2x of id 1 -> drops
      (4L, Seq(0.0, 0.0, 0.9), 0), // orthogonal -> survives
      (5L, Seq(-0.5, 0.4, 0.1), 0))) // distinct -> survives
    val kept = SemDedup.semdedup(assigned, "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L))
  }

  test("dedup is cluster-scoped: identical directions in different clusters both survive") {
    val assigned = quantized(Seq(
      (1L, Seq(0.5, 0.5, 0.0), 0),
      (2L, Seq(0.5, 0.5, 0.0), 1))) // same direction, other cluster
    val kept = SemDedup.semdedup(assigned, "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L))
  }

  test("the candidate join is the cluster equi-join, never a cartesian") {
    val assigned = quantized(Seq((1L, Seq(0.1, 0.2, 0.3), 0),
      (2L, Seq(0.3, 0.2, 0.1), 1)))
    val plan = SemDedup.semdedup(assigned, "vec_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
  }
}
