package graft.ext

import graft.SparkSpec

/** X111 fixed-point k-means: hand-computed Lloyd's rounds, lowest-cid
  * tie-break, and the emptied-cluster keep-old rule.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def run(vecs: Seq[(Long, Seq[Float])], k: Int, iters: Int): Map[Long, Int] =
    KMeans.kmeans(vecs.toDF("id", "vec"), "id", "vec", k, iters)
      .select("id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("one hand-computed round: update moves the boundary") {
    // quantized: 0, 1000, 10000, 11000; init c0=[0], c1=[1000].
    // round 1 assign: {0}->c0, {1,2,3}->c1 (2: 1e8 vs 81e6); update:
    // c0=[0], c1=[floor(22000/3)]=[7333]. final assign: 1 flips to c0
    // (1e6 < (1000-7333)^2=40.1e6); 2,3 stay c1.
    val got = run(Seq(
      0L -> Seq(0.0f), 1L -> Seq(0.1f), 2L -> Seq(1.0f), 3L -> Seq(1.1f)), 2, 1)
    assert(got == Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("equidistant vectors break ties to the lowest centroid id") {
    // init c0=[0], c1=[10]; v2=[5] is 25 from both -> cluster 0.
    val got = run(Seq(
      0L -> Seq(0.0f), 1L -> Seq(0.001f), 2L -> Seq(0.0005f)), 2, 0)
    assert(got(2L) == 0)
  }

  test("a cluster that empties keeps its previous centroid") {
    // duplicate init vectors: everything ties to c0, c1 empties in round
    // 1 and must keep [0] rather than crash or divide by zero.
    val got = run(Seq(
      0L -> Seq(0.0f), 1L -> Seq(0.0f), 2L -> Seq(0.0f)), 2, 2)
    assert(got.values.forall(_ == 0))
  }

  test("fewer vectors than k is refused") {
    intercept[IllegalArgumentException](run(Seq(0L -> Seq(0.0f)), 2, 1))
  }
}
