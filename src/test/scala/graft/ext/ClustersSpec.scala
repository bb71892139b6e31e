package graft.ext

import graft.SparkSpec

/** X34: hash-min connected components — golden graphs and a propagation
  * depth case.
  */
class ClustersSpec extends SparkSpec {

  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(spark, edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two components: a path and a triangle, each labeled by its min node") {
    val got = cc(Seq((5L, 3L), (3L, 9L), // path 5-3-9 → min 3
      (20L, 21L), (21L, 22L), (22L, 20L))) // triangle → min 20
    assert(got == Map(5L -> 3L, 3L -> 3L, 9L -> 3L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("min label propagates along a long path (depth > 1 per round)") {
    // path 10-9-8-...-0: every node must end at 0, which requires the
    // label to travel the full diameter
    val edges = (0L until 10L).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L to 10L).toSet)
  }

  test("isolated nodes (no edges) are not labeled; self-loops are harmless") {
    val got = cc(Seq((1L, 1L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }
}
