package graft.ext

import graft.SparkSpec

/** X159 k-core: hand-computed peel goldens (including the cascade that
  * makes peeling iterative rather than a single degree filter), bounded
  * vs fixpoint tiers, and the load-bearing rounds on the fixture graph.
  */
class KCoreSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("u", "v")
  }

  private def nodes(df: org.apache.spark.sql.DataFrame): Set[Long] = {
    import spark.implicits._
    df.select($"u").union(df.select($"v")).distinct().as[Long].collect().toSet
  }

  // cycle 1-2-3 plus a chain 3-4-5: peeling at k=2 must CASCADE
  // (removing leaf 5 drops 4 to degree 1, removing 4 leaves the cycle)
  private val cascade = edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L)

  test("kcore: single round only removes current low-degree nodes") {
    assert(nodes(KCore.peelRound(cascade, 2)) === Set(1L, 2L, 3L, 4L))
  }

  test("kcore: peeling cascades to the fixpoint") {
    assert(nodes(KCore.kCore(cascade, 2)) === Set(1L, 2L, 3L))
    // bounded tier after 2 rounds reaches the same fixpoint here
    assert(nodes(KCore.peel(cascade, 2, 2)) === Set(1L, 2L, 3L))
  }

  test("kcore: a complete K4 is its own 3-core; adding a pendant changes nothing") {
    val k4 = edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L,
      1L -> 9L) // pendant
    assert(nodes(KCore.kCore(k4, 3)) === Set(1L, 2L, 3L, 4L))
  }

  test("kcore: a graph below k peels to empty") {
    assert(nodes(KCore.kCore(cascade, 3)) === Set.empty[Long])
  }

  test("kcore: fixture peel rounds are load-bearing (each round removes nodes)") {
    // the query's k=45 sits inside the co-purchase degree distribution:
    // at sf0.001 round 1 already removes over half the nodes
    val e = Triangles.coPurchaseEdges(spark, sf).localCheckpoint()
    val n0 = nodes(e).size
    val n1 = nodes(KCore.peel(e, 45, 1)).size
    assert(n1 < n0, s"round 1 must remove nodes ($n1 vs $n0)")
  }
}
