package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X87 triangle counting: hand-computed goldens on a known graph, skew
  * behavior of the degree-ordered orientation, and agreement with naive
  * enumeration on the real fixture graph.
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("u", "v")

  test("hand-computed golden: two triangles sharing an edge, plus a pendant") {
    // K4 minus edge {1,4}: triangles {1,2,3} and {2,3,4}; node 5 pendant.
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val got = Triangles.triangleCounts(g).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangle-free graphs (star and path) yield no rows") {
    val star = edges((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L))
    assert(Triangles.triangleCounts(star).count() == 0)
    assert(Triangles.triangleCounts(path).count() == 0)
  }

  test("hub skew: wedges come from the orientation, not the raw hub degree") {
    // Hub 0 connects to 1..40; spokes i—i+1 close a fan of triangles.
    // Raw wedge count at the hub would be C(40,2) = 780; oriented, the hub
    // (highest degree) has out-degree 0 and each triangle is found at its
    // spoke apex. Counts: every triangle {0, i, i+1}.
    val fan = edges((1L to 40L).map(i => (0L, i)) ++
      (1L until 40L).map(i => (i, i + 1)): _*)
    val got = Triangles.triangleCounts(fan).as[(Long, Long)].collect().toMap
    assert(got(0L) == 39L)            // hub is in every triangle
    assert(got(1L) == 1L && got(40L) == 1L)
    assert((2L to 39L).forall(i => got(i) == 2L))
  }

  test("basket cap bounds a degenerate basket at C(cap, 2) pairs") {
    // one 100-item basket: uncapped it would emit C(100, 2) = 4950 pair
    // rows; the cap-as-contract keeps only the cap smallest items, so the
    // edge set is exactly the pairs among those — the X91 discipline on
    // the triangles fixture builder (round-9 finding #2)
    val degenerate = (1L to 100L).map(p => (1L, p)).toDF("o", "p")
    val edges = Triangles.cappedEdges(degenerate, cap = 10)
      .as[(Long, Long)].collect().toSet
    assert(edges.size == 45) // C(10, 2)
    assert(edges == (for (u <- 1L to 10L; v <- (u + 1) to 10L) yield (u, v)).toSet)
    // the default cap never binds on TPC-H baskets (≤ 7 lineitems/order)
    assert(Triangles.maxBasket > 7)
  }

  test("matches naive id-ordered enumeration on the co-purchase fixture") {
    val g = Triangles.coPurchaseEdges(spark, sf).cache()
    try {
      val fast = Triangles.triangleCounts(g).as[(Long, Long)].collect().toMap
      val naive = g.as("e1")
        .join(g.as("e2"), $"e2.u" === $"e1.u" && $"e2.v" > $"e1.v")
        .join(g.as("e3"), $"e3.u" === $"e1.v" && $"e3.v" === $"e2.v")
        .select(explode(array($"e1.u", $"e1.v", $"e2.v")).as("node"))
        .groupBy("node").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      assert(fast == naive && fast.nonEmpty)
    } finally g.unpersist()
  }
}
