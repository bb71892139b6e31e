package graft.ext

import graft.SparkSpec

/** X59 fixed-point PageRank: pinned against an independent in-memory
  * implementation of the same integer recurrence, plus structural
  * properties (mass conservation, hub dominance, determinism).
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def edgeDf(edges: (Long, Long)*) = edges.toDF("src", "dst")

  /** Reference implementation: the same recurrence, driver-side. */
  private def refRanks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = edges.map(_._1).distinct.sorted
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size.toLong
    val base = (PageRank.scale * 15L / 100L) / n
    var r = nodes.map(_ -> PageRank.scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / out(u) }.sum).toMap
      r = nodes.map(v => v -> (base + 85L * contrib.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  test("matches the independent recurrence on a 4-node asymmetric graph") {
    val edges = Seq(1L -> 2L, 2L -> 1L, 1L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 3L, 2L -> 3L, 3L -> 2L)
    val got = PageRank.pagerank(edgeDf(edges: _*), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == refRanks(edges, 5))
  }

  test("rank mass is conserved up to truncation dust") {
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L) // 3-cycle, outdeg 1 each
    val got = PageRank.pagerank(edgeDf(edges: _*), iters = 5)
      .as[(Long, Long)].collect()
    val total = got.map(_._2).sum
    assert(total <= PageRank.scale)
    assert(total > PageRank.scale - 1000L) // dust ≤ edges × iters + rounding
  }

  test("hub of a symmetrized star outranks its leaves") {
    val star = (2L to 6L).flatMap(leaf => Seq(1L -> leaf, leaf -> 1L))
    val got = PageRank.pagerank(edgeDf(star: _*), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert((2L to 6L).forall(leaf => got(1L) > got(leaf)))
    assert((2L to 6L).map(got).distinct.size == 1) // leaves tie exactly
  }

  test("bit-deterministic across runs") {
    val e = PageRank.supplyEdges(spark, sf)
    val a = PageRank.pagerank(e, 3).as[(Long, Long)].collect().sortBy(_._1)
    val b = PageRank.pagerank(e, 3).as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }
}
