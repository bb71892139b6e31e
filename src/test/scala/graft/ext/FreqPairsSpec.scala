package graft.ext

import graft.SparkSpec

/** X91 frequent pairs: hand-computed goldens, the basket cap as contract,
  * and support thresholding.
  */
class FreqPairsSpec extends SparkSpec {
  import spark.implicits._

  private def mine(rows: Seq[(Long, Long)], cap: Int, sup: Long) =
    FreqPairs.frequentPairs(rows.toDF("basket", "item"), cap, sup)
      .as[(Long, Long, Long)].collect().toSet

  test("hand-computed golden: pair counts across baskets") {
    val baskets = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 40L))
    assert(mine(baskets, cap = 10, sup = 2L) == Set((10L, 20L, 3L)))
    assert(mine(baskets, cap = 10, sup = 1L) == Set(
      (10L, 20L, 3L), (10L, 30L, 1L), (20L, 30L, 1L),
      (10L, 40L, 1L), (20L, 40L, 1L)))
  }

  test("basket cap truncates by item order and changes the counts") {
    // basket 1 = {10,20,30,40}; cap 2 keeps {10,20} only
    val baskets = Seq((1L, 10L), (1L, 20L), (1L, 30L), (1L, 40L),
      (2L, 10L), (2L, 20L))
    assert(mine(baskets, cap = 2, sup = 1L) == Set((10L, 20L, 2L)))
    assert(mine(baskets, cap = 3, sup = 1L) ==
      Set((10L, 20L, 2L), (10L, 30L, 1L), (20L, 30L, 1L)))
  }

  test("duplicate (basket, item) rows count once") {
    val baskets = Seq((1L, 10L), (1L, 10L), (1L, 20L))
    assert(mine(baskets, cap = 10, sup = 1L) == Set((10L, 20L, 1L)))
  }
}
