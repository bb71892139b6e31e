package graft.ext

import graft.SparkSpec
import graft.sources.Tables

/** X253 corpus release diff card: the card's arithmetic closes (A − rm +
  * add = B), every change class fires on the fixture, and the per-source
  * rows match a local replay of the revision rules + the join.
  */
class ReleaseDiffSpec extends SparkSpec {

  test("X253 release diff: card arithmetic closes and matches a local replay") {
    val got = ReleaseDiff.queries("q_release_diff")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_added"),
          r.getAs[Long]("n_removed"), r.getAs[Long]("n_changed"),
          r.getAs[Long]("tok_delta"))).toMap
    assert(got.nonEmpty)
    // conservation per source: B = A − removed + added
    got.values.foreach { case (a, b, add, rm, chg, _) =>
      assert(b == a - rm + add)
      assert(chg <= a - rm, "changed docs must survive into B")
    }
    // all three change classes fire somewhere
    assert(got.values.exists(_._3 > 0) && got.values.exists(_._4 > 0) &&
      got.values.exists(_._5 > 0))
    // local replay of the rules + diff for every source
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(s"rel:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 10
    }
    def ntok(t: String): Long =
      t.toLowerCase.split("\\s+").count(_.nonEmpty).toLong
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expect = docs.groupBy(_._2).map { case (src, ds) =>
      val rm = ds.count(d => bucket(d._1) == 0).toLong
      val add = ds.count(d => bucket(d._1) == 3).toLong
      val chg = ds.count(d => Set(1L, 2L)(bucket(d._1))).toLong
      val tokA = ds.map(d => ntok(d._3)).sum
      val tokB = ds.filter(d => bucket(d._1) != 0).map { d =>
        ntok(d._3) + (if (Set(1L, 2L)(bucket(d._1))) 1L else 0L)
      }.sum + ds.filter(d => bucket(d._1) == 3).map(d => ntok(d._3) + 1L).sum
      src -> (ds.length.toLong, ds.length - rm + add, add, rm, chg, tokB - tokA)
    }
    assert(got == expect)
  }
}
