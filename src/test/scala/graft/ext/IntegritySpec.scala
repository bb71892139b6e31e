package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X158 FK audit: planted orphans are found exactly (count + checksum),
  * intact edges report zero, and the simulated-delete edge strands
  * precisely the children of deleted parents.
  */
class IntegritySpec extends SparkSpec {

  test("fk audit: intact edges zero, post-delete edge strands exactly the deleted parents' children") {
    val rows = Integrity.queries("q_fk_audit")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (nLi, orphLi, sumLi) = rows("lineitem->orders")
    assert(orphLi === 0L && sumLi === 0L && nLi > 0L)

    // independent recompute of the post-delete edge from the raw tables
    import spark.implicits._
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select($"l_orderkey".as[Long]).collect()
    val expOrph = li.count(_ % 97 == 0)
    val expSum = li.filter(_ % 97 == 0).sum
    val (n2, orph2, sum2) = rows("lineitem->orders_postdelete")
    assert(n2 === li.length.toLong)
    assert(orph2 === expOrph.toLong, "orphans = children of deleted parents")
    assert(sum2 === expSum, "checksum pins membership, not just the count")
    assert(orph2 > 0L, "the simulated delete must be load-bearing at sf0.001")
  }

  test("fk audit: planted dangling child keys are counted and checksummed") {
    import spark.implicits._
    val dir = graft.util.Scratch.dir("fk_spec")
    // parents 1..5; children reference 1..5 plus dangling 96+97
    Seq(1L, 2L, 3L, 4L, 5L).toDF("o_orderkey")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 10L), (2L, 11L), (96L, 12L), (97L, 13L), (5L, 14L))
      .toDF("l_orderkey", "l_extra").write.parquet(s"$dir/lineitem.parquet")
    (1L to 3L).toDF("c_custkey").write.parquet(s"$dir/customer.parquet")
    Seq((100L, 1L), (101L, 9L)).toDF("event_id", "user_id")
      .withColumn("ts", current_timestamp()) // Tables.events inspects ts's type
      .write.parquet(s"$dir/events.parquet")
    val rows = Integrity.queries("q_fk_audit")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows("lineitem->orders") === ((5L, 2L, 96L + 97L)))
    // events: user 9 has no customer row → event 101 is the orphan
    assert(rows("events->customer") === ((2L, 1L, 101L)))
  }
}
