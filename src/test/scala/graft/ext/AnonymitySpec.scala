package graft.ext

import graft.SparkSpec

/** X235 k-anonymity release audit: every released class clears k, the
  * ladder conserves rows and the id checksum, and the residual really is
  * the under-k remainder.
  */
class AnonymitySpec extends SparkSpec {

  private lazy val rows =
    Anonymity.queries("q_k_anonymity")(spark, sf).collect()
      .map(r => (r.getAs[Long]("level"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("sum_key")))

  test("X235: every released (level 0/1) class has at least k members") {
    assert(rows.nonEmpty)
    rows.filter(_._1 <= 1).foreach { case (_, n, _) =>
      assert(n >= Anonymity.k, s"released class under k: $n")
    }
  }

  test("X235: ladder conserves the corpus — row count and id checksum") {
    val cust = graft.sources.Tables.customer(spark, sf)
    val total = cust.count()
    val keySum = cust.agg(org.apache.spark.sql.functions
      .sum("c_custkey")).head.getLong(0)
    assert(rows.map(_._2).sum == total, "released+suppressed != corpus")
    assert(rows.map(_._3).sum == keySum, "id checksum not conserved")
  }

  test("X235: all three ladder levels fire on the fixture, residual < k per hidden class") {
    val byLevel = rows.groupBy(_._1).map { case (l, rs) => l -> rs.size }
    assert(byLevel.keySet == Set(0L, 1L, 2L),
      s"fixture should exercise the whole ladder, got levels ${byLevel.keySet}")
    assert(byLevel(2L) == 1, "residual is a single opaque row")
  }
}
