package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X71: bucket-checksum anti-entropy diff — identical replicas cost two
  * aggregate scans and zero phase-2 rows; corruption is localized to its
  * bucket and surfaces as the exact row versions.
  */
class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("id")
  private def base = (1L to 200L).map(i => (i, s"name$i", i * 10))
    .toDF("id", "name", "value")

  test("identical replicas: no divergent buckets, empty diff, no phase-2 scan") {
    val (diffed, bad) = TableDiff.diffDivergent(base, base, keys, 32)
    assert(bad.isEmpty)
    assert(diffed.count() == 0)
  }

  test("one corrupted value flags exactly one bucket; both row versions surface") {
    val corrupted = base.withColumn("value",
      when(col("id") === 77L, lit(-1L)).otherwise(col("value")))
    val (diffed, bad) = TableDiff.diffDivergent(base, corrupted, keys, 32)
    assert(bad.size == 1, s"value corruption must stay in its key bucket: $bad")
    val rows = diffed.select("id", "value", "change")
      .as[(Long, Long, String)].collect().toSet
    assert(rows == Set((77L, 770L, "added"), (77L, -1L, "deleted")))
  }

  test("a mutated key flags at most two buckets and surfaces both versions") {
    val mutated = base.withColumn("id",
      when(col("id") === 42L, lit(9942L)).otherwise(col("id")))
    val (diffed, bad) = TableDiff.diffDivergent(base, mutated, keys, 32)
    assert(bad.nonEmpty && bad.size <= 2, s"buckets: $bad")
    val rows = diffed.select("id", "change").as[(Long, String)].collect().toSet
    assert(rows == Set((42L, "added"), (9942L, "deleted")))
  }

  test("checksum path produces exactly the direct whole-row null-safe diff") {
    val b = base.where(col("id") % 9 =!= 0)
      .withColumn("value", when(col("id") % 11 === 0, col("value") + 1)
        .otherwise(col("value")))
    val viaChecksums = TableDiff.diffDivergent(base, b, keys, 16)._1
      .orderBy("change", "id").collect().toSeq
    val direct = SnapshotDiff.diffNullSafe(base, b, Seq("id", "name", "value"))
      .orderBy("change", "id").collect().toSeq
    assert(viaChecksums == direct && direct.nonEmpty)
  }

  test("null values checksum and diff deterministically") {
    // two INDEPENDENT frames (fresh plans, like two tables read from
    // storage) carrying the same null-bearing data
    def withNull = base.withColumn("name",
      when(col("id") % 50 === 0, lit(null: String)).otherwise(col("name")))
    val (d0, bad0) = TableDiff.diffDivergent(withNull, withNull, keys, 32)
    assert(bad0.isEmpty && d0.count() == 0,
      "null-bearing identical replicas must fingerprint equal")
  }
}
