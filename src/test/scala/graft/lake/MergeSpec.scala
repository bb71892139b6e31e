package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X31 golden fixture: every merge path on a 5-row base, plus the
  * whole-row-replace contract that distinguishes MERGE from per-column
  * coalesce.
  */
class MergeSpec extends SparkSpec {

  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "name", "bal")

  test("upsert: update, insert, delete, no-op delete, passthrough") {
    val updates = Seq(
      (2L, "b2", 21.0, false), // update
      (5L, "e", 50.0, false), // insert (key absent from base)
      (3L, "c", 30.0, true), // delete
      (9L, "x", 0.0, true) // delete of absent key — must be a no-op
    ).toDF("k", "name", "bal", "del")
    val got = Merge.upsert(base, updates, Seq("k"), deleteCol = Some("del"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, "a", 10.0), // passthrough
      (2L, "b2", 21.0), // updated
      (4L, "d", 40.0), // passthrough
      (5L, "e", 50.0))) // inserted
  }

  test("updates replace whole rows: a NULL update column overwrites") {
    val updates = Seq((2L, Option.empty[String], 99.0))
      .toDF("k", "name", "bal")
    val got = Merge.upsert(base, updates, Seq("k")).where(col("k") === 2).head()
    assert(got.isNullAt(1), "MERGE semantics: the update's NULL wins")
    assert(got.getDouble(2) == 99.0)
  }

  test("upsert without deleteCol never drops rows") {
    val updates = Seq((1L, "a9", 11.0)).toDF("k", "name", "bal")
    assert(Merge.upsert(base, updates, Seq("k")).count() == 4)
  }

  test("duplicate-keyed updates are rejected, not fanned out") {
    // real MERGE INTO raises on multiple source matches; silently emitting
    // two rows for one key would corrupt the table's key invariant
    val updates = Seq((2L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "name", "bal")
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(base, updates, Seq("k"))
    }
    assert(e.getMessage.contains("unique source keys"))
  }

  test("updates missing a base column are rejected") {
    val updates = Seq((1L, "a9")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      Merge.upsert(base, updates, Seq("k"))
    }
  }
}
