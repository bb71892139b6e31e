package graft.lake

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Golden fixture pinning the reference's snapshot-diff semantics
  * (FIXTURES.md §2; reference script_api_apify_to_spark.py:238-248).
  */
class SnapshotDiffSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("username", StringType), StructField("full_name", StringType)))

  private def df(rows: Seq[(String, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (u, f) => Row(u, f) }),
      schema)

  private val keys = Seq("username", "full_name")

  test("golden diff: added/deleted/changed/dup/null-key rows") {
    val prev = df(Seq(
      ("stay", "Same Person"),        // unchanged
      ("gone", "Was Here"),           // deleted-only
      ("rename", "Old Name"),         // composite-key change → deleted
      ("dup", "Twice"), ("dup", "Twice"), // in-snapshot duplicate, survives twice
      ("nullkey", null)               // NULL key never matches → added AND deleted
    ))
    val cur = df(Seq(
      ("stay", "Same Person"),
      ("fresh", "New Person"),        // added-only
      ("rename", "New Name"),         // composite-key change → added
      ("dup", "Twice"), ("dup", "Twice"),
      ("nullkey", null)
    ))
    def key(t: (String, String, String)) = (t._1, Option(t._2).getOrElse(""), t._3)
    val out = SnapshotDiff.diff(cur, prev, keys)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(key).toSeq

    val expected = Seq(
      ("fresh", "New Person", "added"),
      ("gone", "Was Here", "deleted"),
      ("nullkey", null, "added"),
      ("nullkey", null, "deleted"),
      ("rename", "New Name", "added"),
      ("rename", "Old Name", "deleted")
    ).sortBy(key)
    assert(out === expected)
  }

  test("golden null-safe diff: NULL keys match, everything else as before") {
    val prev = df(Seq(
      ("stay", "Same Person"),
      ("gone", "Was Here"),
      ("nullkey", null),   // present in both → UNCHANGED under <=>
      ("nullgone", null))) // null-keyed, removed → deleted
    val cur = df(Seq(
      ("stay", "Same Person"),
      ("fresh", "New Person"),
      ("nullkey", null)))
    def key(t: (String, String, String)) = (t._1, Option(t._2).getOrElse(""), t._3)
    val out = SnapshotDiff.diffNullSafe(cur, prev, keys)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(key).toSeq
    assert(out === Seq(
      ("fresh", "New Person", "added"),
      ("gone", "Was Here", "deleted"),
      ("nullgone", null, "deleted")).sortBy(key))
  }

  test("golden update-aware CDC diff: value changes emit delete+insert pairs") {
    // key = username only; full_name is a payload column here
    val prev = df(Seq(
      ("stay", "Same Person"),     // unchanged → silent
      ("gone", "Was Here"),        // deleted
      ("edit", "Old Name"),        // value update → delete+insert pair
      ("nulled", "Had A Name")     // value → NULL, must surface
    ))
    val cur = df(Seq(
      ("stay", "Same Person"),
      ("fresh", "New Person"),     // added
      ("edit", "New Name"),
      ("nulled", null)
    ))
    val out = SnapshotDiff.diffCdc(cur, prev, Seq("username"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(out == Set(
      ("fresh", "New Person", "added"),
      ("gone", "Was Here", "deleted"),
      ("edit", "New Name", "added"),
      ("edit", "Old Name", "deleted"),
      ("nulled", null, "added"),
      ("nulled", "Had A Name", "deleted")))
    // and the plain keyed diff stays presence-only for the same inputs
    assert(SnapshotDiff.diff(cur, prev, Seq("username")).count() == 2)
  }

  test("property: diff(s, s) is empty") {
    val s1 = df(Seq(("a", "A"), ("b", "B"), ("b", "B")))
    assert(SnapshotDiff.diff(s1, s1, keys).count() === 0)
  }

  test("property: added(a,b) == deleted(b,a) modulo tag") {
    val a = df(Seq(("a", "A"), ("b", "B")))
    val b = df(Seq(("b", "B"), ("c", "C")))
    val lhs = SnapshotDiff.added(a, b, keys).drop("change").collect().toSet
    val rhs = SnapshotDiff.deleted(b, a, keys).drop("change").collect().toSet
    assert(lhs === rhs)
  }

  test("applyDiff: apply(prev, diff(cur, prev)) == cur for key-unique snapshots") {
    val prev = df(Seq(("a", "A"), ("b", "B"), ("gone", "X"), ("n", null)))
    val cur = df(Seq(("a", "A"), ("b", "B2"), ("new", "N"), ("n", null)))
    val rebuilt = SnapshotDiff.applyDiff(
      prev, SnapshotDiff.diff(cur, prev, keys), keys)
    assert(rebuilt.collect().map(_.toString).sorted.toSeq ==
      cur.collect().map(_.toString).sorted.toSeq)
    // the null-key row reconstructs exactly: diff double-tags it, apply
    // deletes prev's copy null-safely and re-inserts cur's
    assert(rebuilt.where("full_name IS NULL").count() == 1)
  }

  test("applyDiff: duplicate-key groups are the documented limit") {
    // a matched key-group drops from the diff entirely, so multiplicity
    // changes inside it are NOT representable — apply keeps prev's copies
    val prev = df(Seq(("a", "A"), ("a", "A")))
    val cur = df(Seq(("a", "A")))
    val rebuilt = SnapshotDiff.applyDiff(
      prev, SnapshotDiff.diff(cur, prev, keys), keys)
    assert(rebuilt.count() == 2) // not 1: the contract is key-unique inputs
  }

  test("synthesized snapshots diff as designed") {
    val out = SnapshotDiff.diff(
      SnapshotDiff.synthCurrent(spark, sf),
      SnapshotDiff.synthPrevious(spark, sf), SnapshotDiff.diffKeys)
    val byChange = out.groupBy("change").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every 10th custkey dropped from prev → added; every 7th (not 10th) renamed.
    assert(byChange("added") > 0 && byChange("deleted") > 0)
    assert(byChange("added") > byChange("deleted"))
  }
}
