package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X35: split assignment — group coherence, determinism, coverage. */
class SplitSpec extends SparkSpec {

  import spark.implicits._

  test("all rows of one group land in exactly one split (no leakage)") {
    val ev = graft.sources.Tables.events(spark, sf)
    val perUser = Split.assignSplits(ev, "user_id", Split.standardSplits)
      .groupBy("user_id").agg(countDistinct("split").as("n"))
      .where(col("n") > 1).count()
    assert(perUser == 0)
  }

  test("X209 leakage-safe splits: every near-dup cluster lands whole in one split") {
    val docs = (0L until 40L).toDF("doc_id")
    // two clusters — {1,2,3} via a chain (1-2, 2-3: transitivity needed)
    // and {10,11}; everything else unclustered
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = Split.leakageSafeSplits(spark, docs, edges, Split.standardSplits)
      .select("doc_id", "rep", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byId = got.map(r => r._1 -> r).toMap
    // reps: cluster members share the min-id rep, loners are their own
    assert(Seq(1L, 2L, 3L).map(byId(_)._2).toSet === Set(1L))
    assert(Seq(10L, 11L).map(byId(_)._2).toSet === Set(10L))
    assert(byId(7L)._2 === 7L)
    // the leakage invariant: one split per cluster
    assert(Seq(1L, 2L, 3L).map(byId(_)._3).toSet.size === 1)
    assert(Seq(10L, 11L).map(byId(_)._3).toSet.size === 1)
    // cluster members follow the REP's bucket, not their own: doc 2/3
    // get doc 1's split even where their own hash would differ
    val own = Split.assignSplits(docs, "doc_id", Split.standardSplits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(2L)._3 === own(1L) && byId(3L)._3 === own(1L))
  }

  test("assignment is deterministic and partition-invariant") {
    val df = (1L to 500L).toDF("k")
    def assign(parts: Int) =
      Split.assignSplits(df.repartition(parts), "k", Split.standardSplits)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(assign(1) == assign(13))
  }

  test("every split is populated at plausible proportions") {
    val df = (1L to 2000L).toDF("k")
    val counts = Split.assignSplits(df, "k", Split.standardSplits)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 2000)
    // 80/10/10 with md5 uniformity — generous tolerance, zero flake
    assert(counts("train") > 1400 && counts("train") < 1800)
    assert(counts("val") > 100 && counts("val") < 350)
    assert(counts("test") > 100 && counts("test") < 350)
  }

  test("percents must sum to 100") {
    intercept[IllegalArgumentException] {
      Split.assignSplits(Seq(1L).toDF("k"), "k", Seq("a" -> 50, "b" -> 40))
    }
  }
}
