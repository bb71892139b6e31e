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
