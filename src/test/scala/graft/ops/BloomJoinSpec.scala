package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X36: the bloom pre-filter must never change join semantics — false
  * positives are removed by the exact join, true keys always pass.
  */
class BloomJoinSpec extends SparkSpec {

  import spark.implicits._

  test("bloomSemiJoin equals the plain semi join even with a tiny, collision-prone filter") {
    val fact = (1L to 1000L).map(i => (i, i % 97)).toDF("row_id", "k")
    val dim = Seq(3L, 7L, 11L).toDF("dk")
    // expectedItems deliberately tiny → dense filter, many false positives
    val bloom = BloomJoin.bloomSemiJoin(fact, dim, "k", "dk", expectedItems = Some(3))
      .select("row_id").as[Long].collect().sorted
    val plain = fact.join(dim, col("k") === col("dk"), "left_semi")
      .select("row_id").as[Long].collect().sorted
    assert(bloom.toSeq == plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("mightContain admits every inserted key (no false negatives, the bloom guarantee)") {
    val dim = (1L to 500L).toDF("dk")
    val bytes = BloomJoin.buildBloom(dim, col("dk"), expectedItems = 500)
    val admitted = (1L to 500L).toDF("k")
      .where(BloomJoin.mightContain(bytes, col("k"))).count()
    assert(admitted == 500, "a bloom filter must never reject an inserted key")
  }

  test("the pre-filter actually prunes: most non-members are rejected") {
    val dim = (1L to 100L).toDF("dk")
    val bytes = BloomJoin.buildBloom(dim, col("dk"), expectedItems = 100, fpp = 0.01)
    val survivors = (1000001L to 1010000L).toDF("k")
      .where(BloomJoin.mightContain(bytes, col("k"))).count()
    // 10k non-members at 1% fpp → ~100 expected; generous flake-free bound
    assert(survivors < 1000, s"$survivors of 10000 non-members passed — filter not pruning")
  }

  test("mixed integral key types still match: int fact key vs long dim key") {
    // XxHash64 is type-sensitive; without common-type normalization the
    // bloom would false-NEGATIVE every match here
    val fact = (1 to 100).map(i => (i.toLong, i)).toDF("row_id", "k")
      .withColumn("k", col("k").cast("int"))
    val dim = Seq(3L, 7L).toDF("dk")
    val got = BloomJoin.bloomSemiJoin(fact, dim, "k", "dk", expectedItems = Some(2))
      .select("row_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(3L, 7L))
  }

  test("a 100x-stale estimate saturates the filter; auto-sizing restores the designed FPP") {
    // VERDICT r3 item 5: an understated expectedItems silently blows up the
    // false-positive rate (the filter saturates and prunes nothing) even
    // though semantics stay exact. Auto-sizing from the dim count keeps the
    // non-member pass rate at the designed ~1%.
    val dim = (1L to 20000L).toDF("dk")
    val probes = (1000001L to 1010000L).toDF("k") // 10k non-members
    val stale = BloomJoin.buildBloom(dim, col("dk"), expectedItems = 200) // 100x under
    val auto = BloomJoin.buildBloom(dim, col("dk"), BloomJoin.autoExpectedItems(dim))
    val staleFp = probes.where(BloomJoin.mightContain(stale, col("k"))).count()
    val autoFp = probes.where(BloomJoin.mightContain(auto, col("k"))).count()
    assert(autoFp < 500, s"auto-sized filter passed $autoFp of 10000 non-members")
    assert(staleFp > 5000, s"stale filter should be saturated, passed only $staleFp")
    // and correctness is unaffected either way: the exact join removes FPs
    val fact = (1L to 1000L).map(i => (i, i % 40000)).toDF("row_id", "k")
    val viaStale = BloomJoin.bloomSemiJoin(fact, dim, "k", "dk", Some(200))
      .select("row_id").as[Long].collect().sorted
    val plain = fact.join(dim, col("k") === col("dk"), "left_semi")
      .select("row_id").as[Long].collect().sorted
    assert(viaStale.toSeq == plain.toSeq)
  }

  test("auto-sizing handles an empty dim side (capacity floors at 1)") {
    val dim = spark.emptyDataset[Long].toDF("dk")
    val fact = (1L to 10L).toDF("k")
    assert(BloomJoin.bloomSemiJoin(fact, dim, "k", "dk").count() == 0L)
  }

  test("non-integral mixed key types are rejected up front") {
    val fact = Seq(("a", 1L)).toDF("k", "v")
    val dim = Seq(5L).toDF("dk")
    intercept[IllegalArgumentException] {
      BloomJoin.bloomSemiJoin(fact, dim, "k", "dk", expectedItems = Some(1))
    }
  }
}
