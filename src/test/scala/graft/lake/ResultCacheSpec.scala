package graft.lake

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Scratch

/** X167 result cache: fill-once semantics, version-keyed invalidation,
  * crash-mid-write recovery (no marker ⇒ recompute), illegal tags.
  */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  test("cache fills once per version and invalidates on commit") {
    val root = Scratch.dir("rc_spec")
    ManifestTable.commit(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), s"$root/t",
      20250701, 900)
    val computes = new AtomicInteger(0)
    def agg() = {
      computes.incrementAndGet()
      ManifestTable.readLatest(spark, s"$root/t").agg(sum("v").as("s"))
    }
    def call() = ResultCache.cached(spark, root, "sum_v", Seq(s"$root/t"))(agg())
      .collect().head.getLong(0)
    assert(call() === 30L && computes.get() === 1)
    assert(call() === 30L && computes.get() === 1, "second call serves the entry")
    ManifestTable.appendRetrying(Seq((3L, 5L)).toDF("k", "v"), s"$root/t", 20250701, 930)
    assert(call() === 35L && computes.get() === 2, "a commit changes the key")
    assert(call() === 35L && computes.get() === 2)
  }

  test("a crashed fill (data without marker) recomputes instead of serving garbage") {
    val root = Scratch.dir("rc_crash")
    ManifestTable.commit(Seq((1L, 7L)).toDF("k", "v"), s"$root/t", 20250701, 900)
    // simulate the crash: stale data present, no marker
    Seq((99L, 999L)).toDF("k", "v").write.parquet(s"$root/_results/sum_v/k1/data")
    val got = ResultCache.cached(spark, root, "sum_v", Seq(s"$root/t"))(
      ManifestTable.readLatest(spark, s"$root/t").agg(sum("v").as("s")))
      .collect().head.getLong(0)
    assert(got === 7L)
  }

  test("illegal cache tags refuse (path injection)") {
    val e = intercept[IllegalArgumentException](
      ResultCache.cached(spark, Scratch.dir("rc_bad"), "../evil", Seq())(
        spark.range(1).toDF()))
    assert(e.getMessage.contains("illegal"))
  }
}
