package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X207 — stable row ids: minted once, preserved through re-clustering,
  * inherited through upserts; only new keys advance the watermark.
  */
class RowTrackingSpec extends SparkSpec {

  import spark.implicits._

  test("ids survive ZORDER, updates inherit, inserts mint above the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rowtrack").toString
    val df = spark.range(0, 20, 2) // keys 0,2,..,18
      .selectExpr("id AS k", "CAST(id AS DOUBLE) AS p")
    val (v1, hw1) = RowTracking.trackedAppend(df, dir, "k", 20250901, 900)
    assert(v1 === 1 && hw1 === 10L)
    def pairs(): Set[(Long, Long)] = ManifestTable.readLatest(spark, dir)
      .select(col("k"), col(RowTracking.RowId)).as[(Long, Long)].collect().toSet
    val initial = pairs()
    assert(initial === (0 until 10).map(i => (i * 2L, i + 1L)).toSet,
      "ids 1..N in key order")
    // a full range-shuffle re-cluster rewrites every row; ids must ride
    graft.spark.GraftDml.extSession(spark)
      .sql(s"OPTIMIZE '$dir' ZORDER BY (k) AT 20250901 930")
    assert(pairs() === initial, "maintenance reminted or lost row ids")
    // update keys 0 and 6 (inherit), insert keys 1 and 3 (mint 11, 12)
    val batch = Seq((0L, 100.0), (6L, 106.0), (3L, 3.0), (1L, 1.0)).toDF("k", "p")
    RowTracking.trackedUpsert(spark, dir, batch, "k", "k", 20250901, 1000)
    val after = pairs()
    assert(after((0L, 1L)) && after((6L, 4L)), "updated keys must keep their ids")
    assert(after((1L, 11L)) && after((3L, 12L)), "inserts mint in key order above the watermark")
    assert(Identity.highWater(spark, dir) === 12L)
    // updated VALUES really landed under the old ids
    val vals = ManifestTable.readLatest(spark, dir)
      .where(col("k") === 0L).select("p").as[Double].head()
    assert(vals === 100.0)
    // an all-matched batch advances nothing
    RowTracking.trackedUpsert(spark, dir,
      Seq((0L, 200.0)).toDF("k", "p"), "k", "k", 20250901, 1010)
    assert(Identity.highWater(spark, dir) === 12L)
    assert(pairs().size === 12)
  }
}
