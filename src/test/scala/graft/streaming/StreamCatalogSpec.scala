package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Catalog

/** X109: exactly-once streaming into a multi-table catalog — the cut is
  * both the atomicity and the idempotency boundary.
  */
class StreamCatalogSpec extends SparkSpec {

  import spark.implicits._

  private def batchDF(ids: Long*) =
    ids.map(i => (i, s"t${i % 2}", i % 3, i.toDouble)).toDF(
      "event_id", "event_type", "user_id", "value")

  test("folds accumulate across epochs; a replayed epoch is a cut-level no-op") {
    val root = graft.util.Scratch.dir("scat_spec")
    StreamCatalog.writeEpoch(spark, root, batchDF(1, 2), 0L)
    StreamCatalog.writeEpoch(spark, root, batchDF(3, 4), 1L)
    assert(Catalog.snapshots(spark, root).map(_.epoch) ==
      Seq(Some(0L), Some(1L)))
    // restart replay of epoch 0: no new cut, no double counting
    StreamCatalog.writeEpoch(spark, root, batchDF(1, 2), 0L)
    assert(Catalog.snapshots(spark, root).size == 2)
    val byType = Catalog.readTable(spark, root, "by_type")
      .select(col("k"), col("n_events")).as[(String, Long)].collect().toMap
    assert(byType == Map("t0" -> 2L, "t1" -> 2L), s"got $byType")
    // cross-table invariant: both tables fold the same stream prefix
    val totType = Catalog.readTable(spark, root, "by_type")
      .agg(sum("n_events")).head().getLong(0)
    val totUser = Catalog.readTable(spark, root, "by_user")
      .agg(sum("n_events")).head().getLong(0)
    assert(totType == 4L && totUser == 4L)
  }

  test("crash between table commits and the publish: replay completes the epoch") {
    val root = graft.util.Scratch.dir("scat_crash")
    StreamCatalog.writeEpoch(spark, root, batchDF(1, 2), 0L)
    // simulated crash: epoch 1's tables commit but the cut never lands
    Catalog.commitTableVersions(root, 20250901, 901, Seq(
      "by_type" -> batchDF(3, 4).groupBy(col("event_type").as("k"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).as("sum_value"))))
    assert(Catalog.snapshots(spark, root).size == 1,
      "unpublished epoch must stay invisible")
    assert(Catalog.readTable(spark, root, "by_type")
      .agg(sum("n_events")).head().getLong(0) == 2L)
    // the restart replays epoch 1 end-to-end and the cut completes
    StreamCatalog.writeEpoch(spark, root, batchDF(3, 4), 1L)
    assert(StreamCatalog.committedEpochs(spark, root) == Set(0L, 1L))
    assert(Catalog.readTable(spark, root, "by_type")
      .agg(sum("n_events")).head().getLong(0) == 4L)
  }
}
