package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Scratch

/** X63 stream–static enrichment: per-batch join goldens and the
  * stateless-per-batch emission contract.
  */
class StreamEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("two micro-batches enriched and re-aggregated equal the batch join") {
    val orders = Seq(
      (1L, 10L, 5.00), (2L, 11L, 7.50), // batch 0 (keys % 2 == 1 ... by file)
      (3L, 10L, 2.25), (4L, 12L, 4.00),
    ).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val dim = Seq((10L, "FR"), (11L, "DE"), (12L, "FR"))
      .toDF("o_custkey", "n_name")

    val in = Scratch.dir("se_in"); val out = Scratch.dir("se_out")
    val t0 = System.currentTimeMillis() - 60000
    StreamDiff.writeSnapshotFile(orders.where($"o_orderkey" <= 2), s"$in/b0.parquet", t0)
    StreamDiff.writeSnapshotFile(orders.where($"o_orderkey" > 2), s"$in/b1.parquet", t0 + 1000)
    StreamEnrich.run(spark, in, Scratch.dir("se_chk"), out, orders.schema, dim)

    val got = spark.read.parquet(out)
      .groupBy("n_name").agg(
        sum("n_orders").as("n"),
        sum($"revenue".cast("decimal(18,2)")).cast("double").as("rev"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Double]("rev"))).toSet
    assert(got == Set(("FR", 3L, 11.25), ("DE", 1L, 7.50)))
  }

  test("stateless per batch: a nation absent from a batch emits no row for it") {
    val orders = Seq((1L, 10L, 1.0), (2L, 11L, 1.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val dim = Seq((10L, "FR"), (11L, "DE")).toDF("o_custkey", "n_name")
    val in = Scratch.dir("se2_in"); val out = Scratch.dir("se2_out")
    val t0 = System.currentTimeMillis() - 60000
    StreamDiff.writeSnapshotFile(orders.where($"o_custkey" === 10L), s"$in/b0.parquet", t0)
    StreamDiff.writeSnapshotFile(orders.where($"o_custkey" === 11L), s"$in/b1.parquet", t0 + 1000)
    StreamEnrich.run(spark, in, Scratch.dir("se2_chk"), out, orders.schema, dim)

    val rows = spark.read.parquet(out)
      .select("n_name", "batch_id").as[(String, Long)].collect().toSet
    assert(rows == Set(("FR", 0L), ("DE", 1L)))
  }
}
