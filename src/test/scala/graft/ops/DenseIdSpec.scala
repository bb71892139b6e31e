package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X77: dense ids must equal the global row_number WITHOUT its plan — no
  * single-partition exchange anywhere.
  */
class DenseIdSpec extends SparkSpec {
  import spark.implicits._

  test("ids are 1..n dense in key order, across skewed and shuffled input") {
    val keys = (1L to 500L).map(_ * 7 % 1000).distinct // gappy, unordered
    val df = new scala.util.Random(3).shuffle(keys).toDF("k")
      .repartition(13)
    val got = DenseId.assign(df, "k", 8)
      .select("k", "rid").as[(Long, Long)].collect().sortBy(_._1)
    val expect = keys.sorted.zipWithIndex.map { case (k, i) => (k, i + 1L) }
    assert(got.toSeq == expect)
  }

  test("the plan never collapses to a single partition") {
    val df = graft.sources.Tables.customer(spark, sf).select("c_custkey")
    val plan = DenseId.assign(df, "c_custkey", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"dense-id plan collapsed to one partition:\n$plan")
    // the trap, for contrast: a bare global row_number DOES collapse
    val trap = df.withColumn("rid", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy("c_custkey")))
      .queryExecution.executedPlan.toString
    assert(trap.contains("SinglePartition"))
  }

  test("X240 prefix sum: exclusive running totals match a local scan; plan stays bucket-parallel") {
    // unique keys (7 invertible mod 997, all k < 997), shuffled input
    val rows = (1L to 400L).map(k => (k * 7 % 997, k % 13 + 1))
    val df = new scala.util.Random(5).shuffle(rows).toDF("k", "v")
      .repartition(11)
    val (out, total) = DenseId.prefixSumWithTotal(df, "k", "v", 8)
    val got = out.select("k", "cum_before").as[(Long, Long)]
      .collect().sortBy(_._1)
    var acc = 0L
    val expect = rows.sortBy(_._1).map { case (k, v) =>
      val c = acc; acc += v; (k, c)
    }
    assert(got.toSeq == expect)
    assert(total == rows.map(_._2).sum)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"prefix-sum plan collapsed to one partition:\n$plan")
  }

  test("property: prefix sums match a local scan across sizes, skews, and bucket counts") {
    // deterministic pseudo-random cases: gappy key spaces, heavy value
    // skew, degenerate bucket counts (1 bucket, more buckets than rows)
    val rnd = new scala.util.Random(11)
    Seq((1, 8), (7, 3), (64, 1), (64, 16), (200, 8), (333, 40)).foreach {
      case (n, parts) =>
        val rows = (1 to n).map { i =>
          (i.toLong * 13 % 4099, // unique: 13 invertible mod 4099, n < 4099
            if (i % 17 == 0) 1000L + rnd.nextInt(1000) else rnd.nextInt(5).toLong)
        }
        val df = rnd.shuffle(rows).toDF("k", "v").repartition(5)
        val (out, total) = DenseId.prefixSumWithTotal(df, "k", "v", parts)
        val got = out.select("k", "cum_before").as[(Long, Long)]
          .collect().sortBy(_._1)
        var acc = 0L
        val expect = rows.sortBy(_._1).map { case (k, v) =>
          val c = acc; acc += v; (k, c)
        }
        assert(got.toSeq == expect, s"case n=$n parts=$parts diverged")
        assert(total == rows.map(_._2).sum)
    }
  }

  test("equi-depth buckets reproduce SQL NTILE sizes exactly (uneven arm included)") {
    // n = 23, k = 4 → NTILE sizes 6,6,6,5
    val df = (1L to 23L).map(_ * 3).toDF("k")
    val sizes = DenseId.equiDepth(df, "k", 4, 3)
      .groupBy("bucket").count().orderBy("bucket")
      .as[(Long, Long)].collect().toSeq
    assert(sizes == Seq((1L, 6L), (2L, 6L), (3L, 6L), (4L, 5L)))
    // and bucket order follows key order
    val b1max = DenseId.equiDepth(df, "k", 4, 3)
      .where(col("bucket") === 1).agg(max("k")).head.getLong(0)
    val b2min = DenseId.equiDepth(df, "k", 4, 3)
      .where(col("bucket") === 2).agg(min("k")).head.getLong(0)
    assert(b1max < b2min)
  }

  test("degenerate splits (constant-heavy key space) still produce dense ids") {
    // quantile splits collapse to few distinct values; buckets merge but
    // ids stay correct because offsets follow the ACTUAL bucket counts
    val df = ((1L to 50L) ++ (200L to 210L)).toDF("k")
    val got = DenseId.assign(df, "k", 8)
      .select("rid").as[Long].collect().sorted
    assert(got.toSeq == (1L to 61L))
  }

  test("q_percent_rank plan stays bucket-parallel; naive percent_rank collapses") {
    val plan = DenseId.queries("q_percent_rank")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"percent_rank plan collapsed to one partition:\n$plan")
    val trap = graft.sources.Tables.customer(spark, sf)
      .withColumn("pr", percent_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy("c_custkey")))
      .queryExecution.executedPlan.toString
    assert(trap.contains("SinglePartition"))
  }

  test("percent_rank/cume_dist values match the native window bit-for-bit") {
    val got = DenseId.queries("q_percent_rank")(spark, sf)
      .select("c_custkey", "pr", "cd")
      .as[(Long, Double, Double)].collect()
    val exp = {
      val w = org.apache.spark.sql.expressions.Window.orderBy("sort_key")
      graft.sources.Tables.customer(spark, sf)
        .select(col("c_custkey"),
          (round(col("c_acctbal") * 100).cast("long") * 1000000 +
            col("c_custkey")).as("sort_key"))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .select("c_custkey", "pr", "cd")
        .as[(Long, Double, Double)].collect()
    }
    assert(got.sortBy(_._1).toSeq == exp.sortBy(_._1).toSeq)
  }
}
