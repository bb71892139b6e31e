package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  test("golden: backward match, <= semantics, no-match nulls, key isolation") {
    val quotes = Seq((1L, 10L, 1.5), (1L, 20L, 2.5), (2L, 15L, 9.0))
      .toDF("k", "t", "v")
    val trades = Seq((1L, 5L), (1L, 15L), (1L, 20L), (2L, 30L), (3L, 9L))
      .toDF("k", "t")
    val got = AsofJoin.asofJoin(trades, quotes,
        keys = Seq("k"), leftTime = "t", rightTime = "t",
        rightValues = Seq("v"), matchedTimeAlias = "qt")
      .select("k", "t", "qt", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got == Seq(
      (1L, 5L, None, None), // before any quote
      (1L, 15L, Some(10L), Some(1.5)), // strictly-before match
      (1L, 20L, Some(20L), Some(2.5)), // same-time match counts (<=)
      (2L, 30L, Some(15L), Some(9.0)), // other key's quotes invisible
      (3L, 9L, None, None))) // key with no quotes at all
  }

  test("property: asof == argmax-by-subquery on fixture data") {
    val q = AsofJoin.queries("q_asof_join")(spark, sf)
    // naive reformulation: range join then keep the max quote_date per trade
    val o = graft.sources.Tables.orders(spark, sf)
    val quotes = o.where(col("o_orderkey") % 3 =!= 0)
      .groupBy(col("o_custkey").as("qc"), col("o_orderdate").as("qd"))
      .agg(max("o_totalprice").as("qp"))
    val trades = o.where(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate").as("trade_date"))
    val w = Window.partitionBy("o_orderkey").orderBy(col("qd").desc)
    val naive = trades.join(quotes,
        col("o_custkey") === col("qc") && col("qd") <= col("trade_date"), "left")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_orderkey"), col("o_custkey"), col("trade_date"),
        col("qd").as("quote_date"), col("qp").as("quote_price"))
    val a = q.collect().map(_.toSeq).toSeq
    val b = naive.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("plan: the operator is one shuffle by key, no range-join blowup") {
    val quotes = Seq((1L, 10L, 1.5)).toDF("k", "t", "v")
    val trades = Seq((1L, 5L)).toDF("k", "t")
    val df = AsofJoin.asofJoin(trades, quotes, Seq("k"), "t", "t", Seq("v"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("Join"), "asof must be union+window, not any join")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 key shuffle, saw $shuffles in:\n$plan")
    // the full q_asof_join adds exactly one more shuffle: the quote-side
    // pre-aggregation to one row per (key, time)
    val q = AsofJoin.queries("q_asof_join")(spark, sf)
    q.collect()
    val qplan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(qplan).size == 2, qplan.take(400))
  }
}
