package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for the X86 exact-arithmetic 3σ outlier gate. */
class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("flags agree with a hand-computed golden group") {
    // Group of 11: ten 10.00s and one 100.00. μ = 18.18…, population
    // σ ≈ 25.88 → 3σ ≈ 77.6; |100 − 18.18| ≈ 81.8 > 3σ → only the spike
    // is an outlier (the 10s sit at 0.32σ).
    val df = ((1 to 10).map(i => (i.toLong, "g", 10.00)) :+ (11L, "g", 100.00))
      .toDF("event_id", "event_type", "value")
    val out = outlierRows(df)
    assert(out == Set(11L), s"got $out")
  }

  test("constant group has zero variance and zero outliers (0 > 0 is false)") {
    val df = (1 to 5).map(i => (i.toLong, "g", 7.25)).toDF("event_id", "event_type", "value")
    assert(outlierRows(df).isEmpty)
  }

  test("matches the double z-score gate away from boundaries") {
    val rnd = new scala.util.Random(23)
    val df = (1 to 2000).map { i =>
      (i.toLong, s"t${i % 3}", math.round(rnd.nextGaussian() * 500 + 5000) / 100.0)
    }.toDF("event_id", "event_type", "value")
    val exact = outlierRows(df)
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byG = rows.groupBy(_._2)
    val naive = byG.values.flatMap { rs =>
      val vs = rs.map(_._3)
      val mu = vs.sum / vs.length
      val sd = math.sqrt(vs.map(v => (v - mu) * (v - mu)).sum / vs.length)
      rs.filter(r => math.abs(r._3 - mu) > 3 * sd).map(_._1)
    }.toSet
    assert(exact == naive)
  }

  /** Run the q_outliers pipeline shape on an arbitrary frame and return
    * the flagged event_ids.
    */
  private def outlierRows(df: org.apache.spark.sql.DataFrame): Set[Long] = {
    val c = df.select(col("event_type"), col("event_id"),
      round(col("value") * 100, 0).cast("decimal(20,0)").as("c"))
    val st = c.groupBy("event_type").agg(
      count(lit(1)).cast("decimal(20,0)").as("n"),
      sum(col("c")).as("sc"),
      sum(col("c") * col("c")).as("ssc"))
    val lhs = (col("c") * col("n") - col("sc")) * (col("c") * col("n") - col("sc"))
    val rhs = (col("ssc") * col("n") - col("sc") * col("sc")) * 9
    c.join(broadcast(st), Seq("event_type"))
      .where(lhs > rhs)
      .select("event_id").as[Long].collect().toSet
  }
}
