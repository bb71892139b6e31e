package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X56 temperature resampling: rate formula goldens, never-oversample
  * invariant, determinism, and mix flattening on the real fixture.
  */
class TemperatureSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(counts: (String, Int)*) =
    counts.toSeq.flatMap { case (lang, n) =>
      (0 until n).map(i => (s"$lang-$i".hashCode.toLong & 0x7fffffffL, lang))
    }.toDF("doc_id", "lang")

  test("keep rates follow sqrt(n_min/n_l); smallest language is kept whole") {
    val rates = Temperature.keepRates(corpus("en" -> 400, "fr" -> 100, "is" -> 25))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Double]("keep_rate")).toMap
    assert(rates("is") == 1.0)
    assert(rates("fr") == math.sqrt(25.0 / 100.0))
    assert(rates("en") == math.sqrt(25.0 / 400.0))
  }

  test("sampling never keeps more than a language has; decisions are deterministic") {
    val docs = corpus("en" -> 300, "de" -> 50)
    val a = Temperature.resample(docs).where($"kept").select("doc_id")
      .as[Long].collect().sorted.toSeq
    val b = Temperature.resample(docs).where($"kept").select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty && a.size <= 350)
  }

  test("resampling flattens the real fixture mix toward sqrt proportions") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = Temperature.resample(docs)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), count(when($"kept", 1)).as("k"))
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n"), r.getAs[Long]("k")))
    val rawSkew = out.map(_._2).max.toDouble / out.map(_._2).min
    val keptSkew = out.map(_._3).max.toDouble / out.map(_._3).min
    assert(keptSkew < rawSkew, s"kept mix ($keptSkew) should be flatter than raw ($rawSkew)")
  }

  test("X73 upsampling: rates ≥ 1, largest language exactly whole, expected growth") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)
    val rates = Temperature.upsampleRates(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rates.forall(_._3 >= 1.0), "upsample rates must never shrink a language")
    val maxLang = rates.maxBy(_._2)
    assert(maxLang._3 == 1.0, "the largest language is kept whole")
    val up = Temperature.upsample(docs)
    val perLang = up.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    rates.foreach { case (lang, n, r) =>
      val got = perLang(lang)
      // n·⌊r⌋ ≤ emitted ≤ n·⌈r⌉, and each doc appears ≥ once
      assert(got >= n * math.floor(r).toLong && got <= n * math.ceil(r).toLong,
        s"$lang: emitted $got outside [${n * math.floor(r).toLong}, ${n * math.ceil(r).toLong}]")
    }
    // every source doc survives with copy_idx starting at 1
    assert(up.where(col("copy_idx") === 1).count() == docs.count())
    // determinism: a second run emits the identical multiset
    val again = Temperature.upsample(docs).groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(again == perLang)
  }
}
