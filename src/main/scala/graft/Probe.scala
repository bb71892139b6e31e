package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (dev-only, not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    t("warmup count")(sources.Tables.documents(s, d).count())
    if (args.contains("scale-sweep")) {
      // replicate the documents corpus with perturbed ids/texts and time
      // the dedup family at growing scale — the empirical check that the
      // bucketed/prefix-filtered plans grow ~linearly in corpus size
      // (modulo genuine near-dup pair growth inside the planted cluster)
      Seq(1, 4, 10).foreach { mult =>
        val dir = util.Scratch.dir(s"sweep$mult")
        val base = sources.Tables.documents(s, d)
        (0 until mult).map(i => base
            .withColumn("doc_id", col("doc_id") + i * 1000000L)
            .withColumn("text", concat(col("text"), lit(s" v$i"))))
          .reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        Seq("q_dedup_doc_exact", "q_dedup_minhash", "q_dedup_ngram_jaccard",
          "q_dedup_simhash").foreach { q =>
          t(s"${q}@${mult}x")(SparkEntry.queries(q)(s, dir).count())
        }
      }
    }
    if (args.contains("minhash-stages")) {
      t("docShingles compute")(ext.Dedup.docShingles(s, d).where(size(col("sh")) > 0).count())
      val t0 = System.nanoTime()
      val sh = ext.Dedup.materializePublic(s,
        ext.Dedup.docShingles(s, d).where(size(col("sh")) > 0), "probe_sh")
      println(f"PROBE materialize sh            ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      t("minhashSigs compute")(ext.Dedup.minhashSigs(sh).count())
      val t1 = System.nanoTime()
      val sig = ext.Dedup.materializePublic(s, ext.Dedup.minhashSigs(sh), "probe_sig")
      println(f"PROBE materialize sig           ${(System.nanoTime() - t1) / 1e9}%8.2f s")
    }
    args.filter(SparkEntry.queries.contains).foreach { q =>
      t(q)(SparkEntry.queries(q)(s, d).count())
    }
    s.stop()
  }
}
