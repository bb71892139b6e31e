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
    if (args.contains("recall-sweep")) {
      // recall@k of the ANN tiers vs brute force at growing corpus scale —
      // the quantitative evidence behind the no-oracle q_sim_lsh/q_sim_ivf
      // rows (VERDICT r2 item 8). Replicas are deterministically perturbed
      // per dimension (scale alone would leave cosine invariant), so each
      // round multiplies the candidate set with near- but not exact
      // duplicates; the query vectors (vec_id < nQueries) stay unperturbed.
      Seq(1, 4, 10).foreach { mult =>
        val dir = util.Scratch.dir(s"rsweep$mult")
        val base = sources.Tables.embeddings(s, d)
        (0 until mult).map(i => base
            .withColumn("vec_id", col("vec_id") + i * 1000000L)
            .withColumn("embedding", transform(col("embedding"), (x, j) =>
              (x + lit(i * 0.02f) *
                sin(j.cast("double") * 0.7 + col("vec_id").cast("double")).cast("float"))
                .cast("float"))))
          .reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        val exact = SparkEntry.queries("q_sim_topk")(s, dir)
          .select("qid", "cand_id").cache()
        val tot = exact.count()
        Seq("q_sim_lsh", "q_sim_ivf").foreach { q =>
          val t0 = System.nanoTime()
          val approx = SparkEntry.queries(q)(s, dir).select("qid", "cand_id")
          val hit = exact.intersect(approx).count()
          println(f"PROBE recall@${ext.Similarity.k} $q%-10s ${mult}%2dx  ${hit.toDouble / tot}%.3f ($hit/$tot)  ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        }
        exact.unpersist()
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
