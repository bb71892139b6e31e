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
    args.filter(SparkEntry.queries.contains).foreach { q =>
      t(q)(SparkEntry.queries(q)(s, d).count())
    }
    s.stop()
  }
}
