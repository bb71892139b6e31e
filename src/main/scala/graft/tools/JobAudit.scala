package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Diagnostic main: per query, the number of Spark jobs/stages/tasks one
  * WARM invocation launches. Overhead-dominated queries (many jobs for
  * little data) are where fixed per-query bench cost hides; this is the
  * measurement behind the round-6 bench work, not part of the driver
  * contract.
  */
object JobAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "2048")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    }
    spark.sparkContext.addSparkListener(listener)

    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
    val rows = selected.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).count() // warm (builds fixtures, compiles codegen)
        Thread.sleep(150) // drain the async listener bus (diagnostic-grade)
        jobs = 0; stages = 0; tasks = 0
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150) // drain the async listener bus (diagnostic-grade)
        Some((name, sec, jobs, stages, tasks))
      } catch { case e: Throwable =>
        println(f"$name%-28s FAILED ${e.toString.take(120)}")
        None
      }
    }
    println(f"${"query"}%-28s ${"sec"}%8s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s")
    rows.sortBy(-_._3).foreach { case (n, s, j, st, t) =>
      println(f"$n%-28s $s%8.3f $j%5d $st%7d $t%6d")
    }
    println(f"TOTAL sec=${rows.map(_._2).sum}%.2f jobs=${rows.map(_._3).sum} tasks=${rows.map(_._5).sum}")
    spark.stop()
  }
}
