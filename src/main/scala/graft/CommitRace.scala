package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.{DeleteVectors, ManifestTable}

/** Two-PROCESS optimistic-commit race runner (dev harness, driven by
  * `tools/commit_race.sh`).
  *
  * X96's rename-as-commit concurrency was raced intra-JVM by ManifestSpec
  * (thread barriers); this main puts each writer in its OWN JVM so the
  * race crosses real process isolation — separate Hadoop FileSystem
  * instances, separate page caches, no shared JVM locks — the deployment
  * shape of the reference's parallel per-account spark-submits
  * (`apify_dag.py:83-91,336`), which are exactly concurrent writer
  * processes against shared storage. Assertions mirror ManifestSpec:
  * per-writer versions strictly increase, the union is contiguous with
  * no gaps, and no append/delete is lost.
  *
  * Modes (first arg):
  *  - `seed <dir>`            — commit v1: ids 1..10 tagged "base"
  *  - `append <dir> <tag> <rounds> <startFile>` — wait for startFile,
  *    then `rounds` × appendRetrying of one `(id, tag)` row each; writes
  *    its committed version list to `<dir>/_versions_<tag>.txt`
  *  - `delete <dir> <rounds> <startFile>` — `rounds` × delete of base id
  *    `2k` (k = 1..rounds ≤ 5): predicates touch only seeded rows, so the
  *    final state is ORDER-INDEPENDENT and exactly checkable even though
  *    the interleaving is not
  *  - `check-append <dir> <rounds>`  — assertions after an append/append race
  *  - `check-appdel <dir> <aRounds> <dRounds>` — after an append/delete race
  *
  * Retry budget is deliberately generous (100): unlike the barrier-synced
  * spec, an unsynchronized process can lose many consecutive races in a
  * burst; the harness tests losslessness, not retry tuning.
  */
object CommitRace {
  private val Retries = 100

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Block until the launcher's start flag exists — both writer JVMs
    * finish (slow, variable) SparkSession startup BEFORE the gun fires,
    * so the commit loops genuinely overlap.
    */
  private def awaitStart(flag: String): Unit = {
    val deadline = System.currentTimeMillis() + 60000
    while (!Files.exists(Paths.get(flag))) {
      if (System.currentTimeMillis() > deadline)
        sys.error(s"start flag $flag never appeared")
      Thread.sleep(20)
    }
  }

  def main(args: Array[String]): Unit = args(0) match {
    case "seed" =>
      val s = session(); import s.implicits._
      ManifestTable.commit(
        (1L to 10L).toDF("id").withColumn("tag", lit("base")),
        args(1), 20250816, 800)
      s.stop()

    case "append" =>
      val s = session(); import s.implicits._
      val (dir, tag, rounds) = (args(1), args(2), args(3).toInt)
      awaitStart(args(4))
      val versions = (1 to rounds).map { i =>
        ManifestTable.appendRetrying(
          Seq((1000L * (tag.hashCode.abs % 97 + 1) + i, tag)).toDF("id", "tag"),
          dir, 20250816, 900 + i, maxRetries = Retries)
      }
      Files.writeString(Paths.get(s"$dir/_versions_$tag.txt"),
        versions.mkString(","))
      println(s"RACE append $tag versions=${versions.mkString(",")}")
      s.stop()

    case "delete" =>
      val s = session()
      val (dir, rounds) = (args(1), args(2).toInt)
      require(rounds <= 5, "only 5 even base ids exist to delete")
      awaitStart(args(3))
      val versions = (1 to rounds).map { k =>
        DeleteVectors.deleteWhereRetrying(s, dir, col("id") === (2L * k),
          20250816, 900 + k, maxRetries = Retries)
      }
      Files.writeString(Paths.get(s"$dir/_versions_del.txt"),
        versions.mkString(","))
      println(s"RACE delete versions=${versions.mkString(",")}")
      s.stop()

    case "check-append" =>
      val s = session(); import s.implicits._
      val (dir, rounds) = (args(1), args(2).toInt)
      val (va, vb) = (readVersions(dir, "a"), readVersions(dir, "b"))
      // same three assertions as ManifestSpec's X96 two-writer test
      assert(va == va.sorted && vb == vb.sorted,
        s"per-writer versions must strictly increase: a=$va b=$vb")
      assert((va ++ vb).sorted == (2 to 1 + 2 * rounds),
        s"union must be contiguous 2..${1 + 2 * rounds}: a=$va b=$vb")
      assert(ManifestTable.snapshots(s, dir).map(_.version) ==
        (1 to 1 + 2 * rounds), "log must hold every version exactly once")
      val got = ManifestTable.readLatest(s, dir)
        .groupBy("tag").count().as[(String, Long)].collect().toMap
      assert(got == Map("base" -> 10L, "a" -> rounds.toLong, "b" -> rounds.toLong),
        s"no lost update: $got")
      // contention evidence: how many adjacent versions changed hands
      val owner = (va.map(_ -> "a") ++ vb.map(_ -> "b")).sortBy(_._1).map(_._2)
      val handoffs = owner.zip(owner.tail).count { case (x, y) => x != y }
      println(s"RACE check-append OK versions=${1 + 2 * rounds} handoffs=$handoffs")
      s.stop()

    case "check-appdel" =>
      val s = session(); import s.implicits._
      val (dir, aRounds, dRounds) = (args(1), args(2).toInt, args(3).toInt)
      val n = 1 + aRounds + dRounds
      assert(ManifestTable.snapshots(s, dir).map(_.version) == (1 to n),
        "log must hold every version exactly once")
      val ids = ManifestTable.readLatest(s, dir)
        .select("id").as[Long].collect().toSet
      val baseSurvivors = (1L to 10L).toSet -- (1 to dRounds).map(2L * _)
      assert(ids.filter(_ <= 10) == baseSurvivors,
        s"deletes must land exactly: ${ids.filter(_ <= 10)} vs $baseSurvivors")
      assert(ids.count(_ > 10) == aRounds,
        s"all $aRounds appends must survive: ${ids.filter(_ > 10)}")
      println(s"RACE check-appdel OK versions=$n")
      s.stop()

    case other => sys.error(s"unknown mode $other")
  }

  private def readVersions(dir: String, tag: String): Seq[Int] = {
    val p = Paths.get(s"$dir/_versions_$tag.txt")
    require(Files.exists(p), s"writer $tag never reported — did its JVM die?")
    Files.readString(p).trim.split(",").toSeq.map(_.toInt)
  }
}
