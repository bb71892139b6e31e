package graft.pipeline

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.lake.Layout
import graft.sinks.Jdbc
import graft.sinks.Jdbc.JdbcConfig

/** Composed-pipeline pins (X40) beyond the oracled q_pipeline_e2e:
  * golden rows for each diff-fidelity branch, and the retry contract —
  * re-running a completed run changes NOTHING, in the lake or in JDBC
  * (the reference's Airflow retries, `airflow/dags/apify_dag.py:38-39`,
  * would duplicate both its formatted-layer appends and its Postgres
  * inserts).
  */
class PipelineSpec extends SparkSpec {

  private lazy val timeline: Pipeline.Config =
    PipelineQueries.replayTimeline(spark, sf)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private lazy val finalRows: Seq[String] =
    rows(PipelineQueries.finalState(spark, timeline))

  test("pipeline: timeline produces all three final tables") {
    val srcs = finalRows.map(_.split(",")(0).drop(1)).distinct.sorted
    assert(srcs == Seq("agg", "cmp", "glob"))
  }

  test("pipeline: rename in run 3 shows as added+deleted under the new/old key") {
    // first %13==0 key in the scope that is a run-2 AND run-3 member:
    // 65 → %8==1 (acct_a), %10==5 (all runs), %5==0 → "James", male 0.9
    val cmp = finalRows.filter(s => s.contains("cmp") && s.contains("u65"))
    assert(cmp.exists(s => s.contains("James Renamed") && s.contains("added")))
    assert(cmp.exists(s => s.contains("James Doe") && s.contains("deleted")))
    assert(cmp.forall(s => s.contains("male,0.9")))
  }

  test("pipeline: NULL-key rows surface as both added and deleted (reference fidelity)") {
    // 77: %11==0 → NULL full_name, %7==0 → Emma_77 (female 0.7 via the
    // username tier), member of runs 2 and 3 (%10==7)
    val cmp = finalRows.filter(s => s.contains("cmp") && s.contains("Emma_77"))
    assert(cmp.exists(_.contains("added")))
    assert(cmp.exists(_.contains("deleted")))
    assert(cmp.forall(s => s.contains("female,0.7")))
  }

  test("pipeline: global diff carries cross-day tags at run 2 and same-day at run 3") {
    val glob = finalRows.filter(_.startsWith("[glob"))
    // run 2 (0900) diffs day-2 against day-1: both tags present
    assert(glob.exists(s => s.contains(",900,") && s.contains("added_global")))
    assert(glob.exists(s => s.contains(",900,") && s.contains("deleted_global")))
    // run 3 (1000): current side is the day's two-run union, so only
    // NULL-key rows can be deleted_global (they never match themselves)
    val del3 = glob.filter(s => s.contains(",1000,") && s.contains("deleted_global"))
    assert(del3.nonEmpty && del3.forall(_.contains(",null,")))
  }

  test("pipeline: re-running a completed run is a no-op on every table") {
    val before = finalRows // forces the timeline lazily first
    val usageBefore = rows(Layout.snapshots(spark, Pipeline.usageRef(timeline, "acct_a")))
    val fmtBefore = rows(Layout.snapshots(spark, Pipeline.formattedRef(timeline, "acct_a")))

    // retry run 2 with identical payloads (the Airflow retry shape)
    val payloads = Seq(("acct_a", 1), ("acct_b", 5)).map { case (a, m) =>
      a -> PipelineQueries.payloadJson(spark, sf, m, 2)
    }
    Pipeline.runHourly(spark, timeline, 20250302, 900, payloads)

    assert(rows(PipelineQueries.finalState(spark, timeline)) == before)
    assert(rows(Layout.snapshots(spark, Pipeline.usageRef(timeline, "acct_a"))) == usageBefore)
    assert(rows(Layout.snapshots(spark, Pipeline.formattedRef(timeline, "acct_a"))) == fmtBefore)
  }

  test("pipeline: JDBC sink is retry-idempotent (delete-own-stamp-then-append)") {
    val jdbc = JdbcConfig(
      url = "jdbc:derby:memory:graftpipe;create=true",
      driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val cfg = PipelineQueries.replayTimeline(spark, sf,
      Some(Pipeline.Config(graft.util.Scratch.dir("pipeline_jdbc"), jdbc = Some(jdbc))))

    def tableRows(t: String): Seq[String] =
      rows(Jdbc.read(spark, jdbc, t))

    val agg = tableRows("final_aggregated_usage")
    val cmp = tableRows("final_comparatif_usage")
    val acct = tableRows("acct_a")
    assert(agg.nonEmpty && cmp.nonEmpty && acct.nonEmpty)
    // the per-run stamps partition the table: one batch per (date, time)
    assert(agg.exists(_.contains("20250301")) && agg.exists(_.contains("20250302")))

    // retry run 2: JDBC contents must not grow or change
    val payloads = Seq(("acct_a", 1), ("acct_b", 5)).map { case (a, m) =>
      a -> PipelineQueries.payloadJson(spark, sf, m, 2)
    }
    Pipeline.runHourly(spark, cfg, 20250302, 900, payloads)

    assert(tableRows("final_aggregated_usage") == agg)
    assert(tableRows("final_comparatif_usage") == cmp)
    assert(tableRows("acct_a") == acct)
  }

  test("pipeline: aggregates flow to the ES _bulk endpoint keyed by username") {
    import java.net.InetSocketAddress
    import java.nio.charset.StandardCharsets
    import com.sun.net.httpserver.HttpServer
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/_bulk", ex => {
      received.add(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      val resp = """{"errors":false}""".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    try {
      val es = graft.sinks.Elastic.EsConfig("127.0.0.1", server.getAddress.getPort)
      val cfg = Pipeline.Config(graft.util.Scratch.dir("pipeline_es"), es = Some(es))
      val payloads = Seq(("acct_a", 1), ("acct_b", 5)).map { case (a, m) =>
        a -> PipelineQueries.payloadJson(spark, sf, m, 1)
      }
      Pipeline.runHourly(spark, cfg, 20250301, 1100, payloads)
      val actions = received.toArray(Array.empty[String])
        .flatMap(_.split("\n")).filter(_.contains("\"_index\""))
      assert(actions.nonEmpty)
      // run 1 has no comparatif → only the aggregated index is written
      assert(actions.forall(_.contains(""""_index":"final_aggregated_index"""")))
      // doc-id upsert keyed by username (the reference's es.mapping.id)
      assert(actions.exists(_.matches(""".*"_id":"(u|Emma_)\d+".*""")))
    } finally server.stop(0)
  }
}
