package graft.sinks

import java.util.jar.JarFile

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.Jdbc.JdbcConfig

/** S8/S9/S10 connector modules. No live Postgres/Elasticsearch exists in
  * the sandbox, so:
  *  - JDBC is exercised END-TO-END against embedded Derby (ships in
  *    /opt/spark/jars): real Spark JDBC append writes + single-partition and
  *    range-partitioned reads through [[Jdbc]];
  *  - the Postgres path is pinned at the option-assembly layer plus a
  *    driver-class load from the public jar the reference ships;
  *  - Elasticsearch is pinned at option assembly + index routing (the
  *    connector jar is Scala-2.12-built; its classes can't link here).
  */
class SinksSpec extends SparkSpec {

  private val derbyCfg = JdbcConfig(
    url = "jdbc:derby:memory:graftdb;create=true",
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  test("jdbc: table-name sanitization matches the reference's -_ fix and extends it") {
    assert(Jdbc.sanitizeTable("the-rock") == "the_rock") // the reference's exact case
    assert(Jdbc.sanitizeTable("formatted_data-the-rock") == "formatted_data_the_rock")
    assert(Jdbc.sanitizeTable("already_fine_123") == "already_fine_123")
    assert(Jdbc.sanitizeTable("weird.name with spaces") == "weird_name_with_spaces")
  }

  test("jdbc: option assembly carries url/driver/credentials and the sanitized table") {
    val cfg = JdbcConfig("jdbc:postgresql://db:5432/airflow",
      user = Some("u"), password = Some("p"))
    val opts = Jdbc.options(cfg, "formatted-data")
    assert(opts("url") == "jdbc:postgresql://db:5432/airflow")
    assert(opts("dbtable") == "formatted_data")
    assert(opts("driver") == "org.postgresql.Driver")
    assert(opts("user") == "u" && opts("password") == "p")
  }

  test("jdbc: credentials are omitted, not blank, when unset") {
    val opts = Jdbc.options(derbyCfg, "t")
    assert(!opts.contains("user") && !opts.contains("password"))
  }

  test("jdbc: the reference's public Postgres driver jar loads") {
    val jar = new java.io.File("/root/reference/jars/postgresql-42.2.27.jar")
    assume(jar.isFile)
    val cl = new java.net.URLClassLoader(
      Array(jar.toURI.toURL), ClassLoader.getPlatformClassLoader)
    try assert(cl.loadClass("org.postgresql.Driver") != null)
    finally cl.close()
  }

  test("jdbc: append round-trips through a real JDBC database (Derby)") {
    import spark.implicits._
    val df = Seq(("alice", "Alice A", "female", 0.9),
      ("bob", "Bob B", "male", 0.9)).toDF("username", "full_name", "predicted_gender", "confidence")
    Jdbc.append(df, derbyCfg, "scored-accounts") // sanitized to scored_accounts
    Jdbc.append(df.limit(1), derbyCfg, "scored_accounts") // append accumulates
    val back = Jdbc.read(spark, derbyCfg, "scored_accounts")
    assert(back.count() == 3)
    assert(back.columns.sorted.toSeq == Seq("confidence", "full_name", "predicted_gender", "username"))
    // NB: driver-side check on purpose — Spark maps StringType to Derby
    // CLOB, and Derby can't evaluate a pushed-down CLOB = 'alice' filter
    assert(back.collect().count(_.getAs[String]("username") == "alice") == 2)
  }

  test("jdbc: range-partitioned read splits the scan into numPartitions tasks") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"row$i")).toDF("id", "payload")
    Jdbc.append(df, derbyCfg, "wide_table")
    val part = Jdbc.readPartitioned(spark, derbyCfg, "wide_table",
      partitionColumn = "id", lowerBound = 0, upperBound = 100, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)
    // no row lost or duplicated at the range boundaries
    assert(part.agg(countDistinct("id")).head.getLong(0) == 100)
  }

  test("elastic: option assembly matches the reference's connector contract") {
    val opts = Elastic.options(Elastic.EsConfig("esnode", 9201, wanOnly = true),
      "final_aggregated_index", "username")
    assert(opts("es.nodes") == "esnode")
    assert(opts("es.port") == "9201")
    assert(opts("es.nodes.wan.only") == "true")
    assert(opts("es.resource") == "final_aggregated_index")
    assert(opts("es.mapping.id") == "username")
  }

  test("elastic: aggregate routing fixes the reference's clobber bug by default") {
    // reference behavior: both writes hit final_aggregated_index, so the
    // comparatif write clobbers the aggregated docs (apify_dag.py:298,314)
    assert(Elastic.aggregateRouting(preserveReferenceClobber = true) ==
      ("final_aggregated_index", "final_aggregated_index"))
    // our default: each aggregate gets its own index
    assert(Elastic.aggregateRouting(preserveReferenceClobber = false) ==
      ("final_aggregated_index", "final_comparatif_index"))
  }

  test("elastic: indexed_at is the reference's string format at the sink boundary") {
    import spark.implicits._
    val tagged = Seq("x").toDF("username").withColumn("indexed_at", Elastic.indexedAtCol)
    val v = tagged.head.getString(1)
    assert(v.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"""), s"got: $v")
    assert(tagged.schema("indexed_at").dataType.typeName == "string")
  }

  test("elastic: the public connector jar ships the datasource the module targets") {
    val jarPath = "/root/reference/jars/elasticsearch-spark-30_2.12-8.5.3.jar"
    assume(new java.io.File(jarPath).isFile)
    val jar = new JarFile(jarPath)
    try {
      // the format name resolves via DataSourceRegister / package naming:
      // org.elasticsearch.spark.sql.DefaultSource is the connector's entry
      assert(jar.getEntry("org/elasticsearch/spark/sql/DefaultSource.class") != null)
    } finally jar.close()
  }
}
