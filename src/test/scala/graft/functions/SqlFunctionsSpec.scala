package graft.functions

import graft.SparkSpec

/** X171 — the SQL function registry: both registration routes resolve the
  * whole expression library, registration is idempotent, and the one
  * plan-shape argument (topk_by_count's k) refuses non-literals loudly.
  */
class SqlFunctionsSpec extends SparkSpec {

  private val names = Seq("vec_cosine", "vec_dot", "jaro_winkler",
    "url_canon", "html_text", "nfc_normalize", "topk_by_count")

  test("live registration resolves all seven functions with graft semantics") {
    SqlFunctions.registerAll(spark)
    names.foreach { n =>
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n)),
        s"$n not registered")
    }
    // one end-to-end value per family: the SQL text must hit the SAME
    // codegen'd expressions the Scala API builds
    val row = spark.sql(
      """SELECT vec_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d,
        |       jaro_winkler('martha', 'marhta') AS jw,
        |       url_canon('HTTP://Example.COM:80/a/?b=2&a=1#frag') AS u,
        |       html_text('<p>hi <b>there</b></p>') AS h,
        |       nfc_normalize('José') AS n
        |""".stripMargin).head()
    assert(row.getDouble(0) == 11.0)
    assert(math.abs(row.getDouble(1) - 0.9611111111) < 1e-9)
    assert(row.getString(2) == "http://example.com/a?a=1&b=2")
    assert(row.getString(3).trim == "hi there")
    // decomposed e+U+0301 (5 chars in) composes to the 4-char NFC form
    assert(row.getString(4) == "José")
    // the aggregate: top-1 by count over a tiny group
    import spark.implicits._
    Seq("a", "b", "b").toDF("v").createOrReplaceTempView("sqlfn_tk")
    val tk = spark.sql(
      "SELECT topk_by_count(v, 1) AS t FROM sqlfn_tk").head().getSeq[Any](0)
    assert(tk.map(_.toString).exists(_.contains("b")), s"got $tk")
  }

  test("registration is idempotent — a second registerAll changes nothing") {
    SqlFunctions.registerAll(spark)
    SqlFunctions.registerAll(spark)
    assert(spark.sql("SELECT vec_dot(array(1.0f), array(2.0f)) AS d")
      .head().getDouble(0) == 2.0)
  }

  test("GraftExtensions injects the whole library into a fresh registry") {
    // `SparkSession.builder().withExtensions(...).getOrCreate()` on a JVM
    // with a live session returns that session and silently DROPS the
    // extensions (and `newSession()` skips them too), so asserting through
    // a session never tests the injectFunction route (round-7 ADVICE: the
    // old form of this test passed only because an earlier test had run
    // registerAll on the shared session). Instead, apply the extensions
    // instance to a fresh builtin-clone registry — byte-for-byte what
    // BaseSessionStateBuilder does at session construction — and assert
    // against THAT registry.
    val ext = new org.apache.spark.sql.SparkSessionExtensions()
    new GraftExtensions()(ext)
    val reg = org.apache.spark.sql.GraftShim.extensionsRegistry(ext)
    names.foreach { n =>
      assert(reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n)),
        s"$n missing from extensions-built registry")
    }
    // the injected builder must produce the real evaluable expression
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = reg.lookupFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("url_canon"),
      Seq(Literal("HTTPS://A.B:443/x/")))
    assert(e.eval(null).toString == "https://a.b/x")
  }

  test("topk_by_count refuses a non-literal k at plan time, not mid-job") {
    SqlFunctions.registerAll(spark)
    import spark.implicits._
    Seq(("a", 1), ("b", 2)).toDF("v", "k").createOrReplaceTempView("sqlfn_badk")
    val e = intercept[Exception](
      spark.sql("SELECT topk_by_count(v, k) FROM sqlfn_badk").collect())
    assert(e.getMessage.toLowerCase.contains("literal"), e.getMessage)
  }
}
