package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.UrlCanon

/** X146 pins beyond the hash gate: each canonicalization rule in
  * isolation, idempotence, pass-through of non-URLs, and the codegen
  * residency of the expression.
  */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def canonOf(raw: String): String =
    Seq(raw).toDF("u").select(UrlCanon.url_canon(col("u"))).head.getString(0)

  test("url_canon: every rule, one probe each") {
    // case-folds scheme+host only (path untouched), strips default port
    assert(canonOf("HTTP://ExAmple.COM:80/Path/A") == "http://example.com/Path/A")
    assert(canonOf("https://a.com:443/x") == "https://a.com/x")
    // explicit non-default port survives
    assert(canonOf("http://a.com:8080/x") == "http://a.com:8080/x")
    // https default port is NOT http's
    assert(canonOf("http://a.com:443/x") == "http://a.com:443/x")
    // trailing slashes drop, including the bare root
    assert(canonOf("http://a.com/x///") == "http://a.com/x")
    assert(canonOf("http://a.com/") == "http://a.com")
    // query params sort; empty params vanish; bare '?' drops
    assert(canonOf("http://a.com/x?b=2&a=1") == "http://a.com/x?a=1&b=2")
    assert(canonOf("http://a.com/x?b=2&&a=1&") == "http://a.com/x?a=1&b=2")
    assert(canonOf("http://a.com/x?") == "http://a.com/x")
    // fragment drops even with a query after the path
    assert(canonOf("http://a.com/x?a=1#Frag") == "http://a.com/x?a=1")
    // authority-only and query-only forms
    assert(canonOf("HTTPS://A.com") == "https://a.com")
    assert(canonOf("http://A.com?b=1&a=2") == "http://a.com?a=2&b=1")
    // non-URL passes through (minus fragment): never invents structure
    assert(canonOf("not a url#x") == "not a url")
    assert(canonOf("  http://a.com/x ") == "http://a.com/x") // trimmed
  }

  test("url_canon: idempotent and null-safe") {
    val messy = Seq("HTTP://ExAmple.COM:80/A/?b=2&a=1#f", null)
    val once = messy.toDF("u").select(UrlCanon.url_canon(col("u")).as("c"))
    val twice = once.select(UrlCanon.url_canon(col("c")).as("c2")).collect()
    assert(twice(0).getString(0) == "http://example.com/A?a=1&b=2")
    assert(twice(1).isNullAt(0))
  }

  test("url_canon: stays inside whole-stage codegen") {
    val df = spark.range(3).select(
      UrlCanon.url_canon(concat(lit("HTTP://A.com:80/p"),
        col("id").cast("string"), lit("/"))).as("c"))
    assert(df.collect().map(_.getString(0)).sorted.head == "http://a.com/p0")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expression fell out of codegen:\n$plan")
  }

  test("q_url_dedup: canonical groups collapse raw variants, winner is min id") {
    val out = Url.queries("q_url_dedup")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nDocs, nRaw, nCanon) =
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_raw"), r.getAs[Long]("n_canon"))
      assert(nCanon <= nRaw && nRaw <= nDocs)
      assert(r.getAs[String]("first_canon").startsWith("http"))
    }
    // collapsing must actually fire somewhere (tiny sources may be 1:1)
    assert(out.map(_.getAs[Long]("n_canon")).sum <
      out.map(_.getAs[Long]("n_raw")).sum,
      "fixture must actually exercise collapsing")
  }

  test("blocklist: registrable-domain semantics — subdomains blocked, lookalikes kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "http://site.org/a"),            // exact match → blocked
      (2L, "http://ads.site.org/b"),        // subdomain → blocked
      (3L, "HTTPS://A.B.SiTe.ORG:443/c"),   // deep subdomain + case/port mess → blocked
      (4L, "http://xsite.org/d"),           // lookalike suffix STRING, not a subdomain → kept
      (5L, "http://site.org.evil.com/e"),   // blocked domain as a NON-suffix label → kept
      (6L, "http://other.net/f")            // unrelated → kept
    ).toDF("doc_id", "url")
    val bl = Seq("site.org").toDF("domain")
    val kept = Url.filterBlocked(docs, "url", "doc_id", bl)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(4L, 5L, 6L))
  }

  test("blocklist: suffix chain is exact label decomposition") {
    import spark.implicits._
    val out = Seq("a.b.example.com").toDF("h")
      .select(Url.hostSuffixes(col("h"))).head.getSeq[String](0)
    assert(out == Seq("a.b.example.com", "b.example.com", "example.com", "com"))
  }
}
