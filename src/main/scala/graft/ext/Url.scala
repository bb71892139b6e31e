package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.UrlCanon
import graft.sources.Tables

/** URL canonicalization + URL-keyed dedup (extension X146) — the
  * CommonCrawl/C4 front-door hygiene step: the same page arrives under
  * many spellings (`HTTP://Host.COM:80/a/` vs `http://host.com/a`), and
  * exact dedup keyed on the raw string silently keeps every variant.
  * Canonicalize first ([[graft.functions.UrlCanon]] — codegen'd
  * expression, rules documented there), then dedup on the canonical
  * form with the usual min-id winner rule (E1's shape).
  *
  * Scale shape: canonicalization is a pure per-row expression riding the
  * scan's partitioning — zero shuffles added. The dedup itself is one
  * hash aggregation on the canonical key, map-side combinable, identical
  * to the 100 TB-safe exact-dedup plan. Nothing here is ever O(corpus²).
  *
  * The fixture synthesizes adversarial raw URLs deterministically from
  * `doc_id` so every canonicalization rule fires (case, default vs
  * explicit port, trailing slash, param order, fragment); the DuckDB
  * oracle rebuilds BOTH the raw and the expected canonical string with
  * plain string ops and must agree on distinct counts and exemplar
  * values — a full functional twin, not a rows-only check.
  */
object Url {

  /** The deterministic messy-URL fixture. The PAGE a url denotes is
    * keyed on `doc_id % 25` (so ~25 docs share each page per residue
    * class and collapsing genuinely fires); the MESS — case, default
    * port, trailing slash, param order, fragment — is keyed on `doc_id`
    * itself, so the same page arrives under many spellings. DuckDB
    * rebuilds both the raw string and the expected canonical verbatim.
    */
  def messyUrl(d: Column): Column = {
    val p = d % 25
    val scheme = when(p % 2 === 0, lit("http")).otherwise(lit("https"))
    val schemeRaw = when(d % 3 === 0,
      when(p % 2 === 0, lit("HTTP")).otherwise(lit("HTTPS"))).otherwise(scheme)
    val hostRaw = when(d % 2 === 0,
      concat(lit("ExAmple"), (p % 3).cast("string"), lit(".CoM")))
      .otherwise(concat(lit("example"), (p % 3).cast("string"), lit(".com")))
    val portRaw = when(p % 5 === 1, lit(":8080")) // canon keeps non-default
      .when(d % 3 === 1, when(p % 2 === 0, lit(":80")).otherwise(lit(":443")))
      .otherwise(lit(""))
    val queryRaw = when(p % 4 === 0,
        when(d % 2 === 0, lit("?b=2&a=1")).otherwise(lit("?a=1&b=2")))
      .when(p % 4 === 1, lit("?a=1"))
      .when(p % 4 === 2, lit(""))
      .otherwise(lit("?q=z"))
    concat(schemeRaw, lit("://"), hostRaw, portRaw,
      lit("/Docs/"), p.cast("string"),
      when(d % 5 === 0, lit("/")).otherwise(lit("")),
      queryRaw,
      when(d % 7 === 0, lit("#Sec2")).otherwise(lit("")))
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // X146: canonicalize → dedup by canonical key. Per source: how many
    // raw spellings, how many true pages, and the lexicographically
    // first canonical url (pins exact string output, not just counts).
    "q_url_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
        .withColumn("url", messyUrl(col("doc_id")))
        .withColumn("canon_url", UrlCanon.url_canon(col("url")))
      docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("url")).as("n_raw"),
          countDistinct(col("canon_url")).as("n_canon"),
          min(col("canon_url")).as("first_canon"))
        .orderBy("source")
    }),
  )

  val oracles: Map[String, String] = Map(
    // The oracle rebuilds the raw url with the SAME residue logic and
    // the canonical url by APPLYING THE RULES BY HAND: lowercase scheme
    // and host, default port stripped (:8080 kept), trailing slash
    // dropped, params sorted (b=2&a=1 -> a=1&b=2), fragment gone. Any
    // divergence in the expression's behavior breaks n_canon or
    // first_canon.
    "q_url_dedup" ->
      """WITH t AS (
        |  SELECT source,
        |    (CASE WHEN doc_id%3=0 THEN (CASE WHEN (doc_id%25)%2=0 THEN 'HTTP' ELSE 'HTTPS' END)
        |          ELSE (CASE WHEN (doc_id%25)%2=0 THEN 'http' ELSE 'https' END) END
        |      || '://'
        |      || CASE WHEN doc_id%2=0 THEN 'ExAmple' || CAST((doc_id%25)%3 AS VARCHAR) || '.CoM'
        |              ELSE 'example' || CAST((doc_id%25)%3 AS VARCHAR) || '.com' END
        |      || CASE WHEN (doc_id%25)%5=1 THEN ':8080'
        |              WHEN doc_id%3=1 THEN (CASE WHEN (doc_id%25)%2=0 THEN ':80' ELSE ':443' END)
        |              ELSE '' END
        |      || '/Docs/' || CAST(doc_id%25 AS VARCHAR)
        |      || CASE WHEN doc_id%5=0 THEN '/' ELSE '' END
        |      || CASE WHEN (doc_id%25)%4=0 THEN (CASE WHEN doc_id%2=0 THEN '?b=2&a=1' ELSE '?a=1&b=2' END)
        |              WHEN (doc_id%25)%4=1 THEN '?a=1'
        |              WHEN (doc_id%25)%4=2 THEN '' ELSE '?q=z' END
        |      || CASE WHEN doc_id%7=0 THEN '#Sec2' ELSE '' END) AS url,
        |    (CASE WHEN (doc_id%25)%2=0 THEN 'http' ELSE 'https' END
        |      || '://example' || CAST((doc_id%25)%3 AS VARCHAR) || '.com'
        |      || CASE WHEN (doc_id%25)%5=1 THEN ':8080' ELSE '' END
        |      || '/Docs/' || CAST(doc_id%25 AS VARCHAR)
        |      || CASE WHEN (doc_id%25)%4=0 THEN '?a=1&b=2'
        |              WHEN (doc_id%25)%4=1 THEN '?a=1'
        |              WHEN (doc_id%25)%4=2 THEN '' ELSE '?q=z' END) AS canon_url
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |       count(DISTINCT url) AS n_raw,
        |       count(DISTINCT canon_url) AS n_canon,
        |       min(canon_url) AS first_canon
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
  )
}
