package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables.documents

/** Corpus release diff card (X253) — the changelog a dataset release
  * ships beside its X245 datacard: between release A and release B, per
  * source, how many documents were added, removed, or content-changed,
  * and the net token-mass delta. The U1/X18 snapshot-diff discipline
  * lifted from follower rows to corpus releases: a real release B is not
  * rule-derived from A, so the card comes from an honest full-outer join
  * on document identity comparing content hashes — never from trusting
  * the writer's intent.
  *
  * Fixture: release B is a deterministic md5-keyed revision of the
  * corpus (~10% dropped, ~20% edited, ~10% fresh ids appended), so the
  * oracle can rebuild BOTH releases and replay the join; the operator
  * itself sees two opaque (doc_id, source, text) relations.
  *
  * Scale shape: one hash shuffle per release keyed on doc_id (the join
  * key), comparing 16-byte content hashes — the text itself never
  * shuffles (hash early, join on slim columns); the card is a combinable
  * per-source rollup of join-tagged rows.
  */
object ReleaseDiff {
  type Q = (SparkSession, String) => DataFrame

  /** Release-B revision rules, keyed on `md5("rel:" || doc_id) mod 10`:
    * 0 → dropped; 1,2 → text edited (a revision suffix); 3 → an added
    * fresh document (id + max(doc_id)+1, same source, derived text); else
    * unchanged. The added-id offset derives from the actual key range
    * (the stride discipline Selection/Curriculum use) — a fixed 10^6
    * collides with kept ids once real doc_ids reach 10^6, duplicating
    * release-B keys and fanning out the full-outer join.
    */
  private def relBucket(id: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit("rel:"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % 10

  /** Both releases as slim (doc_id, source, n_tok, content md5) frames. */
  private[ext] def releases(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val t = TextAnalysis.tokens(col("text"))
    def slim(df: DataFrame) = df.select(col("doc_id"), col("source"),
      size(t).cast("long").as("n_tok"), md5(col("text")).as("h"))
    val a = documents(s, d)
    val bucket = relBucket(col("doc_id"))
    val kept = a.where(bucket =!= 0)
      .withColumn("text",
        when(relBucket(col("doc_id")).isin(1L, 2L),
          concat(col("text"), lit(" rev"))).otherwise(col("text")))
    val offset = a.agg(max("doc_id")).head.getAs[Number](0).longValue() + 1
    val added = a.where(bucket === 3)
      .select((col("doc_id") + offset).as("doc_id"), col("source"),
        concat(col("text"), lit(" new")).as("text"))
    (slim(a), slim(kept.select("doc_id", "source", "text").unionByName(added)))
  }

  val queries: Map[String, Q] = Map(
    "q_release_diff" -> ((s, d) => {
      val (a, b) = releases(s, d)
      val joined = a.select(col("doc_id"), col("source").as("src_a"),
          col("n_tok").as("tok_a"), col("h").as("h_a"))
        .join(b.select(col("doc_id"), col("source").as("src_b"),
          col("n_tok").as("tok_b"), col("h").as("h_b")),
          Seq("doc_id"), "full_outer")
      joined
        .select(coalesce(col("src_a"), col("src_b")).as("source"),
          when(col("h_a").isNull, 1L).otherwise(0L).as("is_add"),
          when(col("h_b").isNull, 1L).otherwise(0L).as("is_rm"),
          when(col("h_a").isNotNull && col("h_b").isNotNull &&
            col("h_a") =!= col("h_b"), 1L).otherwise(0L).as("is_chg"),
          coalesce(col("tok_a"), lit(0L)).as("tok_a"),
          coalesce(col("tok_b"), lit(0L)).as("tok_b"))
        .groupBy("source")
        .agg(sum(when(col("is_rm") === 0, 1L).otherwise(0L)).cast("long").as("n_b"),
          sum(when(col("is_add") === 0, 1L).otherwise(0L)).cast("long").as("n_a"),
          sum("is_add").cast("long").as("n_added"),
          sum("is_rm").cast("long").as("n_removed"),
          sum("is_chg").cast("long").as("n_changed"),
          (sum("tok_b") - sum("tok_a")).cast("long").as("tok_delta"))
        .select("source", "n_a", "n_b", "n_added", "n_removed", "n_changed",
          "tok_delta")
        .orderBy("source")
    }),
  )

  private val toks = TextAnalysis.toksSql
  private val relSql =
    "CAST(('0x' || substr(md5('rel:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10"

  val oracles: Map[String, String] = Map(
    "q_release_diff" ->
      s"""WITH a AS (
         |  SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS n_tok,
         |         md5(text) AS h
         |  FROM documents),
         |b_src AS (
         |  SELECT doc_id, source,
         |         CASE WHEN $relSql IN (1, 2) THEN text || ' rev' ELSE text END AS text
         |  FROM documents WHERE $relSql <> 0
         |  UNION ALL
         |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents), source, text || ' new'
         |  FROM documents WHERE $relSql = 3),
         |b AS (
         |  SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS n_tok,
         |         md5(text) AS h
         |  FROM b_src),
         |j AS (
         |  SELECT coalesce(a.source, b.source) AS source,
         |         CASE WHEN a.h IS NULL THEN 1 ELSE 0 END AS is_add,
         |         CASE WHEN b.h IS NULL THEN 1 ELSE 0 END AS is_rm,
         |         CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL AND a.h <> b.h
         |              THEN 1 ELSE 0 END AS is_chg,
         |         coalesce(a.n_tok, 0) AS tok_a, coalesce(b.n_tok, 0) AS tok_b
         |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
         |SELECT source,
         |       CAST(sum(CASE WHEN is_add = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |       CAST(sum(CASE WHEN is_rm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |       CAST(sum(is_add) AS BIGINT) AS n_added,
         |       CAST(sum(is_rm) AS BIGINT) AS n_removed,
         |       CAST(sum(is_chg) AS BIGINT) AS n_changed,
         |       CAST(sum(tok_b) - sum(tok_a) AS BIGINT) AS tok_delta
         |FROM j GROUP BY source ORDER BY source""".stripMargin,
  )
}
