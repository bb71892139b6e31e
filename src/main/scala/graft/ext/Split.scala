package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic, group-aware train/val/test splits (extension X35) —
  * the assignment step every training-data pipeline runs last. Two
  * properties matter and both are pinned:
  *  - DETERMINISTIC: the split is a pure function of the key (md5-based),
  *    not of a seed, partitioning, or row order — re-runs, backfills, and
  *    incremental appends land every row in the same split;
  *  - GROUP-AWARE: keying by a GROUP column (user, document source)
  *    puts all of a group's rows in one split, preventing leakage of a
  *    user's behavior from train into eval.
  *
  * Shape: one per-row expression (md5 → 32-bit prefix → mod 100 → CASE
  * chain), no shuffle, no driver state — embarrassingly parallel at any
  * scale.
  */
object Split {
  type Q = (SparkSession, String) => DataFrame

  /** Bucket in [0, 100) as a pure function of the key's string form. */
  def hashBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"), lit(100))

  /** Append a `split` column assigning each row by `keyCol`'s hash
    * bucket; `splits` are (name, percent) with percents summing to 100.
    * Rows sharing a key always share a split.
    */
  def assignSplits(df: DataFrame, keyCol: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      "split percents must sum to 100")
    require(splits.forall(_._2 > 0), "split percents must be positive")
    val h = hashBucket(col(keyCol))
    val uppers = splits.map(_._2).scanLeft(0)(_ + _).tail // cumulative bounds
    val assign = splits.zip(uppers).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), els) => when(h < hi, lit(name)).otherwise(els)
    }
    df.withColumn("split", assign)
  }

  val standardSplits: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10)

  /** X136: deterministic corpus shuffling — a reproducible global
    * training order WITHOUT a global sort bottleneck. Each doc gets a
    * 40-bit md5 prefix; `(hash40, doc_id)` is a unique hash-major sort
    * key (the id breaks hash ties exactly like the oracle's
    * `ORDER BY h40, doc_id`), and X77's bucket-parallel dense rank —
    * bucketed on the hash, tie-broken in the bucket-local window — turns
    * it into a gapless 1..N shuffle ordinal — same seedless determinism as the splits (re-runs
    * and restarts reproduce the epoch exactly), no SinglePartition
    * window anywhere. Writers then range-partition by the ordinal to lay
    * training shards out in shuffled order.
    */
  def shuffleOrdinal(df: DataFrame, idCol: String, parts: Int = 8): DataFrame =
    shuffleOrdinalWithCount(df, idCol, parts)._1

  /** [[shuffleOrdinal]] plus the total row count (free from the dense-id
    * machinery's per-bucket counts — no second scan for callers needing
    * `n`, e.g. decile math over the ordinal).
    */
  def shuffleOrdinalWithCount(df: DataFrame, idCol: String,
      parts: Int = 8): (DataFrame, Long) = {
    // the FULL 40-bit hash is the bucket/sort key; hash ties (rare but
    // real at corpus scale: birthday bound ~n²/2^41) break on the id via
    // DenseId's tie-break columns. No injective `hash·stride + id`
    // packing — that form had to TRUNCATE the hash once sparse id
    // domains pushed bits(stride) past 22, silently diverging from the
    // oracle's (hash, id) order; the two-column key is exact at any
    // scale.
    val h40 = conv(substring(md5(col(idCol).cast("string")), 1, 10), 16, 10)
      .cast("long")
    val (out, n) = graft.ops.DenseId.assignWithCount(
      df.withColumn("__sk", h40), "__sk", parts, Seq(idCol))
    (out.withColumnRenamed("rid", "shuffle_idx").drop("__sk"), n)
  }

  /** X209 — leakage-safe splits: near-duplicate documents MUST land in
    * the same split, or eval content leaks into train through its
    * near-copies (the reason GPT-3/Pile-era evals dedup across the
    * split boundary, not just inside train). Composition over the dedup
    * family: near-dup pairs (E2's oracled n-gram Jaccard) close into
    * components (X34), and the split keys on the component
    * REPRESENTATIVE instead of the document — every member of a cluster
    * shares its rep's md5 bucket by construction. Docs in no cluster are
    * their own rep (the common case: the rep join is a broadcast of the
    * docs-in-pairs set, corpus never shuffles — the X137 shape).
    */
  def leakageSafeSplits(spark: SparkSession, docs: DataFrame,
      edges: DataFrame, splits: Seq[(String, Int)]): DataFrame = {
    val comp = Clusters.connectedComponents(spark, edges)
      .select(col("node").as("doc_id"), col("label").as("rep0"))
    assignSplits(
      docs.join(broadcast(comp), Seq("doc_id"), "left")
        .withColumn("rep", coalesce(col("rep0"), col("doc_id"))).drop("rep0"),
      "rep", splits)
  }

  val queries: Map[String, Q] = Map(
    // X209: per-split populations under cluster-consistent assignment —
    // the oracle replays pairs → components → rep buckets, so a single
    // document split apart from its near-dup cluster breaks its split's
    // count and id checksum
    "q_split_leakage_safe" -> ((s, d) => {
      val edgeDir = graft.util.FixtureCache.dir("cluster_edges", d) { dir =>
        Dedup.queries("q_dedup_ngram_jaccard")(s, d)
          .select(col("ia").as("a"), col("ib").as("b"))
          .write.mode("overwrite").parquet(s"$dir/edges")
      }
      leakageSafeSplits(s, Tables.documents(s, d).select("doc_id"),
        graft.sources.Tables.cachedParquet(s, s"$edgeDir/edges"),
        standardSplits)
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum("doc_id").cast("long").as("sum_ids"),
          countDistinct("rep").as("n_groups"))
        .orderBy("split")
    }),
    // X136: the shuffled order pinned POSITIONALLY: per-ordinal-decile
    // doc counts and id checksums vs the oracle's row_number over the
    // identical (hash40, doc_id) order — an off-by-one anywhere in the
    // distributed rank relabels a decile and breaks its checksum.
    "q_corpus_shuffle" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id")
      val (shuffled, n) = shuffleOrdinalWithCount(docs, "doc_id")
      shuffled
        .withColumn("decile", least(lit(9L),
          floor((col("shuffle_idx") - 1) * 10 / n).cast("long")))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          sum("doc_id").cast("long").as("sum_ids"),
          min("shuffle_idx").cast("long").as("first_idx"))
        .orderBy("decile")
    }),

    // Events split BY USER (group-aware): the oracle recomputes the same
    // md5-bucket assignment in SQL and must agree on every per-split
    // event count AND distinct-user count — bucket-boundary or
    // hash-mismatch bugs break both.
    "q_split_assign" -> ((s, d) =>
      assignSplits(Tables.events(s, d), "user_id", standardSplits)
        .groupBy("split")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("split")),
  )

  val oracles: Map[String, String] = Map(
    "q_split_leakage_safe" ->
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, ${Dedup.shinglesSql} AS s
         |  FROM (SELECT doc_id, ${Dedup.toksSql} AS l FROM documents)),
         |${graft.ext.Dedup.pairs80ByIndexSql},
         |edges AS (
         |  SELECT ia AS a, ib AS b FROM pairs
         |  UNION
         |  SELECT ib, ia FROM pairs),
         |reach AS (
         |  SELECT a AS node, b AS dst FROM edges
         |  UNION
         |  SELECT r.node, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |comp AS (
         |  SELECT node AS doc_id, least(node, min(dst)) AS component
         |  FROM reach GROUP BY node),
         |rep AS (
         |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS rep
         |  FROM documents d LEFT JOIN comp c USING (doc_id)),
         |assigned AS (
         |  SELECT doc_id, rep,
         |         CAST(('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS h
         |  FROM rep)
         |SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
         |       count(*) AS n_docs,
         |       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
         |       count(DISTINCT rep) AS n_groups
         |FROM assigned GROUP BY 1 ORDER BY split""".stripMargin,

    "q_corpus_shuffle" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY
        |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS UBIGINT),
        |      doc_id) AS idx
        |  FROM documents),
        |n AS (SELECT count(*) AS cnt FROM documents)
        |SELECT least(9, CAST((idx - 1) * 10 // n.cnt AS BIGINT)) AS decile,
        |       count(*) AS n_docs,
        |       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |       CAST(min(idx) AS BIGINT) AS first_idx
        |FROM r, n GROUP BY 1 ORDER BY decile""".stripMargin,

    "q_split_assign" ->
      """SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
        |       count(*) AS n_events,
        |       count(DISTINCT user_id) AS n_users
        |FROM (SELECT user_id,
        |             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS h
        |      FROM events)
        |GROUP BY 1 ORDER BY split""".stripMargin,
  )
}
