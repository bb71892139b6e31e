package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables.documents

/** Training-schedule operators (extensions X228–X230) — the ordering
  * half of a training-data pipeline: once the corpus is cleaned, deduped,
  * and mixed, WHAT ORDER the examples arrive in is itself a curated,
  * reproducible artifact.
  *
  *  - X228 `q_curriculum`: quality-binned curriculum schedule — examples
  *    ordered easy→hard by a fluency proxy (stopword permille, exact
  *    integers), deterministically shuffled WITHIN each bin (a global
  *    sort by raw score would overfit the scorer; binning + in-bin
  *    shuffle is the standard curriculum-learning shape).
  *  - X229 `q_contrastive`: contrastive triplet mining — (anchor,
  *    positive, negative) where positives are true near-duplicates (the
  *    oracled exact-Jaccard pairs) and negatives come from a
  *    deterministic md5-sampled pool, near-dup-excluded. The training-set
  *    builder for embedding models (SimCSE/E5-style), distilled to its
  *    data-engineering core.
  *  - X230 `q_epoch_shuffle`: epoch-varying deterministic permutation —
  *    each epoch reshuffles the corpus under a different salt, so every
  *    epoch's order is distinct yet every run of the pipeline reproduces
  *    it exactly (the X136 shuffle with an epoch seed — multi-epoch
  *    training without a stored permutation table).
  *  - X238 `q_length_batches`: length-bucketed batch assembly with
  *    padding-waste accounting — examples bucket by token length,
  *    shuffle deterministically WITHIN the bucket, and batch in fixed
  *    groups, so a batch's padding cost is bounded by the bucket width
  *    (the dynamic-batching idiom every trainer's data loader ships;
  *    the padding column is the artifact that justifies it).
  *
  * Scale shapes: schedules rank with the X77 dense-id machinery (bucketed
  * quantile split points + bucket-local windows — never a one-partition
  * global window); the contrastive negative pool is a TakeOrdered
  * 16-row broadcast; positives ride the banded/prefix-filtered dedup
  * tier. Everything is exact integer / md5 arithmetic, so every schedule
  * position and triplet choice is DuckDB-replayable.
  */
object Curriculum {

  /** Fixed-width quality bins over the stopword-permille fluency proxy:
    * bin = min(9, permille div 25). Exact integers; empty docs land in
    * bin 0.
    */
  val binWidth = 25
  val nBins = 10

  /** X238 geometry: 16-token length buckets, batches of 8. */
  val lenBucketWidth = 16
  val batchSize = 8

  /** 40-bit md5 prefix of `salt || ":" || id` (salt "" → md5(id), the
    * X136 form) — the deterministic shuffle hash.
    */
  private def h40(idCol: Column, salt: String): Column =
    h40Of(if (salt.isEmpty) idCol.cast("string")
      else concat(lit(s"$salt:"), idCol.cast("string")))

  private def h40Of(key: Column): Column =
    conv(substring(md5(key), 1, 10), 16, 10).cast("long")

  /** Global schedule positions for rows ordered by (`majorCol` asc,
    * shuffle-hash, `idCol`): `major·2^40 + hash40` is the bucket/sort
    * key through the X77 dense-id assignment (distributed rank —
    * bucket-local windows over quantile split points, never a
    * single-partition window), and the id rides as DenseId's TIE-BREAK
    * column for the rare 40-bit hash collision. The id never packs into
    * the key, so the FULL 40-bit hash always fits — the historical
    * `(major, hash) · stride + id` form truncated the hash once the id
    * domain grew past 2^(22−bits(major)) and silently diverged from the
    * oracle's `ORDER BY major, h40, id`; this form is bit-exact to it at
    * any scale (major caps at 2^22 majors before ITS bits overflow,
    * enforced below).
    */
  private def scheduleOrdinal(df: DataFrame, idCol: String, majorCol: Column,
      majorMax: Int, hashCol: Column): (DataFrame, Long) = {
    val majorBits = 32 - Integer.numberOfLeadingZeros(math.max(1, majorMax))
    require(majorBits <= 22, s"major domain too wide: majors=$majorMax")
    val key = majorCol.cast("long") * (1L << 40) + hashCol
    val (out, n) = graft.ops.DenseId.assignWithCount(
      df.withColumn("__sched", key), "__sched", 8, Seq(idCol))
    (out.withColumnRenamed("rid", "pos").drop("__sched"), n)
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // X228: per-bin schedule block — membership (n_docs, sum_ids) pins
    // the binning, min/max positions pin the bin-major contiguous layout,
    // and the hash-position checksum pins the within-bin shuffle order.
    // Easy-first: stopword-RICH (fluent) text trains first, so the
    // schedule orders by descending bin.
    "q_curriculum" -> ((s, d) => {
      // the slim score frame feeds four passes (max-id, quantile splits,
      // bucket counts, the final rank+aggregate) — materialize it so the
      // corpus tokenizes once, not once per pass (the q_source_balance
      // rule; 3 longs per doc, never the text)
      val scored = graft.util.FixtureCache.parquet(s, "curr_scores", d) { dir =>
        val t = TextAnalysis.tokens(col("text"))
        documents(s, d)
          .select(col("doc_id"),
            size(t).cast("long").as("n_tok"),
            TextAnalysis.countIn(t, TextAnalysis.stopwords).as("n_stop"))
          .withColumn("permille",
            expr("n_stop * 1000 div greatest(n_tok, 1)"))
          .withColumn("bin",
            least(lit(nBins - 1L), expr(s"permille div $binWidth")))
          .write.mode("overwrite").parquet(dir)
      }
      val (sched, _) = scheduleOrdinal(scored, "doc_id",
        lit(nBins - 1) - col("bin"), nBins - 1, h40(col("doc_id"), "curr"))
      sched.groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          sum("doc_id").cast("long").as("sum_ids"),
          min("pos").cast("long").as("min_pos"),
          max("pos").cast("long").as("max_pos"),
          sum(col("pos") * col("doc_id")).cast("long").as("pos_checksum"))
        .orderBy("bin")
    }),

    // X229: one triplet per anchor — positive = the anchor's lowest-id
    // exact near-dup (jac ≥ 0.8, the oracled tier), negative = the
    // md5-argmin member of a 16-doc deterministic pool, excluding the
    // anchor, its positive, and ANY near-dup of the anchor (a near-dup
    // negative would teach the model the wrong contrast).
    "q_contrastive" -> ((s, d) => {
      // the near-dup pair set feeds THREE branches (anchors, the jac
      // lookup, the exclusion set) — materialize it so the prefix-filter
      // pipeline runs once, not once per branch (pairs are output-sized)
      val pairs = graft.util.FixtureCache.parquet(s, "contrastive_pairs", d) { dir =>
        Dedup.queries("q_dedup_ngram_jaccard")(s, d)
          .select(col("ia"), col("ib"), col("jac_permille"))
          .write.mode("overwrite").parquet(dir)
      }
      val anchors = pairs.groupBy(col("ia").as("anchor"))
        .agg(min("ib").as("positive"))
      val posJac = pairs.select(col("ia").as("anchor"),
        col("ib").as("positive"), col("jac_permille"))
      val pool = documents(s, d)
        .select(col("doc_id").as("pool_id"),
          md5(col("doc_id").cast("string")).as("pk"))
        .orderBy("pk", "pool_id").limit(16).drop("pk")
      // canonical near-dup key set, both orientations, for the exclusion
      val dup = pairs.select(col("ia").as("u"), col("ib").as("v"))
        .unionByName(pairs.select(col("ib").as("u"), col("ia").as("v")))
      val cand = anchors.crossJoin(broadcast(pool))
        .where(col("pool_id") =!= col("anchor") &&
          col("pool_id") =!= col("positive"))
        .join(dup,
          col("u") === col("anchor") && col("v") === col("pool_id"),
          "left_anti")
        .withColumn("nk",
          md5(concat(col("anchor").cast("string"), lit(":"),
            col("pool_id").cast("string"))))
      // per-anchor argmin over ≤16 pool rows — anchors are output-sized
      // (one per near-dup source), so the window partitions are many and
      // tiny, the opposite of the X62 trap
      val w = Window.partitionBy("anchor").orderBy(col("nk"), col("pool_id"))
      cand.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .select(col("anchor"), col("positive"), col("pool_id").as("negative"))
        .join(posJac, Seq("anchor", "positive"))
        .orderBy("anchor")
    }),

    // X238: length-bucketed batching — bucket by token count (fixed
    // 16-token buckets), deterministic md5 shuffle within the bucket,
    // batches of 8 in schedule order; per-bucket manifest reports doc/
    // batch counts, token mass, and the EXACT padding waste
    // (Σ_batches max_len·cnt − Σ len — what the loader would pad to the
    // batch max). Within-bucket rank rides the same dense-id machinery
    // as X228 (bucket-major global positions, rank = pos − bucket
    // first + broadcast of the bucket-count-sized firsts table), so no
    // bucket ever becomes a single-partition window. Padding per doc is
    // < bucket width by construction — the invariant the spec pins.
    "q_length_batches" -> ((s, d) => {
      val scored = graft.util.FixtureCache.parquet(s, "lb_scores", d) { dir =>
        documents(s, d)
          .select(col("doc_id"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
          .withColumn("bucket", expr(s"n_tok div $lenBucketWidth"))
          .write.mode("overwrite").parquet(dir)
      }
      val maxBucket = scored.agg(max("bucket")).head.getLong(0).toInt
      val (sched, _) = scheduleOrdinal(scored, "doc_id", col("bucket"),
        maxBucket, h40(col("doc_id"), "lb"))
      // bucket-count-sized firsts table — broadcast, never a window
      val firsts = sched.groupBy(col("bucket").as("fb"))
        .agg(min("pos").as("first_pos"))
      sched.join(broadcast(firsts), col("bucket") === col("fb"))
        .withColumn("batch", expr(s"(pos - first_pos) div $batchSize"))
        .groupBy("bucket", "batch")
        .agg(count(lit(1)).as("cnt"), max("n_tok").as("mx"),
          sum("n_tok").as("sm"))
        .groupBy("bucket")
        .agg(sum("cnt").cast("long").as("n_docs"),
          count(lit(1)).as("n_batches"),
          sum("sm").cast("long").as("sum_tokens"),
          sum(col("mx") * col("cnt") - col("sm")).cast("long").as("padding"))
        .orderBy("bucket")
    }),

    // X230: three epochs, three distinct deterministic permutations —
    // per (epoch, schedule-decile) membership count and id checksum pin
    // each epoch's order positionally (the q_corpus_shuffle discipline ×
    // epochs); identical multisets per epoch fall out of n_docs/sum_ids
    // summing equal across epochs, while the checksums differ.
    "q_epoch_shuffle" -> ((s, d) => {
      // ONE dense-id pass over the 3×-exploded corpus with epoch as the
      // major key: epoch blocks are contiguous (block e = (e·n, (e+1)·n]),
      // so within-epoch positions fall out by subtraction — 3 separate
      // ordinal passes would pay the quantile/count machinery thrice for
      // the same answer
      val docs = documents(s, d).select("doc_id")
        .withColumn("epoch", explode(array(lit(0L), lit(1L), lit(2L))))
      val hash = h40Of(concat(lit("e"), col("epoch").cast("string"),
        lit(":"), col("doc_id").cast("string")))
      val (sched, n3) = scheduleOrdinal(docs, "doc_id", col("epoch"), 2, hash)
      val n = n3 / 3
      sched
        .withColumn("pos_in_epoch", col("pos") - col("epoch") * n)
        .withColumn("decile",
          least(lit(9L), expr(s"(pos_in_epoch - 1) * 10 div $n")))
        .groupBy("epoch", "decile")
        .agg(count(lit(1)).as("n_docs"),
          sum("doc_id").cast("long").as("sum_ids"))
        .select("epoch", "decile", "n_docs", "sum_ids")
        .orderBy("epoch", "decile")
    }),
  )

  private val h40Sql = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT)"
  private def h40SaltSql(salt: String) =
    s"CAST(('0x' || substr(md5('$salt:' || CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    "q_curriculum" ->
      s"""WITH scored AS (
         |  SELECT doc_id,
         |         len(${TextAnalysis.toksSql}) AS n_tok,
         |         ${TextAnalysis.countInSql(TextAnalysis.stopwords)} AS n_stop
         |  FROM documents),
         |binned AS (
         |  SELECT doc_id,
         |         LEAST(${nBins - 1}, (n_stop * 1000 // GREATEST(n_tok, 1)) // $binWidth) AS bin
         |  FROM scored),
         |sched AS (
         |  SELECT doc_id, bin,
         |         row_number() OVER (ORDER BY ${nBins - 1} - bin,
         |           ${h40SaltSql("curr")}, doc_id) AS pos
         |  FROM binned)
         |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
         |       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
         |       CAST(min(pos) AS BIGINT) AS min_pos,
         |       CAST(max(pos) AS BIGINT) AS max_pos,
         |       CAST(sum(pos * doc_id) AS BIGINT) AS pos_checksum
         |FROM sched GROUP BY bin ORDER BY bin""".stripMargin,

    "q_contrastive" ->
      s"""WITH sh AS (SELECT doc_id, ${Dedup.shinglesSql} AS s
         |            FROM (SELECT doc_id, ${Dedup.toksSql} AS l FROM documents)),
         |${Dedup.pairsJacByIndexSql},
         |anchors AS (SELECT ia AS anchor, min(ib) AS positive FROM pairs GROUP BY ia),
         |pool AS (SELECT doc_id AS pool_id FROM documents
         |         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 16),
         |dup AS (SELECT ia AS u, ib AS v FROM pairs
         |        UNION ALL SELECT ib, ia FROM pairs),
         |cand AS (
         |  SELECT a.anchor, a.positive, p.pool_id,
         |         md5(CAST(a.anchor AS VARCHAR) || ':' || CAST(p.pool_id AS VARCHAR)) AS nk
         |  FROM anchors a, pool p
         |  WHERE p.pool_id <> a.anchor AND p.pool_id <> a.positive
         |    AND NOT EXISTS (SELECT 1 FROM dup
         |                    WHERE dup.u = a.anchor AND dup.v = p.pool_id)),
         |best AS (SELECT anchor, positive, pool_id AS negative FROM (
         |           SELECT anchor, positive, pool_id,
         |                  row_number() OVER (PARTITION BY anchor
         |                    ORDER BY nk, pool_id) AS rk
         |           FROM cand) WHERE rk = 1)
         |SELECT b.anchor, b.positive, b.negative, pr.jac_permille
         |FROM best b JOIN pairs pr ON pr.ia = b.anchor AND pr.ib = b.positive
         |ORDER BY b.anchor""".stripMargin,

    "q_length_batches" ->
      s"""WITH scored AS (
         |  SELECT doc_id,
         |         CAST(len(${TextAnalysis.toksSql}) AS BIGINT) AS n_tok
         |  FROM documents),
         |ranked AS (
         |  SELECT doc_id, n_tok, n_tok // $lenBucketWidth AS bucket,
         |         row_number() OVER (PARTITION BY n_tok // $lenBucketWidth
         |           ORDER BY ${h40SaltSql("lb")}, doc_id) AS rn
         |  FROM scored),
         |batches AS (
         |  SELECT bucket, (rn - 1) // $batchSize AS batch,
         |         count(*) AS cnt, max(n_tok) AS mx, sum(n_tok) AS sm
         |  FROM ranked GROUP BY 1, 2)
         |SELECT bucket,
         |       CAST(sum(cnt) AS BIGINT) AS n_docs,
         |       count(*) AS n_batches,
         |       CAST(sum(sm) AS BIGINT) AS sum_tokens,
         |       CAST(sum(mx * cnt - sm) AS BIGINT) AS padding
         |FROM batches GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_epoch_shuffle" -> {
      def epoch(e: Int) =
        s"""SELECT CAST($e AS BIGINT) AS epoch,
           |       LEAST(9, (pos - 1) * 10 // (SELECT count(*) FROM documents)) AS decile,
           |       count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
           |FROM (SELECT doc_id, row_number() OVER (ORDER BY ${h40SaltSql(s"e$e")}, doc_id) AS pos
           |      FROM documents)
           |GROUP BY 2""".stripMargin
      (0 until 3).map(epoch).mkString("", "\nUNION ALL\n", "\nORDER BY epoch, decile")
    },
  )
}
