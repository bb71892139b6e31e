package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** X45/X46 pins beyond the hash gate: packing's overflow bound and
  * contiguity, quantization's reconstruction-error bound and range.
  */
class PackingSpec extends SparkSpec {

  test("packing: packs overflow by at most their last doc's tokens") {
    val per = Packing.packed(Tables.documents(spark, sf)).collect()
    // a doc starts a pack iff its cum_before lands inside the pack's
    // window, so pack_tokens < capacity + last doc's n_tokens
    per.groupBy(r => (r.getString(0), r.getLong(4))).foreach { case ((lang, pack), rows) =>
      val tokens = rows.map(_.getLong(2)).sum
      val lastDocTokens = rows.maxBy(_.getLong(1)).getLong(2)
      assert(tokens < Packing.capacity + lastDocTokens,
        s"pack ($lang,$pack) holds $tokens tokens, last doc $lastDocTokens")
      // and every pack start sits inside its window
      val firstCum = rows.minBy(_.getLong(1)).getLong(3)
      assert(firstCum / Packing.capacity == pack)
    }
  }

  test("packing: packs are contiguous doc_id ranges within a language") {
    val m = Packing.queries("q_seq_pack")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5)))
    m.groupBy(_._1).foreach { case (lang, packs) =>
      packs.sortBy(_._2).sliding(2).foreach {
        case Array((_, p1, _, last1), (_, p2, first2, _)) =>
          assert(p2 == p1 + 1 && last1 < first2,
            s"$lang packs $p1/$p2 overlap or skip: $last1 vs $first2")
        case _ =>
      }
    }
  }

  test("X236 fim: spans are non-empty, partition each doc exactly, and are salt-deterministic") {
    val fim = Packing.queries("q_fim")(spark, sf).collect()
    assert(fim.nonEmpty)
    val lens = Tables.documents(spark, sf)
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fim.foreach { r =>
      val (id, pre, mid, suf) = (r.getAs[Long]("doc_id"), r.getAs[Long]("n_pre"),
        r.getAs[Long]("n_mid"), r.getAs[Long]("n_suf"))
      assert(pre >= 1 && mid >= 1 && suf >= 1, s"doc $id degenerate span")
      assert(pre + mid + suf == lens(id), s"doc $id spans don't partition")
    }
    // every eligible doc transforms; sub-3-token docs are excluded
    assert(fim.length == lens.values.count(_ >= 3))
    // deterministic: a second run renders byte-identical examples
    val again = Packing.queries("q_fim")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fim_md5")).toMap
    fim.foreach(r => assert(
      again(r.getAs[Long]("doc_id")) == r.getAs[String]("fim_md5")))
  }

  test("quantize: codes bounded to [-127,127] and reconstruction error <= scale") {
    val rows = Tables.embeddings(spark, sf).limit(200)
      .select(col("embedding"), Quantize.codes(col("embedding")).as("codes"),
        Quantize.maxAbs(col("embedding")).as("m"))
      .collect()
    rows.foreach { r =>
      val emb = r.getSeq[Float](0)
      val codes = r.getSeq[Long](1)
      val m = r.getDouble(2)
      val step = m / 127.0
      assert(codes.forall(c => c >= -127 && c <= 127))
      emb.zip(codes).foreach { case (x, c) =>
        val recon = c * step
        assert(math.abs(x - recon) <= step + 1e-9,
          s"dim error ${math.abs(x - recon)} > step $step")
      }
    }
  }

  test("X249 cdc chunks: per-source report equals a local replay; token mass conserved") {
    val got = Packing.queries("q_cdc_chunks")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_distinct_chunks"),
          r.getAs[Long]("sum_chunk_tokens"), r.getAs[Long]("dup_permille")))
      .toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def h40(s: String): Long = {
      val hex = md.digest(s"cdc:$s".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(10)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getString(2)))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val chunks = ds.flatMap { case (_, text) =>
        val tk = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        if (tk.isEmpty) Seq.empty[Seq[String]]
        else {
          val out = scala.collection.mutable.ArrayBuffer(
            scala.collection.mutable.ArrayBuffer.empty[String])
          tk.foreach { t =>
            if (h40(t) % Packing.cdcResidue == 0 ) out += scala.collection.mutable.ArrayBuffer(t)
            else out.last += t
          }
          out.filter(_.nonEmpty).map(_.toSeq).toSeq
        }
      }
      val payloads = chunks.map(_.mkString(" "))
      src -> (chunks.length.toLong, payloads.distinct.length.toLong,
        chunks.map(_.length.toLong).sum,
        (chunks.length - payloads.distinct.length).toLong * 1000 / chunks.length)
    }
    assert(got == expect)
    // duplicate chunk mass exists on the closed-vocabulary fixture
    assert(got.values.exists(_._4 > 0))
  }

  test("X252 prefix share: groups match a local replay, savings arithmetic exact") {
    val got = Packing.queries("q_prefix_share")(spark, sf).collect()
      .map(r => r.getAs[String]("prefix_md5") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("saved_tokens"),
          r.getAs[Long]("sum_ids"))).toMap
    assert(got.nonEmpty, "fixture has shared prefixes (planted near-dups)")
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .flatMap { r =>
        val tk = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
        if (tk.length < Packing.sharePrefixLen) None
        else Some(md.digest(tk.take(Packing.sharePrefixLen).mkString(" ")
          .getBytes("UTF-8")).map("%02x".format(_)).mkString -> r.getLong(0))
      }
      .groupBy(_._1).filter(_._2.length >= 2)
      .map { case (h, ds) => h -> (ds.length.toLong,
        (ds.length - 1).toLong * Packing.sharePrefixLen, ds.map(_._2).sum) }
    assert(got == expect)
    got.values.foreach { case (n, saved, _) =>
      assert(n >= 2 && saved == (n - 1) * Packing.sharePrefixLen)
    }
  }

  test("X250 span corruption: masks partition, sentinels sequence, renders match a local replay") {
    val got = Packing.queries("q_span_corrupt")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tok"), r.getAs[Long]("n_masked"),
          r.getAs[Long]("n_spans"), r.getAs[String]("input_md5"),
          r.getAs[String]("target_md5"))).toMap
    assert(got.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h40(s: String) = java.lang.Long.parseLong(hex(s).take(10), 16)
    Tables.documents(spark, sf).select("doc_id", "text").collect().take(30)
      .foreach { r =>
        val (id, tk) = (r.getLong(0),
          r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty))
        if (tk.nonEmpty) {
          val m = tk.indices.map(p => h40(s"sc:$id:$p") % Packing.maskResidue == 0)
          val starts = tk.indices.map(p => m(p) && (p == 0 || !m(p - 1)))
          val spanId = starts.scanLeft(0)((a, s) => a + (if (s) 1 else 0)).tail
          val input = tk.indices.flatMap { p =>
            if (!m(p)) Some(tk(p))
            else if (starts(p)) Some(s"<X${spanId(p) - 1}>") else None
          }.mkString(" ")
          val target = tk.indices.flatMap { p =>
            if (m(p) && starts(p)) Some(s"<X${spanId(p) - 1}> ${tk(p)}")
            else if (m(p)) Some(tk(p)) else None
          }.mkString(" ")
          assert(got(id) == ((tk.length.toLong, m.count(identity).toLong,
            starts.count(identity).toLong,
            hex(input), hex(target))), s"doc $id span corruption diverges")
        }
      }
    // the objective is live on the fixture: masked and unmasked mass both exist
    assert(got.values.map(_._2).sum > 0)
    assert(got.values.exists(v => v._2 < v._1))
  }

  test("X243 matryoshka: full width is its own baseline (1000), recall never decreases with width") {
    val rows = Quantize.queries("q_matryoshka")(spark, sf).collect()
      .map(r => (r.getAs[Long]("dims"), r.getAs[Long]("n_ranked"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("recall_permille")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Quantize.mrlDims.map(_.toLong))
    // every tier ranks the same panel: |queries| * k rows
    assert(rows.map(_._2).distinct.length == 1)
    rows.foreach { case (_, n, h, p) =>
      assert(h >= 0 && h <= n && p == h * 1000 / n)
    }
    // the full-width tier is the baseline by construction
    assert(rows.last._4 == 1000L)
    // recall is monotone in prefix width on this fixture
    assert(rows.map(_._4).sliding(2).forall(w => w(0) <= w(1)))
  }

  test("quantize: the all-zero vector quantizes to all-zero codes, not NaN") {
    import spark.implicits._
    val codes = Seq(Array(0f, 0f, 0f)).toDF("embedding")
      .select(Quantize.codes(col("embedding"))).head.getSeq[Long](0)
    assert(codes == Seq(0L, 0L, 0L))
  }
}
