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
