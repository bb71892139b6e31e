package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X228–X230 training-schedule operators: bin-major contiguous layout,
  * triplet hygiene (negatives never near-dups), epoch permutations
  * distinct-yet-multiset-identical.
  */
class CurriculumSpec extends SparkSpec {

  test("X228 curriculum: bins are contiguous blocks, easy (high-stopword) first, positions cover 1..n") {
    val rows = Curriculum.queries("q_curriculum")(spark, sf).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("min_pos"), r.getAs[Long]("max_pos")))
    assert(rows.nonEmpty)
    // per bin: the block is exactly n_docs wide
    rows.foreach { case (_, n, lo, hi) => assert(hi - lo + 1 == n) }
    // schedule is bin-DESC (stopword-rich = fluent = easy trains first)
    val byPos = rows.sortBy(_._3)
    assert(byPos.map(_._1).toSeq == byPos.map(_._1).toSeq.sorted.reverse)
    // blocks tile 1..n with no gaps
    assert(byPos.head._3 == 1L)
    byPos.sliding(2).foreach {
      case Array((_, _, _, hi), (_, _, lo, _)) => assert(lo == hi + 1)
      case _ =>
    }
    val total = rows.map(_._2).sum
    assert(total == graft.sources.Tables.documents(spark, sf).count())
  }

  test("X229 contrastive: one triplet per anchor; negative is pool-drawn and never a near-dup of the anchor") {
    val t = Curriculum.queries("q_contrastive")(spark, sf).collect()
    assert(t.nonEmpty)
    val anchors = t.map(_.getAs[Long]("anchor"))
    assert(anchors.distinct.length == anchors.length, "one triplet per anchor")
    val pool = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("pk"))
      .orderBy("pk", "doc_id").limit(16)
      .collect().map(_.getLong(0)).toSet
    val nearDup = Dedup.queries("q_dedup_ngram_jaccard")(spark, sf)
      .select("ia", "ib").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    t.foreach { r =>
      val (a, p, n) = (r.getAs[Long]("anchor"), r.getAs[Long]("positive"),
        r.getAs[Long]("negative"))
      assert(pool.contains(n), s"negative $n not from the deterministic pool")
      assert(n != a && n != p)
      assert(!nearDup.contains((a, n)), s"negative $n is a near-dup of anchor $a")
      assert(nearDup.contains((a, p)), s"positive $p is not a near-dup of anchor $a")
      assert(r.getAs[Long]("jac_permille") >= 800)
    }
  }

  test("X230 epoch shuffle: every epoch is the same multiset in a distinct order") {
    val rows = Curriculum.queries("q_epoch_shuffle")(spark, sf).collect()
      .map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("decile"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("sum_ids")))
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    // identical multiset: totals agree across epochs
    val totals = byEpoch.view.mapValues(rs => (rs.map(_._3).sum, rs.map(_._4).sum)).toMap
    assert(totals.values.toSet.size == 1, s"epoch multisets differ: $totals")
    // distinct order: the per-decile checksum vectors differ pairwise
    val vecs = byEpoch.view.mapValues(_.sortBy(_._2).map(_._4).toSeq).toMap
    assert(vecs(0L) != vecs(1L) && vecs(1L) != vecs(2L) && vecs(0L) != vecs(2L),
      "epoch permutations must actually differ")
  }

  test("X238 length batches: conservation, batch-count arithmetic, padding bounded by bucket width") {
    val rows = Curriculum.queries("q_length_batches")(spark, sf).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_batches"), r.getAs[Long]("sum_tokens"),
        r.getAs[Long]("padding")))
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect().map(_.getLong(0))
    // every doc lands in exactly one bucket; token mass conserved
    assert(rows.map(_._2).sum == docs.length)
    assert(rows.map(_._4).sum == docs.sum)
    rows.foreach { case (b, n, nb, _, pad) =>
      // batches of 8 (last one partial): exact ceil arithmetic
      assert(nb == (n + Curriculum.batchSize - 1) / Curriculum.batchSize,
        s"bucket $b batch count")
      // per-doc padding < bucket width (lengths within a bucket span
      // at most width-1): THE invariant length-bucketing buys
      assert(pad >= 0 && pad <= (Curriculum.lenBucketWidth - 1).toLong * n,
        s"bucket $b padding $pad out of bound for $n docs")
    }
  }
}
