package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("binary payload roundtrips: decode(bytes) == original text") {
    val back = Multimodal.media(spark, sf)
      .select(col("media_id").as("doc_id"), decode(col("bytes"), "UTF-8").as("rt"))
    val orig = graft.sources.Tables.documents(spark, sf).select("doc_id", "text")
    val mismatches = orig.join(back, "doc_id")
      .where(col("text") =!= col("rt")).count()
    assert(mismatches == 0)
  }

  test("feature extraction is deterministic, partition-count-invariant") {
    implicit val me = org.apache.spark.sql.Encoders.product[Media]
    implicit val fe = org.apache.spark.sql.Encoders.product[MediaFeatures]
    def run(parts: Int) = Multimodal.media(spark, sf)
      .repartition(parts).as[Media]
      .mapPartitions(Multimodal.extractFeatures _)
      .collect().sortBy(_.media_id)
    val a = run(1)
    val b = run(7)
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.media_id == y.media_id && x.n_bytes == y.n_bytes)
      assert(x.mean_byte == y.mean_byte)
      assert(x.stride_means.toSeq == y.stride_means.toSeq)
      assert(x.stride_means.length == Multimodal.nStrides)
      // ASCII text payload → printable byte range
      assert(x.mean_byte > 32 && x.mean_byte < 127)
    }
  }

  test("frame sampling: every frameStep-th frame, correct tail length") {
    val rows = Multimodal.queries("q_frame_sample")(spark, sf).collect()
    assert(rows.nonEmpty)
    val sizes = Multimodal.queries("q_media_meta")(spark, sf)
      .select("media_id", "n_bytes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getAs[Long]("media_id")).foreach { case (id, frames) =>
      val n = sizes(id)
      val idxs = frames.map(_.getAs[Long]("frame_idx")).sorted.toSeq
      val expected = 0L until ((n + Multimodal.frameBytes - 1) / Multimodal.frameBytes) by
        Multimodal.frameStep.toLong
      assert(idxs == expected.toSeq, s"media $id")
      frames.foreach { f =>
        val i = f.getAs[Long]("frame_idx")
        val len = f.getAs[Long]("frame_len")
        assert(len == math.min(Multimodal.frameBytes.toLong, n - i * Multimodal.frameBytes))
        assert(len > 0)
      }
    }
  }

  test("binary substring yields the actual frame content") {
    import spark.implicits._
    val payload = ("x" * 300).getBytes("UTF-8")
    val df = Seq((1L, payload)).toDF("media_id", "bytes")
    val frames = df.select(
      expr(s"substring(bytes, 1, ${Multimodal.frameBytes})").as("f0"),
      expr(s"substring(bytes, ${Multimodal.frameBytes + 1}, ${Multimodal.frameBytes})").as("f1"))
      .head()
    assert(frames.getAs[Array[Byte]]("f0").length == Multimodal.frameBytes)
    assert(frames.getAs[Array[Byte]]("f1").length == 300 - Multimodal.frameBytes)
  }
}
