package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables._

/** A decoded media row (binary payload + typed metadata). */
case class Media(media_id: Long, media_type: String, fmt: String, bytes: Array[Byte])

/** Fixed-shape features extracted from a media payload. */
case class MediaFeatures(
    media_id: Long,
    n_bytes: Long,
    mean_byte: Double,
    stride_means: Array[Double])

/** Multimodal-column operators (north-star mandate): treat image/audio/video
  * as opaque `binary` columns with typed metadata, and run decode /
  * feature-extract / frame-sample as partition-parallel typed operations.
  *
  * The container has no image/audio codecs, so `decodeStub` below is a
  * clearly-marked DETERMINISTIC FAKE standing in for a real decoder (JNI
  * image lib, ffmpeg pipe, …). Everything around it — the binary column
  * synthesis, the `Dataset[Media]` encoder boundary, the `mapPartitions`
  * batch shape, the frame chunk arithmetic — is real Spark plumbing and is
  * what these queries pin down.
  *
  * Scale notes (100 TB): all three queries are per-row / per-partition with
  * zero shuffles; a real deployment holds payloads in parquet BINARY columns
  * (or pointers to object storage for row-group-sized blobs) and the
  * feature extractor amortizes decoder init per PARTITION, exactly the
  * `mapPartitions` shape used here.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  val frameBytes = 256
  val frameStep = 4
  val nStrides = 8

  /** Synthesized media table: the documents fixture's text re-cast as an
    * opaque binary payload with a media_type/fmt derived from doc_id.
    */
  def media(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      when(col("doc_id") % 3 === 0, "png")
        .when(col("doc_id") % 3 === 1, "wav")
        .otherwise("mp4").as("fmt"),
      encode(col("text"), "UTF-8").as("bytes"))

  /** DECODE STUB — deterministic fake. A real implementation would parse
    * `fmt` and decode to pixels/samples; this one treats the payload bytes
    * as the decoded signal so the pipeline stays testable without codecs.
    */
  def decodeStub(m: Media): Array[Byte] = m.bytes

  /** Feature extraction over a partition iterator — decoder init happens
    * once per partition (the expensive part in a real decoder), then
    * per-row features are pure arithmetic on the decoded signal.
    */
  def extractFeatures(rows: Iterator[Media]): Iterator[MediaFeatures] = {
    // (real code: val decoder = Codec.open(...) — once per partition)
    rows.map { m =>
      val signal = decodeStub(m)
      val n = signal.length
      val unsigned = signal.map(b => (b & 0xff).toDouble)
      val strides = Array.tabulate(nStrides) { k =>
        val lo = k * n / nStrides
        val hi = math.max(lo + 1, (k + 1) * n / nStrides)
        val sl = unsigned.slice(lo, math.min(hi, n))
        if (sl.isEmpty) 0.0 else sl.sum / sl.length
      }
      MediaFeatures(m.media_id, n.toLong,
        if (n == 0) 0.0 else unsigned.sum / n, strides)
    }
  }

  val queries: Map[String, Q] = Map(
    // Typed metadata projection over the binary column — oracle-checked
    // (octet_length is engine-independent).
    "q_media_meta" -> ((s, d) =>
      media(s, d).select(
        col("media_id"), col("media_type"), col("fmt"),
        length(col("bytes")).cast("long").as("n_bytes"))
        .orderBy("media_id")),

    // Partition-parallel feature extraction through the typed Dataset
    // boundary (decode stubbed; batch shape real). Rows-only check +
    // MultimodalSpec.
    "q_media_features" -> ((s, d) => {
      implicit val me = org.apache.spark.sql.Encoders.product[Media]
      implicit val fe = org.apache.spark.sql.Encoders.product[MediaFeatures]
      media(s, d).as[Media]
        .mapPartitions(extractFeatures _)
        .toDF()
        .select(col("media_id"), col("n_bytes"),
          round(col("mean_byte"), 4).as("mean_byte_r4"),
          round(element_at(col("stride_means"), 1), 4).as("stride0_r4"),
          round(element_at(col("stride_means"), nStrides), 4).as(s"stride${nStrides - 1}_r4"))
        .orderBy("media_id")
    }),

    // Frame sampling: chunk the payload into frameBytes-sized frames, keep
    // every frameStep-th — pure per-row index arithmetic (the binary
    // substring itself is exercised in MultimodalSpec); integer outputs keep
    // the DuckDB oracle exact.
    "q_frame_sample" -> ((s, d) =>
      media(s, d)
        .select(col("media_id"), length(col("bytes")).as("n"),
          explode(sequence(lit(0),
            (length(col("bytes")) + frameBytes - 1).divide(frameBytes).cast("int") - 1,
            lit(frameStep))).as("frame_idx"))
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          least(lit(frameBytes), col("n") - col("frame_idx") * frameBytes)
            .cast("long").as("frame_len"))
        .orderBy("media_id", "frame_idx")),
  )

  private val mediaTypeSql =
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
  private val fmtSql =
    "CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END"

  val oracles: Map[String, String] = Map(
    "q_media_meta" ->
      s"""SELECT doc_id AS media_id, $mediaTypeSql AS media_type, $fmtSql AS fmt,
         |       octet_length(encode(text)) AS n_bytes
         |FROM documents ORDER BY media_id""".stripMargin,
    "q_frame_sample" ->
      s"""SELECT media_id, i AS frame_idx,
         |       least($frameBytes, n - $frameBytes * i) AS frame_len
         |FROM (SELECT doc_id AS media_id, octet_length(encode(text)) AS n,
         |             unnest(range(0, CAST(ceil(octet_length(encode(text)) / $frameBytes.0) AS BIGINT),
         |                          $frameStep)) AS i
         |      FROM documents)
         |ORDER BY media_id, frame_idx""".stripMargin,
  )
}
