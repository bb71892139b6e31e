package graft.sources

import java.io.ByteArrayInputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X147 pins beyond the hash gate: framing exactness (offsets, headers,
  * payload bytes), loud refusal on corrupt framing, and payloads that
  * contain CRLFs and WARC magic without derailing the parser.
  */
class WarcSpec extends SparkSpec {

  private def bytesOf(recs: (Long, String)*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { case (id, text) =>
      val p = text.getBytes("UTF-8")
      out.write(Warc.headerFor(id, p.length).getBytes("UTF-8"))
      out.write(p)
      out.write("\r\n\r\n".getBytes("UTF-8"))
    }
    out.toByteArray
  }

  test("parse: offsets, headers, and payload bytes are exact") {
    // payloads with CRLFs and embedded 'WARC/1.0' — length-delimited
    // framing must not care
    val a = "line1\r\nWARC/1.0\r\nline3"
    val b = "x"
    val data = bytesOf(7L -> a, 8L -> b)
    val recs = Warc.parse(new ByteArrayInputStream(data), 0L).toList
    assert(recs.map(_.target_uri) ==
      List("http://example.com/doc/7", "http://example.com/doc/8"))
    assert(recs.head.rec_offset == 0L)
    val aBytes = a.getBytes("UTF-8").length
    assert(recs(1).rec_offset ==
      Warc.headerFor(7L, aBytes).getBytes("UTF-8").length + aBytes + 4)
    assert(new String(recs.head.payload, "UTF-8") == a)
    assert(recs.head.warc_type == "response")
    assert(recs.head.content_length == aBytes.toLong)
  }

  test("parse: corrupt framing refuses loudly") {
    val bad = "NOT-WARC\r\nstuff\r\n\r\n".getBytes("UTF-8")
    val e = intercept[IllegalArgumentException](
      Warc.parse(new ByteArrayInputStream(bad), 0L).toList)
    assert(e.getMessage.contains("bad record magic"))

    // declared length beyond EOF = truncation, not a silent short record
    val data = bytesOf(1L -> "hello").dropRight(9) // eat payload tail + seps
    val e2 = intercept[IllegalArgumentException](
      Warc.parse(new ByteArrayInputStream(data), 0L).toList)
    assert(e2.getMessage.contains("truncated"))

    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n").getBytes("UTF-8")
    val e3 = intercept[IllegalArgumentException](
      Warc.parse(new ByteArrayInputStream(noLen), 0L).toList)
    assert(e3.getMessage.contains("Content-Length"))
  }

  test("fixture round-trip: every document lands exactly once, offsets ascend") {
    val dir = Warc.fixture(spark, sf)
    val got = Warc.read(spark, dir).cache()
    val nDocs = Tables.documents(spark, sf).count()
    assert(got.count() == nDocs)
    // ids partition correctly and payload bytes survive verbatim
    val joined = got
      .withColumn("doc_id",
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long"))
      .join(Tables.documents(spark, sf), "doc_id")
      .where(col("payload") =!= encode(col("text"), "UTF-8"))
    assert(joined.count() == 0, "payload bytes diverged from source text")
    // offsets strictly increase within each file
    val nonMono = got.selectExpr("file_idx", "rec_offset",
      "lag(rec_offset) OVER (PARTITION BY file_idx ORDER BY rec_offset) AS prev")
      .where(col("prev").isNotNull && col("rec_offset") <= col("prev"))
    assert(nonMono.count() == 0)
    got.unpersist()
  }

  test("gz tier: sequential read equals the uncompressed stream byte-for-byte") {
    val plain = Warc.read(spark, Warc.fixture(spark, sf))
      .selectExpr("file_idx", "rec_offset", "record_id", "md5(payload) AS m")
      .collect().map(_.toString).sorted.toSeq
    val gz = Warc.readGz(spark, Warc.fixtureGz(spark, sf))
      .selectExpr("file_idx", "rec_offset", "record_id", "md5(payload) AS m")
      .collect().map(_.toString).sorted.toSeq
    assert(gz == plain) // compression is invisible, offsets included
  }

  test("gz tier: every cdx entry random-accesses exactly its record") {
    import org.apache.hadoop.fs.Path
    val dir = Warc.fixtureGz(spark, sf)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cdxFiles = fs.listStatus(new Path(dir)).toSeq
      .map(_.getPath).filter(_.getName.endsWith(".cdx"))
    assert(cdxFiles.nonEmpty)
    var checked = 0
    cdxFiles.foreach { cdx =>
      val warcFile = cdx.toString.stripSuffix(".cdx") + ".warc.gz"
      val in = fs.open(cdx)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toArray finally in.close()
      lines.foreach { line =>
        val Array(off, len, id) = line.split(',')
        val rec = Warc.readMember(fs, warcFile, off.toLong, len.toInt)
        // the seek hit exactly the right member: the id embedded in the
        // record's own headers matches the cdx row's
        assert(rec.target_uri == s"http://example.com/doc/$id")
        assert(rec.content_length == rec.payload.length.toLong)
        checked += 1
      }
    }
    assert(checked == Tables.documents(spark, sf).count())
  }
}
