package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("avi payloads are real parseable uncompressed videos") {
    import graft.functions.Avi
    val rows = Multimodal.media(spark, sf).where(col("fmt") === "avi")
      .select("media_id", "bytes").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val parsed = Avi.parse(r.getAs[Array[Byte]]("bytes"))
      assert(parsed.isDefined, s"media $id did not parse")
      val (info, px) = parsed.get
      assert(info == Avi.AviInfo(Avi.widthFor(id), Avi.heightFor(id),
        Avi.framesFor(id), Avi.rateFor(id), 1))
      // decoded (frame, top-down y, x, c) order must invert the per-frame
      // bottom-up storage
      var i = 0
      for (f <- 0 until info.nFrames; y <- 0 until info.height;
           x <- 0 until info.width; c <- 0 until 3) {
        assert(px(i) == Avi.pixelAt(id, f, x, y, c), s"media $id px ($f,$x,$y,$c)")
        i += 1
      }
    }
  }

  test("avi parser golden fixture: chunk walking, geometry checks, garbage rejection") {
    import graft.functions.Avi
    val canonical = Avi.synth(11L) // w=2+3=5, h=2+2=4, nF=2+1=3
    assert(canonical.length == Avi.fileSize(11L))
    val (info, px) = Avi.parse(canonical).get
    assert(info.nFrames == 3 && info.width == 5 && info.height == 4)
    assert(px.length == 3 * 5 * 4 * 3)
    // an extra JUNK top-level chunk must be skipped, not tripped over
    import java.nio.{ByteBuffer, ByteOrder}
    val junk = {
      val b = ByteBuffer.allocate(8 + 4).order(ByteOrder.LITTLE_ENDIAN)
      b.put("JUNK".getBytes("US-ASCII")).putInt(4).putInt(0)
      b.array
    }
    val riffSizePatched = {
      val withJunk = canonical.take(12) ++ junk ++ canonical.drop(12)
      val b = ByteBuffer.wrap(withJunk).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(4, b.getInt(4) + junk.length)
      withJunk
    }
    val reparsed = Avi.parse(riffSizePatched)
    assert(reparsed.isDefined, "parser must skip unknown top-level chunks")
    assert(reparsed.get._2.toSeq == px.toSeq)
    // garbage, truncation, and frame-count lies are rejected, never thrown
    assert(Avi.parse("not an avi".getBytes).isEmpty)
    assert(Avi.parse(Array.emptyByteArray).isEmpty)
    assert(Avi.parse(canonical.take(100)).isEmpty)
    val lied = canonical.clone
    ByteBuffer.wrap(lied).order(ByteOrder.LITTLE_ENDIAN).putInt(32 + 16, 99) // avih dwTotalFrames
    assert(Avi.parse(lied).isEmpty, "declared frame count must match movi chunks")
  }

  test("bmp payloads are real parseable 24-bit images") {
    import graft.functions.Bmp
    val rows = Multimodal.media(spark, sf).where(col("fmt") === "bmp")
      .select("media_id", "bytes").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val parsed = Bmp.parse(r.getAs[Array[Byte]]("bytes"))
      assert(parsed.isDefined, s"media $id did not parse")
      val (info, px) = parsed.get
      assert(info == Bmp.BmpInfo(Bmp.widthFor(id), Bmp.heightFor(id), 24))
      // decoded top-down (y, x, c) order must invert the bottom-up storage
      var i = 0
      for (y <- 0 until info.height; x <- 0 until info.width; c <- 0 until 3) {
        assert(px(i) == Bmp.pixelAt(id, x, y, c), s"media $id pixel ($x,$y,$c)")
        i += 1
      }
    }
  }

  test("bmp parser golden fixture: padding arithmetic, garbage rejection") {
    import graft.functions.Bmp
    // width 5 → 15 pixel bytes padded to a 16-byte stride
    assert(Bmp.rowSize(5) == 16 && Bmp.rowSize(4) == 12 && Bmp.rowSize(3) == 12)
    val canonical = Bmp.synth(10L) // w = 3+0 = 3, h = 2+2 = 4
    assert(canonical.length == 54 + Bmp.rowSize(3) * 4)
    assert(Bmp.parse(canonical).isDefined)
    assert(Bmp.parse("not a bmp".getBytes).isEmpty)
    assert(Bmp.parse(canonical.take(53)).isEmpty)
    assert(Bmp.parse(canonical.take(60)).isEmpty) // truncated pixel data
  }

  test("wav payloads are real parseable PCM16 WAV files") {
    import graft.functions.Wav
    val rows = Multimodal.media(spark, sf).where(col("fmt") === "wav")
      .select("media_id", "bytes").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val parsed = Wav.parse(r.getAs[Array[Byte]]("bytes"))
      assert(parsed.isDefined, s"media $id did not parse")
      val (info, samples) = parsed.get
      assert(info == Wav.WavInfo(Wav.rateFor(id), 1, 16, Wav.nSamplesFor(id)))
      samples.zipWithIndex.foreach { case (s0, i) =>
        assert(s0 == Wav.sampleAt(id, i), s"media $id sample $i")
      }
    }
  }

  test("wav parser golden fixture: chunk walking, unknown chunks, rejects garbage") {
    import graft.functions.Wav
    import java.nio.{ByteBuffer, ByteOrder}
    // canonical synth file parses to its exact definition
    val canonical = Wav.synth(7L)
    assert(canonical.length == 44 + 2 * Wav.nSamplesFor(7L))
    val (info, samples) = Wav.parse(canonical).get
    assert(info.sampleRate == Wav.rateFor(7L) && info.bitsPerSample == 16)
    assert(samples.length == Wav.nSamplesFor(7L))
    // a LIST chunk between fmt and data must be skipped, not tripped over
    val listChunk = {
      val b = ByteBuffer.allocate(8 + 5 + 1).order(ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("US-ASCII")).putInt(5).put("INFOx".getBytes("US-ASCII"))
      b.put(0.toByte) // odd-size chunks are word-padded
      b.array
    }
    val withList = canonical.take(36) ++ listChunk ++ canonical.drop(36)
    val reparsed = Wav.parse(withList)
    assert(reparsed.isDefined, "parser must skip unknown chunks")
    assert(reparsed.get._2.toSeq == samples.toSeq)
    // garbage and truncation are rejected or clamped, never thrown
    assert(Wav.parse("not a wav at all".getBytes).isEmpty)
    assert(Wav.parse(Array.emptyByteArray).isEmpty)
    assert(Wav.parse(canonical.take(10)).isEmpty)
    val truncated = Wav.parse(canonical.take(60)) // header + few samples
    assert(truncated.isDefined && truncated.get._2.length == (60 - 44) / 2)
  }

  test("X210 aHash: brightness-invariant-ish near-dups collapse, structural change diverges") {
    // a 16x16 smooth gradient
    def grad(shift: Int, transpose: Boolean): Array[Int] =
      Array.tabulate(16 * 16 * 3) { i =>
        val p = i / 3
        val (x, y) = if (transpose) (p / 16, p % 16) else (p % 16, p / 16)
        math.min(255, x * 10 + y * 4 + shift)
      }
    def hash(px: Array[Int]): (Long, Long) = {
      val (lo, hi, _) = Multimodal.aHash(px, 16, 16)
      (lo, hi)
    }
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val base = hash(grad(0, transpose = false))
    // +3 uniform brightness: the mean shifts WITH the pixels — the
    // threshold bits barely move (the property that makes aHash a
    // near-dup detector, not an exact-byte hash)
    assert(ham(base, hash(grad(3, transpose = false))) <= 4)
    // transposing the gradient is a different image: many bits flip
    assert(ham(base, hash(grad(0, transpose = true))) >= 16)
    // exactly 64 cells partitioned by the mean test: bits in [1, 63]
    val (_, _, n) = Multimodal.aHash(grad(0, transpose = false), 16, 16)
    assert(n >= 1 && n <= 63)
  }

  test("X221 image near-dup pairs: band-equality join, never a cartesian product") {
    val plan = graft.SparkEntry.queries("q_image_neardup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must be a chunk-equality join:\n${plan.take(500)}")
    // pigeonhole sanity on crafted hashes: 3 flipped bits in ONE chunk
    // still share the other three chunks — the pair must surface
    val lo = 0x0000FFFF0000FFFFL & 0xFFFFFFFFL
    assert(java.lang.Long.bitCount((lo ^ (lo | 0x7L)) & 0xFFFFL) <= 3)
  }

  test("X242 scene cuts: per-video counts match a local closed-form replay; both outcomes occur") {
    val got = Multimodal.queries("q_scene_cuts")(spark, sf).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("n_cuts"),
          r.getAs[Long]("max_delta"))).toMap
    assert(got.nonEmpty)
    // closed-form replay of the synthetic AVI signal
    got.keys.toSeq.sorted.take(20).foreach { id =>
      val (w, h, nf) = ((2 + id % 4).toInt, (2 + id % 3).toInt, (2 + id % 5).toInt)
      val fs = w * h * 3
      val sums = Array.tabulate(nf) { f =>
        (for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
          yield (id * 7 + f * 97 + y * 31 + x * 3 + c) % 256).sum
      }
      val deltas = (1 until nf).map(f => math.abs(sums(f) - sums(f - 1)))
      val cuts = deltas.count(_ > Multimodal.sceneCutPerByte.toLong * fs)
      assert(got(id) == ((nf.toLong, cuts.toLong, deltas.max)),
        s"video $id scene-cut mismatch")
    }
    // threshold is load-bearing: some frame pairs cut, some don't
    val (nf, cuts) = (got.values.map(v => v._1 - 1).sum, got.values.map(_._2).sum)
    assert(cuts > 0 && cuts < nf, s"degenerate threshold: $cuts of $nf")
  }

  test("X244 audio silence: per-audio windows/segments match a local closed-form replay") {
    val got = Multimodal.queries("q_audio_silence")(spark, sf).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_silent"),
          r.getAs[Long]("n_segments"), r.getAs[Long]("max_wenergy"))).toMap
    assert(got.nonEmpty)
    got.keys.toSeq.sorted.take(20).foreach { id =>
      val n = (50 + id % 100).toInt
      val s = Array.tabulate(n)(i => math.abs(((id * 31 + i * 7) % 4096) - 2048))
      val nw = (n + Multimodal.silenceWindow - 1) / Multimodal.silenceWindow
      val wins = (0 until nw).map { w =>
        val sl = s.slice(w * Multimodal.silenceWindow,
          math.min(n, (w + 1) * Multimodal.silenceWindow))
        (sl.sum, sl.length)
      }
      val silent = wins.map { case (e, ns) =>
        e < Multimodal.silencePerSample.toLong * ns
      }
      val segs = silent.indices.count(i => !silent(i) && (i == 0 || silent(i - 1)))
      assert(got(id) == ((nw.toLong, silent.count(identity).toLong,
        segs.toLong, wins.map(_._1).max)), s"audio $id silence mismatch")
    }
    // threshold is load-bearing: silent and non-silent windows both occur,
    // and some clip is entirely silent (the drop case VAD trimming exists for)
    val (tw, ts) = (got.values.map(_._1).sum, got.values.map(_._2).sum)
    assert(ts > 0 && ts < tw)
    assert(got.values.exists(v => v._2 == v._1), "expect an all-silent clip")
    assert(got.values.exists(_._3 >= 1), "expect speech segments")
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
    }
    // video rows: real decoded frame pixels → byte range; wav rows:
    // real PCM samples → fixture signal amplitude; bmp rows: pixel bytes
    a.filter(_.media_id % 3 == 2).foreach(x => assert(x.mean_byte >= 0 && x.mean_byte <= 255))
    a.filter(_.media_id % 3 == 1).foreach(x => assert(math.abs(x.mean_byte) <= 2048))
    a.filter(_.media_id % 3 == 0).foreach(x => assert(x.mean_byte >= 0 && x.mean_byte <= 255))
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

  test("goertzel recurrence equals the direct DFT sums; pure tone peaks at its bin") {
    import graft.functions.Goertzel
    // Direct-form twin of the recurrence (the oracle's formulation).
    def direct(x: Array[Short], k: Int): Double = {
      val n = x.length
      var re = 0.0; var im = 0.0
      var i = 0
      while (i < n) {
        val ang = 2 * math.Pi * k * i / n
        re += x(i) * math.cos(ang); im += x(i) * math.sin(ang)
        i += 1
      }
      re * re + im * im
    }
    val rnd = new scala.util.Random(3)
    val noise = Array.fill(147)((rnd.nextInt(4096) - 2048).toShort)
    for (k <- Seq(0, 1, 5, 20)) {
      val g = Goertzel.power(noise, k)
      val d = direct(noise, k)
      assert(math.abs(g - d) <= 1e-6 * math.max(d, 1.0),
        s"bin $k: goertzel $g vs direct $d")
    }
    // A pure sine at bin 5 of 128 samples dominates every other bin.
    val tone = Array.tabulate(128)(i =>
      (1000 * math.sin(2 * math.Pi * 5 * i / 128)).toShort)
    val p5 = Goertzel.power(tone, 5)
    for (k <- Seq(1, 3, 4, 6, 10))
      assert(Goertzel.power(tone, k) < p5 / 100, s"bin $k should be quiet")
  }

  test("X93 nearest-neighbor resize: hand-computed map, identity, and decode round-trip") {
    import graft.functions.Bmp
    // 2×1 source (pixels A=(0,0), B=(1,0)) doubled to 4×1: A A B B
    val src = Array(1, 2, 3, 10, 20, 30) // two BGR pixels
    val up = Bmp.resizeNearest(src, 2, 1, 4, 1)
    assert(up.toSeq == Seq(1, 2, 3, 1, 2, 3, 10, 20, 30, 10, 20, 30))
    // identity resize is a no-op
    assert(Bmp.resizeNearest(src, 2, 1, 2, 1).toSeq == src.toSeq)
    // 2×2 → 1×1 keeps the top-left pixel (floor map)
    val q = Array.tabulate(12)(identity)
    assert(Bmp.resizeNearest(q, 2, 2, 1, 1).toSeq == Seq(0, 1, 2))
    // decode→resize on a synthesized payload matches pixelAt through the map
    val id = 9L
    val (info, px) = Bmp.parse(Bmp.synth(id)).get
    val out = Bmp.resizeNearest(px, info.width, info.height, 8, 6)
    for (yo <- 0 until 6; xo <- 0 until 8; c <- 0 until 3) {
      val exp = Bmp.pixelAt(id, xo * info.width / 8, yo * info.height / 6, c)
      assert(out((yo * 8 + xo) * 3 + c) == exp)
    }
  }
}
