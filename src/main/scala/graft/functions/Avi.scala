package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal uncompressed AVI codec (RIFF `AVI ` form, single `vids` stream,
  * 24-bit DIB frames in `00db` chunks) — pure JVM, no codec deps.
  * Completes the multimodal codec family ([[Wav]], [[Bmp]]): the fixture
  * videos are synthesized with arithmetically defined per-frame pixels so
  * a DuckDB oracle can recompute frame count, dimensions, and the decoded
  * all-frames pixel sum in closed form (`q_video_frames`), hash-verifying
  * the whole parse path — RIFF chunk walk, `hdrl`/`strl` header fields,
  * per-frame bottom-up padded row layout.
  */
object Avi {

  case class AviInfo(width: Int, height: Int, nFrames: Int, rate: Int, scale: Int)

  /** Deterministic, SQL-expressible fixture pixel for frame f:
    * `(id·7 + f·97 + y·31 + x·3 + c) mod 256`, c the stored (B,G,R) byte.
    */
  def pixelAt(mediaId: Long, f: Int, x: Int, y: Int, c: Int): Int =
    ((mediaId * 7 + f * 97 + y * 31 + x * 3 + c) % 256).toInt

  def widthFor(mediaId: Long): Int = 2 + (mediaId % 4).toInt
  def heightFor(mediaId: Long): Int = 2 + (mediaId % 3).toInt
  def framesFor(mediaId: Long): Int = 2 + (mediaId % 5).toInt
  def rateFor(mediaId: Long): Int = 10 + (mediaId % 5).toInt

  /** DIB row stride: pixel rows pad to 4-byte boundaries (as in [[Bmp]]). */
  def rowSize(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Fixed header overhead (RIFF + hdrl/avih + strl/strh/strf + movi list
    * headers) is 224 bytes; each frame adds an 8-byte chunk header plus its
    * padded rows.
    */
  def fileSize(mediaId: Long): Int =
    224 + framesFor(mediaId) *
      (8 + rowSize(widthFor(mediaId)) * heightFor(mediaId))

  /** Canonical single-stream uncompressed AVI with the fixture frames. */
  def synth(mediaId: Long): Array[Byte] = {
    val w = widthFor(mediaId)
    val h = heightFor(mediaId)
    val nF = framesFor(mediaId)
    val rate = rateFor(mediaId)
    val stride = rowSize(w)
    val frameData = stride * h
    val strlSize = 4 + (8 + 56) + (8 + 40) // 'strl' + strh + strf
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize) // 'hdrl' + avih + LIST strl
    val moviSize = 4 + nF * (8 + frameData)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(1000000 / rate) // dwMicroSecPerFrame
      .putInt(0) // dwMaxBytesPerSec
      .putInt(0) // dwPaddingGranularity
      .putInt(0) // dwFlags
      .putInt(nF) // dwTotalFrames
      .putInt(0) // dwInitialFrames
      .putInt(1) // dwStreams
      .putInt(frameData) // dwSuggestedBufferSize
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    fourcc("LIST"); buf.putInt(strlSize); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    buf.putInt(0) // dwFlags
      .putShort(0).putShort(0) // wPriority, wLanguage
      .putInt(0) // dwInitialFrames
      .putInt(1) // dwScale
      .putInt(rate) // dwRate (fps = rate/scale)
      .putInt(0) // dwStart
      .putInt(nF) // dwLength (in frames)
      .putInt(frameData) // dwSuggestedBufferSize
      .putInt(-1) // dwQuality
      .putInt(0) // dwSampleSize
      .putShort(0).putShort(0).putShort(0).putShort(0) // rcFrame
    fourcc("strf"); buf.putInt(40) // BITMAPINFOHEADER
    buf.putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24)
      .putInt(0) // BI_RGB
      .putInt(frameData)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
    var f = 0
    while (f < nF) {
      fourcc("00db"); buf.putInt(frameData)
      var y = h - 1
      while (y >= 0) { // rows stored bottom-up, like BMP
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) { buf.put(pixelAt(mediaId, f, x, y, c).toByte); c += 1 }
          x += 1
        }
        var pad = stride - 3 * w
        while (pad > 0) { buf.put(0.toByte); pad -= 1 }
        y -= 1
      }
      f += 1
    }
    buf.array
  }

  /** Walk sibling RIFF chunks in [start, end); `visit(id, bodyOff, size)`
    * returns false to reject. Chunk bodies pad to even offsets (RIFF
    * rule). Returns false on any malformed/hostile size.
    */
  private def walk(bytes: Array[Byte], buf: ByteBuffer, start: Int, end: Int)(
      visit: (String, Int, Int) => Boolean): Boolean = {
    var off = start
    while (off + 8 <= end) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = buf.getInt(off + 4)
      if (size < 0 || off + 8L + size > end) return false
      if (!visit(id, off + 8, size)) return false
      off += 8 + size + (size & 1)
    }
    true
  }

  /** Parse an uncompressed single-video-stream AVI; returns header info +
    * all frames' pixel bytes flattened in (frame, top-down row, x, channel)
    * order — bottom-up storage undone, padding stripped. None for anything
    * that is not a 24-bit BI_RGB AVI, is truncated, or whose frame chunks
    * disagree with the declared geometry.
    */
  def parse(bytes: Array[Byte]): Option[(AviInfo, Array[Int])] = {
    if (bytes.length < 24) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fcc(off: Int): String =
      if (off + 4 > bytes.length) "" else new String(bytes, off, 4, "US-ASCII")
    if (fcc(0) != "RIFF" || fcc(8) != "AVI ") return None
    val riffEnd = math.min(bytes.length.toLong, 8L + buf.getInt(4)).toInt
    var width = 0; var height = 0; var declared = 0
    var rate = 0; var scale = 0; var bpp = 0; var compression = -1
    val frameOffs = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ok = walk(bytes, buf, 12, riffEnd) { (id, off, size) =>
      if (id != "LIST" || size < 4) true // skip non-list chunks (idx1, JUNK)
      else fcc(off) match {
        case "hdrl" => walk(bytes, buf, off + 4, off + size) { (id2, o2, s2) =>
          if (id2 == "avih" && s2 >= 56) {
            declared = buf.getInt(o2 + 16)
            width = buf.getInt(o2 + 32)
            height = buf.getInt(o2 + 36)
            true
          } else if (id2 == "LIST" && s2 >= 4 && fcc(o2) == "strl")
            walk(bytes, buf, o2 + 4, o2 + s2) { (id3, o3, s3) =>
              if (id3 == "strh" && s3 >= 56 && fcc(o3) == "vids") {
                scale = buf.getInt(o3 + 20); rate = buf.getInt(o3 + 24)
              } else if (id3 == "strf" && s3 >= 40) {
                bpp = buf.getShort(o3 + 14) & 0xffff
                compression = buf.getInt(o3 + 16)
              }
              true
            }
          else true
        }
        case "movi" => walk(bytes, buf, off + 4, off + size) { (id2, o2, s2) =>
          if (id2 == "00db" || id2 == "00dc") frameOffs += o2
          true
        }
        case _ => true
      }
    }
    if (!ok || width <= 0 || height <= 0 || bpp != 24 || compression != 0 ||
      scale <= 0 || rate <= 0 || frameOffs.isEmpty || declared != frameOffs.length)
      return None
    // hostile-geometry guard (cf. Bmp.parse): Long arithmetic before alloc
    val strideL = ((3L * width + 3) / 4) * 4
    val pxL = 3L * width * height * frameOffs.length
    if (strideL * height > Int.MaxValue || pxL > Int.MaxValue) return None
    val stride = strideL.toInt
    val frameData = stride * height
    // every frame chunk must carry exactly one frame's padded rows
    var i = 0
    while (i < frameOffs.length) {
      val o = frameOffs(i)
      val size = buf.getInt(o - 4)
      if (size != frameData || o.toLong + frameData > bytes.length) return None
      i += 1
    }
    val out = new Array[Int](pxL.toInt)
    var f = 0
    while (f < frameOffs.length) {
      val base = frameOffs(f)
      var y = 0
      while (y < height) {
        val srcRow = base + (height - 1 - y) * stride // undo bottom-up
        var x = 0
        while (x < width) {
          var c = 0
          while (c < 3) {
            out(((f * height + y) * width + x) * 3 + c) = bytes(srcRow + x * 3 + c) & 0xff
            c += 1
          }
          x += 1
        }
        y += 1
      }
      f += 1
    }
    Some((AviInfo(width, height, frameOffs.length, rate, scale), out))
  }
}
