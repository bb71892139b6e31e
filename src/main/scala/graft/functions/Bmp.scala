package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal BMP (BITMAPINFOHEADER, 24-bit, bottom-up) codec — pure JVM, no
  * codec deps. Companion of [[Wav]] for the multimodal image column: the
  * fixture images are synthesized with arithmetically defined pixels so a
  * DuckDB oracle can recompute dimensions AND the decoded pixel sum in
  * closed form (`q_bmp_decode`), making the parse path (header fields,
  * bottom-up row order, 4-byte row padding) hash-verified.
  */
object Bmp {

  case class BmpInfo(width: Int, height: Int, bitsPerPixel: Int)

  /** Deterministic, SQL-expressible fixture pixel:
    * `(id·7 + y·31 + x·3 + c) mod 256` for channel c ∈ {0,1,2} (stored
    * B,G,R order — c is the STORED byte index, which is what the decoded
    * byte stream exposes).
    */
  def pixelAt(mediaId: Long, x: Int, y: Int, c: Int): Int =
    ((mediaId * 7 + y * 31 + x * 3 + c) % 256).toInt

  def widthFor(mediaId: Long): Int = 3 + (mediaId % 5).toInt
  def heightFor(mediaId: Long): Int = 2 + (mediaId % 4).toInt

  /** BMP row stride: pixel rows pad to 4-byte boundaries. */
  def rowSize(width: Int): Int = ((3 * width + 3) / 4) * 4

  def fileSize(mediaId: Long): Int =
    54 + rowSize(widthFor(mediaId)) * heightFor(mediaId)

  /** Canonical 54-byte-header 24-bit bottom-up BMP with the fixture
    * pixels; padding bytes are zero.
    */
  def synth(mediaId: Long): Array[Byte] = {
    val w = widthFor(mediaId)
    val h = heightFor(mediaId)
    val stride = rowSize(w)
    val size = 54 + stride * h
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(size)
      .putShort(0).putShort(0)
      .putInt(54) // pixel data offset
    buf.putInt(40) // BITMAPINFOHEADER
      .putInt(w)
      .putInt(h) // positive → bottom-up
      .putShort(1) // planes
      .putShort(24) // bpp
      .putInt(0) // BI_RGB, uncompressed
      .putInt(stride * h)
      .putInt(2835).putInt(2835) // 72 dpi
      .putInt(0).putInt(0)
    // rows stored bottom-up
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) { buf.put(pixelAt(mediaId, x, y, c).toByte); c += 1 }
        x += 1
      }
      var pad = stride - 3 * w
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array
  }

  /** Parse a 24-bit uncompressed BMP; returns header info + pixel bytes in
    * TOP-DOWN row-major (y, x, channel) order — i.e. the bottom-up storage
    * is undone and padding stripped. None for anything that is not a
    * 24-bit BI_RGB BMP or is truncated.
    */
  /** Nearest-neighbor resize (X93) of a decoded top-down (y, x, channel)
    * pixel array: source coordinate `⌊out·src/outDim⌋` — pure integer
    * arithmetic, so the resampling is bit-reproducible in SQL (the oracle
    * recomputes every output pixel from the closed-form source formula
    * composed with the same index map). The standard deterministic
    * downscale/thumbnail tier for training-data image pipelines; bilinear
    * and friends belong behind the same signature but trade SQL
    * reproducibility for smoothness.
    */
  def resizeNearest(px: Array[Int], w: Int, h: Int,
      outW: Int, outH: Int): Array[Int] = {
    require(w > 0 && h > 0 && outW > 0 && outH > 0)
    val out = new Array[Int](outW * outH * 3)
    var i = 0
    var yo = 0
    while (yo < outH) {
      val sy = yo * h / outH
      var xo = 0
      while (xo < outW) {
        val sx = xo * w / outW
        var c = 0
        while (c < 3) { out(i) = px((sy * w + sx) * 3 + c); i += 1; c += 1 }
        xo += 1
      }
      yo += 1
    }
    out
  }

  def parse(bytes: Array[Byte]): Option[(BmpInfo, Array[Int])] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    val bpp = buf.getShort(28) & 0xffff
    val compression = buf.getInt(30)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
    // long arithmetic: a hostile width like 715M wraps 3*w+3 negative in
    // Int, sneaks past the size check, and crashes the allocation below —
    // a corrupted binary row must yield None, never a task failure
    val strideL = ((3L * w + 3) / 4) * 4
    val pxL = 3L * w * h
    if (strideL > Int.MaxValue || pxL > Int.MaxValue) return None
    val stride = strideL.toInt
    if (dataOffset < 54 || dataOffset.toLong + strideL * h > bytes.length) return None
    val out = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOffset + (h - 1 - y) * stride // undo bottom-up
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          out((y * w + x) * 3 + c) = bytes(srcRow + x * 3 + c) & 0xff
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Some((BmpInfo(w, h, bpp), out))
  }
}
