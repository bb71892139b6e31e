package graft.functions

import java.io.ByteArrayInputStream
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater}

import javax.imageio.ImageIO

/** Compressed-image tier beside the uncompressed-RIFF codecs ([[Bmp]]/
  * [[Avi]]): truecolor 8-bit PNG (X41). Real training corpora carry
  * compressed formats, so the multimodal column family needs at least one
  * real entropy-coded decode path, not just header walks.
  *
  * The decode side is the JDK's public `javax.imageio` PNG reader — the
  * pure-JVM, zero-dependency choice. The fixture ENCODER is hand-rolled
  * here (filter-0 scanlines through one `java.util.zip.Deflater` stream,
  * CRC-32 chunk framing per the PNG spec), deliberately NOT ImageIO: the
  * oracle then exercises a true cross-implementation round trip — our
  * encoder's bytes, the JDK's inflater+unfilter, and a DuckDB twin
  * recomputing the closed-form pixel sum. Any of the three disagreeing
  * breaks the `q_png_decode` hash.
  */
object Png {

  // ImageIO defaults to a DISK-backed ImageInputStream (a temp file
  // created and deleted per ImageIO.read call) — ~0.5 ms of filesystem
  // churn per image that dwarfs the actual inflate of these payloads.
  // Memory caching is the right mode for byte-array inputs everywhere.
  ImageIO.setUseCache(false)

  case class PngInfo(width: Int, height: Int)

  /** Deterministic, SQL-expressible fixture pixel (RGB channel order). */
  def pixelAt(mediaId: Long, x: Int, y: Int, c: Int): Int =
    ((mediaId * 11 + y * 29 + x * 5 + c * 7) % 256).toInt

  def widthFor(mediaId: Long): Int = 4 + (mediaId % 6).toInt
  def heightFor(mediaId: Long): Int = 3 + (mediaId % 5).toInt

  private val signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val tb = typ.getBytes("US-ASCII")
    val buf = ByteBuffer.allocate(12 + data.length)
    buf.putInt(data.length).put(tb).put(data)
    val crc = new CRC32
    crc.update(tb)
    crc.update(data)
    buf.putInt(crc.getValue.toInt)
    buf.array
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Truecolor-8 PNG of the fixture pattern: IHDR + one IDAT (whole zlib
    * stream, every scanline filter 0) + IEND.
    */
  def synth(mediaId: Long): Array[Byte] = {
    val w = widthFor(mediaId)
    val h = heightFor(mediaId)
    val raw = new Array[Byte](h * (1 + 3 * w))
    var y = 0
    while (y < h) {
      val row = y * (1 + 3 * w) // leading byte per scanline: filter type 0
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          raw(row + 1 + x * 3 + c) = pixelAt(mediaId, x, y, c).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val ihdr = ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, none
      .array
    signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", deflate(raw)) ++
      chunk("IEND", Array.empty)
  }

  /** Decode any PNG via the JDK reader; pixels come back top-down
    * row-major in (y, x, channel) RGB order — the same layout [[Bmp.parse]]
    * exposes. None for unparseable bytes (ImageIO signals null / throws).
    */
  def parse(bytes: Array[Byte]): Option[(PngInfo, Array[Int])] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Int](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val base = (y * w + x) * 3
            out(base) = (rgb >> 16) & 0xff
            out(base + 1) = (rgb >> 8) & 0xff
            out(base + 2) = rgb & 0xff
            x += 1
          }
          y += 1
        }
        Some((PngInfo(w, h), out))
      }
    } catch { case _: Exception => None }
}
