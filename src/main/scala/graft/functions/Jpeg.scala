package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Baseline-JPEG tier of the compressed-image family (X41, with [[Png]]).
  *
  * JPEG is LOSSY, so unlike every other codec fixture the decoded pixels
  * are not bit-recomputable in SQL — the hash oracle (`q_jpeg_decode`)
  * therefore pins exactly what survives the codec: geometry and decoded
  * byte counts, both closed-form. Signal fidelity is pinned separately in
  * CompressedImageSpec: the decoded mean must sit within a tolerance of
  * the source pattern's mean (DC coefficients survive quantization).
  *
  * Both encode and decode are the JDK's `javax.imageio` baseline codec —
  * for a lossy format a hand-rolled twin would pin nothing stronger, since
  * no independent reconstruction of the exact pixels exists by design.
  */
object Jpeg {

  // same rationale as [[Png]]: byte-array IO must not pay ImageIO's
  // default temp-FILE-per-read stream cache
  ImageIO.setUseCache(false)

  case class JpegInfo(width: Int, height: Int)

  /** Same closed-form pattern family as the other codecs; dims are
    * DCT-block-scaled (≥ 16px) so quantization noise stays a small
    * fraction of the signal.
    */
  def pixelAt(mediaId: Long, x: Int, y: Int, c: Int): Int =
    ((mediaId * 13 + y * 17 + x * 5 + c * 7) % 256).toInt

  def widthFor(mediaId: Long): Int = 16 + (mediaId % 16).toInt
  def heightFor(mediaId: Long): Int = 12 + (mediaId % 8).toInt

  /** Mean of the source pattern — the spec's fidelity anchor. */
  def sourceMean(mediaId: Long): Double = {
    val w = widthFor(mediaId)
    val h = heightFor(mediaId)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) { sum += pixelAt(mediaId, x, y, c); c += 1 }
        x += 1
      }
      y += 1
    }
    sum.toDouble / (w * h * 3)
  }

  def synth(mediaId: Long): Array[Byte] = {
    val w = widthFor(mediaId)
    val h = heightFor(mediaId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (pixelAt(mediaId, x, y, 0) << 16) |
            (pixelAt(mediaId, x, y, 1) << 8) |
            pixelAt(mediaId, x, y, 2))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, "jpg", out), "no JPEG writer in this JVM")
    out.toByteArray
  }

  /** Decode via the JDK reader; same return shape as [[Png.parse]]. */
  def parse(bytes: Array[Byte]): Option[(JpegInfo, Array[Int])] =
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
        Some((JpegInfo(w, h), out))
      }
    } catch { case _: Exception => None }
}
