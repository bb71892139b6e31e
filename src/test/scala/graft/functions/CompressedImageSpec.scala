package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** X41 pins beyond the hash gate: the PNG cross-implementation round trip
  * is bit-exact (our encoder → JDK decoder → closed-form pixels), hostile
  * bytes fail soft, and JPEG — lossy by design — preserves geometry
  * exactly and the signal mean within quantization tolerance.
  */
class CompressedImageSpec extends AnyFunSuite {

  test("png: encoder→JDK-decoder round trip is bit-exact vs the closed form") {
    for (id <- 0L to 40L) {
      val (info, px) = Png.parse(Png.synth(id)).get
      assert(info.width == Png.widthFor(id) && info.height == Png.heightFor(id))
      assert(px.length == info.width * info.height * 3)
      for (y <- 0 until info.height; x <- 0 until info.width; c <- 0 until 3)
        assert(px((y * info.width + x) * 3 + c) == Png.pixelAt(id, x, y, c),
          s"id=$id ($x,$y,$c)")
    }
  }

  test("png: corrupted and truncated payloads yield None, never a throw") {
    val good = Png.synth(7L)
    assert(Png.parse(good.take(20)).isEmpty)
    assert(Png.parse(Array.fill[Byte](64)(0x41)).isEmpty)
    // flip a byte inside the IDAT zlib stream: CRC/inflate must fail soft
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0xff).toByte
    assert(Png.parse(corrupt).isEmpty)
    assert(Png.parse(Array.empty[Byte]).isEmpty)
  }

  test("jpeg: geometry is exact; decoded mean tracks the source pattern") {
    for (id <- 1L to 41L by 2) {
      val (info, px) = Jpeg.parse(Jpeg.synth(id)).get
      assert(info.width == Jpeg.widthFor(id) && info.height == Jpeg.heightFor(id))
      assert(px.length == info.width * info.height * 3)
      val mean = px.foldLeft(0L)(_ + _).toDouble / px.length
      val src = Jpeg.sourceMean(id)
      assert(math.abs(mean - src) < 10.0,
        s"id=$id decoded mean $mean vs source $src — quantization drift too large")
    }
  }

  test("jpeg: payloads are really entropy-coded (smaller than raw), parse fails soft") {
    val id = 3L
    val raw = Jpeg.widthFor(id) * Jpeg.heightFor(id) * 3
    assert(Jpeg.synth(id).length < raw,
      "fixture JPEG is not smaller than its raw pixels — not a real compressed payload")
    assert(Jpeg.parse(Array.fill[Byte](32)(0x7f)).isEmpty)
  }
}
