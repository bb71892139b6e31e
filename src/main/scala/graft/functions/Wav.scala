package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Minimal RIFF/WAVE PCM codec — pure JVM, no external codec deps.
  *
  * This is the REAL decode path behind the multimodal operators
  * (north-star: image/audio/video as opaque binary columns): `parse` walks
  * actual RIFF chunks (any order, unknown chunks skipped, word-aligned)
  * and decodes 16-bit little-endian PCM; `synth` emits a canonical
  * 44-byte-header mono PCM file. The fixture payloads are synthesized with
  * arithmetically defined samples so a DuckDB oracle can recompute header
  * fields AND the decoded sample sum from the closed form — the whole
  * synth → bytes → parse → aggregate loop is hash-verified
  * (`q_wav_decode`).
  */
object Wav {

  case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int, nSamples: Int)

  /** Deterministic, SQL-expressible fixture signal:
    * `((id·31 + i·7) mod 4096) − 2048` ∈ [−2048, 2047].
    */
  def sampleAt(mediaId: Long, i: Int): Short =
    (((mediaId * 31 + i * 7) % 4096) - 2048).toShort

  def nSamplesFor(mediaId: Long): Int = (50 + mediaId % 100).toInt
  def rateFor(mediaId: Long): Int = 8000 + (mediaId % 4).toInt * 2000

  /** Canonical 16-bit mono PCM WAV: 12-byte RIFF header + 24-byte fmt
    * chunk + 8-byte data header + samples (44 + 2·n bytes total).
    */
  def synth(mediaId: Long): Array[Byte] = {
    val n = nSamplesFor(mediaId)
    val rate = rateFor(mediaId)
    val dataLen = n * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen).put("WAVE".getBytes(US_ASCII))
    buf.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(rate)
      .putInt(rate * 2) // byte rate = rate · blockAlign
      .putShort(2)      // blockAlign = channels · bytesPerSample
      .putShort(16)     // bits per sample
    buf.put("data".getBytes(US_ASCII)).putInt(dataLen)
    var i = 0
    while (i < n) { buf.putShort(sampleAt(mediaId, i)); i += 1 }
    buf.array
  }

  /** Chunk-walking parser: returns header info + decoded PCM16 samples, or
    * None when the payload is not a PCM16 WAV. Tolerates unknown chunks in
    * any position and RIFF's odd-size word padding; truncated declared
    * sizes are clamped to the real payload.
    */
  def parse(bytes: Array[Byte]): Option[(WavInfo, Array[Short])] = {
    if (bytes.length < 12) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(at: Int): String =
      new String(bytes, at, 4, US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, len)
    while (pos + 8 <= bytes.length) {
      val id = tag(pos)
      val declared = buf.getInt(pos + 4)
      if (declared < 0) return None
      val size = math.min(declared, bytes.length - pos - 8)
      if (id == "fmt " && size >= 16) {
        val audioFormat = buf.getShort(pos + 8) & 0xffff
        if (audioFormat != 1) return None // PCM only
        fmt = Some((buf.getShort(pos + 10) & 0xffff,
          buf.getInt(pos + 12), buf.getShort(pos + 22) & 0xffff))
      } else if (id == "data") {
        data = Some((pos + 8, size))
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    for {
      (channels, rate, bits) <- fmt
      (off, len) <- data
      if bits == 16 && channels >= 1
    } yield {
      val n = len / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) { samples(i) = buf.getShort(off + i * 2); i += 1 }
      (WavInfo(rate, channels, bits, n / channels), samples)
    }
  }
}
