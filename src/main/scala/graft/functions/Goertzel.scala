package graft.functions

/** Goertzel single-bin DFT power (X83) — tone detection / spectral
  * features over decoded PCM audio columns without an FFT dependency.
  *
  * For a k-th DFT bin over N samples the Goertzel recurrence computes
  * `|Σᵢ xᵢ·e^(−2πi·k·i/N)|²` in O(N) multiply-adds with THREE doubles of
  * state — no twiddle tables, no power-of-two padding, no per-row array
  * allocation — which is why it's the classic choice when a pipeline
  * needs a handful of bins (DTMF detection, hum removal, bandedness
  * features for audio quality filtering) rather than a full spectrum.
  * Per-row, embarrassingly parallel; the mapPartitions decode path it
  * rides amortizes nothing extra.
  *
  * The DuckDB oracle recomputes the same bin power in direct DFT form
  * (two SUMs of cos/sin-weighted closed-form fixture samples); Goertzel
  * is algebraically identical, so agreement to the query's 4-decimal
  * log-power rounding pins both the decode and the recurrence.
  */
object Goertzel {

  /** Power of DFT bin `k` over `x` (squared magnitude). 0 for empty
    * input. Exact-ish: error accumulates as O(N²·ε) relative — harmless
    * at audio frame sizes.
    */
  def power(x: Array[Short], k: Int): Double = {
    val n = x.length
    if (n == 0) return 0.0
    val w = 2.0 * math.Pi * k / n
    val c = 2.0 * math.cos(w)
    var s1 = 0.0
    var s2 = 0.0
    var i = 0
    while (i < n) {
      val s = x(i) + c * s1 - s2
      s2 = s1
      s1 = s
      i += 1
    }
    s1 * s1 + s2 * s2 - c * s1 * s2
  }

  /** `log10(1 + power)` — the dynamic-range-compressed feature the query
    * emits (1+ keeps silent bins finite).
    */
  def logPower(x: Array[Short], k: Int): Double =
    math.log10(1.0 + power(x, k))
}
