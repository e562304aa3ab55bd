package graft.raster

/** Pixel-fidelity metrics for the per-row invariant: decoded pixels allclose,
  * PSNR ≥ 40 dB for lossy formats (BASELINE.json input_hint).
  */
object Fidelity {

  /** PSNR in dB between two equal-length value arrays, with `peak` = the
    * representable dynamic range (255 for 8-bit channels).
    */
  def psnr(a: Array[Double], b: Array[Double], peak: Double): Double = {
    require(a.length == b.length && a.nonEmpty)
    var se = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); se += d * d; i += 1 }
    val mse = se / a.length
    if (mse == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(peak * peak / mse)
  }

  /** PSNR between two int16 grids over the observed dynamic range of `a`. */
  def gridPsnr(a: Array[Short], b: Array[Short]): Double = {
    var mn = Int.MaxValue; var mx = Int.MinValue
    var i = 0
    while (i < a.length) { mn = math.min(mn, a(i)); mx = math.max(mx, a(i)); i += 1 }
    val peak = math.max(1, mx - mn).toDouble
    psnr(a.map(_.toDouble), b.map(_.toDouble), peak)
  }

  /** allclose(a, b): |a-b| <= atol + rtol*|b| for every element. */
  def allclose(a: Array[Double], b: Array[Double], rtol: Double = 1e-5,
               atol: Double = 1e-8): Boolean = {
    require(a.length == b.length)
    var i = 0
    while (i < a.length) {
      if (math.abs(a(i) - b(i)) > atol + rtol * math.abs(b(i))) return false
      i += 1
    }
    true
  }

  /** 64-bit average-hash of a grid: mean of 8×8 block means → bit per block.
    * Deterministic perceptual hash for the tile table's `phash` column.
    */
  def phash(samples: Array[Short], size: Int): Long = {
    val block = new Array[Double](64)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        val r0 = by * size / 8; val r1 = math.max(r0 + 1, (by + 1) * size / 8)
        val c0 = bx * size / 8; val c1 = math.max(c0 + 1, (bx + 1) * size / 8)
        var s = 0.0; var n = 0
        var r = r0
        while (r < r1) {
          var c = c0
          while (c < c1) { s += samples(r * size + c); n += 1; c += 1 }
          r += 1
        }
        block(by * 8 + bx) = s / n
        bx += 1
      }
      by += 1
    }
    val mean = block.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) { if (block(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }
}
