package graft.geo

/** Hilbert-curve locality key — [[Morton]]'s write-clustering role with the
  * strictly better locality bound: the Hilbert curve is the classic
  * space-filling curve whose consecutive indexes are ALWAYS 4-adjacent grid
  * neighbours (Morton jumps across half the block at every power-of-two
  * boundary), so sorting a 100 TB point table by this key gives range scans
  * and row-group min/max pruning strictly tighter average cluster shapes
  * (Moon et al. 2001, "Analysis of the clustering properties of the Hilbert
  * space-filling curve", public). Order 8 ⇒ a 256×256 grid, 16-bit keys —
  * the coarse write-clustering granularity (one key ≈ 1.4°×0.7° cell);
  * [[Morton]] stays the fine 32-bit variant.
  *
  * The xy→d conversion is the standard published iterative algorithm
  * (quadrant digit + Gray-code rotation per level) in pure integer ops, so
  * a DuckDB oracle replays it as 8 unrolled CTE steps bit-for-bit.
  */
object Hilbert {

  /** Quantize lng ∈ [−180, 180] to an 8-bit column, clamped — the same
    * association order contract as [[Morton.qLng]] at order 8.
    */
  def q8Lng(lng: Double): Long =
    math.min(255L, math.max(0L, math.floor(((lng + 180.0) / 360.0) * 256.0).toLong))

  /** Quantize lat ∈ [−90, 90] to an 8-bit row, clamped. */
  def q8Lat(lat: Double): Long =
    math.min(255L, math.max(0L, math.floor(((lat + 90.0) / 180.0) * 256.0).toLong))

  /** Hilbert index of a pre-quantized (col, row) cell on the 256×256 grid:
    * per level s = 128..1, the quadrant digit (3·rx)⊕ry scales by s², then
    * the frame reflects/transposes so the child quadrant's curve orients
    * correctly. d ∈ [0, 65536).
    */
  def index(qx: Long, qy: Long): Long = {
    var x = qx; var y = qy; var d = 0L
    var s = 128L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) { // rotate the sub-square
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** 16-bit Hilbert key of a coordinate pair. */
  def key(lng: Double, lat: Double): Long = index(q8Lng(lng), q8Lat(lat))

  /** Inverse (d → quantized cell) — the round-trip witness for specs. */
  def cellOf(d0: Long): (Long, Long) = {
    var x = 0L; var y = 0L; var d = d0
    var s = 1L
    while (s < 256) {
      val rx = 1L & (d / 2)
      val ry = 1L & (d ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      x += s * rx
      y += s * ry
      d /= 4
      s <<= 1
    }
    (x, y)
  }
}
