package graft.geo

/** Z-order (Morton) locality key — the WRITE-CLUSTERING primitive: sorting a
  * 100 TB point table by this key before writing parquet makes every file /
  * row group cover a compact spatial rectangle, so lng/lat range predicates
  * (including the ones [[graft.plans.CellRangeDerivation]] derives from cell
  * predicates) prune at row-group min/max granularity instead of scanning
  * the world. 16+16-bit interleave ⇒ 32-bit keys; the aligned-block prefix
  * property: any 2ᵏ×2ᵏ cell-aligned block is ONE contiguous key range
  * (a row-major key fragments the same block into 2ᵏ runs).
  *
  * Everything is engine-exact: the quantizer is two IEEE ops + floor with a
  * fixed association order, and the bit spread is the standard 4-step magic
  * masks — both replicated verbatim by the DuckDB oracle.
  */
object Morton {

  /** Spread the low 16 bits of v to the even bit positions of a 32-bit word. */
  def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Quantize lng ∈ [−180, 180] to a 16-bit column, clamped. Association
    * order ((lng + 180) / 360) · 65536 is part of the cross-engine contract.
    */
  def qLng(lng: Double): Long =
    math.min(65535L, math.max(0L, math.floor(((lng + 180.0) / 360.0) * 65536.0).toLong))

  /** Quantize lat ∈ [−90, 90] to a 16-bit row, clamped. */
  def qLat(lat: Double): Long =
    math.min(65535L, math.max(0L, math.floor(((lat + 90.0) / 180.0) * 65536.0).toLong))

  /** 32-bit Morton key: lat bits in the odd positions, lng bits in the even. */
  def key(lng: Double, lat: Double): Long =
    (spread16(qLat(lat)) << 1) | spread16(qLng(lng))

  /** Key of a pre-quantized (col, row) cell — for range-cover math. */
  def keyOf(qx: Long, qy: Long): Long = (spread16(qy) << 1) | spread16(qx)
}
