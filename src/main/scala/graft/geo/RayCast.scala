package graft.geo

import org.apache.spark.sql.catalyst.util.ArrayData

/** Even-odd ray casting over packed coordinate arrays (north rule:
  * "point-in-polygon (ray casting over packed coordinate arrays)").
  * Generalizes the reference's per-coordinate spatial addressing to polygon
  * membership; the reference itself has no polygon ops (SURVEY.md §2.3 J2).
  */
object RayCast {

  /** Point in (closed or open) ring given as parallel coordinate arrays.
    * Even-odd rule; a point exactly on an edge may report either side
    * (standard ray-cast semantics — callers needing closed semantics add an
    * explicit boundary test).
    */
  def contains(px: Double, py: Double, xs: Array[Double], ys: Array[Double]): Boolean = {
    var inside = false
    val n = xs.length
    var i = 0
    var j = n - 1
    while (i < n) {
      val yi = ys(i); val yj = ys(j)
      if ((yi > py) != (yj > py)) {
        val xInt = (xs(j) - xs(i)) * (py - yi) / (yj - yi) + xs(i)
        if (px < xInt) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Zero-copy variant over Catalyst ArrayData — called from generated code
    * (whole-stage codegen keeps the refinement predicate on the join path).
    */
  def contains(px: Double, py: Double, xs: ArrayData, ys: ArrayData): Boolean = {
    var inside = false
    val n = xs.numElements()
    var i = 0
    var j = n - 1
    while (i < n) {
      val yi = ys.getDouble(i); val yj = ys.getDouble(j)
      if ((yi > py) != (yj > py)) {
        val xInt = (xs.getDouble(j) - xs.getDouble(i)) * (py - yi) / (yj - yi) + xs.getDouble(i)
        if (px < xInt) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Multi-ring even-odd membership: XOR of the per-ring crossing parities.
    * One call covers both GeoJSON shapes the single-ring test cannot
    * (reference accepts them, src/types.ts:33-40): Polygon WITH HOLES
    * (outer shell ⊕ hole rings — a point inside a hole is outside) and
    * MultiPolygon (disjoint shells — inside any one shell is inside). Rings
    * arrive as parallel arrays-of-arrays; each ring's edges wrap within the
    * ring exactly as [[contains]] does, so single-ring results are
    * bit-identical to the flat test.
    */
  def containsMulti(px: Double, py: Double,
                    xss: Array[Array[Double]], yss: Array[Array[Double]]): Boolean = {
    var inside = false
    var r = 0
    while (r < xss.length) {
      if (contains(px, py, xss(r), yss(r))) inside = !inside
      r += 1
    }
    inside
  }

  /** Zero-copy multi-ring variant over nested Catalyst ArrayData. */
  def containsMulti(px: Double, py: Double, xss: ArrayData, yss: ArrayData): Boolean = {
    var inside = false
    val nr = xss.numElements()
    var r = 0
    while (r < nr) {
      if (contains(px, py, xss.getArray(r), yss.getArray(r))) inside = !inside
      r += 1
    }
    inside
  }
}
