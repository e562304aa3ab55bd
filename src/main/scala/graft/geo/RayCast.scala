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
}
