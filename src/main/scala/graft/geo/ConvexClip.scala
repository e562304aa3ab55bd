package graft.geo

/** Sutherland–Hodgman convex clipping — the intersection-AREA kernel behind
  * [[graft.ops.SpatialJoin.polygonJoinWithArea]]: overlap area is the
  * weighting a raster↔vector pipeline needs when a feature spans zones
  * (area-weighted zonal aggregation), one step past [[RayCast]]'s boolean
  * membership and `polygonJoin`'s boolean pair test.
  *
  * `clip` requires the CLIP ring to be convex and CCW (the subject ring may
  * be any simple polygon); clipping a convex subject by a convex clip is
  * exact. Degenerate results (< 3 vertices) mean empty intersection.
  */
object ConvexClip {

  /** Signed double-area of the triangle (a, b, c): > 0 iff c left of a→b. */
  @inline private def orient(ax: Double, ay: Double, bx: Double, by: Double,
                             cx: Double, cy: Double): Double =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  /** Intersection of segment (px,py)→(qx,qy) with the infinite line a→b. */
  @inline private def lineHit(px: Double, py: Double, qx: Double, qy: Double,
                              ax: Double, ay: Double, bx: Double, by: Double): (Double, Double) = {
    val t = orient(ax, ay, bx, by, px, py) /
      (orient(ax, ay, bx, by, px, py) - orient(ax, ay, bx, by, qx, qy))
    (px + t * (qx - px), py + t * (qy - py))
  }

  /** Clip the subject ring by every edge of the convex CCW clip ring.
    * Returns packed (xs, ys) of the clipped ring — possibly empty.
    */
  def clip(sx: Array[Double], sy: Array[Double],
           cx: Array[Double], cy: Array[Double]): (Array[Double], Array[Double]) = {
    var outX = sx
    var outY = sy
    var i = 0
    while (i < cx.length && outX.length > 0) {
      val ax = cx(i); val ay = cy(i)
      val bx = cx((i + 1) % cx.length); val by = cy((i + 1) % cy.length)
      val inX = outX; val inY = outY
      val nx = Array.newBuilder[Double]; val ny = Array.newBuilder[Double]
      var j = 0
      while (j < inX.length) {
        val px = inX(j); val py = inY(j)
        val k = (j + 1) % inX.length
        val qx = inX(k); val qy = inY(k)
        val pIn = orient(ax, ay, bx, by, px, py) >= 0
        val qIn = orient(ax, ay, bx, by, qx, qy) >= 0
        if (qIn) {
          if (!pIn) {
            val (hx, hy) = lineHit(px, py, qx, qy, ax, ay, bx, by)
            nx += hx; ny += hy
          }
          nx += qx; ny += qy
        } else if (pIn) {
          val (hx, hy) = lineHit(px, py, qx, qy, ax, ay, bx, by)
          nx += hx; ny += hy
        }
        j += 1
      }
      outX = nx.result(); outY = ny.result()
      i += 1
    }
    if (outX.length < 3) (Array.emptyDoubleArray, Array.emptyDoubleArray)
    else (outX, outY)
  }

  /** |shoelace| / 2 of a packed ring; 0 for degenerate rings. */
  def area(xs: Array[Double], ys: Array[Double]): Double = {
    if (xs.length < 3) return 0.0
    var s = 0.0
    var i = 0
    while (i < xs.length) {
      val j = (i + 1) % xs.length
      s += xs(i) * ys(j) - xs(j) * ys(i)
      i += 1
    }
    math.abs(s) / 2.0
  }

  /** Intersection area of a simple subject ring with a convex CCW clip ring. */
  def intersectionArea(sx: Array[Double], sy: Array[Double],
                       cx: Array[Double], cy: Array[Double]): Double = {
    val (ox, oy) = clip(sx, sy, cx, cy)
    area(ox, oy)
  }

  /** Signed shoelace double-area (> 0 for CCW rings). */
  def signedArea2(xs: Array[Double], ys: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < xs.length) {
      val j = (i + 1) % xs.length
      s += xs(i) * ys(j) - xs(j) * ys(i)
      i += 1
    }
    s
  }

  /** Every corner turns left-or-straight (assumes CCW orientation). */
  def isConvexCcw(xs: Array[Double], ys: Array[Double]): Boolean = {
    val n = xs.length
    var i = 0
    while (i < n) {
      val j = (i + 1) % n; val k = (i + 2) % n
      if ((xs(j) - xs(i)) * (ys(k) - ys(i)) - (ys(j) - ys(i)) * (xs(k) - xs(i)) < 0)
        return false
      i += 1
    }
    true
  }

  /** Intersection area for an ARBITRARY simple clip ring (either winding):
    * normalize to CCW; convex rings take the direct Sutherland–Hodgman
    * path, concave rings triangulate ([[EarClip]]) and sum per-triangle
    * intersection areas (exact — triangles partition the clip interior).
    * The subject may be any simple ring in both paths (S–H on a concave
    * subject can emit zero-width bridge edges, which cancel in the
    * shoelace area).
    */
  def intersectionAreaGeneral(sx: Array[Double], sy: Array[Double],
                              cx: Array[Double], cy: Array[Double]): Double = {
    if (cx.length < 3) return 0.0
    val (ccx, ccy) =
      if (signedArea2(cx, cy) < 0) (cx.reverse, cy.reverse) else (cx, cy)
    if (isConvexCcw(ccx, ccy)) intersectionArea(sx, sy, ccx, ccy)
    else EarClip.triangulate(ccx, ccy).map { case (a, b, c) =>
      intersectionArea(sx, sy,
        Array(ccx(a), ccx(b), ccx(c)), Array(ccy(a), ccy(b), ccy(c)))
    }.sum
  }
}
