package graft.geo

/** Ear-clipping triangulation (public textbook algorithm, O(n²)) — lifts
  * [[ConvexClip]]'s convex-clip-ring restriction: a CONCAVE clip ring
  * triangulates into convex pieces (triangles), the subject clips against
  * each, and the per-triangle intersection areas sum exactly (triangles
  * partition the ring's interior; shared edges have measure zero).
  */
object EarClip {

  @inline private def orientIdx(xs: Array[Double], ys: Array[Double],
                                a: Int, b: Int, c: Int): Double =
    (xs(b) - xs(a)) * (ys(c) - ys(a)) - (ys(b) - ys(a)) * (xs(c) - xs(a))

  /** Triangulate a simple CCW ring; returns vertex-index triples (CCW).
    * Zero-area (collinear) corners are snipped without emitting. Throws on
    * input where no ear exists (self-intersecting ring).
    */
  def triangulate(xs: Array[Double], ys: Array[Double]): Array[(Int, Int, Int)] = {
    val n = xs.length
    require(n >= 3, s"ring needs >= 3 vertices, got $n")
    val idx = scala.collection.mutable.ArrayBuffer.range(0, n)
    val out = Array.newBuilder[(Int, Int, Int)]
    def strictlyInside(a: Int, b: Int, c: Int, p: Int): Boolean =
      orientIdx(xs, ys, a, b, p) > 0 && orientIdx(xs, ys, b, c, p) > 0 &&
        orientIdx(xs, ys, c, a, p) > 0
    while (idx.length > 3) {
      val m = idx.length
      var i = 0
      var clipped = false
      while (i < m && !clipped) {
        val a = idx((i + m - 1) % m); val b = idx(i); val c = idx((i + 1) % m)
        val o = orientIdx(xs, ys, a, b, c)
        if (o == 0.0) { // degenerate corner: snip, no triangle
          idx.remove(i); clipped = true
        } else if (o > 0) { // convex corner: an ear iff no vertex inside
          var ok = true
          var j = 0
          while (j < m && ok) {
            val p = idx(j)
            if (p != a && p != b && p != c && strictlyInside(a, b, c, p)) ok = false
            j += 1
          }
          if (ok) { out += ((a, b, c)); idx.remove(i); clipped = true }
        }
        i += 1
      }
      require(clipped, "no ear found — ring is not a simple polygon")
    }
    if (orientIdx(xs, ys, idx(0), idx(1), idx(2)) != 0.0)
      out += ((idx(0), idx(1), idx(2)))
    out.result()
  }
}
