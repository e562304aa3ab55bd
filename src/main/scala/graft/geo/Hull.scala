package graft.geo

/** Convex hull of integer-coordinate point sets — Andrew's monotone chain
  * (public algorithm; Andrew 1979). Integer coordinates keep every turn
  * test an exact Long cross product (|coord| < 2³⁰ ⇒ no overflow), so the
  * minimal hull vertex set is engine-independent and the DuckDB oracle can
  * replicate it via the Carathéodory characterization (a deduped point is a
  * hull vertex iff it is neither strictly inside a triangle of other points
  * nor strictly between two other points on a segment).
  */
object Hull {

  /** Minimal convex-hull vertex set of (xs, ys): strictly-convex turns only
    * (collinear boundary points are NOT vertices), duplicates ignored.
    * Returns vertex indices in counter-clockwise order starting from the
    * lexicographically smallest point. Degenerate inputs: one distinct
    * point → that point; all collinear → the two extreme endpoints.
    */
  def convexHull(xs: Array[Long], ys: Array[Long]): Array[Int] = {
    require(xs.length == ys.length, "coordinate arrays differ in length")
    val n = xs.length
    if (n == 0) return Array.empty
    val sorted = Array.range(0, n)
      .sortWith((a, b) => xs(a) < xs(b) || (xs(a) == xs(b) && ys(a) < ys(b)))
    // dedupe equal points (keep first of each run)
    val ded = new scala.collection.mutable.ArrayBuffer[Int](n)
    var i = 0
    while (i < n) {
      if (ded.isEmpty || xs(ded.last) != xs(sorted(i)) || ys(ded.last) != ys(sorted(i)))
        ded += sorted(i)
      i += 1
    }
    val m = ded.length
    if (m == 1) return Array(ded(0))
    def cross(o: Int, a: Int, b: Int): Long =
      (xs(a) - xs(o)) * (ys(b) - ys(o)) - (ys(a) - ys(o)) * (xs(b) - xs(o))
    val h = new Array[Int](2 * m)
    var k = 0
    // lower hull: pop while the turn is not strictly counter-clockwise
    i = 0
    while (i < m) {
      while (k >= 2 && cross(h(k - 2), h(k - 1), ded(i)) <= 0) k -= 1
      h(k) = ded(i); k += 1
      i += 1
    }
    // upper hull
    val lower = k + 1
    i = m - 2
    while (i >= 0) {
      while (k >= lower && cross(h(k - 2), h(k - 1), ded(i)) <= 0) k -= 1
      h(k) = ded(i); k += 1
      i -= 1
    }
    h.take(k - 1) // last point == first point
  }
}
