package graft.geo

/** Douglas–Peucker polyline simplification (trajectory op for the
  * reference's polyline domain — encoded polylines are its second query
  * input, src/server.ts:52-72).
  *
  * Engine-independence by construction: the split test avoids sqrt and
  * division entirely — a point splits its chord when `cross² > ε²·len²`
  * (cross = 2·triangle area, len² = squared chord length), which equals the
  * classic perpendicular-distance test `dist > ε` but uses only IEEE
  * mul/add/compare, so a SQL oracle reproduces every branch bit-for-bit.
  * Degenerate chord (identical endpoints, len² = 0): squared point distance
  * vs ε². Argmax ties break to the SMALLEST index (strict `>` in the scan);
  * the oracle's `ORDER BY m DESC, seq` rank mirrors it.
  */
object Simplify {

  /** Keep mask + split-recursion depth (depth sizes the oracle's unrolled
    * CTE levels; the result is depth-independent).
    */
  def douglasPeuckerWithDepth(xs: Array[Double], ys: Array[Double],
                              eps: Double): (Array[Boolean], Int) = {
    require(xs.length == ys.length, "packed arrays must align")
    val n = xs.length
    val keep = new Array[Boolean](n)
    if (n == 0) return (keep, 0)
    keep(0) = true
    keep(n - 1) = true
    val eps2 = eps * eps
    var maxDepth = 0
    var stack = List((0, n - 1, 1))
    while (stack.nonEmpty) {
      val (lo, hi, depth) = stack.head
      stack = stack.tail
      if (hi - lo >= 2) {
        if (depth > maxDepth) maxDepth = depth
        val ax = xs(lo); val ay = ys(lo)
        val bx = xs(hi); val by = ys(hi)
        val dx = bx - ax; val dy = by - ay
        val len2 = dx * dx + dy * dy
        var best = -1
        var bestM = Double.NegativeInfinity
        var i = lo + 1
        while (i < hi) {
          val m =
            if (len2 == 0.0) (xs(i) - ax) * (xs(i) - ax) + (ys(i) - ay) * (ys(i) - ay)
            else {
              val c = dx * (ys(i) - ay) - dy * (xs(i) - ax)
              c * c
            }
          if (m > bestM) { bestM = m; best = i } // strict >: smallest index wins ties
          i += 1
        }
        val t = if (len2 == 0.0) eps2 else eps2 * len2
        if (bestM > t) {
          keep(best) = true
          stack = (lo, best, depth + 1) :: (best, hi, depth + 1) :: stack
        }
      }
    }
    (keep, maxDepth)
  }

  def douglasPeucker(xs: Array[Double], ys: Array[Double], eps: Double): Array[Boolean] =
    douglasPeuckerWithDepth(xs, ys, eps)._1
}
