package graft.geo

/** In-repo hierarchical hexagonal index with the H3 API surface
  * (`latLngToCell`, `gridDisk`/`kRing`, `cellToParent`, res 0–15).
  *
  * NOT bit-compatible with uber/h3 — a FINAL scope decision, not a stopgap
  * (SURVEY.md §8 "Hex-index scope decision"): h3's base-cell +
  * icosahedral-face tables are not reproducible or verifiable offline
  * (zero-egress environment, no h3 jar, no golden vectors). This is
  * an aperture-7 hexagonal lattice (cell area shrinks 7× per resolution, like
  * H3) on the equirectangular lng/lat plane, which preserves every property
  * the engine's joins rely on: hexagonal neighbor topology (6 edge
  * neighbors), ring expansion for kNN, ~7 children per parent, uniform cell
  * ids usable as join/partition keys. Documented trade-off: cells distort
  * toward the poles (H3's icosahedral projection distorts less); the engine's
  * exact refinement predicates (ray cast, true distance) make the index a
  * pure candidate-pruning structure, so distortion affects only pruning
  * efficiency, never correctness.
  *
  * Cell id layout (63 bits, sign bit 0): res(4) | q+OFF (29) | r+OFF (29),
  * axial "pointy-top" coordinates.
  */
object Hex {

  val MaxRes = 15

  /** Res-0 hex edge length in degrees (~H3 res0 scale: ~10° ≈ 1100 km). */
  val BaseEdge = 10.0

  private val Sqrt7 = math.sqrt(7.0)
  private val Sqrt3 = math.sqrt(3.0)

  /** Hex edge length at `res` (aperture 7: area ÷7 ⇒ edge ÷√7 per res). */
  def edge(res: Int): Double = BaseEdge / math.pow(Sqrt7, res)

  private val Off = 1 << 28 // offset encoding for signed q/r
  private val Mask = (1L << 29) - 1

  def pack(res: Int, q: Int, r: Int): Long = {
    require(res >= 0 && res <= MaxRes, s"res $res")
    (res.toLong << 58) | ((q.toLong + Off) << 29) | (r.toLong + Off)
  }
  def res(cell: Long): Int = (cell >>> 58).toInt
  def q(cell: Long): Int = (((cell >>> 29) & Mask) - Off).toInt
  def r(cell: Long): Int = ((cell & Mask) - Off).toInt

  /** Axial rounding (cube-coordinate rounding, published hex-grid algorithm).
    * floor(x+0.5), not math.round: JDK Math.round special-cases
    * 0.49999999999999994 (returns 0 where floor(x+0.5) gives 1) and the
    * DuckDB oracle replicates floor(x+0.5) — same parity convention as
    * Bilinear's nearest-node snap.
    */
  private def axialRound(qf: Double, rf: Double): (Int, Int) = {
    val sf = -qf - rf
    var qi = math.floor(qf + 0.5).toInt
    var ri = math.floor(rf + 0.5).toInt
    val si = math.floor(sf + 0.5).toInt
    val dq = math.abs(qi - qf); val dr = math.abs(ri - rf); val ds = math.abs(si - sf)
    if (dq > dr && dq > ds) qi = -ri - si
    else if (dr > ds) ri = -qi - si
    (qi, ri)
  }

  /** (lng, lat) degrees -> cell at `res`. Pointy-top axial mapping:
    * x = lng, y = lat; q = (√3/3·x − 1/3·y)/e, r = (2/3·y)/e.
    */
  def latLngToCell(lng: Double, lat: Double, resolution: Int): Long = {
    val e = edge(resolution)
    val qf = (Sqrt3 / 3.0 * lng - lat / 3.0) / e
    val rf = (2.0 / 3.0 * lat) / e
    val (qi, ri) = axialRound(qf, rf)
    pack(resolution, qi, ri)
  }

  /** Cell center in (lng, lat) degrees. */
  def cellCenter(cell: Long): (Double, Double) = {
    val e = edge(res(cell))
    val qi = q(cell); val ri = r(cell)
    val x = e * (Sqrt3 * qi + Sqrt3 / 2.0 * ri)
    val y = e * (1.5 * ri)
    (x, y)
  }

  /** Parent at a coarser resolution: the coarse cell containing this cell's
    * center (same approximate-containment semantics as H3 parent/child).
    */
  def cellToParent(cell: Long, parentRes: Int): Long = {
    require(parentRes <= res(cell), "parentRes must be <= cell res")
    val (x, y) = cellCenter(cell)
    latLngToCell(x, y, parentRes)
  }

  /** Children at a finer resolution (≈7^(dr) cells). Direct children are the
    * res+1 cells whose center-containment parent is `cell`; deeper levels
    * recurse level-by-level, so the hierarchy is strictly NESTED (res+2
    * descendants = children of children). A direct center-containment test
    * at a 2+-level jump would disagree with two-step parentage on boundary
    * cells (the lattice is only approximately aligned across resolutions),
    * which would break [[compact]]/[[uncompact]] being exact inverses.
    */
  def cellToChildren(cell: Long, childRes: Int): Seq[Long] = {
    require(childRes >= res(cell), "childRes must be >= cell res")
    if (childRes == res(cell)) return Seq(cell)
    val (cx, cy) = cellCenter(cell)
    val nextRes = res(cell) + 1
    val reach = edge(res(cell)) * 1.3
    val k = math.ceil(reach / (edge(nextRes) * Sqrt3)).toInt + 1
    val direct = gridDisk(latLngToCell(cx, cy, nextRes), k)
      .filter(c => cellToParent(c, res(cell)) == cell)
    if (childRes == nextRes) direct
    else direct.flatMap(cellToChildren(_, childRes))
  }

  private val Dirs = Array((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))

  /** The 6 edge neighbors. */
  def neighbors(cell: Long): Seq[Long] = {
    val rr = res(cell); val qi = q(cell); val ri = r(cell)
    Dirs.map { case (dq, dr) => pack(rr, qi + dq, ri + dr) }.toSeq
  }

  /** Hex ring at exact hex-distance `k` (published axial ring walk). */
  def gridRing(cell: Long, k: Int): Seq[Long] = {
    require(k >= 1, "ring k >= 1")
    val rr = res(cell)
    var cq = q(cell) + Dirs(4)._1 * k
    var cr = r(cell) + Dirs(4)._2 * k
    val out = Seq.newBuilder[Long]
    var side = 0
    while (side < 6) {
      var step = 0
      while (step < k) {
        out += pack(rr, cq, cr)
        cq += Dirs(side)._1; cr += Dirs(side)._2
        step += 1
      }
      side += 1
    }
    out.result()
  }

  /** All cells within hex-distance `k` (H3 gridDisk / kRing). */
  def gridDisk(cell: Long, k: Int): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    out += cell
    var ring = 1
    while (ring <= k) { out ++= gridRing(cell, ring); ring += 1 }
    out.result()
  }

  /** Hex (axial cube) distance between two same-res cells. */
  def gridDistance(a: Long, b: Long): Int = {
    require(res(a) == res(b), "same res required")
    val dq = q(a) - q(b); val dr = r(a) - r(b)
    (math.abs(dq) + math.abs(dr) + math.abs(dq + dr)) / 2
  }

  /** Lower bound on the planar degree distance between any point in a cell
    * and any point in a cell at hex grid-distance `k`: center-lattice minimum
    * is 1.5·e per unit grid distance (alternating-direction path), minus one
    * circumradius `e` on each end. Used for kNN distance-bounded pruning
    * (J3): once the running kth-NN distance is below this bound for ring k+1,
    * expansion stops.
    */
  def ringLowerBoundDegrees(resolution: Int, k: Int): Double = {
    val e = edge(resolution)
    math.max(0.0, 1.5 * e * k - 2.0 * e)
  }

  /** H3-style `compact`: replace every complete sibling set (all ≈7 children
    * of one parent present) with the parent, recursively to res 0. Input may
    * mix resolutions; cells are grouped per-res finest-first so a completed
    * parent can itself complete its own sibling set. The center-containment
    * parent/child relation partitions each res level exactly (every child has
    * one parent, [[cellToChildren]] enumerates all of a parent's children),
    * so [[uncompact]] of the result at the original resolution reproduces a
    * uniform-res input set exactly.
    */
  def compact(cells: Seq[Long]): Seq[Long] = {
    if (cells.isEmpty) return Seq.empty
    var cur = cells.toSet
    var level = cells.iterator.map(res).max
    while (level > 0) {
      val atLevel = cur.filter(c => res(c) == level)
      atLevel.groupBy(c => cellToParent(c, level - 1)).foreach { case (p, kids) =>
        if (kids == cellToChildren(p, level).toSet) {
          cur --= kids
          cur += p
        }
      }
      level -= 1
    }
    cur.toSeq.sorted
  }

  /** H3-style `uncompact`: expand every cell to its res-`resolution`
    * descendants (cells at or finer than `resolution` pass through require).
    */
  def uncompact(cells: Seq[Long], resolution: Int): Seq[Long] =
    cells.flatMap(c => cellToChildren(c, resolution)).distinct.sorted

  /** Cover a lng/lat bbox with res-`resolution` cells (superset cover:
    * centers sampled at half min pitch + ring-1 union; refinement predicates
    * downstream make over-cover harmless).
    */
  def coverBBox(lngMin: Double, latMin: Double, lngMax: Double, latMax: Double,
                resolution: Int): Seq[Long] = {
    val step = math.max(edge(resolution) * Sqrt3 / 2.0, 1e-9)
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    var lat = latMin
    while (lat <= latMax + step) {
      var lng = lngMin
      while (lng <= lngMax + step) {
        val c = latLngToCell(math.min(lng, lngMax), math.min(lat, latMax), resolution)
        out += c
        out ++= neighbors(c)
        lng += step
      }
      lat += step
    }
    out.toSeq
  }
}
