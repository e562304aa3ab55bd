package graft

import graft.ops.TileIndex
import graft.raster.Bilinear
import graft.synth.TileGen
import org.scalatest.funsuite.AnyFunSuite

/** Unit properties of the nearest-node map-algebra ops (D8 flow direction,
  * terrain ruggedness index, aspect octant) against INDEPENDENT brute-force
  * re-implementations: flowdir via floating-point slope = drop/dist with
  * dist ∈ {1, √2} (the op itself compares integer-scaled squares), aspect via
  * atan2 sector ranges (the op uses sign/|·| comparisons). No Spark needed —
  * the ops are pure probes on a [[TileIndex]].
  */
class TerrainOpsSpec extends AnyFunSuite {

  private val corners = Seq((-119, 36), (-120, 36), (-119, 37), (-120, 37))
  private val size = 601
  private val idx = new TileIndex(TileGen.tiles(corners, size, "hgt").toArray)

  private def grid(swLng: Int, swLat: Int) = TileGen.grid(swLng, swLat, size)

  private def v(g: Array[Short], r: Int, c: Int): Int = g(r * size + c)

  /** Brute-force D8: max positive slope drop/dist with real division + sqrt. */
  private def bruteFlowdir(g: Array[Short], rn: Int, cn: Int): Int = {
    val dcs = Array(1, 1, 0, -1, -1, -1, 0, 1)
    val drs = Array(0, 1, 1, 1, 0, -1, -1, -1)
    val vc = v(g, rn, cn)
    var best = 0.0
    var code = 0
    for (i <- 0 until 8) {
      val cc = math.min(size - 1, math.max(0, cn + dcs(i)))
      val rc = math.min(size - 1, math.max(0, rn + drs(i)))
      val drop = vc - v(g, rc, cc)
      if (drop > 0) {
        val dist = if (dcs(i) != 0 && drs(i) != 0) math.sqrt(2.0) else 1.0
        val slope = drop / dist
        if (slope > best) { best = slope; code = 1 << i }
      }
    }
    code
  }

  private def bruteTri(g: Array[Short], rn: Int, cn: Int): Long = {
    val dcs = Array(1, 1, 0, -1, -1, -1, 0, 1)
    val drs = Array(0, 1, 1, 1, 0, -1, -1, -1)
    val vc = v(g, rn, cn)
    (0 until 8).map { i =>
      val cc = math.min(size - 1, math.max(0, cn + dcs(i)))
      val rc = math.min(size - 1, math.max(0, rn + drs(i)))
      math.abs(v(g, rc, cc) - vc).toLong
    }.sum
  }

  /** Brute-force aspect: atan2 sector of the downslope vector with north
    * positive (−gy), exact diagonals detected by |gx| == |gy|.
    */
  private def bruteAspect(g: Array[Short], rn: Int, cn: Int): Int = {
    val c0 = math.max(0, cn - 1); val c1 = math.min(size - 1, cn + 1)
    val r0 = math.max(0, rn - 1); val r1 = math.min(size - 1, rn + 1)
    val gx = -((v(g, rn, c1) - v(g, rn, c0)).toDouble / (c1 - c0))
    val gy = -((v(g, r1, cn) - v(g, r0, cn)).toDouble / (r1 - r0))
    if (gx == 0.0 && gy == 0.0) 0
    else if (math.abs(gx) == math.abs(gy)) {
      if (gx > 0) { if (gy > 0) 8 else 2 } else { if (gy > 0) 6 else 4 }
    } else {
      val a = math.atan2(-gy, gx) // north-positive angle, E = 0
      if (math.abs(a) < math.Pi / 4) 1
      else if (a > math.Pi / 4 && a < 3 * math.Pi / 4) 3
      else if (a < -math.Pi / 4 && a > -3 * math.Pi / 4) 7
      else 5
    }
  }

  /** Probe coordinate whose NEAREST node is (rn, cn) of tile (−119, 36),
    * offset 0.3 cells inward so far-edge nodes (600) stay inside this tile
    * (the exact node coordinate of col/row 600 lies on the neighbouring
    * tile's boundary and would probe that tile instead).
    */
  private def at(rn: Int, cn: Int): (Double, Double) =
    (-119.0 + math.max(0.0, cn - 0.3) / 600.0,
      36.0 + math.max(0.0, rn - 0.3) / 600.0)

  // A node sweep covering interior, all 4 edges and all 4 corners.
  private val nodes = (for {
    rn <- Seq(0, 1, 7, 8, 150, 299, 300, 599, 600)
    cn <- Seq(0, 1, 7, 8, 150, 299, 300, 599, 600)
  } yield (rn, cn)) ++ (0 until 200).map(i => ((i * 37) % 601, (i * 91) % 601))

  test("flowdirD8 equals float brute force on interior, edge and corner nodes") {
    val g = grid(-119, 36)
    nodes.foreach { case (rn, cn) =>
      val (lng, lat) = at(rn, cn)
      val (rr, cc) = Bilinear.nearestNode(size, -119.0, 36.0, lng, lat)
      assert((rr, cc) == (rn, cn), s"node mapping ($rn,$cn)")
      assert(idx.flowdirD8(lng, lat) == bruteFlowdir(g, rn, cn).toDouble, s"($rn,$cn)")
    }
  }

  test("tri equals direct neighbour sum; zero only where locally flat") {
    val g = grid(-119, 36)
    nodes.foreach { case (rn, cn) =>
      val (lng, lat) = at(rn, cn)
      assert(idx.tri(lng, lat) == bruteTri(g, rn, cn).toDouble, s"($rn,$cn)")
    }
    // The synthetic field rises E and S: an interior node is never flat.
    assert(idx.tri(at(300, 300)._1, at(300, 300)._2) > 0)
  }

  test("laplacian equals 4-neighbour second difference; signs match terrain shape") {
    val g = grid(-119, 36)
    def brute(rn: Int, cn: Int): Long = {
      val c0 = math.max(0, cn - 1); val c1 = math.min(size - 1, cn + 1)
      val r0 = math.max(0, rn - 1); val r1 = math.min(size - 1, rn + 1)
      v(g, rn, c0).toLong + v(g, rn, c1) + v(g, r0, cn) + v(g, r1, cn) -
        4L * v(g, rn, cn)
    }
    nodes.foreach { case (rn, cn) =>
      val (lng, lat) = at(rn, cn)
      assert(idx.laplacian(lng, lat) == brute(rn, cn).toDouble, s"($rn,$cn)")
    }
    // analytic check: on a plane v = a + 2c + 3r (away from the %32 bump
    // boundaries), N+S+E+W - 4*centre is exactly 0
    assert(brute(3, 3) == 0L)
    // missing tile ⇒ 0 (F8)
    assert(idx.laplacian(-10.5, 10.5) == 0.0)
  }

  test("aspectOctant equals atan2 sectors; synthetic field slopes down to N") {
    val g = grid(-119, 36)
    nodes.foreach { case (rn, cn) =>
      val (lng, lat) = at(rn, cn)
      assert(idx.aspectOctant(lng, lat) == bruteAspect(g, rn, cn).toDouble, s"($rn,$cn)")
    }
    // Gradient of A + 2c + 3r is (2, 3): downslope (−2, −3) → |gy|>|gx|,
    // gy<0 ⇒ N in HGT rows... gy = −3 ⇒ toward smaller r = north ⇒ code 3.
    assert(idx.aspectOctant(at(150, 150)._1, at(150, 150)._2) == 3.0)
  }

  test("missing tile ⇒ 0 for all three ops (F8 no-data)") {
    assert(idx.flowdirD8(-117.5, 36.5) == 0.0)
    assert(idx.tri(-117.5, 36.5) == 0.0)
    assert(idx.aspectOctant(-117.5, 36.5) == 0.0)
  }

  test("flowdir prefers the steeper straight drop over a shallower diagonal") {
    // Constructed grid: centre 100, W neighbour 90 (drop 10, straight),
    // NW neighbour 87 (drop 13, diagonal): slopes 10 vs 13/√2 ≈ 9.19 ⇒ W.
    val g = new Array[Short](9)
    val vals = Array[Short](87, 95, 95, 90, 100, 95, 95, 95, 95)
    Array.copy(vals, 0, g, 0, 9)
    val row = TileGen.tileRow(-119, 36, 3, "hgt", (_, _, r, c) => g(r * 3 + c))
    val ti = new TileIndex(Array(row))
    // size 3 ⇒ nodes at 0, 0.5, 1 degree fractions; centre node (1,1).
    assert(ti.flowdirD8(-119.0 + 0.5, 36.0 + 0.5) == 16.0) // W
  }
}
