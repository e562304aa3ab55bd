package graft

import graft.geo.{Geohash, Hex, Morton, S2}
import org.scalatest.funsuite.AnyFunSuite

/** S2 (bit-faithful, hand-derived golden vectors + properties) and the
  * aperture-7 hex index (topology properties).
  */
class CellIndexSpec extends AnyFunSuite {

  /** Deterministic sampled "property" runner (no scalacheck bridge in the
    * offline cache): 200 seeded samples per property.
    */
  private def samples(seed: Int)(f: (Double, Double, Int) => Unit): Unit = {
    val rnd = new scala.util.Random(seed)
    for (_ <- 1 to 200) {
      val lng = -179.9 + rnd.nextDouble() * 359.8
      val lat = -84.9 + rnd.nextDouble() * 169.8
      val l = 4 + rnd.nextInt(19)
      f(lng, lat, l)
    }
  }

  // ---------- S2 golden vectors (hand-derivable from the published layout) ----------

  test("S2 leaf at (0,0) is 0x1000000000000001") {
    assert(S2.latLngToCell(0.0, 0.0, 30) == 0x1000000000000001L)
    assert(S2.token(0x1000000000000001L) == "1000000000000001")
  }

  test("S2 face cells: id = (2*face+1) << 60") {
    // face centers: +x,+y,+z,-x,-y,-z
    val centers = Seq((0.0, 0.0, 0), (90.0, 0.0, 1), (0.0, 90.0, 2),
      (180.0, 0.0, 3), (-90.0, 0.0, 4), (0.0, -90.0, 5))
    for ((lng, lat, f) <- centers) {
      val id = S2.latLngToCell(lng, lat, 0)
      assert(id == ((2L * f + 1L) << 60), s"face $f at ($lng,$lat)")
      assert(S2.level(id) == 0)
    }
  }

  test("S2 level and parent/contains") {
    val leaf = S2.latLngToCell(-118.29213, 36.57859, 30)
    assert(S2.level(leaf) == 30)
    var prev = leaf
    for (l <- 29 to 0 by -1) {
      val p = S2.parent(leaf, l)
      assert(S2.level(p) == l)
      assert(S2.contains(p, prev))
      assert(S2.contains(p, leaf))
      prev = p
    }
  }

  test("S2 center re-encodes to the same cell (round trip)") {
    samples(1) { (lng, lat, l) =>
      val c = S2.latLngToCell(lng, lat, l)
      val (clng, clat) = S2.centerLatLng(c)
      assert(S2.latLngToCell(clng, clat, l) == c)
    }
  }

  test("S2 token round trip") {
    samples(1) { (lng, lat, l) =>
      val c = S2.latLngToCell(lng, lat, l)
      assert(S2.fromToken(S2.token(c)) == c)
    }
  }

  test("S2 cell contains the point used to create it (containment by range)") {
    samples(1) { (lng, lat, l) =>
      val c = S2.latLngToCell(lng, lat, l)
      val leaf = S2.latLngToCell(lng, lat, 30)
      assert(S2.contains(c, leaf))
    }
  }

  test("S2 neighbors: 8 distinct same-level cells, symmetric (interior)") {
    // interior of face 0 (Gulf of Guinea region) — no face-boundary wrap
    samples(2) { (lng0, lat0, l0) =>
      val lng = lng0 / 6.0; val lat = lat0 / 3.0; val l = 8 + (l0 % 9)
      val c = S2.latLngToCell(lng, lat, l)
      val ns = S2.neighbors(c)
      assert(ns.size == 8)
      assert(ns.forall(n => S2.level(n) == l))
      assert(ns.distinct.size == 8)
      assert(ns.forall(n => S2.neighbors(n).contains(c)))
    }
  }

  test("S2 gridDisk sizes (interior): (2k+1)^2") {
    val c = S2.latLngToCell(8.0, 8.0, 12)
    for (k <- 1 to 3)
      assert(S2.gridDisk(c, k).size == (2 * k + 1) * (2 * k + 1))
  }

  test("S2 rings k>=2 across a face boundary are complete (BFS fallback)") {
    val c = S2.latLngToCell(44.9999, 10.0, 10)
    val d1 = S2.gridDisk(c, 1).toSet
    val r2 = S2.gridRing(c, 2)
    assert(r2.toSet.intersect(d1).isEmpty, "ring 2 must not contain disk-1 cells")
    assert(r2.distinct.size == r2.size)
    // a full ring 2 has ~16 cells; the old clamp collapsed most of them
    assert(r2.size >= 14, s"ring 2 too small near the face edge: ${r2.size}")
    assert(r2.exists(n => (n >>> 61) == 1L), "must include face-1 cells")
    // interior equivalence: BFS and direct enumeration agree away from edges
    val ci = S2.latLngToCell(8.0, 8.0, 12)
    for (k <- 1 to 3)
      assert(S2.gridRing(ci, k).toSet.size == 8 * k)
  }

  test("S2 cross-face neighbors exist and are valid") {
    // cell right at the face-0/face-1 boundary (lng=45)
    val c = S2.latLngToCell(44.9999, 10.0, 10)
    val ns = S2.neighbors(c)
    assert(ns.nonEmpty && ns.forall(n => S2.level(n) == 10))
    // some neighbor must land on face 1
    assert(ns.exists(n => (n >>> 61) == 1L))
  }

  test("S2 coverBBox is a superset cover") {
    val (lngMin, latMin, lngMax, latMax) = (-119.6, 36.5, -118.2, 37.9)
    for (l <- Seq(8, 10, 12)) {
      val cover = S2.coverBBox(lngMin, latMin, lngMax, latMax, l).toSet
      val rnd = new scala.util.Random(7)
      for (_ <- 1 to 500) {
        val lng = lngMin + rnd.nextDouble() * (lngMax - lngMin)
        val lat = latMin + rnd.nextDouble() * (latMax - latMin)
        assert(cover.contains(S2.latLngToCell(lng, lat, l)))
      }
    }
  }

  // ---------- Hex (aperture-7) ----------

  test("Hex center round trip") {
    samples(3) { (lng, lat, l) =>
      val res = l % 13
      val c = Hex.latLngToCell(lng, lat, res)
      val (cx, cy) = Hex.cellCenter(c)
      assert(Hex.latLngToCell(cx, cy, res) == c)
    }
  }

  test("Hex neighbors: 6 distinct, distance 1, symmetric") {
    samples(4) { (lng, lat, l) =>
      val res = 2 + (l % 11)
      val c = Hex.latLngToCell(lng, lat, res)
      val ns = Hex.neighbors(c)
      assert(ns.size == 6 && ns.distinct.size == 6)
      assert(ns.forall(n => Hex.gridDistance(c, n) == 1))
      assert(ns.forall(n => Hex.neighbors(n).contains(c)))
    }
  }

  test("Hex gridDisk size = 1 + 3k(k+1)") {
    val c = Hex.latLngToCell(-118.0, 36.0, 9)
    for (k <- 1 to 4)
      assert(Hex.gridDisk(c, k).size == 1 + 3 * k * (k + 1))
  }

  test("Hex gridRing distance is exactly k") {
    val c = Hex.latLngToCell(5.0, 5.0, 8)
    for (k <- 1 to 4)
      assert(Hex.gridRing(c, k).forall(x => Hex.gridDistance(c, x) == k))
  }

  test("Hex parent contains child center; children round trip") {
    samples(5) { (lng, lat, l) =>
      val res = 1 + (l % 10)
      val c = Hex.latLngToCell(lng, lat, res)
      val p = Hex.cellToParent(c, res - 1)
      val (cx, cy) = Hex.cellCenter(c)
      assert(Hex.latLngToCell(cx, cy, res - 1) == p)
    }
    // children: every child's parent is the cell; ~7 of them on average
    val p = Hex.latLngToCell(-118.3, 36.6, 6)
    val kids = Hex.cellToChildren(p, 7)
    assert(kids.nonEmpty && kids.forall(k => Hex.cellToParent(k, 6) == p))
    assert(kids.size >= 4 && kids.size <= 10)
    // aperture 7: a 7-cell parent disk yields ~49 children
    val disk = Hex.gridDisk(p, 1)
    val total = disk.flatMap(Hex.cellToChildren(_, 7)).distinct.size
    assert(total >= 7 * 6 && total <= 7 * 8, s"total children $total")
  }

  test("Hex ring lower bound is a true lower bound (sampled)") {
    val res = 8
    val c = Hex.latLngToCell(3.0, 3.0, res)
    val (cx, cy) = Hex.cellCenter(c)
    for (k <- 2 to 4) {
      val bound = Hex.ringLowerBoundDegrees(res, k)
      val minDist = Hex.gridRing(c, k).map { n =>
        val (nx, ny) = Hex.cellCenter(n)
        math.hypot(nx - cx, ny - cy) - 2.0 * Hex.edge(res) // worst case inside cells
      }.min
      assert(bound <= minDist + 1e-12, s"k=$k bound=$bound min=$minDist")
    }
  }

  test("Hex compact/uncompact: complete sibling sets collapse, round trip exact") {
    // all children of a parent disk, plus a stray cell elsewhere
    val p = Hex.latLngToCell(-118.3, 36.6, 6)
    val disk = Hex.gridDisk(p, 1)
    val leaves = disk.flatMap(Hex.cellToChildren(_, 8)).distinct
    val stray = Hex.latLngToCell(2.0, 2.0, 8)
    val input = leaves :+ stray
    val compacted = Hex.compact(input)
    // every res-8 descendant set of the disk collapsed to its res-6 ancestor
    assert(disk.forall(compacted.contains), "disk parents present after compact")
    assert(compacted.contains(stray), "incomplete sibling set passes through")
    assert(compacted.size == disk.size + 1, s"got ${compacted.size}")
    // uncompact at the original res reproduces the input set exactly
    assert(Hex.uncompact(compacted, 8).toSet == input.toSet)
    // removing one leaf keeps its whole branch uncompacted
    val holed = Hex.compact(leaves.tail)
    assert(!holed.contains(Hex.cellToParent(leaves.head, 7)))
    assert(Hex.uncompact(holed, 8).toSet == leaves.tail.toSet)
    // idempotent
    assert(Hex.compact(compacted) == compacted)
  }

  test("Morton key: round-trip bits, aligned-block prefix property, locality") {
    import graft.geo.Morton
    // bit round-trip: de-interleaving the key recovers the quantized coords
    val rnd = new scala.util.Random(7)
    def unspread(v: Long): Long = {
      var x = v & 0x55555555L
      x = (x | (x >> 1)) & 0x33333333L
      x = (x | (x >> 2)) & 0x0F0F0F0FL
      x = (x | (x >> 4)) & 0x00FF00FFL
      x = (x | (x >> 8)) & 0x0000FFFFL
      x
    }
    for (_ <- 1 to 500) {
      val lng = -180.0 + rnd.nextDouble() * 360.0
      val lat = -90.0 + rnd.nextDouble() * 180.0
      val k = Morton.key(lng, lat)
      assert(unspread(k) == Morton.qLng(lng))
      assert(unspread(k >> 1) == Morton.qLat(lat))
    }
    // aligned-block prefix property: a 2^k x 2^k cell-aligned block is ONE
    // contiguous key range — the row-group-pruning payoff of sorting by
    // zkey. A row-major key fragments the same block into 2^k runs.
    for (k <- Seq(3, 5); _ <- 1 to 20) {
      val n = 1L << k
      val bx = (rnd.nextInt(65536 >> k).toLong) << k
      val by = (rnd.nextInt(65536 >> k).toLong) << k
      val keys = for (dy <- 0L until n; dx <- 0L until n)
        yield Morton.keyOf(bx + dx, by + dy)
      val sorted = keys.sorted
      assert(sorted.last - sorted.head == n * n - 1, "contiguous range")
      assert(sorted.zip(sorted.tail).forall { case (a, b) => b == a + 1 })
      // row-major comparison: n runs, not 1
      val rowMajor = (for (dy <- 0L until n; dx <- 0L until n)
        yield (by + dy) * 65536L + (bx + dx)).sorted
      val runs = 1 + rowMajor.zip(rowMajor.tail).count { case (a, b) => b != a + 1 }
      assert(runs == n)
    }
  }

  test("Geohash golden vectors (published test points) and prefix parents") {
    // canonical examples from the public geohash literature
    assert(Geohash.encode(10.40744, 57.64911, 11) == "u4pruydqqvj")
    assert(Geohash.encode(-5.603, 42.605, 5) == "ezs42")
    assert(Geohash.encode(-0.1278, 51.5074, 7) == "gcpvj0d")
    // prefix property: shorter hash IS the leading substring
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 200) {
      val lng = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 180 - 90
      val full = Geohash.encode(lng, lat, 12)
      for (k <- 1 to 11)
        assert(Geohash.encode(lng, lat, k) == full.substring(0, k))
    }
    // nearby points share long prefixes; the 60-bit code orders like Morton
    assert(Geohash.encode(10.40744, 57.64911, 6)
      .startsWith(Geohash.encode(10.40745, 57.64912, 4).substring(0, 3)))
  }

  test("Hex coverBBox is a superset cover") {
    val (lngMin, latMin, lngMax, latMax) = (-119.6, 36.5, -118.2, 37.9)
    for (res <- Seq(5, 7, 8)) {
      val cover = Hex.coverBBox(lngMin, latMin, lngMax, latMax, res).toSet
      val rnd = new scala.util.Random(11)
      for (_ <- 1 to 500) {
        val lng = lngMin + rnd.nextDouble() * (lngMax - lngMin)
        val lat = latMin + rnd.nextDouble() * (latMax - latMin)
        assert(cover.contains(Hex.latLngToCell(lng, lat, res)))
      }
    }
  }

  test("Hilbert: bijective round trip over the full order-8 grid; unit-step adjacency") {
    import graft.geo.Hilbert
    // every d in [0, 65536) maps to a unique cell and back
    var d = 0L
    while (d < 65536L) {
      val (x, y) = Hilbert.cellOf(d)
      assert(Hilbert.index(x, y) == d, s"round trip broke at d=$d")
      if (d > 0) {
        // the defining Hilbert property Morton lacks: consecutive indexes
        // are ALWAYS 4-adjacent grid cells
        val (px, py) = Hilbert.cellOf(d - 1)
        assert(math.abs(x - px) + math.abs(y - py) == 1,
          s"non-adjacent step at d=$d: ($px,$py) -> ($x,$y)")
      }
      d += 1
    }
    // quantizer contract matches the Morton association order at 8 bits
    assert(Hilbert.q8Lng(-180.0) == 0 && Hilbert.q8Lng(179.9999) == 255)
    assert(Hilbert.q8Lat(-90.0) == 0 && Hilbert.q8Lat(89.9999) == 255)
    assert(Hilbert.key(0.0, 0.0) == Hilbert.index(128, 128))
  }
}
