package graft

import graft.geo.RayCast
import graft.ops.SpatialJoin
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** PIP (J2) and kNN (J3) joins against in-memory brute-force oracles. */
class SpatialJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // deterministic synthetic workload
  private val rnd = new scala.util.Random(42)
  private val points: Seq[(Long, Double, Double)] =
    (0L until 4000L).map(i => (i, -120.0 + rnd.nextDouble() * 4.0, 36.0 + rnd.nextDouble() * 2.0))
  private val polys: Seq[(Long, Array[Double], Array[Double])] =
    (0L until 60L).map { i =>
      val cx = -120.0 + rnd.nextDouble() * 4.0
      val cy = 36.0 + rnd.nextDouble() * 2.0
      val w = 0.05 + rnd.nextDouble() * 0.25
      val h = 0.05 + rnd.nextDouble() * 0.2
      // irregular quad (tests generic ray cast, not just triangles)
      (i, Array(cx - w, cx + w * 0.7, cx + w, cx - w * 0.4),
          Array(cy - h, cy - h * 0.8, cy + h * 0.6, cy + h))
    }

  private def bruteForcePip: Set[(Long, Long)] =
    (for {
      (pid, px, py) <- points
      (qid, xs, ys) <- polys
      if RayCast.contains(px, py, xs, ys)
    } yield (pid, qid)).toSet

  test("pointInPolygon matches brute force (broadcast + shuffle paths, multiple levels)") {
    import spark.implicits._
    val ptsDf = points.toDF("point_id", "lng", "lat")
    val polysDf = polys.toDF("poly_id", "xs", "ys")
    val expected = bruteForcePip
    assert(expected.nonEmpty, "workload sanity: some containment pairs")
    for (level <- Seq(None, Some(9), Some(12)); bcast <- Seq(true, false)) {
      val got = SpatialJoin.pointInPolygon(ptsDf, polysDf, level, bcast)
        .select("point_id", "poly_id").as[(Long, Long)].collect().toSet
      assert(got == expected, s"level=$level broadcast=$bcast")
    }
  }

  test("pointInPolygonMulti: holes excluded, MultiPolygon shells included, brute-force equality") {
    import spark.implicits._
    // rectangles with a centered hole + a disjoint second shell
    val multiPolys: Seq[(Long, Array[Array[Double]], Array[Array[Double]])] =
      (0L until 40L).map { i =>
        val r2 = new scala.util.Random(1000 + i)
        val cx = -120.0 + r2.nextDouble() * 3.0
        val cy = 36.0 + r2.nextDouble() * 1.5
        val w = 0.05 + r2.nextDouble() * 0.15
        val h = 0.05 + r2.nextDouble() * 0.12
        def rect(x0: Double, y0: Double, hw: Double, hh: Double) =
          (Array(x0 - hw, x0 + hw, x0 + hw, x0 - hw),
           Array(y0 - hh, y0 - hh, y0 + hh, y0 + hh))
        val (ox, oy) = rect(cx, cy, w, h)
        val (hx, hy) = rect(cx, cy, w * 0.5, h * 0.5)
        val (sx, sy) = rect(cx + 0.6, cy, w * 0.4, h * 0.4)
        (i, Array(ox, hx, sx), Array(oy, hy, sy))
      }
    val expected = (for {
      (pid, px, py) <- points
      (qid, xss, yss) <- multiPolys
      if RayCast.containsMulti(px, py, xss, yss)
    } yield (pid, qid)).toSet
    assert(expected.nonEmpty, "workload sanity")
    // semantic anchors: hole center excluded, second-shell center included
    val (_, xss0, yss0) = multiPolys.head
    val holeCx = (xss0(1)(0) + xss0(1)(1)) / 2; val holeCy = (yss0(1)(0) + yss0(1)(2)) / 2
    val shellCx = (xss0(2)(0) + xss0(2)(1)) / 2; val shellCy = (yss0(2)(0) + yss0(2)(2)) / 2
    assert(!RayCast.containsMulti(holeCx, holeCy, xss0, yss0),
      "point inside the hole must be OUTSIDE")
    assert(RayCast.containsMulti(shellCx, shellCy, xss0, yss0),
      "point inside the disjoint second shell must be INSIDE")
    // single-ring parity: containsMulti on one ring == contains
    assert(RayCast.containsMulti(holeCx, holeCy, Array(xss0(0)), Array(yss0(0))) ==
      RayCast.contains(holeCx, holeCy, xss0(0), yss0(0)))
    val ptsDf = points.toDF("point_id", "lng", "lat")
    val polysDf = multiPolys.toDF("poly_id", "xss", "yss")
    for (level <- Seq(None, Some(10)); bcast <- Seq(true, false)) {
      val got = SpatialJoin.pointInPolygonMulti(ptsDf, polysDf, level, bcast)
        .select("point_id", "poly_id").as[(Long, Long)].collect().toSet
      assert(got == expected, s"level=$level broadcast=$bcast")
    }
  }

  test("pointInPolygonSalted matches brute force and the unsalted path") {
    import spark.implicits._
    val ptsDf = points.toDF("point_id", "lng", "lat")
    val polysDf = polys.toDF("poly_id", "xs", "ys")
    val got = SpatialJoin.pointInPolygonSalted(ptsDf, polysDf, level = 11,
        hotThreshold = 5L, salt = 4)
      .select("point_id", "poly_id").as[(Long, Long)].collect().toSet
    assert(got == bruteForcePip)
  }

  test("pointInPolygonAdaptive (hot-cell splitting) matches brute force") {
    import spark.implicits._
    val ptsDf = points.toDF("point_id", "lng", "lat")
    val polysDf = polys.toDF("poly_id", "xs", "ys")
    // threshold low enough that most level-9 cells split
    val got = SpatialJoin.pointInPolygonAdaptive(ptsDf, polysDf, level = 9,
        hotThreshold = 10L, splitLevels = 2)
      .select("point_id", "poly_id").as[(Long, Long)].collect().toSet
    assert(got == bruteForcePip)
  }

  test("Douglas-Peucker matches an independent recursive reference; op = kernel") {
    import graft.geo.Simplify
    import spark.implicits._
    // independent reference: classic perpendicular-distance recursion
    def ref(xs: Array[Double], ys: Array[Double], eps: Double): Array[Boolean] = {
      val keep = new Array[Boolean](xs.length)
      def rec(lo: Int, hi: Int): Unit = {
        keep(lo) = true; keep(hi) = true
        if (hi - lo < 2) return
        val ax = xs(lo); val ay = ys(lo); val bx = xs(hi); val by = ys(hi)
        val len = math.hypot(bx - ax, by - ay)
        var best = -1; var bestD = Double.NegativeInfinity
        for (i <- lo + 1 until hi) {
          val d =
            if (len == 0.0) math.hypot(xs(i) - ax, ys(i) - ay)
            else math.abs((bx - ax) * (ys(i) - ay) - (by - ay) * (xs(i) - ax)) / len
          if (d > bestD) { bestD = d; best = i }
        }
        if (bestD > eps) { rec(lo, best); rec(best, hi) }
      }
      if (xs.nonEmpty) rec(0, xs.length - 1)
      keep
    }
    val rnd3 = new scala.util.Random(13)
    for (trial <- 1 to 30) {
      val n = 2 + rnd3.nextInt(120)
      val xs = Array.fill(n)(rnd3.nextDouble() * 2.0)
      val ys = Array.fill(n)(rnd3.nextDouble())
      val eps = 0.01 + rnd3.nextDouble() * 0.4
      assert(Simplify.douglasPeucker(xs, ys, eps).toSeq == ref(xs, ys, eps).toSeq,
        s"trial $trial n=$n eps=$eps")
    }
    // smooth line + big eps ⇒ real reduction; the Spark op equals the kernel
    val smooth = (0 until 400).map { i =>
      val x = i / 100.0
      (7L, i.toLong, x, math.sin(x) * 0.5 + (i % 3) * 1e-4)
    }
    val keepMask = Simplify.douglasPeucker(
      smooth.map(_._3).toArray, smooth.map(_._4).toArray, 0.01)
    assert(keepMask.count(identity) < 60, s"expected strong reduction, kept ${keepMask.count(identity)}")
    val got = graft.ops.Trajectory.simplify(
        smooth.toDF("line_id", "seq", "lng", "lat"), 0.01)
      .as[(Long, Long, Double, Double)].collect().map(_._2).sorted.toSeq
    val exp = smooth.indices.filter(keepMask).map(_.toLong)
    assert(got == exp)
  }

  test("polygon metrics and ray cast agree with JTS (independent oracle)") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    import graft.functions.spatial
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val gf = new GeometryFactory()
    val r2 = new scala.util.Random(7)
    // star-shaped polygons (sorted angles, random radii) are always simple
    val stars = (0 until 25).map { i =>
      val cx = -119.0 + r2.nextDouble() * 2.0
      val cy = 36.0 + r2.nextDouble()
      val n = 5 + r2.nextInt(8)
      val angles = Seq.fill(n)(r2.nextDouble() * 2.0 * math.Pi).distinct.sorted
      val pts = angles.map { a =>
        val rad = 0.05 + r2.nextDouble() * 0.3
        (cx + rad * math.cos(a), cy + rad * math.sin(a))
      }
      (i.toLong, pts.map(_._1).toArray, pts.map(_._2).toArray)
    }
    val metrics = stars.toDF("poly_id", "xs", "ys")
      .select(col("poly_id"),
        spatial.polygon_area(col("xs"), col("ys")).as("a"),
        spatial.polygon_perimeter(col("xs"), col("ys")).as("p"),
        spatial.polygon_centroid_x(col("xs"), col("ys")).as("cx"),
        spatial.polygon_centroid_y(col("xs"), col("ys")).as("cy"))
      .as[(Long, Double, Double, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    stars.foreach { case (id, xs, ys) =>
      val coords = (xs.indices :+ 0).map(j => new Coordinate(xs(j), ys(j))).toArray
      val poly = gf.createPolygon(coords)
      val (_, a, p, cx, cy) = metrics(id)
      assert(math.abs(math.abs(a) - poly.getArea) < 1e-9, s"area poly $id")
      assert(math.abs(p - poly.getExteriorRing.getLength) < 1e-9, s"perimeter poly $id")
      assert(math.abs(cx - poly.getCentroid.getX) < 1e-9, s"centroid x poly $id")
      assert(math.abs(cy - poly.getCentroid.getY) < 1e-9, s"centroid y poly $id")
      // ray-cast kernel vs JTS containment on random probes (boundary hits
      // have probability zero under continuous sampling)
      for (_ <- 1 to 40) {
        val px = -119.5 + r2.nextDouble() * 3.0
        val py = 35.8 + r2.nextDouble() * 1.4
        val jts = poly.contains(gf.createPoint(new Coordinate(px, py)))
        assert(RayCast.contains(px, py, xs, ys) == jts, s"PIP poly $id at ($px, $py)")
      }
    }
  }

  test("polygon area/perimeter/centroid: golden shapes and orientation sign") {
    import graft.functions.spatial
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val shapes = Seq(
      // (id, xs, ys): CCW unit right triangle; CCW unit square; CW square
      (1L, Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 1.0)),
      (2L, Array(0.0, 1.0, 1.0, 0.0), Array(0.0, 0.0, 1.0, 1.0)),
      (3L, Array(0.0, 0.0, 1.0, 1.0), Array(0.0, 1.0, 1.0, 0.0)))
    val got = shapes.toDF("poly_id", "xs", "ys")
      .select(col("poly_id"),
        spatial.polygon_area(col("xs"), col("ys")).as("a"),
        spatial.polygon_perimeter(col("xs"), col("ys")).as("p"),
        spatial.polygon_centroid_x(col("xs"), col("ys")).as("cx"),
        spatial.polygon_centroid_y(col("xs"), col("ys")).as("cy"))
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    val (_, a1, p1, cx1, cy1) = got(0)
    assert(a1 == 0.5 && math.abs(p1 - (2.0 + math.sqrt(2.0))) < 1e-15)
    assert(math.abs(cx1 - 1.0 / 3.0) < 1e-15 && math.abs(cy1 - 1.0 / 3.0) < 1e-15)
    val (_, a2, p2, cx2, cy2) = got(1)
    assert(a2 == 1.0 && p2 == 4.0 && cx2 == 0.5 && cy2 == 0.5)
    val (_, a3, _, cx3, cy3) = got(2)
    assert(a3 == -1.0, "CW ring has negative signed area")
    assert(cx3 == 0.5 && cy3 == 0.5, "centroid is orientation-invariant")
  }

  test("polygon metrics on an EMPTY ring fold to 0.0 instead of crashing") {
    // sequence(0, size-1) on an empty array is the DESCENDING [0, -1],
    // whose second step hits element_at(xs, 0) — the guard must short-circuit
    import graft.functions.spatial
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val got = Seq((1L, Array.empty[Double], Array.empty[Double]))
      .toDF("poly_id", "xs", "ys")
      .select(spatial.polygon_area(col("xs"), col("ys")).as("a"),
        spatial.polygon_perimeter(col("xs"), col("ys")).as("p"),
        spatial.polygon_centroid_x(col("xs"), col("ys")).as("cx"))
      .as[(Double, Double, Option[Double])].head()
    assert(got._1 == 0.0 && got._2 == 0.0)
    assert(got._3.isEmpty,
      "zero-area centroid is null (ANSI would throw on the 0/0 divide)")
  }

  test("withinDistance matches brute force at several radii and resolutions") {
    import spark.implicits._
    val probes = (0L until 50L)
      .map(i => (i, -120.0 + (i % 10) * 0.4 + 0.17, 36.0 + (i % 5) * 0.4 + 0.09))
    val probesDf = probes.toDF("probe_id", "lng", "lat")
    val targetsDf = points.toDF("target_id", "lng", "lat")
    for (radius <- Seq(0.03, 0.1, 0.35); res <- Seq(None, Some(3), Some(6))) {
      val expected = (for {
        (pid, px, py) <- probes
        (tid, tx, ty) <- points
        d2 = (tx - px) * (tx - px) + (ty - py) * (ty - py)
        if d2 <= radius * radius
      } yield (pid, tid)).toSet
      val got = SpatialJoin.withinDistance(probesDf, targetsDf, radius, res)
        .select("probe_id", "target_id").as[(Long, Long)].collect().toSet
      assert(got == expected, s"radius=$radius res=$res")
      assert(expected.nonEmpty, s"workload sanity at radius=$radius")
    }
  }

  test("knnGeodesic: brute-force equality at high latitude; meters track true haversine") {
    import spark.implicits._
    import graft.geo.Geodesic
    val r2 = new scala.util.Random(7)
    // 66-68°N: 1° of longitude is ~43 km vs ~111 km of latitude — planar
    // degree ranking and geodesic ranking genuinely disagree here
    val hiProbes = (0L until 30L).map(i => (i, -20.0 + r2.nextDouble() * 4.0, 66.0 + r2.nextDouble() * 2.0))
    val hiTargets = (100L until 1100L).map(i => (i, -20.0 + r2.nextDouble() * 4.0, 66.0 + r2.nextDouble() * 2.0))
    val k = 5
    val got = SpatialJoin.knnGeodesic(
        hiProbes.toDF("probe_id", "lng", "lat"),
        hiTargets.toDF("target_id", "lng", "lat"), k = k, res = 5)
      .as[(Long, Long, Int, Double)].collect()
      .map(r => (r._1, r._3) -> (r._2, r._4)).toMap
    def brute(metric: (Double, Double, Double, Double) => Double) =
      hiProbes.map { case (pid, plng, plat) =>
        pid -> hiTargets.map { case (tid, tlng, tlat) =>
          (metric(plng, plat, tlng, tlat), tid)
        }.sorted.take(k)
      }.toMap
    val expected = brute(Geodesic.havT)
    assert(got.size == hiProbes.size * k)
    for ((pid, ranked) <- expected; (r, ((t, tid))) <- (1 to k).zip(ranked)) {
      val (gtid, gm) = got((pid, r))
      assert(gtid == tid, s"probe $pid rank $r")
      assert(gm == Geodesic.metersFromT(t), s"probe $pid rank $r meters")
      // polynomial meters track true haversine to ~1e-9 relative
      def hav(plng: Double, plat: Double, tlng: Double, tlat: Double): Double = {
        val dphi = math.toRadians(tlat - plat) / 2; val dl = math.toRadians(tlng - plng) / 2
        val a = math.sin(dphi) * math.sin(dphi) +
          math.cos(math.toRadians(plat)) * math.cos(math.toRadians(tlat)) * math.sin(dl) * math.sin(dl)
        2 * Geodesic.EarthRadiusM * math.asin(math.sqrt(a))
      }
      val (plng, plat) = hiProbes.find(_._1 == pid).map(p => (p._2, p._3)).get
      val (tlng, tlat) = hiTargets.find(_._1 == gtid).map(p => (p._2, p._3)).get
      val truth = hav(plng, plat, tlng, tlat)
      assert(math.abs(gm - truth) <= 1e-6 * math.max(truth, 1.0),
        s"polynomial meters off: $gm vs $truth")
    }
    // the metric has to matter: at 67°N planar and geodesic top-1 disagree somewhere
    val planarTop = brute((a, b, c, d) => (c - a) * (c - a) + (d - b) * (d - b))
    assert(expected.exists { case (pid, ranked) =>
      ranked.head._2 != planarTop(pid).head._2
    }, "expected planar/geodesic rank-1 disagreement at high latitude")
  }

  test("withinDistanceGeodesic matches brute force at several meter radii") {
    import spark.implicits._
    import graft.geo.Geodesic
    val r3 = new scala.util.Random(11)
    val ps = (0L until 40L).map(i => (i, -20.0 + r3.nextDouble() * 2.0, 66.0 + r3.nextDouble() * 1.0))
    val ts = (100L until 1600L).map(i => (i, -20.0 + r3.nextDouble() * 2.0, 66.0 + r3.nextDouble() * 1.0))
    for (radiusM <- Seq(3000.0, 12000.0)) {
      val sinHalf = Geodesic.sinP(radiusM / (2.0 * Geodesic.EarthRadiusM))
      val tThr = sinHalf * sinHalf
      val expected = (for {
        (pid, plng, plat) <- ps
        (tid, tlng, tlat) <- ts
        if Geodesic.havT(plng, plat, tlng, tlat) <= tThr
      } yield (pid, tid)).toSet
      assert(expected.nonEmpty, s"workload sanity at $radiusM m")
      val got = SpatialJoin.withinDistanceGeodesic(
          ps.toDF("probe_id", "lng", "lat"), ts.toDF("target_id", "lng", "lat"), radiusM)
        .select("probe_id", "target_id").as[(Long, Long)].collect().toSet
      assert(got == expected, s"radius $radiusM m")
    }
  }

  test("knn matches brute force (exact ranks and distances)") {
    import spark.implicits._
    val probes = (0L until 40L)
      .map(i => (i, -120.0 + (i % 8) * 0.5 + 0.21, 36.0 + (i % 4) * 0.5 + 0.13))
    val targets = points.map { case (i, lng, lat) => (i, lng, lat) }
    val k = 7
    val expected: Set[(Long, Long, Int)] = probes.flatMap { case (pid, plng, plat) =>
      targets.map { case (tid, tlng, tlat) =>
        val d2 = (tlng - plng) * (tlng - plng) + (tlat - plat) * (tlat - plat)
        (tid, d2)
      }.sortBy { case (tid, d2) => (d2, tid) }.take(k).zipWithIndex.map {
        case ((tid, _), r) => (pid, tid, r + 1)
      }
    }.toSet
    for (res <- Seq(4, 5, 6)) {
      val got = SpatialJoin.knn(
          probes.toDF("probe_id", "lng", "lat"),
          targets.toDF("target_id", "lng", "lat"), k = k, res = res)
        .select("probe_id", "target_id", "rank").as[(Long, Long, Int)]
        .collect().toSet
      assert(got == expected, s"res=$res")
    }
  }

  test("knn emits exact results for probes whose rings never reach targets") {
    import spark.implicits._
    // targets ~10 degrees away: ring expansion at res 6 cannot reach them
    // within maxRings, so the brute-force fallback must deliver exact kNN
    val probes = Seq((1L, -119.5, 36.5), (2L, -119.2, 36.8))
    val targets = Seq((10L, -110.0, 30.0), (11L, -110.5, 30.5), (12L, -109.5, 29.5))
    val got = SpatialJoin.knn(probes.toDF("probe_id", "lng", "lat"),
        targets.toDF("target_id", "lng", "lat"), k = 2, res = 6, maxRings = 3)
      .select("probe_id", "target_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    val expected = probes.flatMap { case (pid, plng, plat) =>
      targets.map { case (tid, tlng, tlat) =>
        (tid, (tlng - plng) * (tlng - plng) + (tlat - plat) * (tlat - plat))
      }.sortBy { case (tid, d2) => (d2, tid) }.take(2).zipWithIndex.map {
        case ((tid, _), r) => (pid, tid, r + 1)
      }
    }.toSet
    assert(got == expected)
  }

  test("knn with zero targets returns empty without ring churn") {
    import spark.implicits._
    val got = SpatialJoin.knn(
      Seq((1L, -119.5, 36.5)).toDF("probe_id", "lng", "lat"),
      Seq.empty[(Long, Double, Double)].toDF("target_id", "lng", "lat"),
      k = 3, res = 6)
    assert(got.count() == 0)
  }

  test("knn handles fewer targets than k (emits all, ranked)") {
    import spark.implicits._
    val probes = Seq((1L, -119.5, 36.5))
    val targets = Seq((10L, -119.4, 36.4), (11L, -119.6, 36.7))
    val got = SpatialJoin.knn(probes.toDF("probe_id", "lng", "lat"),
        targets.toDF("target_id", "lng", "lat"), k = 5, res = 6)
      .select("probe_id", "target_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    assert(got == Set((1L, 10L, 1), (1L, 11L, 2)))
  }

  test("BroadcastSetContainsExpr matches set semantics (large hot-set path)") {
    import org.apache.spark.sql.graftshim.GraftColumns
    import spark.implicits._
    val set = (0L until 9000L).filter(_ % 3 == 0).toSet // 3000 > InSetLiteralCap
    val bc = spark.sparkContext.broadcast(set)
    val got = (0L until 100L).toDF("v")
      .withColumn("m", GraftColumns.column(graft.ops.BroadcastSetContainsExpr(
        GraftColumns.expression(org.apache.spark.sql.functions.col("v")), bc)))
      .as[(Long, Boolean)].collect().toMap
    assert((0L until 100L).forall(v => got(v) == (v % 3 == 0)))
  }

  test("polygonJoin matches brute-force convex intersection; never a cartesian") {
    import spark.implicits._
    val r2 = new scala.util.Random(77)
    def tri(seed: Int, n: Int): Seq[(Long, Array[Double], Array[Double])] =
      (0 until n).map { i =>
        val cx = -120.0 + r2.nextDouble() * 3.0
        val cy = 36.0 + r2.nextDouble() * 1.5
        val w = 0.02 + r2.nextDouble() * 0.15
        val h = 0.02 + r2.nextDouble() * 0.15
        (i.toLong + seed, Array(cx, cx - w, cx + w), Array(cy + h, cy - h, cy - h))
      }
    val as = tri(0, 80); val bs = tri(1000, 80)
    val aDf = as.toDF("poly_id", "xs", "ys"); val bDf = bs.toDF("poly_id", "xs", "ys")
    val out = SpatialJoin.polygonJoin(aDf, bDf, level = 9)
    assert(!out.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val got = out.as[(Long, Long)].collect().toSet
    // brute force: same predicate semantics, independent implementation
    def orient(ax: Double, ay: Double, bx: Double, by: Double,
               cx: Double, cy: Double): Double =
      (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    def in(pxs: Array[Double], pys: Array[Double], qx: Double, qy: Double): Boolean =
      pxs.indices.forall { i =>
        val j = (i + 1) % pxs.length
        orient(pxs(i), pys(i), pxs(j), pys(j), qx, qy) >= 0
      }
    def crosses(a: (Array[Double], Array[Double]), b: (Array[Double], Array[Double])): Boolean =
      a._1.indices.exists { i =>
        val i2 = (i + 1) % a._1.length
        b._1.indices.exists { j =>
          val j2 = (j + 1) % b._1.length
          val o1 = orient(a._1(i), a._2(i), a._1(i2), a._2(i2), b._1(j), b._2(j))
          val o2 = orient(a._1(i), a._2(i), a._1(i2), a._2(i2), b._1(j2), b._2(j2))
          val o3 = orient(b._1(j), b._2(j), b._1(j2), b._2(j2), a._1(i), a._2(i))
          val o4 = orient(b._1(j), b._2(j), b._1(j2), b._2(j2), a._1(i2), a._2(i2))
          o1 * o2 < 0 && o3 * o4 < 0
        }
      }
    val want = (for {
      (ia, axs, ays) <- as; (ib, bxs, bys) <- bs
      hit = bxs.indices.exists(j => in(axs, ays, bxs(j), bys(j))) ||
        axs.indices.exists(k => in(bxs, bys, axs(k), ays(k))) ||
        crosses((axs, ays), (bxs, bys))
      if hit
    } yield (ia, ib)).toSet
    assert(got == want)
    assert(want.nonEmpty, "degenerate: no intersecting pairs generated")
  }

  test("polygonJoinWithArea overlap areas match JTS intersection areas") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    import spark.implicits._
    val gf = new GeometryFactory()
    val r3 = new scala.util.Random(13)
    def tri(seed: Int, n: Int): Seq[(Long, Array[Double], Array[Double])] =
      (0 until n).map { i =>
        val cx = -120.0 + r3.nextDouble() * 2.0
        val cy = 36.0 + r3.nextDouble()
        val w = 0.03 + r3.nextDouble() * 0.2
        val h = 0.03 + r3.nextDouble() * 0.2
        (i.toLong + seed, Array(cx, cx - w, cx + w), Array(cy + h, cy - h, cy - h))
      }
    val as = tri(0, 50); val bs = tri(1000, 50)
    val got = graft.ops.SpatialJoin.polygonJoinWithArea(
        as.toDF("poly_id", "xs", "ys"), bs.toDF("poly_id", "xs", "ys"), level = 9)
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got.nonEmpty, "degenerate: no intersecting pairs")
    def jts(xs: Array[Double], ys: Array[Double]) =
      gf.createPolygon((xs.indices :+ 0).map(j => new Coordinate(xs(j), ys(j))).toArray)
    val aMap = as.map(t => t._1 -> jts(t._2, t._3)).toMap
    val bMap = bs.map(t => t._1 -> jts(t._2, t._3)).toMap
    got.foreach { case ((pa, pb), area) =>
      val want = aMap(pa).intersection(bMap(pb)).getArea
      assert(math.abs(area - want) < 1e-9, s"pair ($pa,$pb): $area vs $want")
    }
    // completeness: every JTS pair with STRICTLY positive overlap is present
    for ((ia, ax, ay) <- as; (ib, bx, by) <- bs) {
      val w = jts(ax, ay).intersection(jts(bx, by)).getArea
      if (w > 1e-12)
        assert(got.contains((ia, ib)), s"missing pair ($ia,$ib) with area $w")
    }
  }

  test("cellAreaWeights: JTS per-cell equality and exact-partition invariant") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    import spark.implicits._
    val gf = new GeometryFactory()
    val r5 = new scala.util.Random(23)
    val polys = (0 until 40).map { i =>
      val cx = -120.0 + r5.nextDouble() * 2.0
      val cy = 36.0 + r5.nextDouble()
      val w = 0.03 + r5.nextDouble() * 0.3
      val h = 0.03 + r5.nextDouble() * 0.3
      (i.toLong, Array(cx, cx - w, cx + w), Array(cy + h, cy - h, cy - h))
    }
    val cells = 16
    val got = graft.ops.Rasterize.cellAreaWeights(
        polys.toDF("poly_id", "xs", "ys"), cells)
      .as[(Long, Int, Int, Double)].collect()
    assert(got.nonEmpty)
    def jts(xs: Array[Double], ys: Array[Double]) =
      gf.createPolygon((xs.indices :+ 0).map(j => new Coordinate(xs(j), ys(j))).toArray)
    val polyMap = polys.map(t => t._1 -> (jts(t._2, t._3), t._2, t._3)).toMap
    got.foreach { case (pid, cx, cy, area) =>
      val rect = gf.createPolygon(Array(
        new Coordinate(cx.toDouble / cells, cy.toDouble / cells),
        new Coordinate((cx + 1).toDouble / cells, cy.toDouble / cells),
        new Coordinate((cx + 1).toDouble / cells, (cy + 1).toDouble / cells),
        new Coordinate(cx.toDouble / cells, (cy + 1).toDouble / cells),
        new Coordinate(cx.toDouble / cells, cy.toDouble / cells)))
      val want = polyMap(pid)._1.intersection(rect).getArea
      // same tolerance as the polygonJoinWithArea JTS check — JTS computes
      // the intersection by a different pipeline, ulp drift is expected
      assert(math.abs(area - want) < 1e-9, s"poly $pid cell ($cx,$cy): $area vs $want")
      assert(area <= 1.0 / (cells.toDouble * cells) + 1e-15, "cell overflow")
    }
    // the cells PARTITION the polygon: per-poly sum of cell areas equals
    // the polygon's own area
    val sums = got.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    polys.foreach { case (pid, xs, ys) =>
      val whole = graft.geo.ConvexClip.area(xs, ys)
      assert(math.abs(sums.getOrElse(pid, 0.0) - whole) < 1e-10,
        s"poly $pid: cells sum ${sums.getOrElse(pid, 0.0)} vs area $whole")
    }
  }

  test("polygonJoinWithArea handles CONCAVE clip rings (ear-clip): JTS equality") {
    import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
    import spark.implicits._
    val gf = new GeometryFactory()
    val r4 = new scala.util.Random(17)
    // subject side: random triangles (as before)
    val as = (0 until 40).map { i =>
      val cx = -120.0 + r4.nextDouble() * 2.0
      val cy = 36.0 + r4.nextDouble()
      val w = 0.05 + r4.nextDouble() * 0.25
      val h = 0.05 + r4.nextDouble() * 0.25
      (i.toLong, Array(cx, cx - w, cx + w), Array(cy + h, cy - h, cy - h))
    }
    // clip side: CONCAVE fixtures — L-shapes (CCW) and 5-point stars (CW,
    // exercising the winding normalization)
    val bs = (0 until 40).map { i =>
      val cx = -120.0 + r4.nextDouble() * 2.0
      val cy = 36.0 + r4.nextDouble()
      val s = 0.05 + r4.nextDouble() * 0.2
      if (i % 2 == 0) {
        // L-shape, CCW
        (1000L + i,
          Array(cx, cx + s, cx + s, cx + s * 0.4, cx + s * 0.4, cx),
          Array(cy, cy, cy + s * 0.4, cy + s * 0.4, cy + s, cy + s))
      } else {
        // 5-point star, CW (reversed CCW construction)
        val pts = (0 until 10).map { k =>
          val ang = math.Pi / 2 + k * math.Pi / 5
          val rr = if (k % 2 == 0) s else s * 0.4
          (cx + rr * math.cos(ang), cy + rr * math.sin(ang))
        }.reverse
        (1000L + i, pts.map(_._1).toArray, pts.map(_._2).toArray)
      }
    }
    val got = graft.ops.SpatialJoin.polygonJoinWithArea(
        as.toDF("poly_id", "xs", "ys"), bs.toDF("poly_id", "xs", "ys"), level = 9)
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got.nonEmpty, "degenerate: no intersecting pairs")
    assert(got.values.exists(_ > 0), "degenerate: all-zero areas")
    def jts(xs: Array[Double], ys: Array[Double]) =
      gf.createPolygon((xs.indices :+ 0).map(j => new Coordinate(xs(j), ys(j))).toArray)
    val aMap = as.map(t => t._1 -> jts(t._2, t._3)).toMap
    val bMap = bs.map(t => t._1 -> jts(t._2, t._3)).toMap
    got.foreach { case ((pa, pb), area) =>
      val want = aMap(pa).intersection(bMap(pb)).getArea
      assert(math.abs(area - want) < 1e-9, s"pair ($pa,$pb): $area vs $want")
    }
  }

  test("salted PIP with >1024 hot cells takes the broadcast-set path and stays exact") {
    import spark.implicits._
    // hotThreshold=0 makes every occupied cell hot: ~2000 distinct cells at
    // level 11 over a 2-degree span force the >InSetLiteralCap dispatch in
    // hotPredicate through the production join path
    val pts = (0 until 4000).map(i =>
      (i.toLong, -119.9 + (i % 2000) * 1e-3, 36.05 + (i % 7) * 1e-3))
      .toDF("point_id", "lng", "lat")
    val polys = Seq((1L, Array(-120.0, -117.0, -118.5), Array(36.0, 36.0, 37.5)))
      .toDF("poly_id", "xs", "ys")
    val expect = SpatialJoin.pointInPolygon(pts, polys, Some(11))
      .select("point_id", "poly_id").as[(Long, Long)].collect().toSet
    val got = SpatialJoin.pointInPolygonSalted(pts, polys,
        level = 11, hotThreshold = 0L, salt = 3)
      .select("point_id", "poly_id").as[(Long, Long)].collect().toSet
    assert(got == expect && got.nonEmpty)
  }

  test("dbscan matches the brute-force reference (roles and labels)") {
    import spark.implicits._
    val r = new scala.util.Random(13)
    // two dense blobs + a sparse bridge + scattered noise
    val pts: Seq[(Long, Double, Double)] =
      (0 until 120).map(i => (i.toLong,
        -119.0 + r.nextDouble() * 0.02, 36.0 + r.nextDouble() * 0.02)) ++
      (0 until 120).map(i => (200L + i,
        -118.9 + r.nextDouble() * 0.02, 36.1 + r.nextDouble() * 0.02)) ++
      (0 until 30).map(i => (400L + i,
        -119.5 + r.nextDouble() * 0.5, 36.5 + r.nextDouble() * 0.5))
    val eps = 0.0025; val minPts = 6
    val got = SpatialJoin.dbscan(pts.toDF("pid", "lng", "lat"), eps, minPts)
      .as[(Long, String, Option[Long])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    // brute force DBSCAN with min-label border assignment
    val eps2 = eps * eps
    def d2(a: (Long, Double, Double), b: (Long, Double, Double)) = {
      val dx = a._2 - b._2; val dy = a._3 - b._3; dx * dx + dy * dy
    }
    val nbrs = pts.map(p =>
      p._1 -> pts.filter(q => q._1 != p._1 && d2(p, q) <= eps2).map(_._1).toSet).toMap
    val core = pts.map(_._1).filter(p => nbrs(p).size + 1 >= minPts).toSet
    // components over core-core edges (BFS)
    var label = core.map(c => c -> c).toMap
    var changed = true
    while (changed) {
      changed = false
      for (c <- core; n <- nbrs(c) if core(n))
        if (label(n) < label(c)) { label += c -> label(n); changed = true }
    }
    pts.map(_._1).foreach { p =>
      val want: (String, Option[Long]) =
        if (core(p)) ("core", Some(label(p)))
        else {
          val cn = nbrs(p).filter(core).map(label)
          if (cn.nonEmpty) ("border", Some(cn.min)) else ("noise", None)
        }
      assert(got(p) == want, s"pid $p")
    }
    // the fixture actually exercises all three roles and >= 2 clusters
    val roles = got.values.map(_._1).toSet
    assert(roles == Set("core", "border", "noise"))
    assert(got.values.flatMap(_._2).toSet.size >= 2)
  }
}
