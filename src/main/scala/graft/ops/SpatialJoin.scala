package graft.ops

import graft.geo.{Hex, RayCast, S2}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftColumns
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Static argmin kernel shared by [[NearestSiteExpr]]'s interpreted and
  * generated paths: index of the closest site by squared planar distance,
  * strict `<` so ties keep the first (= smallest site_id when the caller
  * sorts by id). Same IEEE op order as the oracle's cross-join argmin.
  */
object VoronoiKernel {
  def nearest(lng: Double, lat: Double,
              sxs: Array[Double], sys: Array[Double]): Int = {
    var best = -1; var bd = Double.PositiveInfinity
    var k = 0
    while (k < sxs.length) {
      val dx = lng - sxs(k); val dy = lat - sys(k)
      val d2 = dx * dx + dy * dy
      if (d2 < bd) { bd = d2; best = k }
      k += 1
    }
    best
  }
}

/** `nearest_site(lng, lat)` — 0-based index of the nearest of a fixed site
  * array (the Voronoi label); the site coordinates ride along as reference
  * objects so the loop whole-stage-codegens with zero allocation.
  */
case class NearestSiteExpr(left: Expression, right: Expression,
                           sxs: Array[Double], sys: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_site"
  override def nullSafeEval(lng: Any, lat: Any): Any =
    VoronoiKernel.nearest(lng.asInstanceOf[Double], lat.asInstanceOf[Double],
      sxs, sys)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rx = ctx.addReferenceObj("voroSxs", sxs, "double[]")
    val ry = ctx.addReferenceObj("voroSys", sys, "double[]")
    nullSafeCodeGen(ctx, ev, (lng, lat) =>
      s"${ev.value} = graft.ops.VoronoiKernel.nearest($lng, $lat, $rx, $ry);")
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): NearestSiteExpr = copy(left = l, right = r)
}

/** `ray_cast(px, py, xs, ys)` — even-odd point-in-ring test over packed
  * coordinate arrays; the exact refinement predicate of the PIP join (J2).
  */
case class RayCastExpr(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType,
    ArrayType(DoubleType, containsNull = false), ArrayType(DoubleType, containsNull = false))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "ray_cast"
  override def nullSafeEval(px: Any, py: Any, xs: Any, ys: Any): Any =
    RayCast.contains(px.asInstanceOf[Double], py.asInstanceOf[Double],
      xs.asInstanceOf[ArrayData], ys.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (px, py, xs, ys) =>
      s"${ev.value} = graft.geo.RayCast.contains($px, $py, $xs, $ys);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): RayCastExpr =
    copy(first = a, second = b, third = c, fourth = d)
}

/** `ray_cast_multi(px, py, xss, yss)` — multi-ring even-odd membership over
  * rings packed as arrays-of-arrays: Polygon-with-holes and MultiPolygon
  * membership (RayCast.containsMulti scaladoc has the semantics).
  */
case class RayCastMultiExpr(first: Expression, second: Expression,
                            third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  private val rings = ArrayType(ArrayType(DoubleType, containsNull = false),
    containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType, rings, rings)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "ray_cast_multi"
  override def nullSafeEval(px: Any, py: Any, xss: Any, yss: Any): Any =
    RayCast.containsMulti(px.asInstanceOf[Double], py.asInstanceOf[Double],
      xss.asInstanceOf[ArrayData], yss.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (px, py, xss, yss) =>
      s"${ev.value} = graft.geo.RayCast.containsMulti($px, $py, $xss, $yss);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): RayCastMultiExpr =
    copy(first = a, second = b, third = c, fourth = d)
}

/** Static helper invoked from generated code (keeps the broadcast handle —
  * not the set — in the plan).
  */
object PipHelpers {
  def setContains(bc: org.apache.spark.broadcast.Broadcast[Set[Long]], v: Long): Boolean =
    bc.value.contains(v)
}

/** Codegen'd membership test against a broadcast `Set[Long]`: the plan
  * carries only the broadcast HANDLE (O(1) plan size), so a hot-cell set
  * with millions of entries doesn't get embedded as In/InSet literals in
  * every serialized plan; executors fetch the set once via the broadcast.
  */
case class BroadcastSetContainsExpr(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Set[Long]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "broadcast_set_contains"
  override def nullSafeEval(v: Any): Any = bc.value.contains(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bcSet", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.ops.PipHelpers.setContains($bcRef, $v);")
  }
  override protected def withNewChildInternal(c: Expression): BroadcastSetContainsExpr =
    copy(child = c)
}

/** Spatial joins over cell indexes (north rule J2/J3): candidate pairs via
  * cell equi-join (Catalyst plans a hash shuffle join — or broadcast when one
  * side is small), exact refinement predicates after.
  *
  * Scale design (100 TB / 10^12 rows):
  *  - the only shuffle is the cell equi-join; both sides are keyed by the
  *    same cell id so AQE can coalesce/skew-split at runtime;
  *  - cover level trades replication (poly side ×|cover|) against candidate
  *    fan-in (points per cell) — [[PipJoin.coverLevelFor]] picks it from the
  *    polygon bbox so each polygon covers O(1..tens) of cells;
  *  - dense-cell skew (urban hotspots) is handled by salting: hot cells
  *    detected by a cheap count pass, point side salted, candidate side
  *    replicated only for the hot cells ([[PipJoin.pointInPolygonSalted]]).
  */
object SpatialJoin {

  def ray_cast(px: Column, py: Column, xs: Column, ys: Column): Column =
    GraftColumns.column(RayCastExpr(
      GraftColumns.expression(px.cast(DoubleType)),
      GraftColumns.expression(py.cast(DoubleType)),
      GraftColumns.expression(xs), GraftColumns.expression(ys)))

  def ray_cast_multi(px: Column, py: Column, xss: Column, yss: Column): Column =
    GraftColumns.column(RayCastMultiExpr(
      GraftColumns.expression(px.cast(DoubleType)),
      GraftColumns.expression(py.cast(DoubleType)),
      GraftColumns.expression(xss), GraftColumns.expression(yss)))

  /** Small hot sets embed as In/InSet literals (fastest probe); large ones
    * switch to the broadcast-backed expression so plan size stays O(1) —
    * the hot-set size is bounded only by nPoints / hotThreshold, which at
    * 10^9+ points can reach millions of cells.
    */
  private val InSetLiteralCap = 1024
  private def hotPredicate(cell: Column,
      hotB: org.apache.spark.broadcast.Broadcast[Set[Long]]): Column = {
    val hot = hotB.value
    if (hot.isEmpty) lit(false)
    else if (hot.size <= InSetLiteralCap) cell.isin(hot.toSeq: _*)
    else GraftColumns.column(BroadcastSetContainsExpr(
      GraftColumns.expression(cell.cast(LongType)), hotB))
  }

  // ---------------- J2: point-in-polygon ----------------

  /** Candidate cells of a polygon bbox at `level` (S2 superset cover). */
  private def coverCells(xs: Seq[Double], ys: Seq[Double], level: Int): Seq[Long] =
    S2.coverBBox(xs.min, ys.min, xs.max, ys.max, level)

  /** Pick the S2 cover level so a bbox of the given size covers O(1..9)
    * cells: smallest level whose avg cell edge is >= half the bbox diagonal
    * extent, clamped to [6, 16].
    */
  def coverLevelFor(maxExtentDegrees: Double): Int = {
    var l = 16
    while (l > 6 && S2.avgEdgeDegrees(l) < maxExtentDegrees) l -= 1
    l
  }

  /** Point-in-polygon join.
    *
    * @param points (point_id, lng, lat) — any extra columns pass through
    * @param polys  (poly_id, xs: array<double>, ys: array<double>) one outer
    *               ring per row, packed coordinate arrays
    * @param level  S2 cover/probe level; None = derive per the max polygon
    *               extent via an initial cheap aggregate
    * @return (point columns..., poly_id) — one row per (point, containing
    *         polygon) pair
    */
  def pointInPolygon(points: DataFrame, polys: DataFrame,
                     level: Option[Int] = None,
                     broadcastPolys: Boolean = true): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val lvl = level.getOrElse {
      val extRow = polys.select(
        max(greatest(
          array_max(col("xs")) - array_min(col("xs")),
          array_max(col("ys")) - array_min(col("ys"))))).head()
      // empty polys aggregate to NULL — any level yields the correct empty join
      val ext = if (extRow.isNullAt(0)) 1e-6 else extRow.getDouble(0)
      coverLevelFor(math.max(ext, 1e-6))
    }
    // poly side: explode the bbox cover (flatMap — a typed generator).
    // Geometry is NEVER replicated per cover cell (see
    // [[pointInPolygonMulti]] for the measured rationale): the cell join
    // carries only flat (cell, poly_id, bbox) rows, a fused inclusive-bbox
    // filter drops the cell-slop candidates, and only survivors fetch the
    // ring arrays via the poly_id equi-join feeding the exact refine.
    val polyCells = polys
      .select(col("poly_id"), col("xs"), col("ys"))
      .as[(Long, Array[Double], Array[Double])]
      .flatMap { case (pid, xs, ys) =>
        coverCells(xs.toSeq, ys.toSeq, lvl)
          .map(c => (c, pid, xs.min, xs.max, ys.min, ys.max))
      }
      .toDF("cell", "poly_id", "bxmin", "bxmax", "bymin", "bymax")
    val rings = polys.select(col("poly_id"), col("xs"), col("ys"))
    val probe = points.withColumn("cell",
      graft.functions.cells.s2_cell(col("lng"), col("lat"), lit(lvl)))
    val cand = (if (broadcastPolys) probe.join(broadcast(polyCells), Seq("cell"))
                else probe.join(polyCells, Seq("cell")))
      .filter(col("lng") >= col("bxmin") && col("lng") <= col("bxmax") &&
        col("lat") >= col("bymin") && col("lat") <= col("bymax"))
      .drop("cell", "bxmin", "bxmax", "bymin", "bymax")
    val withRings = if (broadcastPolys) cand.join(broadcast(rings), Seq("poly_id"))
                    else cand.join(rings, Seq("poly_id"))
    withRings.filter(ray_cast(col("lng"), col("lat"), col("xs"), col("ys")))
      .drop("xs", "ys")
  }

  /** [[pointInPolygon]] for MULTI-RING geometries — Polygon with holes and
    * MultiPolygon, the two reference-accepted shapes (src/types.ts:33-40)
    * the single-ring join cannot answer (a lake-hole point would wrongly
    * report inside). The S2 cover comes from the hull bbox over ALL rings
    * (holes lie inside the shell bbox, so the cover stays a candidate
    * superset); the exact refine is the codegen'd multi-ring even-odd
    * [[ray_cast_multi]].
    *
    * Join shape (the 100 TB point): geometry is NEVER replicated per cover
    * cell. The cell join carries only `(cell, poly_id, bbox)` — 40 flat
    * bytes — so geometry bytes stay proportional to the polygon COUNT, not
    * count × cover size; a fused bbox pre-filter drops the cell-slop
    * candidates (measured 6.5× here: 12.4M cell candidates → 1.9M bbox
    * survivors at sf0.1), and only the survivors fetch the ring arrays via
    * a second equi-join on `poly_id` (broadcast when the polygon table is,
    * shuffle otherwise). Dense-overlap fixtures previously dragged ~200 B
    * of nested rings through every slop candidate — 13.9 s → ~4 s.
    *
    * @param polys (poly_id, xss: array<array<double>>, yss) — ring r is
    *              (xss[r], yss[r]); shells and holes in any order (even-odd)
    */
  def pointInPolygonMulti(points: DataFrame, polys: DataFrame,
                          level: Option[Int] = None,
                          broadcastPolys: Boolean = true): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val flatXs = flatten(col("xss")); val flatYs = flatten(col("yss"))
    val lvl = level.getOrElse {
      val extRow = polys.select(
        max(greatest(
          array_max(flatXs) - array_min(flatXs),
          array_max(flatYs) - array_min(flatYs)))).head()
      val ext = if (extRow.isNullAt(0)) 1e-6 else extRow.getDouble(0)
      coverLevelFor(math.max(ext, 1e-6))
    }
    val polyCells = polys
      .select(col("poly_id"), col("xss"), col("yss"))
      .as[(Long, Array[Array[Double]], Array[Array[Double]])]
      .flatMap { case (pid, xss, yss) =>
        val xs = xss.flatten; val ys = yss.flatten
        coverCells(xs.toSeq, ys.toSeq, lvl)
          .map(c => (c, pid, xs.min, xs.max, ys.min, ys.max))
      }
      .toDF("cell", "poly_id", "bxmin", "bxmax", "bymin", "bymax")
    val rings = polys.select(col("poly_id"), col("xss"), col("yss"))
    val probe = points.withColumn("cell",
      graft.functions.cells.s2_cell(col("lng"), col("lat"), lit(lvl)))
    val cand = (if (broadcastPolys) probe.join(broadcast(polyCells), Seq("cell"))
                else probe.join(polyCells, Seq("cell")))
      // inclusive bbox keeps every point the even-odd refine could accept
      // (all rings lie within the hull bbox), so results are identical
      .filter(col("lng") >= col("bxmin") && col("lng") <= col("bxmax") &&
        col("lat") >= col("bymin") && col("lat") <= col("bymax"))
      .drop("cell", "bxmin", "bxmax", "bymin", "bymax")
    val withRings = if (broadcastPolys) cand.join(broadcast(rings), Seq("poly_id"))
                    else cand.join(rings, Seq("poly_id"))
    withRings.filter(ray_cast_multi(col("lng"), col("lat"), col("xss"), col("yss")))
      .drop("xss", "yss")
  }

  /** Skew-aware PIP: detect cells holding more than `hotThreshold` points,
    * salt the point side on those cells, replicate candidate polygons only
    * for hot cells (adaptive replication — the salted-repartition analog of
    * AQE skew-join, but applied before the join so the replication factor is
    * explicit and bounded).
    */
  def pointInPolygonSalted(points: DataFrame, polys: DataFrame, level: Int,
                           hotThreshold: Long, salt: Int): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val probe0 = points.withColumn("cell",
      graft.functions.cells.s2_cell(col("lng"), col("lat"), lit(level)))
    val hot = probe0.groupBy("cell").count()
      .filter(col("count") > hotThreshold).select("cell")
      .as[Long].collect().toSet
    val hotB = spark.sparkContext.broadcast(hot)
    // codegen'd membership (In/InSet literals or the broadcast-backed
    // expression — never a Scala UDF, which would break codegen on the
    // probe-side projection)
    val isHotProbe = hotPredicate(col("cell"), hotB)
    val probe = probe0.withColumn("salt",
      when(isHotProbe, pmod(col("point_id").cast(LongType), lit(salt)))
        .otherwise(lit(0L)))
    // flat (cell, salt, poly_id, bbox) rows only: geometry is never
    // replicated through the cover × salt fan-out (salt multiplies the
    // replication, so the late ring fetch matters MORE here than in the
    // unsalted join); rings join the bbox survivors on poly_id
    val polyCells = polys
      .select(col("poly_id"), col("xs"), col("ys"))
      .as[(Long, Array[Double], Array[Double])]
      .flatMap { case (pid, xs, ys) =>
        coverCells(xs.toSeq, ys.toSeq, level).flatMap { c =>
          val copies = if (hotB.value.contains(c)) 0 until salt else 0 until 1
          copies.map(sv => (c, sv.toLong, pid, xs.min, xs.max, ys.min, ys.max))
        }
      }
      .toDF("cell", "salt", "poly_id", "bxmin", "bxmax", "bymin", "bymax")
    val rings = polys.select(col("poly_id"), col("xs"), col("ys"))
    probe.join(polyCells, Seq("cell", "salt"))
      .filter(col("lng") >= col("bxmin") && col("lng") <= col("bxmax") &&
        col("lat") >= col("bymin") && col("lat") <= col("bymax"))
      .drop("cell", "salt", "bxmin", "bxmax", "bymin", "bymax")
      .join(broadcast(rings), Seq("poly_id"))
      .filter(ray_cast(col("lng"), col("lat"), col("xs"), col("ys")))
      .drop("xs", "ys")
  }

  /** Adaptive cell-splitting PIP (north rule: "salted repartitioning and
    * adaptive cell-splitting"): cells whose point count exceeds
    * `hotThreshold` are re-indexed at a finer level on BOTH sides, so a
    * dense cell's candidate join fans out across finer cells (more
    * parallelism, and polygons covering only part of the dense cell stop
    * receiving all of its points). The split depth is gated on MEASURED
    * density — ceil(log4(peakCount / hotThreshold)), capped by
    * `splitLevels` — so mildly-hot data does not pay the full cover
    * fan-out. Cold cells join at the coarse level unchanged; results are
    * the exact union.
    */
  def pointInPolygonAdaptive(points: DataFrame, polys: DataFrame, level: Int,
                             hotThreshold: Long, splitLevels: Int = 2): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val probe0 = points.withColumn("cell",
      graft.functions.cells.s2_cell(col("lng"), col("lat"), lit(level)))
    val hotCounts = probe0.groupBy("cell").count()
      .filter(col("count") > hotThreshold)
      .as[(Long, Long)].collect()
    val hot = hotCounts.map(_._1).toSet
    // gate split depth on MEASURED density, capped by the caller's
    // splitLevels: each split level quarters a cell, so depth
    // ceil(log4(peak / threshold)) is what's needed to bring the densest
    // cell back under the threshold — mildly-hot data must not pay the full
    // 4^splitLevels cover fan-out
    val peak = if (hotCounts.isEmpty) 0L else hotCounts.map(_._2).max
    val densityDepth = if (peak <= hotThreshold) 1
      else math.ceil(math.log(peak.toDouble / hotThreshold) / math.log(4.0)).toInt
    val effSplit = math.max(1, math.min(splitLevels, densityDepth))
    val fine = level + effSplit
    val hotB = spark.sparkContext.broadcast(hot)
    val isHotProbe = hotPredicate(col("cell"), hotB)
    // point side: hot cells re-key at the fine level (cheap: one more
    // latLngToCell; isin keeps the projection codegen'd), cold cells keep
    // the coarse key
    val probe = probe0.withColumn("jcell",
      when(isHotProbe,
        graft.functions.cells.s2_cell(col("lng"), col("lat"), lit(fine)))
        .otherwise(col("cell")))
      .drop("cell")
    // polygon side: cover at the coarse level; covers landing on a hot cell
    // expand to the fine cells inside it. The fine cover is computed ONCE
    // per polygon and grouped by coarse parent — recomputing it per hot
    // cover cell is quadratic in cover size and was a 50× slowdown.
    val polyCells = polys
      .select(col("poly_id"), col("xs"), col("ys"))
      .as[(Long, Array[Double], Array[Double])]
      .flatMap { case (pid, xs, ys) =>
        def row(c: Long) = (c, pid, xs.min, xs.max, ys.min, ys.max)
        val coarse = coverCells(xs.toSeq, ys.toSeq, level)
        if (!coarse.exists(hotB.value.contains)) coarse.map(row)
        else {
          val fineByParent = S2.coverBBox(xs.min, ys.min, xs.max, ys.max, fine)
            .groupBy(fc => S2.parent(fc, level))
          coarse.flatMap { c =>
            if (hotB.value.contains(c))
              fineByParent.getOrElse(c, Nil).map(row)
            else Seq(row(c))
          }
        }
      }
      .toDF("jcell", "poly_id", "bxmin", "bxmax", "bymin", "bymax")
    val rings = polys.select(col("poly_id"), col("xs"), col("ys"))
    probe.join(polyCells, Seq("jcell"))
      .filter(col("lng") >= col("bxmin") && col("lng") <= col("bxmax") &&
        col("lat") >= col("bymin") && col("lat") <= col("bymax"))
      .drop("jcell", "bxmin", "bxmax", "bymin", "bymax")
      .join(broadcast(rings), Seq("poly_id"))
      .filter(ray_cast(col("lng"), col("lat"), col("xs"), col("ys")))
      .drop("xs", "ys")
  }

  // ---------------- J5: within-distance (range) join ----------------

  /** Hex resolution whose cell edge best matches `radius`: the finest res
    * with edge ≥ radius, so each probe replicates to a disk of O(7) cells
    * while per-cell candidate density stays proportional to the query area.
    */
  def rangeResFor(radius: Double): Int = {
    var r = 0
    while (r < Hex.MaxRes && Hex.edge(r + 1) >= radius) r += 1
    r
  }

  /** Within-distance (range) join: every (probe, target) pair with planar
    * squared degree distance ≤ radius². The classic spatial range join the
    * reference cannot express — generalizes its single-point lookup to
    * "all points near X" analytics (geofencing, catchment areas).
    *
    * Scale shape (the only shuffle is one cell equi-join, same contract as
    * J2): the PROBE side replicates to the hex cells of `gridDisk(cell, R)` —
    * R chosen so [[Hex.ringLowerBoundDegrees]] proves any cell outside the
    * disk is strictly farther than `radius` from every point of the probe's
    * cell (the same bound that makes kNN ring pruning exact) — while the
    * (usually much larger) TARGET side is keyed by its own cell only, never
    * replicated. Both sides shuffle on the cell id, so AQE can coalesce or
    * skew-split the join at runtime; dense-cell salting composes exactly as
    * in [[pointInPolygonSalted]] if a probe hotspot demands it. With the
    * default resolution ([[rangeResFor]]) the disk is 7 cells (R = 1).
    *
    * @param probes  (probe_id, lng, lat)
    * @param targets (target_id, lng, lat)
    * @param radius  planar degree radius (> 0)
    * @param res     hex resolution; None = [[rangeResFor]](radius)
    * @return (probe_id, target_id, dist2), dist2 ≤ radius²
    */
  def withinDistance(probes: DataFrame, targets: DataFrame, radius: Double,
                     res: Option[Int] = None): DataFrame = {
    require(radius > 0, s"radius must be > 0, got $radius")
    val spark = probes.sparkSession
    import spark.implicits._
    val lvl = res.getOrElse(rangeResFor(radius))
    var rings = 1
    while (Hex.ringLowerBoundDegrees(lvl, rings + 1) <= radius) rings += 1
    val r2 = radius * radius
    val cand = probes
      .select(col("probe_id").cast(LongType), col("lng").cast(DoubleType),
        col("lat").cast(DoubleType)).as[(Long, Double, Double)]
      .flatMap { case (pid, plng, plat) =>
        Hex.gridDisk(Hex.latLngToCell(plng, plat, lvl), rings)
          .map(c => (c, pid, plng, plat))
      }
      .toDF("cell", "probe_id", "plng", "plat")
    val tgt = targets
      .select(col("target_id").cast(LongType), col("lng").cast(DoubleType).as("tlng"),
        col("lat").cast(DoubleType).as("tlat"))
      .withColumn("cell", graft.functions.cells.hex_cell(col("tlng"), col("tlat"), lit(lvl)))
    cand.join(tgt, Seq("cell"))
      .select(col("probe_id"), col("target_id"),
        ((col("tlng") - col("plng")) * (col("tlng") - col("plng")) +
         (col("tlat") - col("plat")) * (col("tlat") - col("plat"))).as("dist2"))
      .filter(col("dist2") <= lit(r2))
  }

  /** [[withinDistance]] with a GEODESIC (meter) radius: the hex-disk cover
    * widens to [[graft.geo.Geodesic.coverDegreesFor]]'s safe planar superset
    * (longitude degrees shrink by cos lat), and the exact refine keeps pairs
    * whose polynomial-haversine term t stays under sinP(radius/2R)² — all
    * pure arithmetic, oracle-replayable.
    *
    * @return (probe_id, target_id, dist_m), dist_m ≤ radiusMeters
    */
  def withinDistanceGeodesic(probes: DataFrame, targets: DataFrame,
                             radiusMeters: Double,
                             res: Option[Int] = None): DataFrame = {
    import graft.geo.Geodesic
    require(radiusMeters > 0, s"radius must be > 0, got $radiusMeters")
    val spark = probes.sparkSession
    import spark.implicits._
    val phiCap = {
      val t = targets.select(max(abs(col("lat")))).head()
      val p = probes.select(max(abs(col("lat")))).head()
      math.max(if (t.isNullAt(0)) 0.0 else t.getDouble(0),
        if (p.isNullAt(0)) 0.0 else p.getDouble(0))
    }
    val coverDeg = Geodesic.coverDegreesFor(radiusMeters, phiCap)
    val lvl = res.getOrElse(rangeResFor(coverDeg))
    var rings = 1
    while (Hex.ringLowerBoundDegrees(lvl, rings + 1) <= coverDeg) rings += 1
    val sinHalf = Geodesic.sinP(radiusMeters / (2.0 * Geodesic.EarthRadiusM))
    val tThr = sinHalf * sinHalf
    val cand = probes
      .select(col("probe_id").cast(LongType), col("lng").cast(DoubleType),
        col("lat").cast(DoubleType)).as[(Long, Double, Double)]
      .flatMap { case (pid, plng, plat) =>
        Hex.gridDisk(Hex.latLngToCell(plng, plat, lvl), rings)
          .map(c => (c, pid, plng, plat))
      }
      .toDF("cell", "probe_id", "plng", "plat")
    val tgt = targets
      .select(col("target_id").cast(LongType), col("lng").cast(DoubleType).as("tlng"),
        col("lat").cast(DoubleType).as("tlat"))
      .withColumn("cell", graft.functions.cells.hex_cell(col("tlng"), col("tlat"), lit(lvl)))
    cand.join(tgt, Seq("cell"))
      .select(col("probe_id"), col("target_id"),
        Geodesic.havT(col("plng"), col("plat"), col("tlng"), col("tlat")).as("t"))
      .filter(col("t") <= lit(tThr))
      .select(col("probe_id"), col("target_id"),
        Geodesic.metersFromT(col("t")).as("dist_m"))
  }

  /** DBSCAN density clustering (Ester et al., KDD'96 — the published
    * algorithm) over planar points, composed entirely from the engine's
    * scale primitives so every stage is key-bounded:
    *
    *  1. ε-neighbor pairs from [[withinDistance]]'s hex-disk cover — ONE
    *     cell equi-join, never all-pairs;
    *  2. core points by neighbor count (`|N_ε(p)| ≥ minPts`, the point
    *     itself included — the classic convention);
    *  3. clusters = connected components of the core–core ε-graph via
    *     [[TextDedup.connectedComponentsStar]] (large-star/small-star,
    *     O(log n) rounds regardless of cluster diameter — a snaking
    *     density ridge doesn't serialize the job);
    *  4. border points (non-core with ≥ 1 core ε-neighbor) join the MIN
    *     adjacent core's cluster label — the textbook algorithm leaves
    *     border assignment scan-order-dependent; taking the min makes it
    *     deterministic and engine-independent (the oracle contract).
    *
    * Cluster labels are the min core point id of the component. Noise rows
    * keep a NULL cluster.
    *
    * @param points (pid, lng, lat)
    * @param eps    ε radius in planar degrees
    * @param minPts density threshold, self included
    * @return (pid, role ∈ core|border|noise, cluster — null for noise)
    */
  def dbscan(points: DataFrame, eps: Double, minPts: Int): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1: $minPts")
    val pts = points.select(col("pid").cast(LongType),
      col("lng").cast(DoubleType), col("lat").cast(DoubleType))
    val pairs = withinDistance(
        pts.select(col("pid").as("probe_id"), col("lng"), col("lat")),
        pts.select(col("pid").as("target_id"), col("lng"), col("lat")), eps)
      .filter(col("probe_id") =!= col("target_id"))
      .select(col("probe_id"), col("target_id"))
      .localCheckpoint(false)
    val nNbr = pairs.groupBy(col("probe_id").as("pid"))
      .agg(count(lit(1)).as("n_nbr"))
    val flagged = pts.join(nNbr, Seq("pid"), "left")
      .withColumn("is_core",
        coalesce(col("n_nbr"), lit(0L)) + 1 >= lit(minPts.toLong))
      .select("pid", "is_core")
    val coreIds = flagged.filter(col("is_core")).select("pid")
      .localCheckpoint(false)
    val coreEdges = pairs
      .join(coreIds.select(col("pid").as("probe_id")), Seq("probe_id"), "left_semi")
      .join(coreIds.select(col("pid").as("target_id")), Seq("target_id"), "left_semi")
      .select(col("probe_id").as("doc_a"), col("target_id").as("doc_b"))
    val comp = TextDedup.connectedComponentsStar(coreEdges,
        coreIds.select(col("pid").as("doc_id")))
      .select(col("doc_id").as("pid"), col("comp").as("ccluster"))
    val borderLbl = pairs
      .join(comp.select(col("pid").as("target_id"), col("ccluster")),
        Seq("target_id"))
      .groupBy(col("probe_id").as("pid"))
      .agg(min("ccluster").as("bcluster"))
    flagged.join(comp, Seq("pid"), "left")
      .join(borderLbl, Seq("pid"), "left")
      .select(col("pid"),
        when(col("is_core"), lit("core"))
          .when(col("bcluster").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        when(col("is_core"), col("ccluster"))
          .otherwise(col("bcluster")).as("cluster"))
  }

  // ---------------- J3: kNN (cell-ring expansion, distance-bounded) ----------------

  /** kNN join: for each probe, the k nearest targets by planar squared
    * degree distance (ties by target_id). Cell-ring expansion over the hex
    * index in GEOMETRIC ring batches (0–1 | 2–4 | 5–8 | 9–maxRings):
    * candidate cells of a whole batch join on hex cell at once, so the
    * driver loop is ≤ 4 rounds instead of one per ring — at 10^9 probes the
    * per-round driver barrier and job-scheduling overhead dominates
    * single-ring expansion. A probe stops expanding when it holds >= k
    * neighbors whose kth distance is below the lower bound of the first
    * unexplored ring (distance-bounded pruning, north rule J3).
    *
    * Incremental ranking: only the running top-k per pending probe (`best`,
    * <= k rows/probe) carries across rounds — never the full accumulated
    * candidate set — so each round's window re-rank is O(batch candidates +
    * k·pending), not O(all candidates ever seen). Dropping a candidate that
    * ranked > k is exact: the candidate set only grows, so nothing outside
    * the running top-k can re-enter it.
    *
    * @param probes  (probe_id, lng, lat)
    * @param targets (target_id, lng, lat)
    * @param res     hex resolution; pick so E[targets/cell] ≈ k
    */
  def knn(probes: DataFrame, targets: DataFrame, k: Int, res: Int,
          maxRings: Int = 12): DataFrame =
    knnImpl(probes, targets, k, res, maxRings,
      dist = (plng, plat, tlng, tlat) =>
        (tlng - plng) * (tlng - plng) + (tlat - plat) * (tlat - plat),
      settleBound = d => d * d)

  /** [[knn]] ranked by GEODESIC (meter) distance — the hex cells stay the
    * pruning structure, only the refine metric changes (VERDICT r3 #5). The
    * ranking value is the monotone haversine term [[graft.geo.Geodesic.havT]]
    * (polynomial kernels — bit-replayable by the oracle; Geodesic scaladoc
    * has the accuracy envelope), the settle bound is the conservative
    * [[graft.geo.Geodesic.tLowerBound]] at the workload's max |lat| (at
    * extreme polar caps the bound degrades toward the exact brute-force
    * fallback — correct, just less pruned).
    *
    * @return (probe_id, target_id, rank, dist_m) — rank by (t, target_id),
    *         dist_m = polynomial-haversine meters
    */
  def knnGeodesic(probes: DataFrame, targets: DataFrame, k: Int, res: Int,
                  maxRings: Int = 12): DataFrame = {
    import graft.geo.Geodesic
    val phiCap = {
      val t = targets.select(max(abs(col("lat")))).head()
      val p = probes.select(max(abs(col("lat")))).head()
      math.max(if (t.isNullAt(0)) 0.0 else t.getDouble(0),
        if (p.isNullAt(0)) 0.0 else p.getDouble(0))
    }
    knnImpl(probes, targets, k, res, maxRings,
      dist = Geodesic.havT,
      settleBound = d => Geodesic.tLowerBound(d, phiCap))
      .select(col("probe_id"), col("target_id"), col("rank"),
        Geodesic.metersFromT(col("dist2")).as("dist_m"))
  }

  private def knnImpl(probes: DataFrame, targets: DataFrame, k: Int, res: Int,
                      maxRings: Int,
                      dist: (Column, Column, Column, Column) => Column,
                      settleBound: Double => Double): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    val tgt = targets
      .select(col("target_id").cast(LongType), col("lng").cast(DoubleType).as("tlng"),
        col("lat").cast(DoubleType).as("tlat"))
      .withColumn("tcell", graft.functions.cells.hex_cell(col("tlng"), col("tlat"), lit(res)))
      .persist()
    val totalTargets = tgt.count()

    var pending = probes
      .select(col("probe_id").cast(LongType), col("lng").cast(DoubleType),
        col("lat").cast(DoubleType)).as[(Long, Double, Double)]
    var best: DataFrame = null // running top-k of still-pending probes
    val doneParts = scala.collection.mutable.ArrayBuffer[DataFrame]()
    // first batch is disk(1), NOT the center cell alone: the lower bound of
    // ring 1 is 0 (a ring-1 cell can touch the center cell), so a (0,0)
    // batch can never settle a probe and only adds a wasted driver round
    val batches = Seq((0, 1), (2, 4), (5, 8), (9, maxRings))
      .filter(_._1 <= maxRings)
      .map { case (lo, hi) => (lo, math.min(hi, maxRings)) }
    val it = batches.iterator
    while (it.hasNext && totalTargets > 0 && !pending.isEmpty) {
      val (lo, hi) = it.next()
      // candidate cells of rings lo..hi for every pending probe (rings are
      // disjoint across batches, so every (probe, target) pair appears once)
      val cand = pending.flatMap { case (pid, plng, plat) =>
        val c = Hex.latLngToCell(plng, plat, res)
        val cells =
          if (lo == 0) Hex.gridDisk(c, hi)
          else (lo to hi).flatMap(r => Hex.gridRing(c, r))
        cells.map(cc => (pid, plng, plat, cc))
      }.toDF("probe_id", "plng", "plat", "tcell")
      val pairs = cand.join(tgt, Seq("tcell"))
        .select(col("probe_id"), col("plng"), col("plat"), col("target_id"),
          dist(col("plng"), col("plat"), col("tlng"), col("tlat")).as("dist2"))
      // re-rank running top-k ∪ this batch's candidates; localCheckpoint cuts
      // the compounding lineage (the loop is driver-side but every step is a
      // distributed job)
      val all = if (best == null) pairs else best.unionAll(pairs)
      val w = Window.partitionBy(col("probe_id")).orderBy(col("dist2"), col("target_id"))
      val ranked = all.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k).localCheckpoint(true)
      // a probe is settled when its kth candidate beats the lower bound of
      // every ring past `hi`. strict <: at dist2 == b2 an unexplored
      // equal-distance target with a smaller id could still outrank the kth
      // under the (dist2, id) order. Probes that can never settle this way
      // (fewer than k targets in all rings) ride through the loop cheaply
      // and are finished exactly by the brute-force fallback below.
      val b2 = settleBound(Hex.ringLowerBoundDegrees(res, hi + 1))
      val doneIds = ranked.filter(col("rk") === k && col("dist2") < lit(b2))
        .select("probe_id").localCheckpoint(true)
      doneParts += ranked.join(doneIds, Seq("probe_id"))
        .select(col("probe_id"), col("target_id"), col("rk").as("rank"), col("dist2"))
      pending = pending.toDF("probe_id", "lng", "lat")
        .join(doneIds, Seq("probe_id"), "left_anti").as[(Long, Double, Double)]
        .localCheckpoint(true)
      best = ranked.join(doneIds, Seq("probe_id"), "left_anti").drop("rk")
    }
    // probes still unsettled after maxRings (rings exhausted without the
    // bound closing — sparse/far targets, or fewer than k targets in range)
    // get an EXACT brute-force pass so the "k nearest per probe" contract
    // holds unconditionally. Broadcast whichever side is SMALL (usually the
    // ring-pruned pending probes; with a tiny target table — where NO probe
    // can ever settle and pending is everything — the target side); if both
    // sides are genuinely large the partitioned cartesian is the honest
    // plan, never a forced driver-side broadcast of an unbounded set.
    if (totalTargets > 0 && !pending.isEmpty) {
      // byte-based broadcast gate (a row cap alone ignores row width): a
      // materialized UnsafeRow here is ~(8B null bitmap + 8B per field) ≈
      // 32-40 B plus object overhead, call it 64 B — 64 MB budget ⇒ ~1M
      // rows, a driver/executor footprint Spark's broadcast machinery
      // handles comfortably. Past it the partitioned cartesian is the
      // honest plan.
      val broadcastMaxBytes = 64L << 20
      val estRowBytes = 64L
      val broadcastLimit = broadcastMaxBytes / estRowBytes
      val pendDf0 = pending.toDF("probe_id", "plng", "plat")
      val nPending = pendDf0.count()
      val pairs0 =
        if (nPending <= broadcastLimit) broadcast(pendDf0).crossJoin(tgt)
        else if (totalTargets <= broadcastLimit) pendDf0.crossJoin(broadcast(tgt))
        else pendDf0.crossJoin(tgt)
      val pairs = pairs0
        .select(col("probe_id"), col("target_id"),
          dist(col("plng"), col("plat"), col("tlng"), col("tlat")).as("dist2"))
      val w = Window.partitionBy(col("probe_id")).orderBy(col("dist2"), col("target_id"))
      doneParts += pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .select(col("probe_id"), col("target_id"), col("rank"), col("dist2"))
        .localCheckpoint(true)
    }
    tgt.unpersist()
    if (doneParts.isEmpty)
      spark.emptyDataset[(Long, Long, Int, Double)]
        .toDF("probe_id", "target_id", "rank", "dist2")
    else doneParts.reduceLeft(_ unionAll _)
  }

  // ---------------- J6: polygon-polygon intersection join ----------------

  /** 2D orientation determinant as a SQL-expr fragment: >0 iff c is left of
    * a→b. Operand order is part of the cross-engine contract.
    */
  private def orientSql(ax: String, ay: String, bx: String, by: String,
                        cx: String, cy: String): String =
    s"((($bx) - ($ax)) * (($cy) - ($ay)) - ((($by) - ($ay)) * (($cx) - ($ax))))"

  /** q inside the CCW convex ring (pxs, pys): left-of (or on) every edge. */
  private def vertexInSql(pxs: String, pys: String,
                          qx: String, qy: String): String =
    s"""forall(sequence(1, size($pxs)), i -> ${orientSql(
      s"element_at($pxs, i)", s"element_at($pys, i)",
      s"element_at($pxs, (i % size($pxs)) + 1)",
      s"element_at($pys, (i % size($pxs)) + 1)", qx, qy)} >= 0D)"""

  /** Convex-ring intersection predicate over packed coordinate arrays
    * (axs, ays) × (bxs, bys), both CCW: any vertex containment either way,
    * or any PROPER edge crossing. Semantics are CLOSED-set intersection:
    * the vertex test is boundary-inclusive (orient >= 0), so rings sharing
    * just a vertex or touching edge-on-edge DO count as intersecting (any
    * convex touch puts some vertex on the other ring's boundary); only the
    * edge-crossing arm is strict (sign products < 0), which is subsumed by
    * the vertex arm for touches. Deterministic in both engines either way.
    */
  private[graft] def intersectsSql(axs: String, ays: String,
                                   bxs: String, bys: String): String = {
    def edge(xs: String, ys: String, i: String) = (
      s"element_at($xs, $i)", s"element_at($ys, $i)",
      s"element_at($xs, (($i) % size($xs)) + 1)",
      s"element_at($ys, (($i) % size($xs)) + 1)")
    val (a1x, a1y, a2x, a2y) = edge(axs, ays, "i")
    val (b1x, b1y, b2x, b2y) = edge(bxs, bys, "j")
    val o1 = orientSql(a1x, a1y, a2x, a2y, b1x, b1y)
    val o2 = orientSql(a1x, a1y, a2x, a2y, b2x, b2y)
    val o3 = orientSql(b1x, b1y, b2x, b2y, a1x, a1y)
    val o4 = orientSql(b1x, b1y, b2x, b2y, a2x, a2y)
    val cross =
      s"""exists(sequence(1, size($axs)), i ->
            exists(sequence(1, size($bxs)), j ->
              ($o1) * ($o2) < 0D AND ($o3) * ($o4) < 0D))"""
    val bInA = s"exists(sequence(1, size($bxs)), j -> ${vertexInSql(
      axs, ays, s"element_at($bxs, j)", s"element_at($bys, j)")})"
    val aInB = s"exists(sequence(1, size($axs)), k -> ${vertexInSql(
      bxs, bys, s"element_at($axs, k)", s"element_at($ays, k)")})"
    s"($bInA) OR ($aInB) OR ($cross)"
  }

  /** Polygon↔polygon intersection join for convex CCW rings.
    *
    * Candidates come from a shared S2 superset cover of each ring's bbox —
    * ONE cell equi-join, never a cartesian (two bboxes that overlap share
    * the cell containing any overlap point, so the cover join is a superset
    * of the truth); the exact orientation-sign predicate refines. At scale
    * both sides shuffle once on cell; rings travel as packed arrays and the
    * refine is codegen'd higher-order-function arithmetic, no UDF.
    *
    * @param a (poly_id, xs, ys) left rings, CCW convex
    * @param b (poly_id, xs, ys) right rings, CCW convex
    * @return (poly_a, poly_b) intersecting pairs
    */
  /** Intersecting pairs WITH both coordinate arrays — the shared core of
    * [[polygonJoin]] and [[polygonJoinWithArea]].
    */
  private def polygonJoinPairs(a: DataFrame, b: DataFrame, level: Int): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    def cellsOf(df: DataFrame, idAs: String): DataFrame = df
      .select(col("poly_id").cast(LongType), col("xs").cast("array<double>"),
        col("ys").cast("array<double>"))
      .as[(Long, Seq[Double], Seq[Double])]
      .flatMap { case (id, xs, ys) => coverCells(xs, ys, level).map(c => (c, id)) }
      .toDF("cell", idAs)
    val cand = cellsOf(a, "poly_a").join(cellsOf(b, "poly_b"), Seq("cell"))
      .select("poly_a", "poly_b").distinct()
    cand
      .join(a.select(col("poly_id").as("poly_a"),
        col("xs").cast("array<double>").as("axs"),
        col("ys").cast("array<double>").as("ays")), Seq("poly_a"))
      .join(b.select(col("poly_id").as("poly_b"),
        col("xs").cast("array<double>").as("bxs"),
        col("ys").cast("array<double>").as("bys")), Seq("poly_b"))
      // cheap bbox-overlap pre-filter: the cover cells are coarse (a level-9
      // cell is bigger than a typical ring), so most cell-sharing pairs have
      // disjoint bboxes — reject them with 8 comparisons before the O(n·m)
      // orientation predicate (measured 5x on the 1000x1000 gate: 8.2->1.6 s)
      .filter(array_min(col("axs")) <= array_max(col("bxs")) &&
        array_min(col("bxs")) <= array_max(col("axs")) &&
        array_min(col("ays")) <= array_max(col("bys")) &&
        array_min(col("bys")) <= array_max(col("ays")))
      .filter(expr(intersectsSql("axs", "ays", "bxs", "bys")))
      .select("poly_a", "poly_b", "axs", "ays", "bxs", "bys")
  }

  def polygonJoin(a: DataFrame, b: DataFrame, level: Int = 9): DataFrame =
    polygonJoinPairs(a, b, level).select("poly_a", "poly_b")

  /** [[polygonJoin]] + the exact OVERLAP AREA of each pair via
    * Sutherland–Hodgman clipping ([[graft.geo.ConvexClip]]) — the
    * area-weighted zonal-aggregation primitive (a feature spanning zones
    * contributes proportionally to each). The `b` (clip) rings may be
    * convex OR concave, either winding: concave clip rings ear-clip
    * triangulate and per-triangle areas sum exactly
    * ([[graft.geo.ConvexClip.intersectionAreaGeneral]]);
    * JTS-cross-checked in SpatialJoinSpec on convex AND concave fixtures.
    *
    * @return (poly_a, poly_b, area) for intersecting pairs
    */
  def polygonJoinWithArea(a: DataFrame, b: DataFrame, level: Int = 9): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    polygonJoinPairs(a, b, level)
      .as[(Long, Long, Seq[Double], Seq[Double], Seq[Double], Seq[Double])]
      .map { case (pa, pb, axs, ays, bxs, bys) =>
        (pa, pb, graft.geo.ConvexClip.intersectionAreaGeneral(
          axs.toArray, ays.toArray, bxs.toArray, bys.toArray))
      }
      .toDF("poly_a", "poly_b", "area")
  }

  /** Bounded-radius snap of points onto the nearest line segment — the map-
    * matching primitive (GPS trace → road network). Exact within `radius`:
    * the grid cell size equals the radius, probes search their 3×3 cell
    * ring, and any segment within `radius` of a probe has bbox cover
    * intersecting that ring — so the ring join is a complete candidate set,
    * not a heuristic. One equi-join shuffle on the cell; segments replicate
    * to O(len/radius + 1)² cells, probes to 9.
    *
    * Refinement projects the probe onto each candidate segment
    * (`t = clamp₀₁((p−a)·(b−a)/|b−a|²)`, degenerate segments snap to their
    * `a` endpoint) in a fixed association order, so the doubles are
    * bit-reproducible. Per probe the single nearest segment survives
    * (ties: smaller seg_id); probes with nothing in range emit no row.
    *
    * @param probes (probe_id, px, py)
    * @param segs   (seg_id, x1, y1, x2, y2)
    * @return (probe_id, seg_id, t, dist2)
    */
  def snapToSegments(probes: DataFrame, segs: DataFrame,
                     radius: Double): DataFrame = {
    require(radius > 0, s"radius must be > 0, got $radius")
    val cs = lit(radius)
    val segCells = segs
      .withColumn("gx0", floor(least(col("x1"), col("x2")) / cs).cast("long"))
      .withColumn("gx1", floor(greatest(col("x1"), col("x2")) / cs).cast("long"))
      .withColumn("gy0", floor(least(col("y1"), col("y2")) / cs).cast("long"))
      .withColumn("gy1", floor(greatest(col("y1"), col("y2")) / cs).cast("long"))
      .withColumn("gx", explode(sequence(col("gx0"), col("gx1"))))
      .withColumn("gy", explode(sequence(col("gy0"), col("gy1"))))
      .select("seg_id", "x1", "y1", "x2", "y2", "gx", "gy")
    val probeCells = probes
      .withColumn("pgx", floor(col("px") / cs).cast("long"))
      .withColumn("pgy", floor(col("py") / cs).cast("long"))
      .withColumn("gx", explode(sequence(col("pgx") - 1, col("pgx") + 1)))
      .withColumn("gy", explode(sequence(col("pgy") - 1, col("pgy") + 1)))
      .select("probe_id", "px", "py", "gx", "gy")
    val dxs = col("x2") - col("x1")
    val dys = col("y2") - col("y1")
    val len2 = dxs * dxs + dys * dys
    val dot = (col("px") - col("x1")) * dxs + (col("py") - col("y1")) * dys
    val t = when(len2 > 0.0, least(lit(1.0), greatest(lit(0.0), dot / len2)))
      .otherwise(lit(0.0))
    val cand = probeCells.join(segCells, Seq("gx", "gy"))
      .withColumn("t", t)
      .withColumn("ddx", col("px") - (col("x1") + col("t") * dxs))
      .withColumn("ddy", col("py") - (col("y1") + col("t") * dys))
      .withColumn("dist2", col("ddx") * col("ddx") + col("ddy") * col("ddy"))
      .filter(col("dist2") <= lit(radius * radius))
    // a segment spanning several ring cells yields duplicate candidate rows
    // with identical (t, dist2) — row_number keeps exactly one survivor
    val w = Window.partitionBy("probe_id").orderBy(col("dist2"), col("seg_id"))
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select("probe_id", "seg_id", "t", "dist2")
  }

  /** Dense nearest-site assignment (Voronoi labeling): every point gets its
    * closest of K sites — service-area / catchment assignment. The site set
    * is SMALL by contract (it collects to a literal array; a 10¹²-point
    * scan never shuffles AT ALL): the argmin is an `aggregate` HOF fold
    * over the site array per row — zero joins, zero exchanges, the whole
    * operator is a projection on the scan. For large site sets use [[knn]]
    * (cell-ring pruning) instead — this is the k=1 broadcast complement,
    * the same small-side/big-side split as the tile-index elevation join.
    *
    * (First cut was a broadcast crossJoin + `min(struct(d², site_id))`:
    * Spark's hash aggregate rejects struct-typed min, so the plan fell to
    * a SortAggregate over the K-fanned candidates — 128 s at sf0.1 for
    * what is now 1 s. The HOF fold also keeps the tie rule exact: sites
    * iterate in site_id order and only a STRICTLY smaller d² replaces the
    * accumulator, so ties keep the smaller site_id.)
    *
    * @param points (point_id, lng, lat)
    * @param sites  (site_id, sx, sy) — must fit on the driver
    * @return (point_id, site_id, d2) — ties on d² break to smaller site_id
    */
  def voronoiAssign(points: DataFrame, sites: DataFrame): DataFrame = {
    val siteRows = sites.select(col("site_id").cast("long"),
        col("sx").cast("double"), col("sy").cast("double"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    require(siteRows.nonEmpty, "voronoiAssign needs at least one site")
    val sxs = siteRows.map(_._2).toArray
    val sys = siteRows.map(_._3).toArray
    // codegen'd argmin loop (an `aggregate` HOF fold is interpreted and
    // allocates one struct per site per row — measured 17.8 s where this
    // runs in ~1 s at sf0.1); site_id/d² recompute from the index via
    // literal-array element_at, same IEEE ops as the loop
    val idx = org.apache.spark.sql.graftshim.GraftColumns.column(
      NearestSiteExpr(
        org.apache.spark.sql.graftshim.GraftColumns.expression(
          col("lng").cast("double")),
        org.apache.spark.sql.graftshim.GraftColumns.expression(
          col("lat").cast("double")), sxs, sys))
    val one = col("_vi") + 1
    val sx = element_at(typedLit(sxs.toSeq), one)
    val sy = element_at(typedLit(sys.toSeq), one)
    val ddx = col("lng") - sx
    val ddy = col("lat") - sy
    points.withColumn("_vi", idx)
      .select(col("point_id"),
        element_at(typedLit(siteRows.map(_._1)), one).as("site_id"),
        (ddx * ddx + ddy * ddy).as("d2"))
  }

  /** Inverse-distance-weighted interpolation — the scattered-data gridding
    * primitive (estimate a field at probe locations from irregular
    * observations), complementing [[graft.raster.Bilinear]]'s regular-grid
    * sampling. Same exact-candidate discipline as [[snapToSegments]]: cell
    * size = radius, probes search their 3×3 ring, so every observation
    * within `radius` is found — one equi-join shuffle keyed by the cell.
    *
    * Determinism: weights are `floor(1/d²)` capped at 10¹² (the floor input
    * is one IEEE division, the cap keeps the long sums exact), so the
    * per-probe aggregation is an order-independent integer sum and the
    * interpolated value an integer division. Exact probe/observation
    * coincidences (d² = 0) are EXCLUDED — the caller dedups those
    * separately (standard IDW practice: an exact hit is the value itself).
    *
    * @param probes (probe_id, px, py)
    * @param obs    (x, y, v) — v integral
    * @return (probe_id, n_obs, vsum, wsum, idw_q = vsum div wsum)
    */
  def idwInterpolate(probes: DataFrame, obs: DataFrame,
                     radius: Double): DataFrame = {
    require(radius > 0, s"radius must be > 0, got $radius")
    val cs = lit(radius)
    val obsCells = obs
      .withColumn("gx", floor(col("x") / cs).cast("long"))
      .withColumn("gy", floor(col("y") / cs).cast("long"))
    val probeCells = probes
      .withColumn("pgx", floor(col("px") / cs).cast("long"))
      .withColumn("pgy", floor(col("py") / cs).cast("long"))
      .withColumn("gx", explode(sequence(col("pgx") - 1, col("pgx") + 1)))
      .withColumn("gy", explode(sequence(col("pgy") - 1, col("pgy") + 1)))
      .drop("pgx", "pgy")
    probeCells.join(obsCells, Seq("gx", "gy"))
      .withColumn("ddx", col("px") - col("x"))
      .withColumn("ddy", col("py") - col("y"))
      .withColumn("d2", col("ddx") * col("ddx") + col("ddy") * col("ddy"))
      .filter(col("d2") > 0.0 && col("d2") <= lit(radius * radius))
      .withColumn("wq",
        least(floor(lit(1.0) / col("d2")), lit(1.0e12)).cast("long"))
      .groupBy("probe_id")
      .agg(count(lit(1)).cast("long").as("n_obs"),
        sum(col("wq") * col("v")).cast("long").as("vsum"),
        sum("wq").cast("long").as("wsum"))
      .withColumn("idw_q", expr("vsum div wsum"))
  }

  /** Segment×segment intersection join — the vector-overlay primitive
    * (road/river crossings, trajectory × boundary). Candidates come from a
    * uniform-grid equi-join over each segment's bbox cell cover; the pair
    * is emitted only from the ONE cell containing the upper-left corner of
    * the two bboxes' overlap (the PBSM reference-point rule), so no
    * distinct-shuffle is needed to dedup multi-cell pairs.
    *
    * Refinement is the classic four-orientation test (proper intersection:
    * the endpoints of each segment straddle the other's line), and the
    * crossing point comes from the signed-distance ratio `t = d1/(d1−d2)`
    * — all fixed-order double arithmetic, bit-reproducible. Collinear
    * overlaps and shared endpoints are NOT emitted (proper crossings only
    * — the d·d < 0 strictness), which is the documented contract.
    *
    * @param a (seg_id, x1, y1, x2, y2) — emitted as a_id
    * @param b (seg_id, x1, y1, x2, y2) — emitted as b_id
    * @return (a_id, b_id, ix, iy) one row per properly-crossing pair
    */
  def segmentIntersectJoin(a: DataFrame, b: DataFrame,
                           cellSize: Double): DataFrame = {
    require(cellSize > 0, s"cellSize must be > 0, got $cellSize")
    val cs = lit(cellSize)
    def cover(df: DataFrame, p: String): DataFrame = df
      .select(col("seg_id").as(s"${p}_id"), col("x1").as(s"${p}x1"),
        col("y1").as(s"${p}y1"), col("x2").as(s"${p}x2"), col("y2").as(s"${p}y2"))
      .withColumn(s"${p}x0", least(col(s"${p}x1"), col(s"${p}x2")))
      .withColumn(s"${p}y0", least(col(s"${p}y1"), col(s"${p}y2")))
      .withColumn(s"${p}xm", greatest(col(s"${p}x1"), col(s"${p}x2")))
      .withColumn(s"${p}ym", greatest(col(s"${p}y1"), col(s"${p}y2")))
      .withColumn("gx", explode(sequence(
        floor(col(s"${p}x0") / cs).cast("long"),
        floor(col(s"${p}xm") / cs).cast("long"))))
      .withColumn("gy", explode(sequence(
        floor(col(s"${p}y0") / cs).cast("long"),
        floor(col(s"${p}ym") / cs).cast("long"))))
    def cross(px: Column, py: Column, qx: Column, qy: Column,
              rx: Column, ry: Column): Column =
      (qx - px) * (ry - py) - (qy - py) * (rx - px)
    val d1 = cross(col("bx1"), col("by1"), col("bx2"), col("by2"),
      col("ax1"), col("ay1")) // a1 vs line b
    val d2 = cross(col("bx1"), col("by1"), col("bx2"), col("by2"),
      col("ax2"), col("ay2")) // a2 vs line b
    val d3 = cross(col("ax1"), col("ay1"), col("ax2"), col("ay2"),
      col("bx1"), col("by1")) // b1 vs line a
    val d4 = cross(col("ax1"), col("ay1"), col("ax2"), col("ay2"),
      col("bx2"), col("by2")) // b2 vs line a
    cover(a, "a").join(cover(b, "b"), Seq("gx", "gy"))
      // PBSM reference point: only the cell holding the overlap's min corner
      // emits the pair; any crossing point lies in both bboxes, so that cell
      // is in both covers and the pair is found exactly once
      .filter(col("gx") === floor(greatest(col("ax0"), col("bx0")) / cs).cast("long") &&
        col("gy") === floor(greatest(col("ay0"), col("by0")) / cs).cast("long"))
      .withColumn("d1", d1).withColumn("d2", d2)
      .withColumn("d3", d3).withColumn("d4", d4)
      .filter(col("d1") * col("d2") < 0.0 && col("d3") * col("d4") < 0.0)
      .withColumn("t", col("d1") / (col("d1") - col("d2")))
      .select(col("a_id"), col("b_id"),
        (col("ax1") + col("t") * (col("ax2") - col("ax1"))).as("ix"),
        (col("ay1") + col("t") * (col("ay2") - col("ay1"))).as("iy"))
  }

  /** Per-group convex hull over integer coordinates: the footprint /
    * coverage-outline aggregate (one hull per device, per region, per
    * cluster). Exact Long cross products via [[graft.geo.Hull]] — the
    * minimal vertex set is engine-independent, so the DuckDB oracle can
    * re-derive it from the Carathéodory characterization (not strictly
    * inside any triangle of other points, not strictly between two points
    * on a segment).
    *
    * Scale shape: ONE shuffle keyed by the group; per-group state is that
    * group's deduped point set (the same per-feature bound as GeoJSON
    * reassembly A4). Groups are mutually independent; a group too big for
    * one task should be pre-reduced (e.g. per-partition hulls unioned, then
    * hulled again — hull(hull(A)∪hull(B)) = hull(A∪B)).
    *
    * @param points (gid, x, y) integer coordinates, |x|,|y| < 2³⁰
    * @return (gid, x, y) hull vertices, one row per vertex
    */
  def convexHullPerGroup(points: DataFrame): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    points.select(col("gid").cast("long"), col("x").cast("long"),
        col("y").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (gid, it) =>
        val pts = it.toArray
        val xs = pts.map(_._2); val ys = pts.map(_._3)
        graft.geo.Hull.convexHull(xs, ys).iterator
          .map(i => (gid, xs(i), ys(i)))
      }
      .toDF("gid", "x", "y")
  }

  /** Sort-Tile-Recursive R-tree leaf packing (Leutenegger et al., public)
    * — the bulk-load step of a spatial index build, surfaced as the leaf
    * audit a packing job logs (per-leaf count + bbox; tight, low-overlap
    * leaf rectangles are the whole point of STR). Points are ranked by
    * (xq, point_id), cut into ⌈√L⌉ vertical slices of ⌈n/S⌉ points, and
    * each slice is ranked by (yq, point_id) into leaves of `leafCap`.
    *
    * The global x-rank is computed DISTRIBUTED, never through one window
    * partition: range-repartition on the rank key, sort within partitions,
    * then per-partition offsets (one ≤#partitions-row agg, broadcast back)
    * + the partition-local row_number. Rank values are independent of
    * where the range boundaries fall, so the sampling inside
    * repartitionByRange cannot perturb results. The per-slice y-rank
    * window is key-bounded (≤⌈n/S⌉ rows per slice). One count() action
    * sizes the grid — the same pass a production bulk-loader spends.
    *
    * @param points (point_id, xq, yq) integer-quantized coordinates
    * @return (slice, leaf, n_pts, min_x, max_x, min_y, max_y)
    */
  def strPack(points: DataFrame, leafCap: Int): DataFrame = {
    require(leafCap > 0, s"leafCap must be positive: $leafCap")
    val base = points.select(col("point_id").cast(LongType),
      col("xq").cast(LongType), col("yq").cast(LongType))
    val n = base.count()
    val leaves = (n + leafCap - 1) / leafCap
    val s = math.ceil(math.sqrt(leaves.toDouble)).toLong max 1L
    val sliceSz = (n + s - 1) / s max 1L
    val parts = base
      .repartitionByRange(col("xq"), col("point_id"))
      .sortWithinPartitions("xq", "point_id")
      .withColumn("pid", spark_partition_id())
    val offs = parts.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(
        sum("cnt").over(Window.partitionBy(GlobalRank.boundedPartitionKey(col("pid"))).orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "off")
    val ranked = parts.join(broadcast(offs), "pid")
      .withColumn("xr",
        row_number().over(Window.partitionBy("pid").orderBy("xq", "point_id"))
          .cast(LongType) - 1L + col("off"))
      .withColumn("slice", expr(s"xr DIV ${sliceSz}L"))
    ranked
      .withColumn("yr",
        row_number().over(Window.partitionBy("slice").orderBy("yq", "point_id"))
          .cast(LongType) - 1L)
      .withColumn("leaf", expr(s"yr DIV ${leafCap}L"))
      .groupBy("slice", "leaf")
      .agg(count(lit(1)).as("n_pts"),
        min("xq").as("min_x"), max("xq").as("max_x"),
        min("yq").as("min_y"), max("yq").as("max_y"))
  }
}
