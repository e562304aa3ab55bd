package graft.plans

import graft.functions.{GeohashExpr, HexCellExpr, TileKeyExpr}
import graft.geo.{Geohash, Hex, TileKey}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cell-predicate range derivation — the one custom optimizer rewrite SURVEY
  * §4 calls for beyond Catalyst's built-ins.
  *
  * A predicate on a DERIVED spatial key — `tile_key(lng, lat) = 'N36W119'`,
  * `hex_cell(lng, lat, 7) IN (...)` — cannot reach a parquet scan: the scan
  * only prunes on STORED columns, and the key is computed per-row. But every
  * such predicate implies a rectangle in (lng, lat): a tile key IS the unit
  * floor-box `[swLng, swLng+1) × [swLat, swLat+1)` (exact, reference F4/F9
  * semantics), and a hex cell is contained in its hexagon's bounding box
  * (exact hexagon geometry of the axial Voronoi lattice, + an ulp-scale pad
  * for the FP boundary). This rule conjoins those implied lng/lat range
  * predicates onto the filter, where Catalyst's existing machinery takes
  * over: they push into the scan's `dataFilters`, engage parquet row-group
  * min/max stats, and prune lng/lat-clustered layouts (the layout
  * repartitionByRange produces, and the natural order of per-region
  * ingests) — while the original exact cell predicate still refines row by
  * row, so results never change.
  *
  * Soundness: the ranges are IMPLIED supersets — every row satisfying the
  * cell predicate satisfies them — so conjoining them preserves semantics
  * (on null inputs both old and new conjuncts are null ⇒ filter drops the
  * row either way; on NaN/Infinite coordinates TileKeyExpr/HexCellExpr
  * return NULL by contract, so the cell predicate drops the row just as the
  * derived range does — no finite-range conjunct can contradict a key
  * match, because a non-finite coordinate never produces a key).
  * Idempotent: derived conjuncts already present (by
  * `semanticEquals`) are not re-added, so the fixpoint batch converges on
  * the second pass.
  *
  * Scope: tile keys (equality + IN), hex cells (equality + IN, res encoded
  * in the id), and geohashes (equality + IN — the box decodes from the
  * string literal itself at any prefix length; equirectangular cells, so
  * the box is exact up to the encoder's one FP rounding, ulp-padded).
  * S2 cells are deliberately OUT: an S2 cell's lat/lng
  * bounds need geodesic edge extrema (S2LatLngRect machinery) — a corner
  * bbox is unsound near poles/face edges, and an unsound prune is a wrong
  * result. Install via `spark.experimental.extraOptimizations :+=
  * CellRangeDerivation` or session-wide with `graft.GraftExtensions`.
  */
object CellRangeDerivation extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val derived = conjuncts.flatMap(rangesFor)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
      if (derived.isEmpty) f
      else Filter(And(cond, derived.reduce(And)), child)
  }

  /** (lngMin, lngMax incl., latMin, latMax incl., strictUpper) boxes. */
  private type Box = (Double, Double, Double, Double, Boolean)

  private def rangesFor(pred: Expression): Seq[Expression] = pred match {
    case EqualTo(TileKeyExpr(lngE, latE), Literal(k: UTF8String, StringType)) =>
      tileBoxes(Seq(k)).toSeq.flatMap(box => rangePreds(lngE, latE, box))
    case EqualTo(Literal(k: UTF8String, StringType), TileKeyExpr(lngE, latE)) =>
      tileBoxes(Seq(k)).toSeq.flatMap(box => rangePreds(lngE, latE, box))
    case In(TileKeyExpr(lngE, latE), keys) if literalStrings(keys) =>
      tileBoxes(keys.map(_.asInstanceOf[Literal].value.asInstanceOf[UTF8String]))
        .toSeq.flatMap(box => rangePreds(lngE, latE, box))
    case EqualTo(HexCellExpr(lngE, latE, _), Literal(c: Long, _)) =>
      hexBoxes(Seq(c)).toSeq.flatMap(box => rangePreds(lngE, latE, box))
    case EqualTo(Literal(c: Long, _), HexCellExpr(lngE, latE, _)) =>
      hexBoxes(Seq(c)).toSeq.flatMap(box => rangePreds(lngE, latE, box))
    case In(HexCellExpr(lngE, latE, _), cells) if literalLongs(cells) =>
      hexBoxes(cells.map(_.asInstanceOf[Literal].value.asInstanceOf[Long]))
        .toSeq.flatMap(box => rangePreds(lngE, latE, box))
    // OptimizeIn rewrites In → InSet past the conversion threshold (10), and
    // this batch runs after it — match both forms
    case InSet(TileKeyExpr(lngE, latE), hset)
        if hset.nonEmpty && hset.forall(_.isInstanceOf[UTF8String]) =>
      tileBoxes(hset.toSeq.map(_.asInstanceOf[UTF8String]))
        .toSeq.flatMap(box => rangePreds(lngE, latE, box))
    case InSet(HexCellExpr(lngE, latE, _), hset)
        if hset.nonEmpty && hset.forall(_.isInstanceOf[Long]) =>
      hexBoxes(hset.toSeq.map(_.asInstanceOf[Long]))
        .toSeq.flatMap(box => rangePreds(lngE, latE, box))
    // geohash equality/IN: the cell box decodes from the literal itself
    // (any prefix length — the string IS the cell), padded like hex for
    // the encoder's one-rounding-per-coordinate FP boundary
    case EqualTo(GeohashExpr(lngE, latE, _), Literal(g: UTF8String, StringType)) =>
      ghBoxes(Seq(g)).toSeq.flatMap(box => rangePreds(lngE, latE, box))
    case EqualTo(Literal(g: UTF8String, StringType), GeohashExpr(lngE, latE, _)) =>
      ghBoxes(Seq(g)).toSeq.flatMap(box => rangePreds(lngE, latE, box))
    case In(GeohashExpr(lngE, latE, _), keys) if literalStrings(keys) =>
      ghBoxes(keys.map(_.asInstanceOf[Literal].value.asInstanceOf[UTF8String]))
        .toSeq.flatMap(box => rangePreds(lngE, latE, box))
    case InSet(GeohashExpr(lngE, latE, _), hset)
        if hset.nonEmpty && hset.forall(_.isInstanceOf[UTF8String]) =>
      ghBoxes(hset.toSeq.map(_.asInstanceOf[UTF8String]))
        .toSeq.flatMap(box => rangePreds(lngE, latE, box))
    case _ => Seq.empty
  }

  /** Hull box of the geohashes' decoded cells, ulp-padded; None on any
    * invalid hash (derive nothing rather than risk an unsound range).
    */
  private def ghBoxes(ghs: Seq[UTF8String]): Option[Box] = {
    val parsed = ghs.map(g => Geohash.box(g.toString))
    if (parsed.exists(_.isEmpty) || parsed.isEmpty) None
    else {
      val b = parsed.flatten.map { case (x0, x1, y0, y1) =>
        val padX = math.max(1e-12, (x1 - x0) * 1e-9)
        val padY = math.max(1e-12, (y1 - y0) * 1e-9)
        (x0 - padX, x1 + padX, y0 - padY, y1 + padY)
      }
      Some((b.map(_._1).min, b.map(_._2).max, b.map(_._3).min, b.map(_._4).max, false))
    }
  }

  private def literalStrings(es: Seq[Expression]): Boolean =
    es.nonEmpty && es.forall {
      case Literal(_: UTF8String, StringType) => true
      case _ => false
    }

  private def literalLongs(es: Seq[Expression]): Boolean =
    es.nonEmpty && es.forall {
      case Literal(_: Long, _) => true
      case _ => false
    }

  /** Hull box of the keys' unit floor-boxes; None on any unparsable key
    * (derive nothing rather than risk an unsound range).
    */
  private def tileBoxes(keys: Seq[UTF8String]): Option[Box] = {
    val parsed = keys.map { k =>
      try {
        val (swLng, swLat) = TileKey.toDegrees(k.toString)
        Some((swLng.toDouble, swLng + 1.0, swLat.toDouble, swLat + 1.0))
      } catch { case _: IllegalArgumentException | _: NumberFormatException => None }
    }
    if (parsed.exists(_.isEmpty)) None
    else {
      val b = parsed.flatten
      // floor-box upper edges are EXCLUSIVE (floor(lng) = sw, never sw+1)
      Some((b.map(_._1).min, b.map(_._2).max, b.map(_._3).min, b.map(_._4).max, true))
    }
  }

  /** Hull box of the cells' hexagon bounding boxes (pointy-top hexagon of
    * circumradius e: half-width √3·e/2, half-height e), padded an ulp-scale
    * amount for FP boundary rounding in latLngToCell.
    */
  private def hexBoxes(cells: Seq[Long]): Option[Box] = {
    if (cells.isEmpty) return None
    val b = cells.map { c =>
      val (cx, cy) = Hex.cellCenter(c)
      val e = Hex.edge(Hex.res(c))
      val pad = math.max(1e-12, e * 1e-9)
      (cx - (math.sqrt(3.0) / 2.0) * e - pad, cx + (math.sqrt(3.0) / 2.0) * e + pad,
        cy - e - pad, cy + e + pad)
    }
    Some((b.map(_._1).min, b.map(_._2).max, b.map(_._3).min, b.map(_._4).max, false))
  }

  private def rangePreds(lngE: Expression, latE: Expression, box: Box): Seq[Expression] = {
    val (lngMin, lngMax, latMin, latMax, strictUpper) = box
    def hi(e: Expression, v: Double): Expression =
      if (strictUpper) LessThan(e, Literal(v, DoubleType))
      else LessThanOrEqual(e, Literal(v, DoubleType))
    Seq(
      GreaterThanOrEqual(lngE, Literal(lngMin, DoubleType)), hi(lngE, lngMax),
      GreaterThanOrEqual(latE, Literal(latMin, DoubleType)), hi(latE, latMax))
  }
}
