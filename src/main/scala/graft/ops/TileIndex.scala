package graft.ops

import graft.core.{DecodedTile, TileCodec, TileRow}
import graft.raster.Bilinear
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftshim.GraftColumns
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.{Column, Dataset, SparkSession}

/** Broadcast tile-pyramid index (north star: "assigns every geometry ... via
  * a broadcast tile-pyramid index"): the raster side of the point→tile join
  * shipped to executors ONCE as encoded payloads, decoded lazily ONCE per
  * executor JVM, and probed per-row without materializing the `bytes` column
  * into join output rows.
  *
  * Why not a plain broadcast hash join on `bytes`: Spark's join output
  * materializes each probe row, and reading a BinaryType column copies the
  * full payload (`UnsafeRow.getBinary`) — a 2.9 MB memcpy per coordinate,
  * i.e. ~3 TB of copying per million rows. The index keeps payloads out of
  * the row entirely; the probe is 4 int16 reads (`Bilinear`). This replaces
  * the reference's per-process LRU tile cache (src/fetchTileData.ts:50-84):
  * the broadcast is the cache, request coalescing is free, and the missing
  * tile ⇒ 0 rule (src/elevation/getElevation.ts:22-28) lives in
  * [[TileIndex.elevation]].
  */
final class TileIndex(rows: Array[TileRow]) extends Serializable {

  /** Decoded once per JVM on first probe (executor-local, like the
    * reference's LRU but immutable and complete).
    */
  @transient private lazy val decoded: java.util.HashMap[Int, DecodedTile] = {
    val m = new java.util.HashMap[Int, DecodedTile](rows.length * 2)
    rows.foreach { t =>
      val d = TileCodec.decode(t)
      m.put(TileIndex.key(d.swLng, d.swLat), d)
    }
    m
  }

  def size: Int = rows.length

  /** Bilinear elevation at (lng, lat); missing tile ⇒ sea level 0 (F8). */
  def elevation(lng: Double, lat: Double): Double = {
    val swLng = math.floor(lng)
    val swLat = math.floor(lat)
    val d = decoded.get(TileIndex.key(swLng.toInt, swLat.toInt))
    if (d == null) 0.0
    else Bilinear.sampleGrid(d.samples, d.size, swLng, swLat, lng, lat)
  }

  /** Squared slope magnitude (map-algebra / terrain-analysis op, beyond the
    * reference): central-difference gradient at the grid node nearest to
    * (lng, lat), clamped at tile edges — `(dz/dcol)² + (dz/drow)²` in
    * meters²-per-cell². Missing tile ⇒ 0 (F8 semantics).
    */
  def slope2(lng: Double, lat: Double): Double = {
    val swLng = math.floor(lng)
    val swLat = math.floor(lat)
    val d = decoded.get(TileIndex.key(swLng.toInt, swLat.toInt))
    if (d == null) 0.0
    else {
      val size = d.size - 1
      val (rn, cn) = Bilinear.nearestNode(d.size, swLng, swLat, lng, lat)
      val c0 = math.max(0, cn - 1); val c1 = math.min(size, cn + 1)
      val r0 = math.max(0, rn - 1); val r1 = math.min(size, rn + 1)
      val dc = (d.sample(rn, c1) - d.sample(rn, c0)).toDouble / (c1 - c0)
      val dr = (d.sample(r1, cn) - d.sample(r0, cn)).toDouble / (r1 - r0)
      dc * dc + dr * dr
    }
  }

  /** Lambertian hillshade (map-algebra op, beyond the reference): analytic
    * illumination of the surface normal by a fixed light from azimuth 315°
    * (NW), altitude 45° — the GDAL/ESRI default sun. Uses the same
    * central-difference gradient as [[slope2]]; the light vector components
    * are EXACT double literals (−0.5, 0.5, √2/2) so the DuckDB oracle can
    * reproduce the value bit-for-bit: every remaining op (mul/add/div/sqrt)
    * is IEEE correctly-rounded and therefore engine-independent. Missing
    * tile ⇒ 0 (F8 no-data semantics; flat terrain yields √2/2, so 0 is
    * unambiguously "no data").
    */
  def hillshade(lng: Double, lat: Double): Double = {
    val swLng = math.floor(lng)
    val swLat = math.floor(lat)
    val d = decoded.get(TileIndex.key(swLng.toInt, swLat.toInt))
    if (d == null) 0.0
    else {
      val size = d.size - 1
      val (rn, cn) = Bilinear.nearestNode(d.size, swLng, swLat, lng, lat)
      val c0 = math.max(0, cn - 1); val c1 = math.min(size, cn + 1)
      val r0 = math.max(0, rn - 1); val r1 = math.min(size, rn + 1)
      val dc = (d.sample(rn, c1) - d.sample(rn, c0)).toDouble / (c1 - c0)
      val dr = (d.sample(r1, cn) - d.sample(r0, cn)).toDouble / (r1 - r0)
      // light L = (lx, ly, lz), unnormalized surface normal N = (−dc, −dr, 1):
      // illum = (L·N)/|N|. lx = cos45·sin315 = −0.5, ly = cos45·cos315 = 0.5,
      // lz = sin45 = √2/2. Same association order as the oracle SQL.
      (-0.5 * -dc + 0.5 * -dr + 0.7071067811865476) /
        math.sqrt(dc * dc + dr * dr + 1.0)
    }
  }

  /** Nearest-neighbour sampling mode (reference `_nearestNeighbour`). */
  def elevationNearest(lng: Double, lat: Double): Double = {
    val swLng = math.floor(lng)
    val swLat = math.floor(lat)
    val d = decoded.get(TileIndex.key(swLng.toInt, swLat.toInt))
    if (d == null) 0.0
    else Bilinear.nearestGrid(d.samples, d.size, swLng, swLat, lng, lat)
  }
}

object TileIndex {
  def key(swLng: Int, swLat: Int): Int = (swLat + 90) * 360 + (swLng + 180)

  /** Collect + broadcast the tile table. Sized for bounded tile sets (the
    * common case: a query bbox covers few tiles; a whole-planet 3″ store is
    * ~64k land tiles ≈ 180 GB encoded — beyond that use
    * [[Elevation.lookupCogroup]], the shuffle path).
    */
  def broadcastIndex(tiles: Dataset[TileRow]): Broadcast[TileIndex] = {
    val rows = tiles.collect()
    tiles.sparkSession.sparkContext.broadcast(new TileIndex(rows))
  }
}

/** `elev_at(lng, lat)` over a broadcast [[TileIndex]] — the whole J1/J4
  * lookup join collapsed into one codegen'd scalar probe.
  */
case class ElevAtExpr(left: Expression, right: Expression,
                      bc: Broadcast[TileIndex], method: String = "elevation")
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "elev_at"
  override def nullSafeEval(lng: Any, lat: Any): Any = {
    val x = lng.asInstanceOf[Double]; val y = lat.asInstanceOf[Double]
    method match {
      case "elevationNearest" => bc.value.elevationNearest(x, y)
      case "slope2"           => bc.value.slope2(x, y)
      case "hillshade"        => bc.value.hillshade(x, y)
      case _                  => bc.value.elevation(x, y)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tileIndexBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, (lng, lat) =>
      s"${ev.value} = ((graft.ops.TileIndex) $ref.value()).$method($lng, $lat);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ElevAtExpr =
    copy(left = l, right = r)
}

object ElevAt {
  def elev_at(lng: Column, lat: Column, bc: Broadcast[TileIndex]): Column =
    GraftColumns.column(ElevAtExpr(
      GraftColumns.expression(lng.cast(DoubleType)),
      GraftColumns.expression(lat.cast(DoubleType)), bc))
  def elev_at_nearest(lng: Column, lat: Column, bc: Broadcast[TileIndex]): Column =
    GraftColumns.column(ElevAtExpr(
      GraftColumns.expression(lng.cast(DoubleType)),
      GraftColumns.expression(lat.cast(DoubleType)), bc, "elevationNearest"))
  def elev_slope2(lng: Column, lat: Column, bc: Broadcast[TileIndex]): Column =
    GraftColumns.column(ElevAtExpr(
      GraftColumns.expression(lng.cast(DoubleType)),
      GraftColumns.expression(lat.cast(DoubleType)), bc, "slope2"))
  def elev_hillshade(lng: Column, lat: Column, bc: Broadcast[TileIndex]): Column =
    GraftColumns.column(ElevAtExpr(
      GraftColumns.expression(lng.cast(DoubleType)),
      GraftColumns.expression(lat.cast(DoubleType)), bc, "hillshade"))
}
