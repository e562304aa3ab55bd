package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, QuaternaryExpression}
import org.apache.spark.sql.graftshim.GraftColumns
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot spatial scalar functions. Each has
  * a `doGenCode` emitting a static call so the whole stage stays inside
  * whole-stage codegen (no Scala-UDF serialization/boxing on the join probe
  * path).
  */

/** `tile_key(lng, lat)` — SRTM 1°×1° tile key of the containing tile (F4+F9:
  * reference src/elevation/getElevationTileKey.ts:3-10 with floored degrees).
  *
  * Non-finite coordinates yield NULL (there is no containing tile), mirroring
  * null-input semantics. This also keeps [[graft.plans.CellRangeDerivation]]
  * sound: a NaN coordinate fails the derived lng/lat range conjuncts, and
  * with a NULL key it fails the original cell predicate too — both filters
  * agree the row drops, instead of a floored-NaN garbage key matching a
  * literal the range filter then contradicts.
  */
case class TileKeyExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "tile_key"
  override def nullSafeEval(lng: Any, lat: Any): Any = {
    val lngd = lng.asInstanceOf[Double]; val latd = lat.asInstanceOf[Double]
    if (java.lang.Double.isFinite(lngd) && java.lang.Double.isFinite(latd))
      UTF8String.fromString(graft.geo.TileKey.of(lngd, latd))
    else null
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lng, lat) =>
      s"""if (java.lang.Double.isFinite($lng) && java.lang.Double.isFinite($lat)) {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    graft.geo.TileKey.of($lng, $lat));
         |} else {
         |  ${ev.isNull} = true;
         |}""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TileKeyExpr =
    copy(left = l, right = r)
}

/** `bilinear_hgt(bytes, size, lng, lat)` — bilinear elevation sample from raw
  * HGT tile bytes, with the tile SW corner derived by flooring the coordinate
  * (valid after an equi-join on `tile_key(lng, lat)`). Null-safe: a missing
  * tile (null bytes from a left outer join) yields null, to be coalesced to
  * sea level 0 (F8).
  */
case class BilinearHgtExpr(first: Expression, second: Expression,
                           third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, IntegerType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bilinear_hgt"
  override def nullSafeEval(bytes: Any, size: Any, lng: Any, lat: Any): Any =
    graft.raster.Bilinear.sampleFromFloor(bytes.asInstanceOf[Array[Byte]],
      size.asInstanceOf[Int], lng.asInstanceOf[Double], lat.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, s, lng, lat) =>
      s"${ev.value} = graft.raster.Bilinear.sampleFromFloor($b, $s, $lng, $lat);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): BilinearHgtExpr =
    copy(first = a, second = b, third = c, fourth = d)
}

/** `nearest_hgt(bytes, size, lng, lat)` — nearest-neighbour sampling mode
  * (capability parity with the reference's `_nearestNeighbour`).
  */
case class NearestHgtExpr(first: Expression, second: Expression,
                          third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, IntegerType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "nearest_hgt"
  override def nullSafeEval(bytes: Any, size: Any, lng: Any, lat: Any): Any = {
    val lngd = lng.asInstanceOf[Double]; val latd = lat.asInstanceOf[Double]
    graft.raster.Bilinear.nearestHgt(bytes.asInstanceOf[Array[Byte]],
      size.asInstanceOf[Int], math.floor(lngd), math.floor(latd), lngd, latd)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, s, lng, lat) =>
      s"${ev.value} = graft.raster.Bilinear.nearestHgt($b, $s, " +
        s"java.lang.Math.floor($lng), java.lang.Math.floor($lat), $lng, $lat);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): NearestHgtExpr =
    copy(first = a, second = b, third = c, fourth = d)
}

/** Column-level API + SQL registration for the spatial functions. */
object spatial {
  private def col(e: Expression): Column = GraftColumns.column(e)
  private def ex(c: Column): Expression = GraftColumns.expression(c)

  def tile_key(lng: Column, lat: Column): Column =
    col(TileKeyExpr(ex(lng.cast(DoubleType)), ex(lat.cast(DoubleType))))
  def bilinear_hgt(bytes: Column, size: Column, lng: Column, lat: Column): Column =
    col(BilinearHgtExpr(ex(bytes), ex(size.cast(IntegerType)),
      ex(lng.cast(DoubleType)), ex(lat.cast(DoubleType))))
  def nearest_hgt(bytes: Column, size: Column, lng: Column, lat: Column): Column =
    col(NearestHgtExpr(ex(bytes), ex(size.cast(IntegerType)),
      ex(lng.cast(DoubleType)), ex(lat.cast(DoubleType))))

  // ---- polygon metrics over packed coordinate arrays ----
  // Composed from built-in higher-order functions (preference (a): no custom
  // expression needed — `aggregate` is a sequential in-order fold, so the
  // summation order is deterministic and the DuckDB oracle replicates it
  // term-for-term with the same left association).
  import org.apache.spark.sql.functions.{aggregate, element_at, lit, pmod, sequence, size => asize, sqrt, when}

  /** Σ (xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ) over cyclic vertex pairs (twice the signed area).
    * Empty rings fold to 0.0 — `sequence(0, -1)` would otherwise produce the
    * DESCENDING sequence [0, -1] and crash on `element_at(xs, 0)`.
    */
  private def shoelace(xs: Column, ys: Column,
      term: (Column, Column, Column, Column) => Column): Column = {
    val n = asize(xs)
    val fold = aggregate(
      sequence(lit(0), n - lit(1)), lit(0.0),
      (acc: Column, i: Column) => {
        val xi = element_at(xs, i + lit(1))
        val yi = element_at(ys, i + lit(1))
        val xj = element_at(xs, pmod(i + lit(1), n) + lit(1))
        val yj = element_at(ys, pmod(i + lit(1), n) + lit(1))
        acc + term(xi, yi, xj, yj)
      })
    when(n > lit(0), fold).otherwise(lit(0.0))
  }

  /** Signed shoelace area of one packed-array ring (CCW positive). */
  def polygon_area(xs: Column, ys: Column): Column =
    shoelace(xs, ys, (xi, yi, xj, yj) => xi * yj - xj * yi) * lit(0.5)

  /** Ring perimeter (planar degree units, like dist2 elsewhere). */
  def polygon_perimeter(xs: Column, ys: Column): Column =
    shoelace(xs, ys, (xi, yi, xj, yj) =>
      sqrt((xj - xi) * (xj - xi) + (yj - yi) * (yj - yi)))

  /** Area-weighted centroid x: Σ(xᵢ+xᵢ₊₁)·crossᵢ / (3·Σcrossᵢ).
    * Null for zero-area (degenerate) rings — ANSI mode would otherwise
    * throw DIVIDE_BY_ZERO rather than produce NaN.
    */
  def polygon_centroid_x(xs: Column, ys: Column): Column =
    centroidRatio(xs, ys, (xi, xj) => xi + xj, isX = true)

  /** Area-weighted centroid y (null for zero-area rings, like x). */
  def polygon_centroid_y(xs: Column, ys: Column): Column =
    centroidRatio(xs, ys, (yi, yj) => yi + yj, isX = false)

  private def centroidRatio(xs: Column, ys: Column,
      pair: (Column, Column) => Column, isX: Boolean): Column = {
    val num = shoelace(xs, ys, (xi, yi, xj, yj) =>
      (if (isX) pair(xi, xj) else pair(yi, yj)) * (xi * yj - xj * yi))
    val den = lit(3.0) * shoelace(xs, ys, (xi, yi, xj, yj) => xi * yj - xj * yi)
    when(den =!= lit(0.0), num / den)
  }

  /** Register SQL names on a session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("tile_key",
      es => TileKeyExpr(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("bilinear_hgt",
      es => BilinearHgtExpr(es.head, es(1), es(2), es(3)), "built-in")
    reg.createOrReplaceTempFunction("nearest_hgt",
      es => NearestHgtExpr(es.head, es(1), es(2), es(3)), "built-in")
  }
}
