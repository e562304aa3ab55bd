package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftColumns
import org.apache.spark.sql.types._

/** Static helpers invoked from generated code (keeps expressions inside
  * whole-stage codegen while the math lives in the plain-JVM core).
  */
object ExprHelpers {
  def terrariumRgb(elev: Double): ArrayData = {
    val (r, g, b) = graft.raster.Terrarium.encode(elev)
    new GenericArrayData(Array(r, g, b))
  }
}

/** `terrarium_rgb(elev)` → array<int> [r, g, b] — the reference's Terrarium
  * DEM byte encoding (F6, src/elevation/getTerrariumDemElevation.ts:10-20).
  */
case class TerrariumRgbExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "terrarium_rgb"
  override def nullSafeEval(e: Any): Any =
    ExprHelpers.terrariumRgb(e.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, e => s"graft.functions.ExprHelpers.terrariumRgb($e)")
  override protected def withNewChildInternal(c: Expression): TerrariumRgbExpr = copy(child = c)
}

/** `zxy_x(lng, z)` — Web-Mercator slippy tile column. */
case class TileXExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, IntegerType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "zxy_x"
  override def nullSafeEval(lng: Any, z: Any): Any =
    graft.geo.WebMercator.tileX(lng.asInstanceOf[Double], z.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lng, z) => s"graft.geo.WebMercator.tileX($lng, $z)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TileXExpr =
    copy(left = l, right = r)
}

/** `zxy_y(lat, z)` — Web-Mercator slippy tile row. */
case class TileYExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, IntegerType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "zxy_y"
  override def nullSafeEval(lat: Any, z: Any): Any =
    graft.geo.WebMercator.tileY(lat.asInstanceOf[Double], z.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lat, z) => s"graft.geo.WebMercator.tileY($lat, $z)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TileYExpr =
    copy(left = l, right = r)
}

object raster {
  private def col(e: Expression): Column = GraftColumns.column(e)
  private def ex(c: Column): Expression = GraftColumns.expression(c)

  def terrarium_rgb(elev: Column): Column = col(TerrariumRgbExpr(ex(elev.cast(DoubleType))))
  def zxy_x(lng: Column, z: Column): Column =
    col(TileXExpr(ex(lng.cast(DoubleType)), ex(z.cast(IntegerType))))
  def zxy_y(lat: Column, z: Column): Column =
    col(TileYExpr(ex(lat.cast(DoubleType)), ex(z.cast(IntegerType))))

  /** Bing-maps quadkey of slippy tile `(x, y)` at zoom `z`: digit i (MSB
    * first) is `bit_i(x) + 2·bit_i(y)` as a character `'0'..'3'` — the
    * string tile address whose PREFIX property (a parent tile's quadkey is
    * a proper prefix of every descendant's) turns pyramid containment into
    * `LIKE 'prefix%'` / string-range predicates that parquet min/max stats
    * and Catalyst pushdown prune directly — the string twin of the Morton
    * `zorder_key` (same bit interleave, opposite consumer: range scans vs
    * write clustering). `z` is a plan-time constant, so the digits unroll
    * into a fixed `concat` of codegen'd integer bit ops — no UDF, no
    * array allocation.
    */
  def quadkey(x: Column, y: Column, z: Int): Column = {
    import org.apache.spark.sql.functions.{concat, shiftright, lit}
    require(z >= 1 && z <= 30, s"zoom out of [1, 30]: $z")
    concat((z to 1 by -1).map { i =>
      ((shiftright(x, i - 1) % lit(2)) + (shiftright(y, i - 1) % lit(2)) * lit(2))
        .cast("string")
    }: _*)
  }
}
