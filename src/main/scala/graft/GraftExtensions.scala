package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes every graft scalar function
  * available to plain SQL sessions via
  * `spark.sql.extensions=graft.GraftExtensions` (or programmatically with
  * `.withExtensions(new GraftExtensions)`). The same registrations are
  * available per-session through `functions.spatial.register` /
  * `functions.cells.register`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    import graft.functions._
    ext.injectFunction(fn("tile_key", es => TileKeyExpr(es.head, es(1))))
    ext.injectFunction(fn("bilinear_hgt",
      es => BilinearHgtExpr(es.head, es(1), es(2), es(3))))
    ext.injectFunction(fn("nearest_hgt",
      es => NearestHgtExpr(es.head, es(1), es(2), es(3))))
    ext.injectFunction(fn("s2_cell", es => S2CellExpr(es.head, es(1), es(2))))
    ext.injectFunction(fn("s2_token", es => S2TokenExpr(es.head)))
    ext.injectFunction(fn("hex_cell", es => HexCellExpr(es.head, es(1), es(2))))
    ext.injectFunction(fn("geohash", es => GeohashExpr(es.head, es(1), es(2))))
    ext.injectFunction(fn("terrarium_rgb", es => TerrariumRgbExpr(es.head)))
    ext.injectFunction(fn("zxy_x", es => TileXExpr(es.head, es(1))))
    ext.injectFunction(fn("zxy_y", es => TileYExpr(es.head, es(1))))
    ext.injectFunction(fn("ray_cast",
      es => graft.ops.RayCastExpr(es.head, es(1), es(2), es(3))))
    // cell predicate → pushable lng/lat range conjuncts (scan row-group
    // pruning on lng/lat-clustered layouts); see plans.CellRangeDerivation
    ext.injectOptimizerRule(_ => graft.plans.CellRangeDerivation)
  }
}
