package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftColumns
import org.apache.spark.sql.types._

/** Vector kernels for the embedding ops. The SQL higher-order-function form
  * (`aggregate(zip_with(a, b, (x,y) -> x*y), 0D, ...)`) is interpreted per
  * element (no codegen) and allocates the zipped array; this expression is a
  * tight loop over the unsafe array data. The summation order is the same
  * left fold, so results are IEEE-identical to the lambda form (and to the
  * DuckDB oracle's list_reduce).
  */
object VecOps {
  /** Sequential-fold dot product: ((0 + a0·b0) + a1·b1) + ... */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Sequential-fold squared distance: Σ (a_i − b_i)². */
  def dist2(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); acc += d * d; i += 1 }
    acc
  }
}

case class VecDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.dot($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotExpr =
    copy(left = l, right = r)
}

case class VecDist2Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dist2"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dist2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.dist2($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDist2Expr =
    copy(left = l, right = r)
}

object vectors {
  def vec_dot(a: Column, b: Column): Column =
    GraftColumns.column(VecDotExpr(GraftColumns.expression(a), GraftColumns.expression(b)))
  def vec_dist2(a: Column, b: Column): Column =
    GraftColumns.column(VecDist2Expr(GraftColumns.expression(a), GraftColumns.expression(b)))
}
