package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Native codegen dot product over fixed-point long vectors (the
 * similarity ops' hot kernel, SURVEY.md §2.9). The declarative form —
 * `aggregate(zip_with(a, b, _*_), 0, _+_)` — runs INTERPRETED: Spark's
 * higher-order functions have no doGenCode, so every product allocates
 * lambda-variable holders and boxes through `eval`. At q45's shape
 * (IVF assignment = |corpus| × |centroids| dots of dim 64) that
 * interpretation dominated the query at 4.1 s/sf0.1. This expression
 * generates a tight primitive loop via a static call; accumulation
 * order (ascending index, long wrap-around) is identical to the
 * `aggregate` fold, so results are bit-identical to the oracle either
 * way.
 */
case class LongDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    LongDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LongDot.dot($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "long_dot"
}

object LongDot {
  /** Static kernel shared by interpreted eval and generated code. */
  def dot(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  def column(a: Column, b: Column): Column =
    GraftBridge.column(LongDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
