package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native codegen dot product over integral vectors (the similarity ops'
 * hot kernel, SURVEY.md §2.9). The declarative form —
 * `aggregate(zip_with(a, b, _*_), 0, _+_)` — runs INTERPRETED: Spark's
 * higher-order functions have no doGenCode, so every product allocates
 * lambda-variable holders and boxes through `eval`. At q45's shape
 * (IVF assignment = |corpus| × |centroids| dots of dim 64) that
 * interpretation dominated the query at 4.1 s/sf0.1. This expression
 * generates a tight primitive loop via a static call; accumulation
 * order (ascending index, long wrap-around) is identical to the
 * `aggregate` fold, so results are bit-identical to the oracle either
 * way.
 *
 * Accepts any integral element type per side (byte/short/int/long) so
 * the fixed-point 2^20 long vectors and the int8-quantized vectors
 * ([[graft.ops.Similarity.quantizeInt8]]) share one kernel; the element
 * accessor is picked at plan time and inlined as a constant kind.
 *
 * Null semantics match the zip_with form: mismatched lengths or a null
 * element yield NULL (zip_with null-pads the shorter side and the
 * product/sum propagate the null) — a truncated or zero-filled dot
 * would silently mis-rank instead of surfacing the bad row. The
 * element-null scan is emitted only when a side's array type admits
 * null elements (plan-time constant).
 */
case class LongDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def kindOf(e: Expression): Int = e.dataType match {
    case ArrayType(ByteType, _)    => 0
    case ArrayType(ShortType, _)   => 1
    case ArrayType(IntegerType, _) => 2
    case _                         => 3 // ArrayType(LongType) — enforced by checkInputDataTypes
  }
  private lazy val kindL = kindOf(left)
  private lazy val kindR = kindOf(right)

  private def elemsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => true
  }
  private lazy val checkElemNulls = elemsNullable(left) || elemsNullable(right)

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(ByteType | ShortType | IntegerType | LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_dot needs integral arrays, got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements() ||
        (checkElemNulls && LongDot.hasNullElem(x, y))) null
    else java.lang.Long.valueOf(LongDot.dot(x, y, kindL, kindR))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nullElem =
        if (checkElemNulls) s" || graft.functions.LongDot.hasNullElem($a, $b)" else ""
      s"""
         |if ($a.numElements() != $b.numElements()$nullElem) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.LongDot.dot($a, $b, $kindL, $kindR);
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "long_dot"
}

object LongDot {
  /** Equal-length precondition holds at both call sites. */
  def hasNullElem(x: ArrayData, y: ArrayData): Boolean = {
    val n = x.numElements()
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Static kernel shared by interpreted eval and generated code.
    * kind: 0=byte, 1=short, 2=int, 3=long (constant per call site).
    * Callers have already verified equal lengths and no null elements. */
  def dot(x: ArrayData, y: ArrayData, kx: Int, ky: Int): Long = {
    val n = x.numElements()
    var s = 0L
    var i = 0
    if (kx == 3 && ky == 3) { // fast path: the fixed-point long vectors
      while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    } else {
      while (i < n) { s += get(x, i, kx) * get(y, i, ky); i += 1 }
    }
    s
  }

  @inline private def get(a: ArrayData, i: Int, k: Int): Long = k match {
    case 0 => a.getByte(i).toLong
    case 1 => a.getShort(i).toLong
    case 2 => a.getInt(i).toLong
    case _ => a.getLong(i)
  }

  def column(a: Column, b: Column): Column =
    GraftBridge.column(LongDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
