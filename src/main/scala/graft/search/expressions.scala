package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter stem as a native Catalyst expression (C4): posting-list builds
  * run it over every token of every document, so it stays inside
  * whole-stage codegen like the URL expressions (SURVEY.md §2.9). */
case class StemToken(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PorterStemmer.stem(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.search.PorterStemmer.stem($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): StemToken =
    copy(child = newChild)
  override def prettyName: String = "stem_token"
}

object searchfunctions {
  def stem_token(c: Column): Column = GraftBridge.column(StemToken(GraftBridge.expression(c)))
}
