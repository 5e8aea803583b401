package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * MinHash hash-family kernel: `minhash_md5(s, k)` returns the k RAW
 * 16-byte digests `[md5(s || "#0"), …, md5(s || "#k-1")]`. Spark
 * compares BinaryType byte-wise UNSIGNED, which is exactly the
 * lexicographic order of the lowercase-hex rendering, so
 * `lower(hex(min(raw)))` is BIT-IDENTICAL to the composed built-ins
 * `min(md5(concat(s, lit("#j"))))` — the scheme the q21 DuckDB oracle
 * pins.
 *
 * Why an expression and not the k composed built-ins: the built-in
 * path pays, PER SHINGLE PER SEED, a concat allocation, a
 * `MessageDigest.getInstance`, a hex `char[]` + `java.lang.String`
 * allocation and a UTF-16→UTF-8 re-encode (`UTF8String.fromString`),
 * and the min aggregate then compares/copies 32-byte hex strings.
 * This kernel reads the shingle bytes once, reuses a thread-local
 * digest across all k seeds, and hands the aggregate 16-byte raw
 * digests; the hex rendering runs once per GROUP on the k minima
 * instead of once per shingle per seed. Measured at the q21 shape
 * (sf0.1): ~35% off the signature aggregation, identical output.
 */
case class MinhashMd5(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"minhash_md5 needs k >= 1, got $k")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_md5 needs a string column, got ${dt.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinhashMd5.hashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashMd5.hashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinhashMd5 =
    copy(child = newChild)
  override def prettyName: String = "minhash_md5"
}

object MinhashMd5 {
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Static kernel shared by interpreted eval and generated code. */
  def hashes(s: UTF8String, k: Int): ArrayData = {
    val base = s.getBytes // UTF-8, same bytes concat+cast-to-binary feeds md5()
    val md = md5.get()
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      md.reset()
      md.update(base)
      md.update('#'.toByte)
      val js = Integer.toString(j)
      var i = 0
      while (i < js.length) { md.update(js.charAt(i).toByte); i += 1 }
      out(j) = md.digest() // raw 16 bytes; unsigned order == hex order
      j += 1
    }
    new GenericArrayData(out)
  }

  def column(c: Column, k: Int): Column =
    GraftBridge.column(MinhashMd5(GraftBridge.expression(c), k))
}
