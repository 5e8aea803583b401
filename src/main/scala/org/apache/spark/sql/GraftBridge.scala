package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.StructType

/** Bridge into Spark's `private[sql]` Column<->Expression converters
  * (Spark 4.x removed the public `new Column(expr)` constructor) and
  * the InternalRow-level DataFrame<->RDD boundary (the public
  * `df.rdd` / `createDataFrame` pair converts every row through the
  * external-type converters — `UTF8String`->`String`,
  * micros->`Timestamp`, `ArrayData`->`Seq` — and back, twice the
  * per-row cost the prefix-sum passes actually need). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The DataFrame's InternalRow RDD (no external-type conversion).
    * Rows may be reused buffers — `copy()` before holding a reference. */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.queryExecution.toRdd

  /** Wrap an InternalRow RDD back into a DataFrame without the
    * external-Row encoder pass. */
  def fromInternalRdd(spark: SparkSession, rdd: RDD[InternalRow],
                      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
