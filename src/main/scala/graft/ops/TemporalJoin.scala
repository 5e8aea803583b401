package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal joins — the two join shapes Spark has no built-in operator
 * for, each reduced to a single shuffled equi-join/window so the plan
 * survives a 100-TB fact table.
 *
 * Reference analogue: the crawler correlates each fetch with the most
 * recent robots snapshot / politeness budget in force at fetch time
 * (`crawler/crawler_node.py:289-302` re-reads the rules dict that was
 * last refreshed before the request) — an as-of lookup — and the
 * monitor attributes events to the alert window that covers them
 * (`monitor.py:165-204`) — an interval join. Both are here as general
 * operators over any (key, time) tables.
 */
object TemporalJoin {

  /** As-of join: for every left row, attach the payload of the single
    * right row with the greatest `rightTs <= leftTs` in the same `key`
    * group (inclusive; inner semantics — left rows with no prior right
    * row are dropped). Right rows must be unique per (key, rightTs);
    * pre-aggregate if they are not.
    *
    * Scale shape: ONE shuffle, no range join. A per-row lookup would be
    * a correlated subquery and a (left × right) inequality join is
    * O(L·R) per key; instead both sides are union-tagged and sorted once
    * per key, and a running `last(payload, ignoreNulls)` window carries
    * the latest right payload forward onto each left row. That is the
    * same hash-partition + sort plan as any per-key window, so it holds
    * at 10^10 rows as long as single keys fit a partition (salt upstream
    * for pathological hot keys). Right rows sort BEFORE left rows at an
    * equal timestamp, which is what makes the match inclusive (>=).
    *
    * Output: all `left` columns, then the matched right timestamp as
    * `matchedTsName`, then the `payload` columns.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, payload: Seq[String],
           matchedTsName: String = "asof_ts"): DataFrame = {
    val outR     = matchedTsName +: payload
    val rPayload = struct(col(rightTs).as(matchedTsName) +: payload.map(col): _*)
    val rType    = right.select(rPayload).schema.head.dataType
    val leftCols = left.columns.toSeq
    val lStruct  = struct(leftCols.map(col): _*)
    val lType    = left.select(lStruct).schema.head.dataType

    val rTagged = right.select(
      col(key).as("__k"), col(rightTs).as("__t"), lit(0).as("__side"),
      lit(null).cast(lType).as("__l"), rPayload.as("__r"))
    val lTagged = left.select(
      col(key).as("__k"), col(leftTs).as("__t"), lit(1).as("__side"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rTagged.unionByName(lTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1 && col("__m").isNotNull)
      .select(leftCols.map(c => col(s"__l.`$c`").as(c)) ++
              outR.map(c => col(s"__m.`$c`").as(c)): _*)
  }

  /** Interval (range) join: pair each point row with every interval row
    * whose `[startTs, endTs)` half-open window contains `ptTs`. There is
    * no equi key, so the naive plan is a broadcast-nested-loop — O(P·I).
    * Instead both sides are binned onto a fixed grid of `bucketMicros`:
    * an interval explodes to the few grid cells it overlaps, a point
    * maps to exactly one cell, and the join becomes a shuffled equi-join
    * on the cell id plus the residual containment filter. Each matching
    * pair is emitted exactly once (the point's cell is unique), so no
    * post-join distinct is needed. Pick `bucketMicros` near the typical
    * interval width: wider buckets cut the explode factor, narrower
    * buckets cut per-cell join fan-in.
    *
    * Empty/inverted intervals (endTs <= startTs) match nothing and are
    * dropped before the explode (a descending `sequence` would throw).
    * Epochs are assumed non-negative (post-1970), so integral `div`
    * truncation equals floor. Output: all point columns then all
    * interval columns.
    */
  def intervalJoin(points: DataFrame, ptTs: String,
                   intervals: DataFrame, startTs: String, endTs: String,
                   bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    // `div` (exact integral division) rather than floor(a / b): the
    // double division loses ulps near cell boundaries at 2^50-scale
    // microsecond epochs. The TIMESTAMP cast admits TIMESTAMP_NTZ
    // columns (parquet writes them) — unix_micros alone rejects NTZ;
    // the session timezone is pinned to UTC so the cast is exact.
    def micros(c: String) = s"unix_micros(cast(`$c` as timestamp))"
    val iv = intervals
      .where(col(endTs) > col(startTs))
      .withColumn("__b", explode(sequence(
        expr(s"${micros(startTs)} div ${bucketMicros}L"),
        expr(s"(${micros(endTs)} - 1) div ${bucketMicros}L"))))
    val pt = points.withColumn("__b", expr(s"${micros(ptTs)} div ${bucketMicros}L"))
    pt.join(iv, Seq("__b"))
      .where(col(ptTs) >= col(startTs) && col(ptTs) < col(endTs))
      .drop("__b")
      .select(points.columns.map(col) ++ intervals.columns.map(col): _*)
  }
}
