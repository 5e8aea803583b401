package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recrawl scheduling (SURVEY §2.10 T44) — the freshness side of a
  * production crawler. The reference crawls each URL once; a continuous
  * crawl must decide WHICH already-fetched pages to refetch, and the
  * classic policy (Cho & Garcia-Molina, "Effective Page Refresh
  * Policies") prioritizes by estimated change rate x staleness: a page
  * observed to change often AND not fetched recently outranks both
  * stable pages and just-fetched ones.
  */
object Recrawl {

  /** Per-page change-rate estimate + refresh priority from a fetch
    * history `(id, ts, obs)`: `obs` is the per-fetch content observation
    * (digest/fingerprint value); a "change" is `obs != previous obs` in
    * per-page fetch order.
    *
    *   change_rate = scale * n_changes div n_intervals   (fixed-point)
    *   age_s       = corpus max fetch time - page's last fetch, seconds
    *   priority    = change_rate * age_s
    *
    * All arithmetic is integer (epoch microseconds div 1e6; quantized
    * rate), so the ranking is bit-identical across engines and row
    * orders. Overflow: rate <= scale (10^6) and age_s < 2^31 for any
    * real corpus, so priority < 2^51.
    *
    * Scale shape: ONE shuffle on the page id serves both the lag window
    * (per-page fetch order is a per-key sort inside its hash partition,
    * never a global sort) and the groupBy that follows it — Catalyst
    * reuses the window's hash partitioning for the aggregation. The
    * corpus-max timestamp is derived from the RAW history (max of
    * per-page maxes = global max), a partial-agg scan that collapses to
    * 1 row and crossJoins back as a broadcast — deriving it from the
    * per-page table would inline the window+agg subtree a second time
    * (the q21 recompute class). Skew note: pages are the key, fetch
    * history per page is politeness-bounded (a page cannot be fetched
    * more often than its host budget allows), so per-key cardinality is
    * capped and the window cannot hot-spot.
    */
  def priority(history: DataFrame, id: String = "user_id",
               ts: String = "ts", obs: String = "value",
               tiebreak: String = "event_id",
               scale: Long = 1000000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col(ts), col(tiebreak))
    // tz-free epoch micros: the input is TIMESTAMP_NTZ (parquet µs), and
    // unix_micros would route it through the session timezone — a
    // DST-shifting tz could then warp intervals. timestampdiff from the
    // NTZ epoch matches DuckDB's epoch_us exactly.
    val epochUs = expr(
      s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00'," +
        s" CAST($ts AS TIMESTAMP_NTZ))")
    val flagged = history.select(
        col(id), col(ts), col(obs), col(tiebreak))
      .withColumn("changed",
        when(lag(col(obs), 1).over(w).isNull, 0L)
          .when(col(obs) =!= lag(col(obs), 1).over(w), 1L)
          .otherwise(0L))
    val perPage = flagged.groupBy(col(id))
      .agg(count(lit(1)).as("n_fetches"),
        sum(col("changed")).as("n_changes"),
        max(epochUs).as("last_us"))
    val corpusMax = history.agg(max(epochUs).as("max_us"))
    perPage.crossJoin(broadcast(corpusMax))
      .select(col(id),
        col("n_fetches"),
        col("n_changes"),
        when(col("n_fetches") > 1,
          expr(s"$scale * n_changes div (n_fetches - 1)")).otherwise(0L)
          .as("change_rate"),
        expr("(max_us - last_us) div 1000000").as("age_s"))
      .withColumn("priority", col("change_rate") * col("age_s"))
  }

  /** Snapshot-to-snapshot crawl delta (T47): classify every URL across
    * two crawl snapshots as `added` (new only), `removed` (old only),
    * `changed` (both, digest differs) or `unchanged`. This is the
    * incremental-recrawl primitive: a continuous crawl re-exports only
    * the added+changed slice downstream (index updates, dedup refresh),
    * and the removed slice drives tombstones — diffing snapshots beats
    * reprocessing the full corpus by the change ratio (~1-10%/week on
    * the real web).
    *
    * Scale shape: ONE co-partitioned full-outer join — both sides hash
    * (or sort-merge) on the key with no other exchange; snapshots stored
    * bucketed by the key (storage/Bucketing) join with zero shuffle.
    * The digest comparison is a null-safe column op, no UDF. Output
    * carries both digests so downstream consumers can verify without
    * re-reading either snapshot. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   id: String = "url", digest: String = "digest"): DataFrame = {
    val o = oldSnap.select(col(id).as("__k"), col(digest).as("old_digest"))
    val n = newSnap.select(col(id).as("__k2"), col(digest).as("new_digest"))
    o.join(n, col("__k") === col("__k2"), "full_outer")
      .select(
        coalesce(col("__k"), col("__k2")).as(id),
        when(col("__k").isNull, lit("added"))
          .when(col("__k2").isNull, lit("removed"))
          // null-SAFE compare: a null digest on one side (fetch failed,
          // body withheld) vs a value on the other IS a change; =!=
          // would yield null there and silently classify 'unchanged'
          .when(!(col("old_digest") <=> col("new_digest")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("old_digest"), col("new_digest"))
  }
}
