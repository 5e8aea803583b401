package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming translations of the reference's poll-loop
 * semantics (SURVEY.md §2.8). The crawl itself is deliberately a batch
 * wave loop (ordering + atomic multi-table commits are provable there);
 * these operators are the streaming forms of its monitoring/state
 * paths, for deployments that tail the crawl's logs live:
 *
 *  - `windowedEventCounts`: heartbeat/crawl-rate monitoring —
 *    event-time tumbling windows with a watermark for late data
 *    (A5/O5: `monitor.py:112-133`, rate deltas per time bucket).
 *  - `hostBudgetState`: per-host politeness accounting with
 *    `flatMapGroupsWithState` — the streaming equivalent of the
 *    per-wave budget window (`crawler/crawler_node.py:297`), emitting a
 *    row whenever a host first exceeds its budget within the state
 *    lifetime.
 */
object StreamOps {

  /** Tumbling windowed counts + value sums per event type, 10-minute
    * watermark (late rows beyond it are dropped, matching the
    * reference's drop-unknown-task behavior, `master_node.py:131-132`). */
  def windowedEventCounts(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming first-seen URL dedup — the streaming form of the
    * frontier's seen-set anti-join (J1). `dropDuplicatesWithinWatermark`
    * keeps per-URL state only inside the watermark horizon, so state is
    * bounded by arrival-rate × horizon instead of growing with the
    * 10^10-URL crawl history; a duplicate arriving beyond the horizon
    * re-emits, and the batch anti-join backstop at commit corrects it —
    * the same probabilistic-filter + exact-backstop split the Bloom
    * seen-set uses. */
  def firstSeenUrls(urls: DataFrame, tsCol: String = "ts",
                    watermark: String = "10 minutes"): DataFrame =
    urls.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark("url")

  /** Streaming sessionization — the SAME native `session_window`
    * aggregation as the batch q70 query, under a watermark: the state
    * store merges overlapping per-key windows as events arrive, and a
    * session emits exactly once (append) when the watermark passes its
    * end (last event + gap). State is bounded by open sessions within
    * the horizon, not by history. */
  def sessionizedCounts(events: DataFrame, gap: String = "30 minutes",
                        watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Streaming task-id correlation (J5, `master/master_node.py:119-130`
    * matching completions back to dispatched tasks): a stream-stream
    * inner join of the dispatch stream against the completion stream on
    * task_id, bounded by an event-time range (`done.ts` within
    * [sent.ts, sent.ts + maxLag]). Both sides carry watermarks, so the
    * join state the store retains is arrival-rate × horizon — a
    * completion that never arrives inside the lag bound simply ages
    * out; the batch J5 anti-join over committed tables remains the
    * exact backstop, same split as firstSeenUrls. Emits
    * (task_id, sent_ts, done_ts, lag_sec) exactly once per match. */
  def taskCorrelation(sent: DataFrame, done: DataFrame,
                      maxLag: String = "10 minutes",
                      watermark: String = "10 minutes"): DataFrame = {
    val s = sent.withWatermark("ts", watermark)
      .select(col("task_id"), col("ts").as("sent_ts"))
    val d = done.withWatermark("ts", watermark)
      .select(col("task_id").as("task_id_d"), col("ts").as("done_ts"))
    s.join(d,
        col("task_id") === col("task_id_d") &&
          col("done_ts") >= col("sent_ts") &&
          col("done_ts") <= col("sent_ts") + expr(s"INTERVAL $maxLag"))
      .select(col("task_id"), col("sent_ts"), col("done_ts"),
        (unix_timestamp(col("done_ts")) - unix_timestamp(col("sent_ts"))).as("lag_sec"))
  }

  /** Streaming → snapshot sink: a `foreachBatch` body that lands each
    * micro-batch as one atomic IceLite commit, recording the batch id
    * in the commit metadata. Exactly-once across restarts comes from
    * idempotent replay: Structured Streaming re-delivers the last
    * batch after recovery, and the sink skips any batch id at or below
    * the one already committed (the same batchId-dedup contract
    * Spark's own transactional sinks document).
    *
    * The guard walks the snapshot HISTORY for the newest commit
    * carrying this sink's key — checking only the head would forget
    * the batch id as soon as any other writer (a batch job, another
    * stream) committed in between, and the key is namespaced per table
    * so two streams landing different tables in one store don't
    * clobber each other's progress. Batch ids are monotonic, so the
    * newest occurrence is the max. The walk runs ONCE per sink
    * instance (restart recovery); afterwards the closure caches its
    * own high-water mark, so steady-state micro-batches cost zero
    * manifest reads (an absent key would otherwise walk the full
    * history every batch).
    *
    * Retention contract: `IceLite.expire` must keep at least one
    * commit carrying each live stream's meta key — expiring ALL of a
    * stream's commits while that stream is down erases its replay
    * guard, and the re-delivered last batch would commit twice on
    * restart. (Expire keeps a trailing window of commits, so this
    * only needs the window to exceed the outage, same as any
    * checkpoint-retention policy.) Usage:
    * `stream.writeStream.foreachBatch(StreamOps.snapshotSink(ice, "t")).start()`. */
  def snapshotSink(ice: graft.icelite.IceLite, table: String): (DataFrame, Long) => Unit = {
    val metaKey = s"stream_batch_id:$table"
    var recovered = false
    var committed: Option[Long] = None
    (batch, batchId) => {
      if (!recovered) {
        committed = ice.history.iterator
          .flatMap(id => ice.commitMeta(id).get(metaKey))
          .map(_.toLong).nextOption()
        recovered = true
      }
      if (!committed.exists(_ >= batchId)) {
        ice.commit(Seq(table -> batch), meta = Map(metaKey -> batchId.toString))
        committed = Some(batchId)
      }
    }
  }

  case class FetchEvent(host: String, url: String)
  case class BudgetBreach(host: String, nFetches: Long)

  /** Stateful per-host counter: emits a breach row the first time a host
    * crosses `budget` fetches. `timeoutMs` evicts idle host state in a
    * live deployment; leave it None under `processAllAvailable()`-style
    * synchronous draining — ProcessingTimeTimeout keeps scheduling
    * timeout-evaluation micro-batches, which livelocks that call. */
  def hostBudgetState(fetches: Dataset[FetchEvent], budget: Long,
                      timeoutMs: Option[Long] = None): Dataset[BudgetBreach] = {
    import fetches.sparkSession.implicits._
    val timeoutKind =
      if (timeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    fetches
      .groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append, timeoutKind)(
        (host: String, rows: Iterator[FetchEvent], state: GroupState[Long]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val before = state.getOption.getOrElse(0L)
            val after = before + rows.size
            state.update(after)
            timeoutMs.foreach(state.setTimeoutDuration)
            if (before <= budget && after > budget) Iterator(BudgetBreach(host, after))
            else Iterator.empty
          }
        })
  }

  case class DocEvent(docId: Long, text: String)
  case class DupCandidate(docId: Long, priorId: Long, bandId: Int)

  /** T63: streaming near-duplicate candidates (the Distributed
    * Streaming Set Similarity Join shape, ICDE 2020): each arriving
    * doc is MinHash-banded with the SAME md5 scheme as the batch path
    * ([[graft.ops.Dedup.minhashSigLocal]] — batch-stored band tables
    * and live streams stay interchangeable), keyed by
    * (band_id, band_hash), and each bucket's state holds the doc ids
    * seen there; an arrival emits one candidate row per prior bucket
    * member, so candidates appear the moment the dup arrives, not at
    * the next batch dedup run.
    *
    * State is bounded per bucket (`maxBucket`): LSH keeps honest
    * buckets tiny, and a bucket that outgrows the cap IS an
    * exact-dup cluster — further members still emit candidates
    * against the capped prefix, which is the verdict that matters.
    * The same pair can emit once per shared band; consumers dedup
    * (exactly the batch `minhashCandidates.distinct()` step, done
    * downstream here so the hot path stays append-only). `timeoutMs`
    * evicts idle buckets in live deployments; leave None under
    * synchronous `processAllAvailable()` draining (see
    * [[hostBudgetState]]). */
  def streamingNearDup(docs: Dataset[DocEvent], n: Int = 3, k: Int = 8,
                       rowsPerBand: Int = 2, maxBucket: Int = 64,
                       timeoutMs: Option[Long] = None): Dataset[DupCandidate] = {
    import docs.sparkSession.implicits._
    val timeoutKind =
      if (timeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val banded: Dataset[(String, Int, Long)] = docs.flatMap { d =>
      val sig = graft.ops.Dedup.minhashSigLocal(d.text, n, k)
      if (sig.isEmpty) Iterator.empty
      else graft.ops.Dedup.bandHashesLocal(sig, rowsPerBand).iterator.zipWithIndex
        .map { case (h, b) => (s"$b#$h", b, d.docId) }
    }
    banded
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutKind)(
        (key: String, rows: Iterator[(String, Int, Long)], state: GroupState[List[Long]]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var seen = state.getOption.getOrElse(Nil)
            val out = List.newBuilder[DupCandidate]
            rows.foreach { case (_, band, id) =>
              if (!seen.contains(id)) {
                seen.iterator.take(maxBucket).foreach(p => out += DupCandidate(id, p, band))
                seen = id :: seen
              }
            }
            state.update(seen.take(maxBucket))
            timeoutMs.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
        })
  }
}
