package graft.pipeline

import org.apache.spark.TaskContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.codec.ImageCodec
import graft.fetch.Fetcher
import graft.icelite.IceLite
import graft.model._
import graft.seen.UrlSeen
import graft.urlnorm.UrlCanon
import graft.urlnorm.urlfunctions._

/** Tuning knobs for the wave loop. */
case class CrawlConfig(
    waveSeconds: Double = 30.0,   // politeness budget window per wave
    defaultDelay: Double = 1.0,   // crawl-delay when robots has none (`archive/crawler_node.py:34`)
    nPartitions: Int = 32,
    hostSaltTarget: Int = 8,      // target selected-URLs per (host,salt) partition key
    bloomExpectedSeen: Long = 1 << 20,
    // J1 scale path: above this frontier size the seen-set pre-filter
    // switches from one broadcast sketch to the executor-side bucketed
    // sketch table (UrlSeen.filterNewBucketed) — a ~10^10-key frontier
    // cannot ship a single 12 GB sketch to every task
    seenBucketsThreshold: Long = 100000000L,
    seenBuckets: Int = 4096,
    // seed lists longer than this bootstrap distributively (driver ships
    // raw strings only); below it a one-job driver-side path is cheaper
    initDistributedThreshold: Int = 16384,
    // compact the log tables' wave-per-delta dirs every k waves (0 = off):
    // a politeness-bound crawl accretes one small dir per table per wave,
    // and past ~10^3 waves scan planning outgrows the data (IceLite.compact)
    compactEveryWaves: Int = 0)

/**
 * The crawl engine (SURVEY.md §3.1): a batch-iterative wave loop where
 * every reference process boundary collapses into a shuffle or an
 * atomic IceLite commit.
 *
 * One wave:
 * {{{
 *  pending  = frontier ANTI-JOIN fetchlog            (not yet fetched)
 *  robots   ⟕ broadcast join on host; disallowed → fetchlog(robots_denied)
 *  budget   = max(1, floor(waveSeconds / crawl_delay)) per host
 *  selected = row_number over (host ORDER BY depth, seq) <= budget   (politeness O1/§2.8)
 *  fetch    = salted repartition by (host, seq%salt) → mapPartitions  (hot-host skew defused)
 *  verify   = decode payload: PSNR vs ground truth, caption equality  (north-rule invariant)
 *  links    = posexplode → resolve_url → is_http_url → canonicalize_url
 *  firstSeen= min(parent_seq, pos) per canonical URL (intra-wave dedup)
 *  new      = Bloom pre-filter + exact anti-join vs frontier          (J1 two-stage)
 *  seq      = global discovery rank by (parent_seq, pos)  — BFS contract
 *  commit   = frontier Δ, fetchlog Δ, images Δ, indexed_docs Δ,
 *             metrics Δ, lineage Δ — ONE atomic snapshot
 * }}}
 *
 * Determinism contract (matched by the sequential oracle in tests):
 * pages are conceptually processed in (depth, seq) order, links in
 * document order; first-seen-wins with ties broken by (parent_seq,
 * pos); new URLs get consecutive seq in that order. The reference's v1
 * FIFO queue (`archive/master_node.py:16,46-54,73-78`) produces exactly
 * this order when fetch completion is sequential.
 */
class CrawlPipeline(spark: SparkSession, store: IceLite,
                    fetcherB: Broadcast[Fetcher],
                    robots: Seq[RobotsRule],
                    conf: CrawlConfig = CrawlConfig()) {
  import spark.implicits._

  private val frontierSchema = Encoders.product[FrontierEntry].schema
  // fetchlog = FetchOut minus the payload columns (bytes, caption and the
  // link array live only in `images`, the staged fetch table)
  private val fetchlogSchema = org.apache.spark.sql.types.StructType(
    Encoders.product[FetchOut].schema.filterNot(f =>
      f.name == "bytes" || f.name == "caption" || f.name == "outLinks"))

  // ---------- seeding ----------

  /** Canonicalize + first-seen-dedup the seed list; commit frontier
    * snapshot 1 (reference: seeds enqueued in list order,
    * `archive/master_node.py:39-42`). */
  def init(seeds: Seq[String]): Long = {
    // Two shapes, same semantics (canonicalize -> first-seen-wins in list
    // order -> dense seq). Small lists stay driver-side (one job); large
    // bootstraps (10^5..10^7 seeds) go distributed: the driver ships only
    // the raw strings and every per-URL cost (canonicalize, host parse,
    // dedup, row encode) runs executor-side — at N vs 4N cores a driver-
    // serial init is pure Amdahl overhead charged to both legs.
    val (entriesDf: DataFrame, knownRows: Option[Long]) = if (seeds.size <= conf.initDistributedThreshold) {
      val canon = seeds.map(UrlCanon.canonicalize).filter(UrlCanon.isHttpUrl)
      val firstSeen = scala.collection.mutable.LinkedHashSet[String]()
      canon.foreach(firstSeen += _)
      val entries = firstSeen.toSeq.zipWithIndex.map { case (u, i) =>
        FrontierEntry(u, UrlCanon.host(u), depth = 0, seq = i + 1L, parent = "", wave = 0)
      }
      // parallelize the seed write: a driver Seq becomes a single-task
      // local relation otherwise (a 10^7-seed bootstrap would serialize)
      (spark.createDataset(entries).repartition(conf.nPartitions).toDF(),
        Some(entries.size.toLong))
    } else {
      val raw = spark.sparkContext.parallelize(seeds, conf.nPartitions)
        .zipWithIndex() // positional: preserves seed-list order across partitions
        .toDF("raw", "idx")
      val firstSeen = raw
        .select(canonicalize_url($"raw").as("url"), $"idx")
        .filter(is_http_url($"url"))
        .groupBy($"url").agg(min($"idx").as("idx"))
        .orderBy($"idx")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val schema = firstSeen.schema.add("seq", LongType)
      val df = spark.createDataFrame(
          firstSeen.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) },
          schema)
        .select($"url", url_host($"url").as("host"), lit(0).as("depth"),
          $"seq", lit("").as("parent"), lit(0).as("wave"))
        .as[FrontierEntry].toDF()
      val out = df.localCheckpoint() // materialize before unpersisting the sort
      firstSeen.unpersist(blocking = false)
      (out, None)
    }
    // `seeds` = canonicalized/deduplicated frontier rows (equal to the
    // frontier row count and max seq by construction — readers compare
    // them); `seeds_raw` = the caller's list size including junk/dupes.
    // The distributed branch counts the localCheckpointed result: a
    // cached-partition count, not a recompute.
    val nFrontier = knownRows.getOrElse(entriesDf.count())
    val id = store.commit(
      Seq("frontier" -> entriesDf),
      Map("wave" -> "0", "seeds" -> nFrontier.toString,
        "seeds_raw" -> seeds.size.toString))
    // drop any state cached before seeding
    maxSeqCache = None; loggedCache = None; seenBloom = None
    frontierState = None; flogKeysState = None
    id
  }

  // ---------- state reads ----------

  def frontier(snap: Option[Long] = None): DataFrame =
    store.read(spark, "frontier", snap, Some(frontierSchema))
  def fetchlog(snap: Option[Long] = None): DataFrame =
    store.read(spark, "fetchlog", snap, Some(fetchlogSchema))

  def pending(): DataFrame =
    frontierDf.join(flogKeys, Seq("url"), "left_anti")

  private def robotsDf: DataFrame =
    robots.map(r => (r.host, r.effectiveRules, r.crawlDelay, r.robotsFailed))
      .toDF("host", "rules", "crawl_delay", "robots_failed")

  // ---------- one wave ----------

  // Driver-held wave-to-wave state (performance only — resume recomputes
  // everything from the committed tables, so crashes can't corrupt it):
  // frontier size == max seq (seq is dense), finalized-count, seen-Bloom.
  // The frontier / finalized-key DataFrames are plain multi-dir parquet
  // relations re-resolved from the manifest after each commit — a single
  // scan node regardless of wave count (no union nesting, no block-
  // manager residency, nothing to re-checkpoint on long crawls). Wave
  // sizes are read from manifest footer stats, never count() jobs.
  private var maxSeqCache: Option[Long] = None
  private var loggedCache: Option[Long] = None
  private var seenBloom: Option[org.apache.spark.util.sketch.BloomFilter] = None
  private var frontierState: Option[DataFrame] = None
  private var flogKeysState: Option[DataFrame] = None

  private def frontierDf: DataFrame = frontierState.getOrElse {
    val df = store.read(spark, "frontier", None, Some(frontierSchema))
    frontierState = Some(df); df
  }
  private def flogKeys: DataFrame = flogKeysState.getOrElse {
    val df = fetchlog().select($"url")
    flogKeysState = Some(df); df
  }

  /** Runs wave `wave`; returns number of URLs fetched (0 = frontier drained). */
  def runWave(wave: Int): Long = {
    var t = System.nanoTime()
    val front0 = frontierDf
    // dense seq ⇒ frontier size == max seq; manifest stats answer both
    // totals with zero Spark jobs (fallback: one agg on resume from a
    // pre-stats snapshot)
    val maxSeq = maxSeqCache.getOrElse(
      store.tableStat("frontier").map(_._1)
        .getOrElse(front0.agg(max($"seq")).as[Long].head()))
    maxSeqCache = Some(maxSeq)
    val logged = loggedCache.getOrElse(
      store.tableStat("fetchlog").map(_._1).getOrElse(flogKeys.count()))
    loggedCache = Some(logged)
    if (logged >= maxSeq) return 0L // every enqueued URL is finalized
    // nothing finalized yet (wave 1 of a fresh crawl / a pre-seeded
    // drain) ⇒ pending == frontier; skip the anti-join shuffle entirely
    val pend = if (logged == 0L) frontierDf else pending()

    // robots broadcast join (J3) + disallow predicate (F4); permissive
    // default when no robots row (`crawler/crawler_node.py:49-52`).
    // Pure column logic — url_path is a codegen expression and the
    // prefix test an `exists` over the tiny prefix array (no Scala UDF
    // closure on the highest-volume filter). The path is materialized
    // as a column once so the lambda doesn't re-parse the URL per
    // prefix element.
    // Lazy checkpoint: the anti-join (frontier vs fetchlog) executes once
    // and is reused by both the fetch path and the denied-audit path.
    // With no robots rules at all, the join is the identity and `denied`
    // empty by construction — skip the join AND the checkpoint
    // materialization (100k+ rows through the block manager per wave).
    val (allowed, deniedOpt) = if (robots.isEmpty) (pend, None) else {
      val joined = pend.join(broadcast(robotsDf), Seq("host"), "left")
        .withColumn("__path", url_path($"url"))
        .localCheckpoint(false)
      // ordered first-match-wins rules (full RobotFileParser semantics,
      // Allow lines exact); for pure-Disallow hosts this agrees with the
      // legacy prefix-only predicate bit-for-bit
      val disallowedCol =
        graft.robots.RobotsTxt.disallowedColOrdered($"__path", $"rules")
      (joined.filter(!disallowedCol), Some(joined.filter(disallowedCol)))
    }

    // per-host politeness budget (§2.8): selected_k <= floor(wave/delay).
    // Constant-folded away when it provably cannot bind (no robots rules
    // ⇒ every delay is the default, and floor(wave/default) >= frontier
    // size bounds any per-host count) — the rank window is a full
    // shuffle+sort of the pending set, pure overhead on an unconstrained
    // drain wave.
    val budgetUnbounded =
      robots.isEmpty && conf.waveSeconds / conf.defaultDelay >= maxSeq.toDouble
    val selected = if (budgetUnbounded) {
      allowed.select($"url", $"host", $"depth", $"seq")
    } else {
      // J4 delay semantics: the rule row's crawl_delay is the single
      // source of truth — RobotsTxt.failed() stores v1's conservative
      // 3 s there (`archive/crawler_node.py:75`), present rules carry
      // their own Crawl-delay, and a host with no robots row falls
      // through to the permissive default.
      val delay = if (robots.isEmpty) lit(conf.defaultDelay)
        else coalesce($"crawl_delay", lit(conf.defaultDelay))
      val budget = greatest(lit(1L), floor(lit(conf.waveSeconds) / delay))
      val rankW = Window.partitionBy($"host").orderBy($"depth", $"seq")
      allowed
        .withColumn("budget", budget)
        .withColumn("rk", row_number().over(rankW))
        .filter($"rk" <= $"budget")
        .select($"url", $"host", $"depth", $"seq")
    }

    // salted repartition: a hot host spreads over ceil(cnt/target) keys
    // (performance_optimizer.py:585-589 made real; first wave uses the
    // same formula — counts come from this wave's own selection).
    // Per-host counts via groupBy + broadcast join back, NOT
    // count().over(Window.partitionBy(host)): the window form shuffles
    // AND sorts the whole selection by host, and the hot host's rows
    // all land in one sort partition — a serial tail exactly where the
    // salt was supposed to remove one. The agg is map-side partial
    // (nHosts rows cross the wire); at web scale (10^7+ hosts) the
    // count table outgrows broadcast and the join flips to shuffle +
    // AQE skew split, still sort-free.
    // NOTE: repartition hashes the key columns — pass (host, salt-bucket)
    // raw. Pre-modding to nPartitions values and hashing those would
    // birthday-collide into ~2/3 of the partitions with 3x skew.
    // On a budget-unbounded drain wave no per-host grouping is needed at
    // all (politeness cannot bind), so skip the count/join and hash the
    // fine-grained `seq` directly: the (host, salt) key space is coarse
    // (~nHosts + hot-host buckets), and whole key-groups colliding into
    // the same partition leaves a ±15% row-count spread across fetch
    // tasks — a straggler tail exactly at the highest core count. A dense
    // unique key hashes to ±2%.
    val salted = if (budgetUnbounded) {
      selected.repartition(conf.nPartitions, $"seq")
    } else {
      CrawlPipeline.saltedFetchPartitions(selected, conf.nPartitions, conf.hostSaltTarget)
    }

    // fetch stage (S3): per-partition fetcher, payload decode + invariant
    val fb = fetcherB
    val traceFetch = CrawlPipeline.traceOn
    val fetchedRaw: Dataset[FetchOut] = salted.as[(String, String, Int, Long)]
      .mapPartitions { it0 =>
        val f = fb.value
        val pid = TaskContext.getPartitionId()
        val exec = Option(org.apache.spark.SparkEnv.get).map(_.executorId).getOrElse("driver")
        var fetchNs = 0L
        var rows = 0L
        val t0 = System.nanoTime()
        val it = if (!traceFetch) it0 else new Iterator[(String, String, Int, Long)] {
          def hasNext = {
            val h = it0.hasNext
            if (!h) System.err.println(f"[fetch-trace] pid=$pid rows=$rows fetch=${fetchNs / 1e9}%.1fs total=${(System.nanoTime() - t0) / 1e9}%.1fs")
            h
          }
          def next() = it0.next()
        }
        it.map { case (url, host, depth, seq) =>
          val tf = System.nanoTime()
          val pg = f.fetch(url)
          val out = if (pg.status == 200) {
            // thread-local decode: px (and possibly truthPixels) live in
            // per-thread scratch sized >= w*h; both are fully consumed
            // here, before the next fetch on this thread
            val (px, w, h) = ImageCodec.decodeTL(pg.bytes)
            val ps = ImageCodec.psnr(px, pg.truthPixels, w * h)
            val ph = ImageCodec.phash64(px, w, h)
            FetchOut(url, host, depth, seq, 200, success = true, error = null,
              image_id = graft.corpus.SyntheticWeb.imageIdOf(url),
              outLinks = pg.outLinks, psnr = ps,
              captionOk = pg.caption == pg.truthCaption, wave = wave,
              pid = pid, executor = exec, bytes = pg.bytes, caption = pg.caption,
              w = w, h = h, fmt = ImageCodec.format(pg.bytes), phash = ph,
              nLinks = pg.outLinks.size, nBytes = pg.bytes.length.toLong)
          } else
            FetchOut(url, host, depth, seq, pg.status, success = false,
              error = s"http_${pg.status}", image_id = null, outLinks = Seq.empty,
              psnr = 0.0, captionOk = false, wave = wave, pid = pid, executor = exec,
              bytes = null, caption = null, w = 0, h = 0, fmt = null, phash = 0L,
              nLinks = 0, nBytes = 0L)
          fetchNs += System.nanoTime() - tf
          rows += 1
          out
        }
      }

    // Materialize the fetch EXACTLY ONCE, directly as the wave's staged
    // `images` delta (parquet). Image payloads are written to disk a
    // single time and never pass through the block manager as java
    // objects; every downstream consumer (fetchlog, links, docs,
    // metrics) re-reads only the small columns it needs — parquet
    // column pruning skips the byte pages entirely. The staged dir
    // becomes visible only when the wave's manifest commits.
    val stagedImagesDir = store.stage("images", fetchedRaw.toDF())
    val imagesStat = graft.icelite.ParquetStats.dirStat(stagedImagesDir)
    val nFetched = imagesStat.rows // footer metadata, no job
    val fetched = spark.read.parquet(stagedImagesDir)
    t = CrawlPipeline.trace(t, s"wave $wave select+fetch n=$nFetched files=${imagesStat.files}")

    // discoveries: explode links in document order (F10), resolve (F3),
    // scheme-filter (F1), canonicalize (C10)
    val links = fetched.filter($"success")
      .select($"url".as("parent"), $"depth".as("parent_depth"), $"seq".as("parent_seq"),
        posexplode($"outLinks").as(Seq("pos", "href")))
      .withColumn("resolved", resolve_url($"parent", $"href"))
      .filter($"resolved".isNotNull && is_http_url($"resolved"))
      .withColumn("url", canonicalize_url($"resolved"))

    // intra-wave first-seen-wins: pages are conceptually processed in
    // (depth, seq) order, links in document order, so the winning
    // discovery is min (parent_depth, parent_seq, pos) per canonical URL
    // Persisted: the two-stage seen-filter fans this into two branches
    // (definitely-new / maybe-seen). The probe predicate references only
    // the groupBy key, so Catalyst pushes each branch's filter BELOW the
    // aggregation — the branches' exchange subtrees then differ and
    // ReuseExchange cannot dedupe them, recomputing the full link
    // explode + canonicalize (the wave's widest map stage) once per
    // branch. Materializing the post-agg rows (small: distinct URLs
    // only) runs that stage exactly once.
    // The parent URL string is deliberately NOT in the min-struct: it is
    // recoverable from parent_seq (seq is unique per fetched page), so
    // carrying it would widen the wave's widest shuffle (links ≈ 20× the
    // page count) by a ~60-byte string per row AND make every partial-min
    // comparison a string compare. The winners join back to the fetched
    // pages (small, column-pruned) after the seen-filter instead.
    val candidates = links
      .groupBy($"url")
      .agg(min(struct($"parent_depth", $"parent_seq", $"pos")).as("m"))
      .select($"url", $"m.parent_depth", $"m.parent_seq", $"m.pos",
        ($"m.parent_depth" + 1).as("depth"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // J1 two-stage dedup vs everything ever enqueued. Below the
    // threshold: one driver-maintained broadcast sketch (merged after
    // each commit, never rebuilt from the full frontier). Above it (the
    // 10^10 path): the executor-side bucketed sketch table — built from
    // the frontier as one distributed aggregation, probed via a
    // bucket-cogroup; nothing sketch-sized ever reaches the driver.
    val useBuckets = maxSeq > conf.seenBucketsThreshold
    val novel = if (useBuckets) {
      UrlSeen.filterNewBucketed(candidates, front0.select($"url"), "url",
        conf.seenBuckets, itemsPerBucket = math.max(2L * maxSeq / conf.seenBuckets, 1024L))
    } else {
      val bloom = seenBloom.getOrElse(
        UrlSeen.buildBloom(front0.select($"url"), "url", conf.bloomExpectedSeen))
      seenBloom = Some(bloom)
      UrlSeen.filterNewWithBloom(spark, candidates,
        front0.select($"url"), "url", bloom)
    }

    // global BFS seq assignment: rank by (parent_depth, parent_seq, pos) —
    // distributed via sort + zipWithIndex (no single-partition window at
    // 10^8 discoveries/wave). `novel` is persisted FIRST: a global sort
    // range-samples its input before shuffling, so an unpersisted plan
    // would evaluate the whole discover subtree (link explode + first-
    // seen agg + seen-filter) twice. The sorted result is persisted too,
    // for the two passes zipWithIndex inherently needs (offset count +
    // map); it then goes straight to a staged parquet dir — row count
    // from footers, later consumers (commit reference, bloom merge)
    // read the file. No checkpoint or count jobs anywhere.
    val novelP = novel.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (CrawlPipeline.traceOn) { // sub-phase attribution (trace builds only)
      var tt = System.nanoTime()
      val nCand = candidates.count()
      tt = CrawlPipeline.trace(tt, s"wave $wave [sub] candidates n=$nCand")
      val nNov = novelP.count()
      CrawlPipeline.trace(tt, s"wave $wave [sub] seen-filter novel n=$nNov")
    }
    // Empty-wave short-circuit: a draining frontier (and the final wave
    // of every crawl) discovers nothing new — isEmpty on the persisted
    // novel set is one cheap job, versus the range-sample + sort +
    // zipWithIndex + stage-write + footer-read chain it skips.
    val stagedFrontierDirOpt: Option[String] = if (novelP.isEmpty) None else {
      val sortedNovel = novelP.orderBy($"parent_depth", $"parent_seq", $"pos")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val novelSchema = sortedNovel.schema
        .add("seq", LongType).add("wave", org.apache.spark.sql.types.IntegerType)
      val wv0 = wave
      // Recover the parent URL by joining the winners back to this
      // wave's fetched pages on parent_seq (unique). The fetched side is
      // a column-pruned parquet read ((seq, url) only); at bench scale
      // it broadcasts, at 10^7-page waves it flips to a shuffle join —
      // either is far cheaper than shuffling the parent string through
      // the 20×-larger exploded-link aggregation above.
      val parents = fetched.select($"seq".as("parent_seq"), $"url".as("parent"))
      val newEntries = spark.createDataFrame(
          sortedNovel.rdd.zipWithIndex.map { case (r, i) =>
            Row.fromSeq(r.toSeq :+ (maxSeq + i + 1) :+ wv0) },
          novelSchema)
        .join(parents, Seq("parent_seq"))
        .select($"url", url_host($"url").as("host"), $"depth".cast("int").as("depth"),
          $"seq", $"parent", $"wave")
        .as[FrontierEntry]
      val dir = store.stage("frontier", newEntries.toDF())
      sortedNovel.unpersist(blocking = false)
      Some(dir)
    }
    novelP.unpersist(blocking = false)
    candidates.unpersist(blocking = false)
    val nNew = stagedFrontierDirOpt
      .map(d => graft.icelite.ParquetStats.dirStat(d).rows).getOrElse(0L)

    // fetchlog Δ: wave results + robots-denied finalizations (F12 routing).
    // NOTE: the wave number deliberately never appears as a literal in any
    // plan here — a per-wave literal would defeat the codegen cache and
    // recompile every stage every wave; it travels through closures and
    // the $"wave" column of `fetched` instead.
    val wv = wave
    // With no robots rules, `denied` is empty by construction — skip the
    // union branch entirely: even an empty distinct+encode subtree costs
    // a shuffle stage + job setup per wave.
    val flog = deniedOpt match {
      case None => fetched.drop("bytes", "caption", "outLinks")
      case Some(denied) =>
        val deniedLog = denied.select($"url", $"host", $"depth", $"seq").distinct()
          .as[(String, String, Int, Long)]
          .map { case (url, host, depth, seq) =>
            FetchOut(url, host, depth, seq, -1, success = false,
              error = "robots_disallowed", image_id = null, outLinks = Seq.empty,
              psnr = 0.0, captionOk = false, wave = wv, pid = -1, executor = "scheduler",
              bytes = null, caption = null, w = 0, h = 0, fmt = null, phash = 0L,
              nLinks = 0, nBytes = 0L)
          }
        fetched.drop("bytes", "caption", "outLinks")
          .unionByName(deniedLog.toDF().drop("bytes", "caption", "outLinks"))
    }

    // images Δ = the staged fetch parquet itself (S5 content sink): it
    // carries the input_hint schema columns — imageId(image_id-class
    // key), bytes, w, h, fmt, caption, phash — plus fetch metadata;
    // readers filter success=true for payload rows. No second copy of
    // the bytes is ever written.

    // indexed docs Δ (S6/S7 — url-keyed doc table; url is unique because
    // fetchlog prevents refetch, so upsert == append here)
    val docs = fetched.filter($"success").select(
      $"url",
      array_join(slice(split($"caption", " "), 1, 8), " ").as("title"),
      $"caption".as("content"),
      $"host".as("domain"), $"wave".as("crawl_wave"),
      // stored index-time stamp (`indexer_node.py:96` strftime) — the
      // deterministic crawl clock (epoch + 1 s per wave) rather than
      // wall time, so resume-from-snapshot re-runs commit identical rows.
      // Rendered with timezone-FREE civil arithmetic (DATE math + integer
      // time-of-day), never date_format(timestamp), which formats in
      // spark.sql.session.timeZone — a resume under a different session
      // timezone would otherwise change the stored bytes. CrawlEpoch is
      // a fixed constant, so no per-wave literal enters the plan.
      CrawlPipeline.crawlDateCol($"wave").as("crawl_date"))

    // metrics + lineage Δ (A1 counters, per-partition attribution).
    // Both are aggregates of the same staged scan at different grains;
    // one pass computes the finer (wave, partition, executor) grain and
    // is materialized (localCheckpoint — one row per fetch task, trivially
    // small), then metrics re-aggregates those rows driver-free. Written
    // separately, each table's commit job would re-scan the staged
    // parquet — two full column-pruned scans where one suffices.
    val perPart = fetched.groupBy($"wave", $"pid".as("partitionId"), $"executor")
      .agg(sum(when($"success", 1L).otherwise(0L)).as("fetched"),
        sum(when(!$"success", 1L).otherwise(0L)).as("failed"),
        sum($"nLinks").cast("long").as("linksExtracted"),
        sum($"nBytes").as("bytesWritten"),
        count(lit(1)).as("nRows"))
      .localCheckpoint()
    val metrics = perPart.groupBy($"wave", $"partitionId")
      .agg(sum($"fetched").as("fetched"), sum($"failed").as("failed"),
        sum($"linksExtracted").as("linksExtracted"),
        sum($"bytesWritten").as("bytesWritten"))
      .withColumn("newUrls", lit(null).cast("long"))
    val lineage = perPart
      .select($"wave", $"partitionId", $"executor", $"nRows")
      .withColumn("stage", lit("fetch"))

    t = CrawlPipeline.trace(t, s"wave $wave discover n=$nNew")
    val staged = Seq.newBuilder[(String, String)]
    if (nFetched > 0) staged += "images" -> stagedImagesDir
    stagedFrontierDirOpt.foreach { dir =>
      if (nNew > 0) staged += "frontier" -> dir
      else org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    val deltas = Seq.newBuilder[(String, DataFrame)]
    deltas += "fetchlog" -> flog
    if (nFetched > 0) {
      deltas += "indexed_docs" -> docs
      deltas += "metrics" -> metrics
      deltas += "lineage" -> lineage
    }
    val snapId = store.commit(deltas.result(),
      Map("wave" -> wave.toString, "fetched" -> nFetched.toString, "new_urls" -> nNew.toString),
      staged = staged.result())
    // an all-denied wave stages an empty images dir that no manifest
    // references (it is excluded from `staged` above) — remove it after
    // the commit's fetchlog write has re-read it, mirroring the staged
    // frontier cleanup
    if (nFetched == 0)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stagedImagesDir))

    // advance driver caches to the committed state: counts come from the
    // manifest footer stats of the just-committed delta dirs; the state
    // DataFrames re-resolve against the new manifest (single multi-dir
    // parquet relation — zero jobs here)
    maxSeqCache = Some(maxSeq + nNew)
    loggedCache = Some(store.tableStat("fetchlog", Some(snapId)).map(_._1)
      .getOrElse {
        // resume-from-pre-stats store: legacy dirs without footer stats
        // poison the table total, but the delta THIS commit wrote
        // (d<snapId>) always has stats — its exact row count is
        // nFetched + nDenied, keeping the drained check
        // (logged >= maxSeq) exact even with robots denials
        val sep = java.io.File.separator
        val deltaRows = store.manifest(snapId).stats
          .getOrElse("fetchlog", Seq.empty)
          .filter(_.dir.endsWith(s"${sep}d$snapId"))
          .map(_.rows).filter(_ >= 0).sum
        logged + (if (deltaRows > 0) deltaRows else nFetched)
      })
    frontierState = None
    flogKeysState = None
    if (nNew > 0 && !useBuckets)
      stagedFrontierDirOpt.foreach(dir =>
        seenBloom.foreach(_.mergeInPlace(UrlSeen.buildBloom(
          spark.read.parquet(dir), "url", conf.bloomExpectedSeen))))
    CrawlPipeline.trace(t, s"wave $wave commit")
    nFetched
  }

  /** Drive waves until the frontier drains or maxWaves; resumes from the
    * last committed snapshot (wave counter from commit metadata). */
  def run(maxWaves: Int): Int = {
    val startWave = store.currentSnapshotId
      .map(id => store.commitMeta(id).get("wave").map(_.toInt + 1).getOrElse(1))
      .getOrElse(1)
    var wave = startWave
    var fetchedSomething = true
    while (fetchedSomething && wave < startWave + maxWaves) {
      fetchedSomething = runWave(wave) > 0
      if (fetchedSomething) {
        // periodic log-table compaction (images excluded: payload dirs
        // are already write-once-right-sized and must never be rewritten)
        if (conf.compactEveryWaves > 0 && wave % conf.compactEveryWaves == 0) {
          Seq("frontier", "fetchlog", "metrics", "lineage")
            .foreach(t => store.compact(spark, t))
          frontierState = None // re-resolve against the compacted manifest
          flogKeysState = None
        }
        wave += 1
      }
    }
    wave - 1
  }
}

object CrawlPipeline {
  /** Deterministic crawl clock origin (2025-01-01T00:00:00Z): indexed
    * docs stamp `crawl_date` = epoch + wave seconds, keeping resume
    * re-runs byte-identical where the reference's `time.strftime`
    * (`indexer_node.py:96`) would not be. */
  val CrawlEpoch: Long = 1735689600L

  /** `crawl_date` rendering: "yyyy-MM-dd HH:mm:ss" of the UTC instant
    * CrawlEpoch + wave, built from timezone-free civil arithmetic (DATE
    * day-offset math + integer time-of-day). `date_format(timestamp)`
    * would render in spark.sql.session.timeZone, so the same snapshot
    * resumed under a different session timezone would commit different
    * bytes; this expression is a pure function of `wave` under ANY
    * session configuration, and whole-stage-codegens like any other
    * string concat. */
  def crawlDateCol(wave: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val epochS = lit(CrawlEpoch) + wave.cast("long")
    val days = floor(epochS / 86400L).cast("int")
    val secs = (epochS - days.cast("long") * 86400L).cast("long")
    val two = (c: org.apache.spark.sql.Column) => lpad(c.cast("string"), 2, "0")
    concat(
      date_add(lit(java.sql.Date.valueOf("1970-01-01")), days).cast("string"), lit(" "),
      two(floor(secs / 3600L).cast("long")), lit(":"),
      two(floor(pmod(secs, lit(3600L)) / 60L).cast("long")), lit(":"),
      two(pmod(secs, lit(60L))))
  }

  /** The politeness-bounded fetch stage's salted partitioning (moved out
    * of runWave so the skew bound is spec-testable — the SURVEY §4
    * "domain-aware crawling" recommendation made measurable,
    * `performance_optimizer.py:585-589`): per-host counts from THIS
    * selection via a map-side-partial agg + broadcast join back, salt =
    * floor(count/target) buckets per host, repartition on the RAW
    * (host, seq % salt) pair — pre-modding the pair to nPartitions
    * values and hashing those birthday-collides into ~2/3 of the
    * partitions with 3× skew (BASELINE.md "Scale notes"). A host
    * holding half the selection spreads over count/target buckets, so
    * per-partition row counts stay near-uniform; CrawlParitySpec pins
    * the ≤2× bound on a 50%-one-host selection. */
  def saltedFetchPartitions(selected: DataFrame, nPartitions: Int,
                            hostSaltTarget: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val hostCounts = selected.groupBy(col("host")).agg(count(lit(1)).as("__hc"))
    selected
      .join(broadcast(hostCounts), Seq("host"))
      .withColumn("salt", greatest(lit(1L), floor(col("__hc") / lit(hostSaltTarget))))
      .repartition(nPartitions, col("host"), pmod(col("seq"), col("salt")))
      .select(col("url"), col("host"), col("depth"), col("seq"))
  }

  /** Section timing to stderr when SPARK_GRAFT_TRACE=1 (perf debugging). */
  private[pipeline] val traceOn = sys.env.get("SPARK_GRAFT_TRACE").contains("1")
  def trace(since: Long, msg: String): Long = {
    if (traceOn) System.err.println(f"[crawl-trace] $msg: ${(System.nanoTime() - since) / 1e9}%.2fs")
    System.nanoTime()
  }
}

/** Flat fetch-stage row: FetchResult fields + payload + lineage. */
case class FetchOut(
    url: String, host: String, depth: Int, seq: Long,
    status: Int, success: Boolean, error: String, image_id: String,
    outLinks: Seq[String], psnr: Double, captionOk: Boolean, wave: Int,
    pid: Int, executor: String, bytes: Array[Byte], caption: String,
    w: Int, h: Int, fmt: String, phash: Long,
    nLinks: Int, nBytes: Long) // precomputed so metrics never scan payload columns
