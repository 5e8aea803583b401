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
    bloomExpectedSeen: Long = 1 << 20)

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
  // fetchlog = FetchOut minus the payload columns (bytes live in `images`)
  private val fetchlogSchema = org.apache.spark.sql.types.StructType(
    Encoders.product[FetchOut].schema.filterNot(f => f.name == "bytes" || f.name == "caption"))

  // ---------- seeding ----------

  /** Canonicalize + first-seen-dedup the seed list; commit frontier
    * snapshot 1 (reference: seeds enqueued in list order,
    * `archive/master_node.py:39-42`). */
  def init(seeds: Seq[String]): Long = {
    val canon = seeds.map(UrlCanon.canonicalize).filter(UrlCanon.isHttpUrl)
    val firstSeen = scala.collection.mutable.LinkedHashSet[String]()
    canon.foreach(firstSeen += _)
    val entries = firstSeen.toSeq.zipWithIndex.map { case (u, i) =>
      FrontierEntry(u, UrlCanon.host(u), depth = 0, seq = i + 1L, parent = "", wave = 0)
    }
    store.commit(Seq("frontier" -> entries.toDF()),
      Map("wave" -> "0", "seeds" -> entries.size.toString))
  }

  // ---------- state reads ----------

  def frontier(snap: Option[Long] = None): DataFrame =
    store.read(spark, "frontier", snap, Some(frontierSchema))
  def fetchlog(snap: Option[Long] = None): DataFrame =
    store.read(spark, "fetchlog", snap, Some(fetchlogSchema))

  def pending(): DataFrame =
    frontier().join(fetchlog().select($"url").distinct(), Seq("url"), "left_anti")

  private def robotsDf: DataFrame =
    robots.map(r => (r.host, r.disallowPrefixes, r.crawlDelay))
      .toDF("host", "disallow_prefixes", "crawl_delay")

  // ---------- one wave ----------

  /** Runs wave `wave`; returns number of URLs fetched (0 = frontier drained). */
  def runWave(wave: Int): Long = {
    val pend = pending()
    if (pend.isEmpty) return 0L

    // robots broadcast join (J3) + disallow predicate (F4); permissive
    // default when no robots row (`crawler/crawler_node.py:49-52`)
    val pathDisallowed = udf { (url: String, prefixes: Seq[String]) =>
      prefixes != null && {
        val p = UrlCanon.pathOf(url)
        prefixes.exists(pre => p.startsWith(pre))
      }
    }
    val joined = pend.join(broadcast(robotsDf), Seq("host"), "left")
    val denied = joined.filter(pathDisallowed($"url", $"disallow_prefixes"))
    val allowed = joined.filter(!pathDisallowed($"url", $"disallow_prefixes"))

    // per-host politeness budget (§2.8): selected_k <= floor(wave/delay)
    val budget = greatest(lit(1L),
      floor(lit(conf.waveSeconds) / coalesce($"crawl_delay", lit(conf.defaultDelay))))
    val rankW = Window.partitionBy($"host").orderBy($"depth", $"seq")
    val selected = allowed
      .withColumn("budget", budget)
      .withColumn("rk", row_number().over(rankW))
      .filter($"rk" <= $"budget")
      .select($"url", $"host", $"depth", $"seq")

    // salted repartition: a hot host spreads over ceil(cnt/target) keys
    // (performance_optimizer.py:585-589 made real; first wave uses the
    // same formula — counts come from this wave's own selection)
    val cntW = Window.partitionBy($"host")
    val salted = selected
      .withColumn("salt", greatest(lit(1L), floor(count(lit(1)).over(cntW) / lit(conf.hostSaltTarget))))
      .withColumn("pkey", pmod(xxhash64($"host", pmod($"seq", $"salt")), lit(conf.nPartitions)))
      .repartition(conf.nPartitions, $"pkey")
      .select($"url", $"host", $"depth", $"seq")

    // fetch stage (S3): per-partition fetcher, payload decode + invariant
    val fb = fetcherB
    val fetched: Dataset[FetchOut] = salted.as[(String, String, Int, Long)]
      .mapPartitions { it =>
        val f = fb.value
        val pid = TaskContext.getPartitionId()
        val exec = Option(org.apache.spark.SparkEnv.get).map(_.executorId).getOrElse("driver")
        it.map { case (url, host, depth, seq) =>
          val pg = f.fetch(url)
          if (pg.status == 200) {
            val (px, w, h) = ImageCodec.decode(pg.bytes)
            val ps = ImageCodec.psnr(px, pg.truthPixels)
            val ph = ImageCodec.phash64(px, w, h)
            FetchOut(url, host, depth, seq, 200, success = true, error = null,
              imageId = graft.corpus.SyntheticWeb.imageIdOf(url),
              outLinks = pg.outLinks, psnr = ps,
              captionOk = pg.caption == pg.truthCaption, wave = wave,
              pid = pid, executor = exec, bytes = pg.bytes, caption = pg.caption,
              w = w, h = h, fmt = ImageCodec.format(pg.bytes), phash = ph)
          } else
            FetchOut(url, host, depth, seq, pg.status, success = false,
              error = s"http_${pg.status}", imageId = null, outLinks = Seq.empty,
              psnr = 0.0, captionOk = false, wave = wave, pid = pid, executor = exec,
              bytes = null, caption = null, w = 0, h = 0, fmt = null, phash = 0L)
        }
      }.localCheckpoint() // fetch exactly once per wave: links, images, log all reuse this

    val nFetched = fetched.count()

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
    val candidates = links
      .groupBy($"url")
      .agg(min(struct($"parent_depth", $"parent_seq", $"pos", $"parent")).as("m"))
      .select($"url", $"m.parent_depth", $"m.parent_seq", $"m.pos",
        ($"m.parent_depth" + 1).as("depth"), $"m.parent")

    // J1 two-stage dedup vs everything ever enqueued
    val front = frontier()
    val novel = UrlSeen.filterNew(spark, candidates, front.select($"url"),
      "url", conf.bloomExpectedSeen)

    // global BFS seq assignment: rank by (parent_depth, parent_seq, pos) —
    // distributed via sort + zipWithIndex (no single-partition window at
    // 10^8 discoveries/wave)
    val maxSeq = front.agg(max($"seq")).as[Long].head()
    val sortedNovel = novel.orderBy($"parent_depth", $"parent_seq", $"pos")
    val novelSchema = sortedNovel.schema.add("seq", LongType)
    val newEntries = spark.createDataFrame(
        sortedNovel.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (maxSeq + i + 1)) },
        novelSchema)
      .select($"url", url_host($"url").as("host"), $"depth".cast("int").as("depth"),
        $"seq", $"parent", lit(wave).as("wave"))
      .as[FrontierEntry]

    // fetchlog Δ: wave results + robots-denied finalizations (F12 routing)
    val deniedLog = denied.select($"url", $"host", $"depth", $"seq").distinct()
      .withColumn("status", lit(-1)).withColumn("success", lit(false))
      .withColumn("error", lit("robots_disallowed"))
      .withColumn("imageId", lit(null).cast("string"))
      .withColumn("outLinks", array().cast("array<string>"))
      .withColumn("psnr", lit(0.0)).withColumn("captionOk", lit(false))
      .withColumn("wave", lit(wave)).withColumn("pid", lit(-1))
      .withColumn("executor", lit("scheduler"))
      .withColumn("bytes", lit(null).cast("binary"))
      .withColumn("caption", lit(null).cast("string"))
      .withColumn("w", lit(0)).withColumn("h", lit(0))
      .withColumn("fmt", lit(null).cast("string")).withColumn("phash", lit(0L))
    val flog = fetched.toDF().drop("bytes", "caption")
      .unionByName(deniedLog.drop("bytes", "caption"))

    // images Δ (S5 content sink — schema per BASELINE.json input_hint)
    val images = fetched.filter($"success").select(
      $"imageId".as("image_id"), $"bytes", $"w", $"h", $"fmt",
      $"caption", $"phash", $"url", lit(wave).as("wave"))

    // indexed docs Δ (S6/S7 — url-keyed doc table; url is unique because
    // fetchlog prevents refetch, so upsert == append here)
    val docs = fetched.filter($"success").select(
      $"url",
      array_join(slice(split($"caption", " "), 1, 8), " ").as("title"),
      $"caption".as("content"),
      $"host".as("domain"), lit(wave).as("crawl_wave"))

    // metrics + lineage Δ (A1 counters, per-partition attribution)
    val metrics = fetched.groupBy($"pid".as("partitionId"))
      .agg(sum(when($"success", 1L).otherwise(0L)).as("fetched"),
        sum(when(!$"success", 1L).otherwise(0L)).as("failed"),
        sum(size($"outLinks")).cast("long").as("linksExtracted"),
        sum(when($"bytes".isNotNull, length($"bytes")).otherwise(0)).cast("long").as("bytesWritten"))
      .withColumn("wave", lit(wave))
      .withColumn("newUrls", lit(null).cast("long"))
    val lineage = fetched.groupBy($"pid".as("partitionId"), $"executor")
      .agg(count(lit(1)).as("nRows"))
      .withColumn("wave", lit(wave)).withColumn("stage", lit("fetch"))

    val nNew = newEntries.count()
    store.commit(
      Seq("frontier" -> newEntries.toDF(), "fetchlog" -> flog, "images" -> images,
        "indexed_docs" -> docs, "metrics" -> metrics, "lineage" -> lineage),
      Map("wave" -> wave.toString, "fetched" -> nFetched.toString, "new_urls" -> nNew.toString))
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
      if (fetchedSomething) wave += 1
    }
    wave - 1
  }
}

/** Flat fetch-stage row: FetchResult fields + payload + lineage. */
case class FetchOut(
    url: String, host: String, depth: Int, seq: Long,
    status: Int, success: Boolean, error: String, imageId: String,
    outLinks: Seq[String], psnr: Double, captionOk: Boolean, wave: Int,
    pid: Int, executor: String, bytes: Array[Byte], caption: String,
    w: Int, h: Int, fmt: String, phash: Long)
