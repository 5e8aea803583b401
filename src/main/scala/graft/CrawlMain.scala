package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.SyntheticWeb
import graft.fetch.{Fetcher, SyntheticFetcher}
import graft.icelite.IceLite
import graft.pipeline.{CrawlConfig, CrawlPipeline}

/**
 * The production crawl driver — the `spark-submit` entry point the
 * north rule runs on a multi-executor cluster:
 *
 * {{{
 * spark-submit --class graft.CrawlMain --master yarn \
 *   --num-executors 250 --executor-cores 4 ... graft.jar \
 *   --store hdfs:///crawl/store --max-waves 500 --wave-seconds 30 \
 *   --partitions 2048 --compact-every 64 \
 *   --synthetic seed=42,hosts=64,pages=100000
 * }}}
 *
 * The session is built WITHOUT a master: spark-submit supplies cluster
 * coordinates (local[*] fallback keeps `sbt "runMain graft.CrawlMain"`
 * working). Cluster sizing changes no code path — the same job submits
 * at N and 4N executors; only `--partitions` should scale with the
 * cluster (2-4 tasks per total core).
 *
 * Resume is implicit: if `--store` already holds a committed snapshot,
 * seeding is skipped and the wave loop continues from the last
 * committed wave (CrawlPipeline.run reads the wave counter from commit
 * metadata) — kill the job at any point and resubmit to continue, the
 * per-wave commit is atomic.
 *
 * This sandbox has no egress, so the bundled corpus is the seeded
 * synthetic web (`--synthetic seed=S,hosts=H,pages=N` — deterministic:
 * same args, same crawl). A deployment replaces ONE binding — the
 * `Fetcher` implementation (an HTTP client inside `mapPartitions`,
 * reference `crawler/crawler_node.py:80-83`) and its robots source —
 * everything else (frontier, politeness, seen-set, verify, commit) is
 * fetcher-agnostic.
 */
object CrawlMain {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args)
    val store = a.getOrElse("store",
      sys.error("required: --store <dir> (crawl state root)"))
    val maxWaves = a.getOrElse("max-waves", "100").toInt
    val waveSeconds = a.getOrElse("wave-seconds", "30").toDouble
    val nPartitions = a.getOrElse("partitions", "32").toInt
    val compactEvery = a.getOrElse("compact-every", "64").toInt
    val syn = a.getOrElse("synthetic", "seed=42,hosts=16,pages=2000")
      .split(",").map(_.split("=")).collect { case Array(k, v) => k -> v.toLong }.toMap

    val spark = SparkSession.builder()
      .appName("graft-crawl")
      .config("spark.sql.shuffle.partitions", nPartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

    val web = SyntheticWeb.generate(
      syn.getOrElse("seed", 42L),
      syn.getOrElse("hosts", 16L).toInt,
      syn.getOrElse("pages", 2000L).toInt)
    val fetcher: Fetcher = SyntheticFetcher.forWeb(web)

    val ice = new IceLite(store)
    val pipe = new CrawlPipeline(spark, ice,
      spark.sparkContext.broadcast(fetcher), web.robots,
      CrawlConfig(waveSeconds = waveSeconds, nPartitions = nPartitions,
        compactEveryWaves = compactEvery))

    val resuming = ice.currentSnapshotId.isDefined
    if (!resuming) pipe.init(web.seeds)
    val t0 = System.nanoTime()
    val lastWave = pipe.run(maxWaves)
    val secs = (System.nanoTime() - t0) / 1e9

    val fetched = ice.tableStat("fetchlog").map(_._1).getOrElse(0L)
    val frontier = ice.tableStat("frontier").map(_._1).getOrElse(0L)
    println(f"""{"store":"$store","resumed":$resuming,"last_wave":$lastWave,"frontier":$frontier,"fetched":$fetched,"secs":$secs%.1f,"urls_per_sec":${fetched / math.max(secs, 1e-9)}%.1f}""")
  }
}
