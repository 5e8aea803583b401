package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession

import graft.bench.{BenchFetcher, BenchWeb}
import graft.fetch.Fetcher
import graft.icelite.IceLite
import graft.pipeline.{CrawlConfig, CrawlPipeline}

/**
 * Benchmark main (driver contract): prints ONE JSON line.
 *
 *  - `queries`: wall seconds per headline SparkEntry query on
 *    SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS].
 *  - `crawl`: the north-rule metric — URLs fetched+verified per second
 *    over a synthetic frontier, measured at two parallelism levels
 *    (local[8] vs local[32] stands in for N vs 4N executors — no real
 *    cluster in this sandbox) plus the scaling efficiency
 *    (rate32/rate8)/4, target >= 0.8.
 */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One full crawl of `nPages`; returns (urlsFetched, seconds). */
  private def crawlRun(cores: Int, nPages: Int): (Long, Double) = {
    val spark = session(cores)
    try {
      val web = BenchWeb(seed = 42L, nHosts = 64, nPages = nPages)
      val fetcher: Fetcher = new BenchFetcher(web)
      val root = Files.createTempDirectory(s"bench-crawl-$cores").toString
      val pipe = new CrawlPipeline(spark, new IceLite(root),
        spark.sparkContext.broadcast(fetcher), robots = Seq.empty,
        CrawlConfig(waveSeconds = 1e9, nPartitions = cores * 2,
          hostSaltTarget = 64, bloomExpectedSeen = nPages.toLong * 2))
      val t0 = System.nanoTime()
      pipe.init(web.seeds)
      pipe.run(maxWaves = 30)
      val fetched = new IceLite(root).read(spark, "fetchlog").count()
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      (fetched, secs)
    } finally spark.stop()
  }

  private val headline = Seq(
    "q01_agg", "q02_join_broadcast", "q05_first_seen", "q13_token_freq",
    "q21_minhash_lsh", "q22_simhash", "q24_knn_cosine", "q31_sessionize")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val crawlPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "60000").toInt

    // 1) headline query timings
    val spark = session(cpus)
    val queryTimes = try {
      headline.filter(SparkEntry.queries.contains).map { name =>
        val fn = SparkEntry.queries(name)
        fn(spark, sfDir).count() // warm (plan + IO cache)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      }
    } finally spark.stop()

    // 2) crawl throughput at two parallelism levels (N vs 4N)
    val (f8, s8) = crawlRun(8, crawlPages)
    val (f32, s32) = crawlRun(32, crawlPages)
    val rate8 = f8 / s8
    val rate32 = f32 / s32
    val eff = (rate32 / rate8) / 4.0

    val qs = queryTimes.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = queryTimes.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","crawl":{"pages":$crawlPages,"urls_per_sec_local8":$rate8%.1f,"urls_per_sec_local32":$rate32%.1f,"scaling_efficiency":$eff%.3f,"fetched_local8":$f8,"fetched_local32":$f32,"secs_local8":$s8%.1f,"secs_local32":$s32%.1f}}""")
  }
}
