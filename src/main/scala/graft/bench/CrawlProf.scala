package graft.bench

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.bench.{BenchFetcher, BenchWeb}
import graft.fetch.Fetcher
import graft.icelite.IceLite
import graft.pipeline.{CrawlConfig, CrawlPipeline}

object CrawlProf {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nPages = args(1).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"crawl-prof-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val secs = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val gc = si.taskMetrics.jvmGCTime / 1e3
        val cpu = si.taskMetrics.executorCpuTime / 1e9
        val run = si.taskMetrics.executorRunTime / 1e3
        if (secs > 1.0)
          System.err.println(f"[stage] id=${si.stageId} tasks=${si.numTasks} wall=$secs%.1f taskRun=$run%.1f taskCpu=$cpu%.1f gc=$gc%.1f ${si.name.take(60)}")
      }
    })
    val web = BenchWeb(seed = 42L, nHosts = 64, nPages = nPages)
    val fetcher: Fetcher = new BenchFetcher(web)
    val root = Files.createTempDirectory(s"prof-crawl-$cores").toString
    val pipe = new CrawlPipeline(spark, new IceLite(root),
      spark.sparkContext.broadcast(fetcher), robots = Seq.empty,
      CrawlConfig(waveSeconds = 1e9, nPartitions = cores * 2,
        hostSaltTarget = 64, bloomExpectedSeen = nPages.toLong * 2))
    val t0 = System.nanoTime()
    pipe.init(web.seeds)
    pipe.run(maxWaves = 30)
    val fetched = new IceLite(root).read(spark, "fetchlog").count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"CRAWLPROF cores=$cores pages=$nPages fetched=$fetched secs=$secs%.1f rate=${fetched/secs}%.1f")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
