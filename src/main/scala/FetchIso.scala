import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.bench.{BenchFetcher, BenchWeb}
import graft.codec.ImageCodec
import graft.pipeline.FetchOut
import java.util.concurrent.atomic.AtomicLong

object FetchIso {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cpuNs = new AtomicLong(); val gcMs = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        cpuNs.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime)
        gcMs.addAndGet(sc.stageInfo.taskMetrics.jvmGCTime)
      }
    })
    val web = BenchWeb(42L, 64, n)
    val fb = spark.sparkContext.broadcast(new BenchFetcher(web))
    def mkFetch(i: Long): FetchOut = {
      val url = web.urlOf(i.toInt)
      val pg = fb.value.fetch(url)
      if (pg.status == 200) {
        val (px, w, h) = ImageCodec.decode(pg.bytes)
        val ps = ImageCodec.psnr(px, pg.truthPixels)
        val ph = ImageCodec.phash64(px, w, h)
        FetchOut(url, "h", 1, i, 200, true, null, "id", pg.outLinks, ps,
          pg.caption == pg.truthCaption, 1, 0, "e", pg.bytes, pg.caption,
          w, h, ImageCodec.format(pg.bytes), ph, pg.outLinks.size, pg.bytes.length.toLong)
      } else FetchOut(url, "h", 1, i, pg.status, false, "err", null, Seq.empty,
        0.0, false, 1, 0, "e", null, null, 0, 0, null, 0L, 0, 0L)
    }
    def timed(name: String)(f: => Unit): Unit = {
      cpuNs.set(0); gcMs.set(0)
      val t0 = System.nanoTime(); f
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"ISO $name cores=$cores n=$n wall=$wall%.1f cpu=${cpuNs.get/1e9}%.1f gc=${gcMs.get/1e3}%.1f")
    }
    // C: raw RDD fetch, no Row encoder, no write
    timed("C_rdd_fetch") {
      spark.sparkContext.range(0, n, 1, cores * 2)
        .mapPartitions(it => it.map(i => mkFetch(i).nBytes)).sum()
    }
    // B: Dataset encoder, no write
    timed("B_encoder") {
      spark.range(0, n, 1, cores * 2).as[Long].mapPartitions(it => it.map(mkFetch))
        .toDF().selectExpr("sum(nBytes)").collect()
    }
    // A: full parquet write
    val dir = java.nio.file.Files.createTempDirectory("iso").toString
    timed("A_parquet") {
      spark.range(0, n, 1, cores * 2).as[Long].mapPartitions(it => it.map(mkFetch))
        .toDF().write.mode("overwrite").parquet(dir)
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
