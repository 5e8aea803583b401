package graft.bench

import graft.codec.ImageCodec


/** Standalone (no Spark) scaling probe for the per-row crawl kernel:
  * fetch(synthesize+encode) + decodeTL + psnr + phash, the exact hot
  * path of the bench fetch stage. Run pinned at 1 vs 4 threads to
  * separate host frequency/bandwidth inflation from Spark overheads. */
object KernelScale {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val rows = args(1).toInt
    val web = BenchWeb(seed = 42L, nHosts = 64, nPages = rows * threads)
    val f = new BenchFetcher(web)
    // warmup (capped at nPages: BenchFetcher 404s ids >= nPages, and a
    // 404 row skips the decode/psnr/phash kernel the timing measures)
    runSlice(f, web, 0, math.min(2000, rows * threads))
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { k =>
      val t = new Thread(() => runSlice(f, web, k * rows, rows))
      t.start(); t
    }
    ts.foreach(_.join())
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"KERNEL threads=$threads rowsPerThread=$rows secs=$secs%.2f msPerRow=${secs * 1000 * threads / (rows.toDouble * threads)}%.4f")
  }

  private def runSlice(f: BenchFetcher, web: BenchWeb, off: Int, n: Int): Unit = {
    var acc = 0L
    var i = off
    while (i < off + n) {
      val pg = f.fetch(web.urlOf(i))
      if (pg.status == 200) {
        val (px, w, h) = ImageCodec.decodeTL(pg.bytes)
        val ps = ImageCodec.psnr(px, pg.truthPixels, w * h)
        val ph = ImageCodec.phash64(px, w, h)
        acc ^= ph ^ ps.toLong ^ pg.outLinks.size
      }
      i += 1
    }
    if (acc == 42L) System.err.print("")
  }
}
