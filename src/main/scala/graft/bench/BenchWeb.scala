package graft.bench

import graft.codec.ImageCodec
import graft.corpus.SyntheticWeb
import graft.fetch.{FetchedPage, Fetcher}

/**
 * Distributed synthetic web for benchmarking: pages, links and image
 * payloads are pure functions of the URL, so fetchers synthesize
 * everything executor-side — no broadcast maps, no driver
 * materialization, arbitrary scale (this is how the 10^10-URL frontier
 * is exercised without 10^10 rows of prebuilt fixture).
 *
 * Page i: `http://h{k}.example.test/p/{i}` with a deliberately hot
 * host 0 (~20% of pages) to exercise salted repartitioning. Fetch work
 * per URL = decode + PSNR verify + phash — the real per-row cost of the
 * crawl's verify stage.
 */
case class BenchWeb(seed: Long, nHosts: Int, nPages: Int) {
  def hostOf(i: Int): Int = if (i % 5 == 0) 0 else i % nHosts
  def urlOf(i: Int): String = s"http://h${hostOf(i)}.example.test/p/$i"
  def seeds: Seq[String] = (0 until math.min(4096, nPages)).map(urlOf)
}

class BenchFetcher(web: BenchWeb) extends Fetcher {
  private val PathRe = "/p/(\\d+)$".r
  // truthPixels is consumed (PSNR) within the same pipeline row, so it
  // lives in a per-thread scratch buffer: a fresh 20 KB array per page is
  // ~2 GB of young-gen churn per 100k-page leg — allocation-rate memory
  // traffic that throttles the high-core-count leg while single-core
  // timings look fine. Contract documented on Fetcher.fetch.
  @transient private lazy val truthTL: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](160 * 128))

  override def fetch(url: String): FetchedPage = {
    val i = PathRe.findFirstMatchIn(url).map(_.group(1).toInt).getOrElse(-1)
    if (i < 0 || i >= web.nPages) return FetchedPage(404, null, null, Seq.empty, null, null)
    val r0 = SyntheticWeb.draw(web.seed, 500000L + i, 0)
    if ((r0 & 63) == 0) return FetchedPage(500, null, null, Seq.empty, null, null)

    val px = SyntheticWeb.pixelsForInto(web.seed, 600000L + i, 160, 128, truthTL.get())
    val lossy = (i & 1) == 1
    val bytes = if (lossy) ImageCodec.encodeQdct(px, 160, 128) else ImageCodec.encodeRaw(px, 160, 128)
    val nWords = 5 + (SyntheticWeb.draw(web.seed, 500000L + i, 1) & 15).toInt
    val caption = (0 until nWords)
      .map(j => SyntheticWeb.Vocab(((SyntheticWeb.draw(web.seed, 500000L + i, 2 + j) >>> 1)
        % SyntheticWeb.Vocab.size).toInt)).mkString(" ")
    val nLinks = 12 + (SyntheticWeb.draw(web.seed, 500000L + i, 20) & 7).toInt
    val links = (0 until nLinks).map { j =>
      val t = ((SyntheticWeb.draw(web.seed, 500000L + i, 30 + j) >>> 1) % web.nPages).toInt
      web.urlOf(t)
    }
    FetchedPage(200, bytes, caption, links, px, caption)
  }
}
