package graft.corpus

import graft.codec.ImageCodec
import graft.model.{ImageRow, PageRow, RobotsRule}
import graft.urlnorm.UrlCanon

/**
 * Deterministic synthetic web (FIXTURES.md): link graph with Zipf-skewed
 * host popularity (exercises hot-host salting), messy hrefs (exercises
 * CanonicalizeUrl/ResolveUrl), robots rules with a fully-disallowed host
 * (exact version of the reference's robots-compliance test,
 * `test_system.py:164-202`), and an image+caption payload per page
 * (lossless + lossy codecs for the PSNR invariant).
 *
 * Everything derives from splitmix64 streams keyed by (seed, entity id) —
 * no wall clock, no java.util.Random, reproducible across JVMs.
 */
object SyntheticWeb {

  // ---- splitmix64 (public-domain PRNG recurrence) ----
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d493ddaccadf85L
    z ^ (z >>> 31)
  }
  /** n-th draw from the stream keyed by (seed, key). */
  def draw(seed: Long, key: Long, n: Int): Long =
    splitmix64(splitmix64(seed * 1000003L + key) + n * 0x632be59bd9b4e019L)
  private def pick(seed: Long, key: Long, n: Int, bound: Int): Int =
    ((draw(seed, key, n) >>> 1) % bound).toInt

  val Vocab: Vector[String] = Vector(
    "spark", "join", "scan", "filter", "table", "row", "column", "batch",
    "stream", "window", "agg", "hash", "sort", "merge", "key", "value",
    "fast", "slow", "big", "small", "data", "query", "the", "a", "crawl",
    "image", "pixel", "frame", "link", "page", "host", "depth")

  case class Web(pages: Seq[PageRow], images: Seq[ImageRow],
                 robots: Seq[RobotsRule], seeds: Seq[String],
                 truthPixels: Map[String, Array[Byte]]) // image_id -> original pixels

  def hostName(k: Int): String = s"h$k.example.test"
  def pageUrl(hostIdx: Int, page: Int): String = s"http://${hostName(hostIdx)}/p/$page"

  /**
   * Build a web of `nPages` pages over `nHosts` hosts (Zipf(1.2) host
   * popularity). Page global index i determines everything about it.
   */
  def generate(seed: Long, nHosts: Int, nPages: Int): Web = {
    // Zipf host assignment via inverse CDF over 1/k^1.2
    val weights = (1 to nHosts).map(k => 1.0 / math.pow(k, 1.2))
    val total = weights.sum
    val cdf = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    def hostOf(i: Int): Int = {
      val u = ((draw(seed, 7777, i) >>> 11).toDouble / (1L << 53).toDouble)
      val idx = cdf.indexWhere(u <= _)
      if (idx < 0) nHosts - 1 else idx
    }

    val hostIdxOf = (0 until nPages).map(hostOf)
    // per-host local page number (urls stay unique per host)
    val counters = scala.collection.mutable.Map[Int, Int]().withDefaultValue(0)
    val pageNum = (0 until nPages).map { i =>
      val h = hostIdxOf(i); val c = counters(h); counters(h) = c + 1; c
    }
    val urls = (0 until nPages).map(i => pageUrl(hostIdxOf(i), pageNum(i)))
    val urlSet = urls.toSet

    val pages = (0 until nPages).map { i =>
      val h = hostIdxOf(i)
      val url = urls(i)
      val nLinks = pick(seed, 100L + i, 0, 13)
      val links = (0 until nLinks).map { j =>
        val t = pick(seed, 100L + i, 10 + 3 * j, nPages)
        val tUrl = urls(t)
        val tHost = hostIdxOf(t)
        // messy variants (FIXTURES.md §2): exercise canonicalize/resolve
        pick(seed, 100L + i, 11 + 3 * j, 10) match {
          case 0 => tUrl + "#section" + j                          // fragment
          case 1 => tUrl.replace("http://h", "HTTP://H")           // scheme/host case
          case 2 => tUrl + "?b=2&a=1"                              // unsorted query
          case 3 if tHost == h => s"/p/${pageNum(t)}"              // absolute path
          case 4 if tHost == h => s"p/${pageNum(t)}"               // relative (base /p/x -> /p/p/y... resolved)
          case 5 => s"mailto:u$j@example.test"                     // scheme filter noise
          case 6 => s"javascript:void($j)"
          case 7 => tUrl                                           // duplicate target often
          case _ => tUrl
        }
      }
      // ~6% failures
      val status = pick(seed, 200L + i, 0, 100) match {
        case s if s < 94 => 200
        case s if s < 97 => 404
        case _           => 500
      }
      PageRow(url, hostName(hostIdxOf(i)), status, links, imageIdOf(url))
    }

    // a "/private/..." page per populous host to exercise robots filtering:
    // rewrite every 7th page's url path under /private (still unique)
    val pagesWithPrivate = pages.zipWithIndex.map { case (p, i) =>
      if (i % 7 == 3) {
        val u = p.url.replace("/p/", "/private/p/")
        p.copy(url = u, imageId = imageIdOf(u))
      } else p
    }
    // Links still referencing a pre-rewrite url of a /private page now
    // dangle — they 404 at fetch time, which is deliberate (dead links
    // exercise F12 error routing in both pipeline and oracle).
    val finalPages = pagesWithPrivate
    val imagesAndTruth = finalPages.map(_.url).zipWithIndex.map { case (u, i) =>
      imageFor(seed, u, i)
    }
    val images = imagesAndTruth.map(_._1)
    val truth = imagesAndTruth.map { case (img, px) => img.image_id -> px }.toMap

    val robots = (0 until nHosts).flatMap { k =>
      if (k % 10 == 9) None // ~10% of hosts: no robots row (permissive default)
      else if (k == 2) Some(RobotsRule(hostName(k), Seq("/"), 1.0)) // blocks everything
      else {
        val delay = Seq(0.5, 1.0, 1.0, 2.0, 3.0, 5.0)(pick(seed, 300L + k, 0, 6))
        val dis = if (k % 3 == 0) Seq("/private", "/search") else Seq.empty
        Some(RobotsRule(hostName(k), dis, delay))
      }
    }

    // 5 seeds on distinct non-blocked hosts (the reference's "5 seeds" E2E)
    val seeds = finalPages.map(_.url).distinct
      .groupBy(UrlCanon.host).toSeq.sortBy(_._1)
      .filterNot(_._1 == hostName(2))
      .take(5).map(_._2.min)

    Web(finalPages, images, robots, seeds, truth)
  }

  def imageIdOf(canonicalUrl: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(canonicalUrl.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** Deterministic pixels: diagonal gradient + keyed noise. */
  def pixelsFor(seed: Long, key: Long, w: Int, h: Int): Array[Byte] =
    pixelsForInto(seed, key, w, h, new Array[Byte](w * h))

  /** In-place variant: fills the first w*h entries of `px` (sized by the
    * caller, e.g. a per-thread scratch buffer on the bench fetch path —
    * a fresh 20 KB truth-pixel array per fetched page is pure young-gen
    * memory traffic at 100k pages/leg). Returns `px`. */
  def pixelsForInto(seed: Long, key: Long, w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = (x * 255 / math.max(w - 1, 1) + y * 255 / math.max(h - 1, 1)) / 2
        val noise = (draw(seed, key, y * w + x) & 0x1f).toInt - 16
        px(y * w + x) = math.max(0, math.min(255, base + noise)).toByte
        x += 1
      }
      y += 1
    }
    px
  }

  /** Returns the encoded ImageRow together with the pre-encoding
    * ground-truth pixels (the PSNR invariant's reference). */
  def imageFor(seed: Long, canonicalUrl: String, i: Int): (ImageRow, Array[Byte]) = {
    val key = 900000L + i
    val w = Seq(16, 32, 64)(pick(seed, key, 1, 3))
    val h = Seq(16, 32, 48)(pick(seed, key, 2, 3))
    val px = pixelsFor(seed, key, w, h)
    val lossy = (draw(seed, key, 3) & 1L) == 1L
    val bytes = if (lossy) ImageCodec.encodeQdct(px, w, h) else ImageCodec.encodeRaw(px, w, h)
    val fmt = if (lossy) ImageCodec.FmtQdct else ImageCodec.FmtRaw
    val nWords = 5 + pick(seed, key, 4, 26)
    val caption = (0 until nWords).map(j => Vocab(pick(seed, key, 10 + j, Vocab.size))).mkString(" ")
    (ImageRow(imageIdOf(canonicalUrl), bytes, w, h, fmt, caption, ImageCodec.phash64(px, w, h)), px)
  }
}
