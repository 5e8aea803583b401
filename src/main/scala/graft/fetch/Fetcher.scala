package graft.fetch

import graft.model.{ImageRow, PageRow}

/** What a fetch returns (S3 HTTP-fetch source, F5/F12 semantics). */
case class FetchedPage(
    status: Int,
    bytes: Array[Byte],        // encoded image payload (null unless 200)
    caption: String,           // payload caption (null unless 200)
    outLinks: Seq[String],     // raw hrefs in document order
    truthPixels: Array[Byte],  // ground-truth decoded pixels for invariant checks
    truthCaption: String)

/**
 * Fetch boundary (SURVEY.md S3): the pipeline calls this inside
 * mapPartitions — one instance per partition, connection reuse inside
 * (`requests.Session` analogue, `crawler/crawler_node.py:80-83`). A real
 * deployment implements this with an HTTP client; this sandbox has no
 * egress, so the test/bench implementation resolves against the
 * deterministic synthetic web.
 */
trait Fetcher extends Serializable {
  /** `truthPixels` in the returned page may reference a per-thread
    * scratch buffer (sized >= w*h): it is valid only until the next
    * `fetch` on the same thread, and callers must bound reads by the
    * decoded image's w*h, not the array length. The payload `bytes` are
    * always caller-owned. */
  def fetch(url: String): FetchedPage
}

/**
 * Resolves fetches against broadcast synthetic-web maps. Unknown URLs
 * (dangling links) return 404 — the reference's requests exception path
 * (`crawler/crawler_node.py:333-338`).
 */
class SyntheticFetcher(pages: Map[String, PageRow],
                       images: Map[String, ImageRow],
                       truth: Map[String, Array[Byte]]) extends Fetcher {
  override def fetch(url: String): FetchedPage =
    pages.get(url) match {
      case None => FetchedPage(404, null, null, Seq.empty, null, null)
      case Some(p) if p.httpStatus != 200 =>
        FetchedPage(p.httpStatus, null, null, Seq.empty, null, null)
      case Some(p) =>
        val img = images(p.imageId)
        FetchedPage(200, img.bytes, img.caption, p.outLinks,
          truth(p.imageId), img.caption)
    }
}

object SyntheticFetcher {
  import graft.corpus.SyntheticWeb

  /** Build a fetcher for a generated web (ground-truth pixels travel
    * with the Web so the PSNR invariant compares against the original,
    * pre-encoding pixels). */
  def forWeb(web: SyntheticWeb.Web): SyntheticFetcher =
    new SyntheticFetcher(
      web.pages.map(p => p.url -> p).toMap,
      web.images.map(i => i.image_id -> i).toMap,
      web.truthPixels)
}
