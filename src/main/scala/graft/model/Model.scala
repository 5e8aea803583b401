package graft.model

/** Core typed rows (SURVEY.md §1.7 mapping table). */

/** One frontier/urlseen entry — the frontier IS the seen set (first-seen-
  * wins dedup happens at enqueue time, `master/master_node.py:119-127`). */
case class FrontierEntry(
    url: String,      // canonical URL (CanonicalizeUrl output) — the dedup key
    host: String,
    depth: Int,       // BFS depth (seeds = 0)
    seq: Long,        // global first-discovery sequence — (depth, seq) is the drain order
    parent: String,   // discovering page ("" for seeds)
    wave: Int)        // wave in which the entry was discovered

/** Synthetic web page (linkgraph row): what a fetch of `url` returns. */
case class PageRow(
    url: String,            // canonical page URL
    host: String,
    httpStatus: Int,        // 200 / 404 / 500 (F5 status filter)
    outLinks: Seq[String],  // raw hrefs in document order (messy: relative, fragments, schemes)
    imageId: String)        // payload FK into the image corpus

/** Image payload row — schema per BASELINE.json input_hint. */
case class ImageRow(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long)

/** One `Allow`/`Disallow` line in file order; empty path on an allow
  * line is RobotFileParser's allow-everything rule. */
case class RobotsLine(allow: Boolean, path: String)

/** robots.txt rules for one host (S4/F4/J4). `robotsFailed` marks a
  * host whose robots.txt fetch errored: still permissive on paths
  * (v3, `crawler/crawler_node.py:50-52`) but throttled to the v1
  * conservative delay (`archive/crawler_node.py:68-75`).
  *
  * `rules` carries the applicable group's FULL ordered Allow/Disallow
  * lines (first match wins — RobotFileParser's decision procedure), so
  * Allow-before-Disallow grammars evaluate exactly; when empty, the
  * prefix-only `disallowPrefixes` form applies (for pure-Disallow
  * grammars the two agree). */
case class RobotsRule(
    host: String,
    disallowPrefixes: Seq[String],
    crawlDelay: Double,
    robotsFailed: Boolean = false,
    rules: Seq[RobotsLine] = Seq.empty) {
  /** The ordered-line form, derived from the prefixes when the rule was
    * built prefix-only — one uniform shape for the pipeline predicate. */
  def effectiveRules: Seq[RobotsLine] =
    if (rules.nonEmpty) rules else disallowPrefixes.map(RobotsLine(false, _))
}

/** Outcome of fetching one frontier entry (F12 sum-type row). */
case class FetchResult(
    url: String,
    host: String,
    depth: Int,
    seq: Long,
    status: Int,
    success: Boolean,
    error: String,            // null when success
    imageId: String,          // null on failure
    outLinks: Seq[String],    // empty on failure
    psnr: Double,             // payload invariant: decoded-pixel PSNR (Inf for lossless)
    captionOk: Boolean,       // payload invariant: exact caption equality
    wave: Int)

/** Per-partition metrics committed with each wave (A1 counters). */
case class MetricRow(
    wave: Int,
    partitionId: Int,
    fetched: Long,
    failed: Long,
    linksExtracted: Long,
    newUrls: Long,
    bytesWritten: Long)

/** Per-partition lineage attribution committed with each wave. */
case class LineageRow(
    wave: Int,
    stage: String,
    partitionId: Int,
    executor: String,
    nRows: Long)
