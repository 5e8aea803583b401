package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.urlnorm.urlfunctions._
import Tables._

/**
 * URL-operator coverage (SURVEY.md §2.2/§2.7: F1-F3, F7, C2, C10).
 * URLs are synthesized deterministically from `documents.doc_id`, so the
 * DuckDB oracle can state the expected canonical form directly — the
 * Spark side must genuinely canonicalize (lowercase scheme/host, strip
 * fragment, drop default port, sort query params) to match.
 */
object UrlQueries {

  /** q15: CanonicalizeUrl expression end-to-end (C10). */
  def q15Canonicalize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select($"doc_id",
        concat(lit("HTTP://Host"), ($"doc_id" % 40).cast("string"),
               lit(".Example.TEST:80/p/"), $"doc_id".cast("string"),
               lit("/../q/"), $"doc_id".cast("string"),
               lit("?b=2&a=1#frag")).as("raw_url"))
      .withColumn("url_c", canonicalize_url($"raw_url"))
      .withColumn("host", url_host($"url_c"))
      .orderBy($"doc_id")
  }

  val q15Sql: String =
    """SELECT doc_id,
      | concat('HTTP://Host', doc_id % 40, '.Example.TEST:80/p/', doc_id, '/../q/', doc_id, '?b=2&a=1#frag') AS raw_url,
      | concat('http://host', doc_id % 40, '.example.test/p/q/', doc_id, '?a=1&b=2') AS url_c,
      | concat('host', doc_id % 40, '.example.test') AS host
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q16: ResolveUrl (urljoin, F3) + canonicalize across href families. */
  def q16Resolve(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hostN = ($"doc_id" % 40).cast("string")
    val base = concat(lit("http://h"), hostN, lit(".example.test/a/b"))
    val href = when($"doc_id" % 5 === 0, lit("/abs/path"))
      .when($"doc_id" % 5 === 1, lit("rel/p2"))
      .when($"doc_id" % 5 === 2, lit("?x=1"))
      .when($"doc_id" % 5 === 3, lit("#frag"))
      .otherwise(lit("http://Other.COM/q"))
    documents(s, d)
      .select($"doc_id", base.as("base"), href.as("href"))
      .withColumn("resolved", canonicalize_url(resolve_url($"base", $"href")))
      .orderBy($"doc_id")
  }

  val q16Sql: String =
    """SELECT doc_id,
      | concat('http://h', doc_id % 40, '.example.test/a/b') AS base,
      | CASE doc_id % 5 WHEN 0 THEN '/abs/path' WHEN 1 THEN 'rel/p2'
      |   WHEN 2 THEN '?x=1' WHEN 3 THEN '#frag' ELSE 'http://Other.COM/q' END AS href,
      | CASE doc_id % 5
      |  WHEN 0 THEN concat('http://h', doc_id % 40, '.example.test/abs/path')
      |  WHEN 1 THEN concat('http://h', doc_id % 40, '.example.test/a/rel/p2')
      |  WHEN 2 THEN concat('http://h', doc_id % 40, '.example.test/a/b?x=1')
      |  WHEN 3 THEN concat('http://h', doc_id % 40, '.example.test/a/b')
      |  ELSE 'http://other.com/q' END AS resolved
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q17: scheme whitelist filter (F1 — `crawler/crawler_node.py:315`). */
  def q17SchemeFilter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val url = when($"doc_id" % 4 === 0, concat(lit("http://ex.test/p/"), $"doc_id".cast("string")))
      .when($"doc_id" % 4 === 1, concat(lit("https://ex.test/p/"), $"doc_id".cast("string")))
      .when($"doc_id" % 4 === 2, concat(lit("mailto:u"), $"doc_id".cast("string"), lit("@ex.test")))
      .otherwise(concat(lit("javascript:void("), $"doc_id".cast("string"), lit(")")))
    documents(s, d)
      .select($"doc_id", url.as("url"))
      .filter(is_http_url($"url"))
      .orderBy($"doc_id")
  }

  val q17Sql: String =
    """SELECT doc_id,
      | CASE doc_id % 4
      |  WHEN 0 THEN concat('http://ex.test/p/', doc_id)
      |  WHEN 1 THEN concat('https://ex.test/p/', doc_id)
      |  WHEN 2 THEN concat('mailto:u', doc_id, '@ex.test')
      |  ELSE concat('javascript:void(', doc_id, ')') END AS url
      |FROM documents WHERE doc_id % 4 IN (0, 1) ORDER BY doc_id""".stripMargin

  /** q18: domain projection (F7: `indexer_node.py:89`) + per-domain counts. */
  def q18DomainAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select($"doc_id",
        concat(lit("https://WWW.Site"), ($"doc_id" % 7).cast("string"), lit(".ORG/path/x")).as("url"))
      .withColumn("domain", url_host(canonicalize_url($"url")))
      .groupBy($"domain")
      .agg(count(lit(1)).as("n_pages"), min($"doc_id").as("first_doc"))
      .orderBy($"domain")
  }

  val q18Sql: String =
    """SELECT concat('www.site', doc_id % 7, '.org') AS domain,
      | count(*) AS n_pages, min(doc_id) AS first_doc
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** q43: seed normalization — F6 empty/whitespace guard
    * (`crawler/crawler_node.py:390-393`) + F8 scheme-default projection
    * (`indexer/indexer_node.py:121-122`) + canonicalize, the exact
    * pre-steps user-entered seeds go through before the frontier. */
  def q43SeedNormalize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val n = ($"doc_id" % 9).cast("string")
    val raw = when($"doc_id" % 5 === 0, concat(lit("example"), n, lit(".test/page/"), $"doc_id".cast("string")))
      .when($"doc_id" % 5 === 1, concat(lit("  HTTPS://Example"), n, lit(".TEST/x/"), $"doc_id".cast("string"), lit("  ")))
      .when($"doc_id" % 5 === 2, lit(""))
      .when($"doc_id" % 5 === 3, lit("   "))
      .otherwise(concat(lit("http://example"), n, lit(".test:80/y/"), $"doc_id".cast("string")))
    documents(s, d)
      .select($"doc_id", raw.as("raw_seed"))
      .filter(non_empty_url($"raw_seed"))
      .withColumn("url_c", canonicalize_url(ensure_scheme($"raw_seed")))
      .select($"doc_id", $"url_c")
      .orderBy($"doc_id")
  }

  val q43Sql: String =
    """SELECT doc_id,
      | CASE doc_id % 5
      |  WHEN 0 THEN concat('http://example', doc_id % 9, '.test/page/', doc_id)
      |  WHEN 1 THEN concat('https://example', doc_id % 9, '.test/x/', doc_id)
      |  ELSE concat('http://example', doc_id % 9, '.test/y/', doc_id) END AS url_c
      |FROM documents WHERE doc_id % 5 NOT IN (2, 3) ORDER BY doc_id""".stripMargin

  /** q55: robots allow predicate (F4/J3/J4) end-to-end — raw robots.txt
    * bodies parsed by RobotsTxt (the reference's RobotFileParser grammar,
    * `crawler/crawler_node.py:33-55`), broadcast-joined to the URL set,
    * prefix-tested with pure column logic (`exists` over the disallow
    * array, no UDF), permissive default + default crawl-delay where no
    * robots row exists. The oracle states each (host, path-family)
    * verdict the parsed bodies imply. */
  def q55RobotsFilter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rules = Seq(
      graft.robots.RobotsTxt.toRule("h0.example.test",
        "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"),
      graft.robots.RobotsTxt.toRule("h1.example.test",
        "User-agent: *\nDisallow: /tmp/\nDisallow: /private/\n"))
      .map(r => (r.host, r.disallowPrefixes, r.crawlDelay))
      .toDF("host", "disallow_prefixes", "crawl_delay")
    val id = $"doc_id".cast("string")
    val path = when($"doc_id" % 3 === 0, concat(lit("/p/"), id))
      .when($"doc_id" % 3 === 1, concat(lit("/private/"), id))
      .otherwise(concat(lit("/tmp/"), id))
    documents(s, d)
      .select($"doc_id",
        concat(lit("h"), ($"doc_id" % 4).cast("string"), lit(".example.test")).as("host"),
        path.as("path"))
      .join(broadcast(rules), Seq("host"), "left")
      .withColumn("allowed",
        !graft.robots.RobotsTxt.disallowedCol($"path", $"disallow_prefixes"))
      .withColumn("delay", coalesce($"crawl_delay", lit(1.0)))
      .select($"doc_id", $"host", $"path", $"allowed", $"delay")
      .orderBy($"doc_id")
  }

  val q55Sql: String =
    """SELECT doc_id,
      | concat('h', doc_id % 4, '.example.test') AS host,
      | CASE doc_id % 3 WHEN 0 THEN concat('/p/', doc_id)
      |  WHEN 1 THEN concat('/private/', doc_id)
      |  ELSE concat('/tmp/', doc_id) END AS path,
      | CASE WHEN doc_id % 4 = 0 AND doc_id % 3 = 1 THEN false
      |      WHEN doc_id % 4 = 1 AND doc_id % 3 IN (1, 2) THEN false
      |      ELSE true END AS allowed,
      | CAST(CASE WHEN doc_id % 4 = 0 THEN 2.0 ELSE 1.0 END AS DOUBLE) AS delay
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q106: ordered robots rules (F4 since r3) through the driver gate —
    * first-match-wins over a rule list with an Allow carved ABOVE a
    * broader Disallow, the grammar the prefix-only q55 form cannot
    * express. Rules are built from robots.txt TEXT via the real parser
    * ([[graft.robots.RobotsTxt.toRule]]) and evaluated by the same
    * `disallowedColOrdered` column predicate the crawl wave runs; the
    * oracle hand-unrolls the first-match decision for each host's fixed
    * rule list, so a hash match certifies the ordered evaluation
    * end-to-end from text. Paths /p/0../p/19 make the /p/1 Allow match
    * /p/1 and /p/10../p/19 — prefix semantics, deliberately. */
  def q106RobotsOrdered(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // h0/h2: Allow /p/1 above Disallow /p (carve); h1: Disallow /p/1
    // only; h3: no robots row (permissive default through the left join)
    val carved = "User-agent: *\nAllow: /p/1\nDisallow: /p\n"
    val narrow = "User-agent: *\nDisallow: /p/1\n"
    val rules = Seq(
      graft.robots.RobotsTxt.toRule("h0", carved),
      graft.robots.RobotsTxt.toRule("h1", narrow),
      graft.robots.RobotsTxt.toRule("h2", carved))
      .map(r => (r.host, r.effectiveRules))
      .toDF("host", "rules")
    documents(s, d)
      .select($"doc_id",
        concat(lit("h"), ($"doc_id" % 4).cast("string")).as("host"),
        concat(lit("/p/"), ($"doc_id" % 20).cast("string")).as("path"))
      .join(broadcast(rules), Seq("host"), "left")
      .withColumn("denied",
        graft.robots.RobotsTxt.disallowedColOrdered($"path", $"rules"))
      .select($"doc_id", $"host", $"path", $"denied")
      .orderBy($"doc_id")
  }

  val q106Sql: String =
    """SELECT doc_id, host, path,
      | CASE host
      |  WHEN 'h1' THEN starts_with(path, '/p/1')
      |  WHEN 'h3' THEN FALSE
      |  ELSE (NOT starts_with(path, '/p/1')) AND starts_with(path, '/p')
      | END AS denied
      |FROM (
      | SELECT doc_id, concat('h', doc_id % 4) AS host,
      |  concat('/p/', doc_id % 20) AS path
      | FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** q92 (T50): tracking-parameter strip — utm-prefixed/click-id params are
    * removed, content params survive in order, an all-tracking query
    * drops its '?'. The oracle states each expected form directly, so
    * the Spark side must genuinely parse/filter/rejoin the query
    * string. */
  def q92TrackingParams(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val id = $"doc_id".cast("string")
    val raw = when($"doc_id" % 4 === 0,
        concat(lit("http://ex.test/p/"), id, lit("?utm_source=news&a="), id, lit("&fbclid=XYZ")))
      .when($"doc_id" % 4 === 1,
        concat(lit("http://ex.test/p/"), id, lit("?b=2&UTM_Medium=email&a=1")))
      .when($"doc_id" % 4 === 2,
        concat(lit("http://ex.test/p/"), id, lit("?utm_campaign=x&gclid="), id))
      .otherwise(concat(lit("http://ex.test/p/"), id))
    documents(s, d)
      .select($"doc_id", raw.as("url"))
      .withColumn("url_s", strip_tracking_params($"url"))
      .orderBy($"doc_id")
  }

  val q92Sql: String =
    """SELECT doc_id,
      | CASE doc_id % 4
      |  WHEN 0 THEN concat('http://ex.test/p/', doc_id, '?utm_source=news&a=', doc_id, '&fbclid=XYZ')
      |  WHEN 1 THEN concat('http://ex.test/p/', doc_id, '?b=2&UTM_Medium=email&a=1')
      |  WHEN 2 THEN concat('http://ex.test/p/', doc_id, '?utm_campaign=x&gclid=', doc_id)
      |  ELSE concat('http://ex.test/p/', doc_id) END AS url,
      | CASE doc_id % 4
      |  WHEN 0 THEN concat('http://ex.test/p/', doc_id, '?a=', doc_id)
      |  WHEN 1 THEN concat('http://ex.test/p/', doc_id, '?b=2&a=1')
      |  ELSE concat('http://ex.test/p/', doc_id) END AS url_s
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q93 (T51): crawl-trap detection. Three synthesized URL families
    * per host: a calendar-style trap (`/cal/2020/<id>` — one distinct
    * URL per doc), a bounded article family (8 distinct pages), and a
    * single static page. Only the trap template crosses the
    * distinct-URL threshold. Host/path come from the URL via the
    * native url expressions; the oracle rebuilds the same grouping
    * with DuckDB regexp_replace. */
  def q93UrlTraps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val id = $"doc_id".cast("string")
    val path = when($"doc_id" % 3 === 0, concat(lit("/cal/2020/"), id))
      .when($"doc_id" % 3 === 1, concat(lit("/article/"), ($"doc_id" % 8).cast("string")))
      .otherwise(lit("/static/about"))
    val url = concat(lit("http://h"), ($"doc_id" % 4).cast("string"),
      lit(".example.test"), path)
    graft.ops.Frontier.trapTemplates(
        documents(s, d).select($"doc_id", url.as("url")), "url", minDistinct = 10L)
      .orderBy($"host", $"template")
  }

  val q93Sql: String =
    """WITH u AS (
      | SELECT concat('h', doc_id % 4, '.example.test') AS host,
      |  CASE doc_id % 3 WHEN 0 THEN concat('/cal/2020/', doc_id)
      |   WHEN 1 THEN concat('/article/', doc_id % 8)
      |   ELSE '/static/about' END AS path
      | FROM documents)
      |SELECT host, regexp_replace(path, '[0-9]+', 'N', 'g') AS template,
      | count(DISTINCT path) AS n_urls,
      | count(DISTINCT path) >= 10 AS trap
      |FROM u GROUP BY 1, 2 ORDER BY host, template""".stripMargin

  /** q96 (T54): max-min-fair wave allocation. Hosts get quadratically
    * skewed pending counts (host index = floor(sqrt(doc_id % 100)) →
    * h0 holds 1% of the frontier, h9 holds 19%); capacity is 60% of
    * the frontier, so small hosts are fully served and big hosts clamp
    * to the water level. IEEE sqrt is correctly rounded, so both
    * engines floor identically. */
  def q96FairQuota(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val frontier = documents(s, d).select(
      concat(lit("h"), floor(sqrt(($"doc_id" % 100).cast("double"))).cast("long").cast("string"))
        .as("host"))
    val cap = documents(s, d).count() * 3 / 5
    graft.ops.Frontier.fairHostQuota(frontier, "host", cap)
      .orderBy($"host")
  }

  val q96Sql: String =
    """WITH f AS (
      | SELECT concat('h', CAST(CAST(floor(sqrt(doc_id % 100)) AS BIGINT) AS VARCHAR)) AS host
      | FROM documents),
      |counts AS (SELECT host, count(*) AS pending FROM f GROUP BY host),
      |cap AS (SELECT count(*) * 3 // 5 AS c FROM documents),
      |hist AS (
      | SELECT pending AS c, count(*) AS n_hosts FROM counts GROUP BY pending
      | UNION ALL SELECT 0, 0),
      |lv AS (
      | SELECT c,
      |  sum(c * n_hosts) OVER (ORDER BY c) AS sum_le,
      |  sum(n_hosts) OVER () - sum(n_hosts) OVER (ORDER BY c) AS hosts_gt,
      |  max(c) OVER () AS c_max
      | FROM hist),
      |level AS (
      | SELECT CASE WHEN hosts_gt = 0 THEN c_max
      |  ELSE c + ((SELECT c FROM cap) - (sum_le + hosts_gt * c)) // hosts_gt END AS level
      | FROM lv WHERE sum_le + hosts_gt * c <= (SELECT c FROM cap)
      | ORDER BY c DESC LIMIT 1)
      |SELECT counts.host, counts.pending,
      | CAST(least(counts.pending, level.level) AS BIGINT) AS quota
      |FROM counts, level ORDER BY host""".stripMargin

  /** q100 (capstone, T50-T54 composed): the frontier-hygiene pipeline a
    * production wave runs before fetch selection — strip tracking
    * params (campaign-link variants collapse in the dedup), template
    * traps detected and anti-joined out, mirror hosts demoted as a
    * set, then max-min-fair quotas over what remains. Synthesized
    * frontier: 8 hosts with quadratic skew, every 5th page a
    * calendar-trap URL, hosts h6/h7 serving the same content pool
    * (mirrors — h7 demoted), half the URLs carrying utm noise. Every
    * stage's semantics is pinned by the one DuckDB oracle.
    *
    * Scale shape: the stripped frontier is materialized once and feeds
    * trap detection + the admission anti-joins; the filtered frontier
    * is materialized once and feeds the count + quota; all joins are
    * keyed (host/template equi-joins), quotas are the q96 closed-form
    * water level. */
  def q100FrontierPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = floor(sqrt(($"doc_id" % 64).cast("double"))).cast("long")
    val host = concat(lit("h"), m.cast("string"), lit(".test"))
    val key = when(m >= 6, ($"doc_id" % 40).cast("string"))
      .otherwise(concat(m.cast("string"), lit(":"),
        expr("(doc_id div 64) % 40").cast("string")))
    val path = when($"doc_id" % 5 === 0,
        concat(lit("/cal/2020/"), $"doc_id".cast("string")))
      .otherwise(concat(lit("/p/"), ($"doc_id" % 4).cast("string")))
    val qstr = when($"doc_id" % 2 === 0,
        concat(lit("?utm_source=x&id="), ($"doc_id" % 200).cast("string")))
      .otherwise(concat(lit("?id="), ($"doc_id" % 200).cast("string")))
    val stripped = documents(s, d)
      .select(concat(lit("http://"), host, path, qstr).as("url"),
        host.as("host"), md5(key).as("digest"))
      .withColumn("url_s", strip_tracking_params($"url"))
      .localCheckpoint()
    val traps = graft.ops.Frontier
      .trapTemplates(stripped.select($"url_s".as("url")), "url", minDistinct = 5L)
      .filter($"trap").select($"host", $"template")
    val demoted = graft.ops.Dedup
      .mirrorHostPairs(stripped.select($"host", $"digest"), "host", "digest",
        dfCap = 8L, minJaccardPpm = 500000L)
      .select($"host_b".as("host")).distinct()
    val fr = stripped
      .withColumn("template", regexp_replace(url_path($"url_s"), "[0-9]+", "N"))
      .join(traps, Seq("host", "template"), "left_anti")
      .join(demoted, Seq("host"), "left_anti")
      .select($"host", $"url_s").distinct()
      .localCheckpoint()
    val cap = fr.count() * 3 / 5
    graft.ops.Frontier.fairHostQuota(fr, "host", cap).orderBy($"host")
  }

  val q100Sql: String =
    """WITH raw AS (
      | SELECT doc_id,
      |  concat('h', CAST(CAST(floor(sqrt(doc_id % 64)) AS BIGINT) AS VARCHAR), '.test') AS host,
      |  CAST(floor(sqrt(doc_id % 64)) AS BIGINT) AS m,
      |  CASE WHEN doc_id % 5 = 0 THEN concat('/cal/2020/', doc_id)
      |   ELSE concat('/p/', doc_id % 4) END AS path,
      |  doc_id % 200 AS idp
      | FROM documents),
      |hd AS (
      | SELECT DISTINCT host,
      |  md5(CASE WHEN m >= 6 THEN CAST(doc_id % 40 AS VARCHAR)
      |       ELSE concat(m, ':', CAST((doc_id // 64) % 40 AS VARCHAR)) END) AS digest
      | FROM raw),
      |sizes AS (SELECT host, count(*) AS n_pages FROM hd GROUP BY host),
      |dfreq AS (SELECT digest FROM hd GROUP BY digest
      | HAVING count(*) >= 2 AND count(*) <= 8),
      |kept AS (SELECT hd.host, hd.digest FROM hd JOIN dfreq USING (digest)),
      |mpairs AS (
      | SELECT a.host AS host_a, b.host AS host_b, count(*) AS shared
      | FROM kept a JOIN kept b ON a.digest = b.digest AND a.host < b.host
      | GROUP BY 1, 2),
      |demoted AS (
      | SELECT DISTINCT host_b AS host FROM mpairs
      | JOIN sizes sa ON sa.host = mpairs.host_a
      | JOIN sizes sb ON sb.host = mpairs.host_b
      | WHERE (shared * 1000000) // (sa.n_pages + sb.n_pages - shared) >= 500000),
      |tmpl AS (
      | SELECT host, regexp_replace(path, '[0-9]+', 'N', 'g') AS template,
      |  count(DISTINCT path) AS n
      | FROM raw GROUP BY 1, 2),
      |traps AS (SELECT host, template FROM tmpl WHERE n >= 5),
      |fr AS (
      | SELECT DISTINCT r.host, r.path, r.idp FROM raw r
      | WHERE NOT EXISTS (SELECT 1 FROM traps t WHERE t.host = r.host
      |   AND t.template = regexp_replace(r.path, '[0-9]+', 'N', 'g'))
      |  AND NOT EXISTS (SELECT 1 FROM demoted dm WHERE dm.host = r.host)),
      |counts AS (SELECT host, count(*) AS pending FROM fr GROUP BY host),
      |cap AS (SELECT count(*) * 3 // 5 AS c FROM fr),
      |hist AS (SELECT pending AS c, count(*) AS n_hosts FROM counts GROUP BY pending
      | UNION ALL SELECT 0, 0),
      |lv AS (SELECT c, sum(c * n_hosts) OVER (ORDER BY c) AS sum_le,
      |  sum(n_hosts) OVER () - sum(n_hosts) OVER (ORDER BY c) AS hosts_gt,
      |  max(c) OVER () AS c_max FROM hist),
      |level AS (SELECT CASE WHEN hosts_gt = 0 THEN c_max
      |  ELSE c + ((SELECT c FROM cap) - (sum_le + hosts_gt * c)) // hosts_gt END AS level
      | FROM lv WHERE sum_le + hosts_gt * c <= (SELECT c FROM cap)
      | ORDER BY c DESC LIMIT 1)
      |SELECT counts.host, counts.pending,
      | CAST(least(counts.pending, level.level) AS BIGINT) AS quota
      |FROM counts, level ORDER BY host""".stripMargin

  /** q103 (T61): SURT clustering key over a subdomain-rich synthetic
    * frontier. The output carries the registered domain alongside the
    * key so the oracle pins BOTH the transform and what it buys: rows
    * sorted by `surt` put each domain's subdomains in one contiguous
    * range (the min/max-footer pruning property; see
    * `urlfunctions.surt_key`). */
  def q103SurtKey(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sub = element_at(
      array(lit(""), lit("www."), lit("news."), lit("img."), lit("cdn.")),
      (($"doc_id" % 5) + 1).cast("int"))
    val raw = concat(lit("http://"), sub, lit("dom"), ($"doc_id" % 7).cast("string"),
      lit(".example.test/p/"), $"doc_id".cast("string"), lit("?s=1"))
    documents(s, d)
      .select($"doc_id", canonicalize_url(raw).as("url"))
      .withColumn("surt", surt_key($"url"))
      .withColumn("reg_domain",
        concat(lit("dom"), ($"doc_id" % 7).cast("string"), lit(".example.test")))
      .select($"doc_id", $"url", $"surt", $"reg_domain")
      .orderBy($"surt", $"doc_id")
  }

  val q103Sql: String =
    """WITH u AS (
      | SELECT doc_id,
      |  CASE doc_id % 5 WHEN 0 THEN '' WHEN 1 THEN 'www.' WHEN 2 THEN 'news.'
      |                  WHEN 3 THEN 'img.' ELSE 'cdn.' END AS sub,
      |  'dom' || (doc_id % 7) || '.example.test' AS reg_domain
      | FROM documents)
      |SELECT doc_id,
      | 'http://' || sub || reg_domain || '/p/' || doc_id || '?s=1' AS url,
      | array_to_string(list_reverse(string_split(sub || reg_domain, '.')), ',')
      |   || ')/p/' || doc_id || '?s=1' AS surt,
      | reg_domain
      |FROM u ORDER BY surt, doc_id""".stripMargin
}
