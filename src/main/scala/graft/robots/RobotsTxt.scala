package graft.robots

import graft.model.RobotsRule

/**
 * robots.txt parser (S4 source made whole): the reference consumes raw
 * robots.txt bodies through Python's `urllib.robotparser.RobotFileParser`
 * (`crawler/crawler_node.py:13,44-48`); this is the same grammar and
 * decision procedure in Scala, so a crawl seeded with robots.txt *text*
 * reaches the same allow/deny verdicts the reference reaches.
 *
 * Semantics mirrored from RobotFileParser (documented stdlib behavior):
 *  - groups: consecutive `User-agent:` lines open an entry; the entry
 *    collects `Allow:`/`Disallow:`/`Crawl-delay:` lines until a blank
 *    line that is followed by a new `User-agent:` starts the next group;
 *  - `#` starts a comment; field names are case-insensitive;
 *  - agent match: an entry applies when one of its agents is `*` or is a
 *    case-insensitive substring of the caller's agent token (the part
 *    before the first `/`);
 *  - decision: the FIRST applicable entry in file order wins (the `*`
 *    entry is consulted last); within it, the FIRST rule whose path is a
 *    prefix of the URL path wins; no rule matches -> allowed;
 *  - `Disallow:` with an empty value is an allow-everything rule;
 *  - unfetchable robots (None body) -> everything allowed
 *    (`crawler/crawler_node.py:50-52`).
 *
 * Paths are compared as plain prefixes (the synthetic web and the
 * reference's own tests use unescaped ASCII paths; percent-quoting
 * normalization is out of scope and documented here).
 */
object RobotsTxt {

  /** Column-level disallow predicate over prefix-only rule rows (q55's
    * oracle shape): a row is disallowed iff a rules row joined on
    * (null-safe) and some disallow prefix matches the url path. Null
    * prefixes ⇒ allowed (the reference's permissive fetch-failure
    * default). For Allow-bearing grammars use [[disallowedColOrdered]]
    * — on pure-Disallow rule sets the two agree (the first matching
    * line of an all-disallow list is a disallow iff any line matches). */
  def disallowedCol(pathCol: org.apache.spark.sql.Column,
                    prefixesCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{exists, startswith}
    prefixesCol.isNotNull && exists(prefixesCol, p => startswith(pathCol, p))
  }

  /** Column-level FIRST-MATCH-WINS disallow predicate over ordered
    * `array<struct<allow:boolean, path:string>>` rule rows — the full
    * RobotFileParser decision procedure (first rule whose path is a
    * prefix of the url path decides; empty path matches everything; no
    * match ⇒ allowed), so `Allow: /public` before `Disallow: /`
    * evaluates exactly. Pure built-in column logic (higher-order
    * `filter` keeps file order + `element_at` head) on the tiny
    * broadcast rules array — no Scala UDF on the wave's hottest filter.
    * Null rules ⇒ allowed (permissive fetch-failure default). */
  def disallowedColOrdered(pathCol: org.apache.spark.sql.Column,
                           rulesCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{element_at, filter, length, lit, size, startswith}
    val matching = filter(rulesCol, r =>
      length(r.getField("path")) === 0 || startswith(pathCol, r.getField("path")))
    rulesCol.isNotNull && size(matching) > lit(0) &&
      !element_at(matching, 1).getField("allow")
  }

  /** One `Allow`/`Disallow` line, in file order. */
  final case class Rule(allow: Boolean, path: String) {
    def matches(urlPath: String): Boolean = path.isEmpty || urlPath.startsWith(path)
  }

  /** One user-agent group. */
  final case class Group(agents: Seq[String], rules: Seq[Rule], crawlDelay: Option[Double]) {
    def isDefault: Boolean = agents.contains("*")
    def appliesTo(agentToken: String): Boolean =
      agents.exists(a => a == "*" || agentToken.contains(a))
  }

  final case class Parsed(groups: Seq[Group]) {
    private def agentToken(userAgent: String): String =
      userAgent.split("/", 2)(0).toLowerCase.trim

    private def groupFor(userAgent: String): Option[Group] = {
      val tok = agentToken(userAgent)
      groups.find(g => !g.isDefault && g.appliesTo(tok))
        .orElse(groups.find(_.isDefault))
    }

    /** RobotFileParser.can_fetch: first matching rule of the applicable
      * group; no group / no match -> allowed. */
    def canFetch(userAgent: String, urlPath: String): Boolean =
      groupFor(userAgent) match {
        case None => true
        case Some(g) => g.rules.find(_.matches(urlPath)).forall(_.allow)
      }

    /** RobotFileParser.crawl_delay. */
    def crawlDelay(userAgent: String): Option[Double] =
      groupFor(userAgent).flatMap(_.crawlDelay)
  }

  /** Parse a robots.txt body. */
  def parse(body: String): Parsed = {
    var groups = Vector.empty[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var delay: Option[Double] = None
    // state: 0 = expecting user-agent, 1 = collecting agents, 2 = collecting
    // rules — RobotFileParser's state machine, including its quirk that a
    // group whose agents are never followed by a rule line (blank line or
    // EOF while in state 1) is DISCARDED, not kept as an empty group (an
    // empty group would otherwise shadow the `*` fallback for its agents).
    var state = 0
    def flush(): Unit = {
      if (state == 2 && agents.nonEmpty) groups :+= Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None
    }
    for (raw <- body.linesIterator) {
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case i  => raw.substring(0, i).trim
      }
      if (line.isEmpty) {
        flush(); state = 0
      } else line.split(":", 2) match {
        case Array(k, v) =>
          val key = k.trim.toLowerCase
          val value = v.trim
          key match {
            case "user-agent" =>
              if (state == 2) { flush(); state = 0 } // new group begins
              agents :+= value.toLowerCase
              state = 1
            case "allow" if state != 0 =>
              rules :+= Rule(allow = true, value); state = 2
            case "disallow" if state != 0 =>
              // empty Disallow == allow everything (RobotFileParser)
              if (value.isEmpty) rules :+= Rule(allow = true, "")
              else rules :+= Rule(allow = false, value)
              state = 2
            case "crawl-delay" if state != 0 =>
              delay = scala.util.Try(value.toDouble).toOption.orElse(delay)
              state = 2
            case _ => () // unknown field: ignored (Sitemap etc.)
          }
        case _ => ()
      }
    }
    flush()
    Parsed(groups)
  }

  /** Flatten a parsed body into the pipeline's per-host rule row
    * ([[RobotsRule]]): the applicable group's FULL ordered
    * Allow/Disallow lines (first-match-wins, evaluated by
    * [[disallowedColOrdered]] — Allow-before-Disallow grammars are
    * exact), the Disallow prefixes (the legacy prefix-only projection,
    * still what q55's oracle mirrors), and its crawl-delay (default
    * when absent). */
  def toRule(host: String, body: String, userAgent: String = "*",
             defaultDelay: Double = 1.0): RobotsRule = {
    val p = parse(body)
    val tok = userAgent.split("/", 2)(0).toLowerCase.trim
    val g = p.groups.find(g => !g.isDefault && g.appliesTo(tok))
      .orElse(p.groups.find(_.isDefault))
    RobotsRule(host,
      g.map(_.rules.collect { case Rule(false, path) if path.nonEmpty => path }).getOrElse(Seq.empty),
      g.flatMap(_.crawlDelay).getOrElse(defaultDelay),
      rules = g.map(_.rules.map(r => graft.model.RobotsLine(r.allow, r.path))).getOrElse(Seq.empty))
  }

  /** Unfetchable robots.txt (fetch error): permissive default, matching
    * `crawler/crawler_node.py:50-52`. */
  def permissive(host: String, defaultDelay: Double = 1.0): RobotsRule =
    RobotsRule(host, Seq.empty, defaultDelay)

  /** Robots fetch FAILED (vs merely absent): v1's conservative stance —
    * paths stay permissive but the host is throttled at the 3 s
    * conservative delay until robots can be re-fetched
    * (`archive/crawler_node.py:68-75`). The delay is stored in the rule
    * row's crawlDelay — the single source of truth the wave budget
    * reads; `robotsFailed` remains as a diagnostic flag only. */
  def failed(host: String, conservativeDelay: Double = 3.0): RobotsRule =
    RobotsRule(host, Seq.empty, conservativeDelay, robotsFailed = true)
}
