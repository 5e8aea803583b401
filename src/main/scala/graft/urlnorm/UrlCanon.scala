package graft.urlnorm

import java.util.Locale

/**
 * Pure-Scala RFC 3986-style URL canonicalization. This is the canonical
 * dedup key for the URL-seen set — the north rule's upgrade of the
 * reference's fragment-strip + urljoin behavior
 * (`crawler/crawler_node.py:310-315` does only `urljoin` + `split('#')[0]`).
 *
 * Steps (deterministic, idempotent):
 *  1. trim; scheme + host lowercased
 *  2. fragment stripped
 *  3. default ports dropped (http:80, https:443)
 *  4. percent-encoding normalized: %XX of unreserved chars decoded,
 *     other %XX uppercased
 *  5. path dot-segments removed (RFC 3986 §5.2.4); empty path → "/"
 *  6. query params sorted lexicographically by raw component; empty
 *     query dropped
 *
 * Invalid inputs (no "scheme://") are returned trimmed but otherwise
 * unchanged — scheme filtering (F1) happens before canonicalization in
 * the pipeline, so this path only ever sees http(s) URLs there.
 */
object UrlCanon {

  def canonicalize(raw: String): String = {
    if (raw == null) return null
    val s = raw.trim
    val schemeEnd = s.indexOf("://")
    if (schemeEnd <= 0) return s
    val scheme = s.substring(0, schemeEnd).toLowerCase(Locale.ROOT)

    // strip fragment first (reference behavior F2)
    val noFrag = { val h = s.indexOf('#'); if (h >= 0) s.substring(0, h) else s }
    val rest = noFrag.substring(schemeEnd + 3)

    // authority = up to first '/' or '?'
    var authEnd = rest.length
    var i = 0
    var found = false
    while (i < rest.length && !found) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?') { authEnd = i; found = true }
      i += 1
    }
    val authority = rest.substring(0, authEnd)
    val pathAndQuery = rest.substring(authEnd)

    // userinfo@host:port
    val at = authority.lastIndexOf('@')
    val userinfo = if (at >= 0) authority.substring(0, at + 1) else ""
    val hostPort = if (at >= 0) authority.substring(at + 1) else authority
    val colon = hostPort.lastIndexOf(':')
    val (host0, port0) =
      if (colon >= 0 && hostPort.drop(colon + 1).forall(_.isDigit) && !hostPort.endsWith("]"))
        (hostPort.substring(0, colon), hostPort.substring(colon + 1))
      else (hostPort, "")
    val host = host0.toLowerCase(Locale.ROOT)
    val port =
      if (port0.isEmpty) ""
      else if (scheme == "http" && port0 == "80") ""
      else if (scheme == "https" && port0 == "443") ""
      else ":" + port0

    // split path / query
    val qMark = pathAndQuery.indexOf('?')
    val rawPath = if (qMark >= 0) pathAndQuery.substring(0, qMark) else pathAndQuery
    val rawQuery = if (qMark >= 0) pathAndQuery.substring(qMark + 1) else null

    val path = {
      val p = removeDotSegments(normalizePct(rawPath))
      if (p.isEmpty) "/" else p
    }
    val query =
      if (rawQuery == null || rawQuery.isEmpty) ""
      else {
        val parts = rawQuery.split("&", -1).filter(_.nonEmpty).map(normalizePct).sorted
        if (parts.isEmpty) "" else "?" + parts.mkString("&")
      }

    scheme + "://" + userinfo + host + port + path + query
  }

  /** Host component of a canonical URL ("" if unparseable). */
  def host(url: String): String = {
    if (url == null) return null
    val schemeEnd = url.indexOf("://")
    if (schemeEnd <= 0) return ""
    val rest = url.substring(schemeEnd + 3)
    var end = rest.length
    var i = 0
    while (i < end) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') { end = i }
      else i += 1
    }
    val auth = rest.substring(0, end)
    val at = auth.lastIndexOf('@')
    val hp = if (at >= 0) auth.substring(at + 1) else auth
    val colon = hp.lastIndexOf(':')
    val h = if (colon >= 0 && hp.drop(colon + 1).forall(_.isDigit)) hp.substring(0, colon) else hp
    h.toLowerCase(Locale.ROOT)
  }

  /**
   * RFC 3986 §5.3 reference resolution (the reference's `urljoin`,
   * `crawler/crawler_node.py:312`). Returns null when href is empty or
   * the result has no usable scheme.
   */
  def resolve(base: String, href: String): String = {
    if (base == null || href == null) return null
    val h = href.trim
    if (h.isEmpty) return null
    // absolute href with scheme
    val schemeIdx = h.indexOf(':')
    if (schemeIdx > 0 && h.substring(0, schemeIdx).forall(c => c.isLetter || c.isDigit || c == '+' || c == '-' || c == '.')
        && h.substring(0, schemeIdx).headOption.exists(_.isLetter))
      return h
    val bSchemeEnd = base.indexOf("://")
    if (bSchemeEnd <= 0) return null
    val scheme = base.substring(0, bSchemeEnd)
    val bRest = base.substring(bSchemeEnd + 3)
    var authEnd = bRest.length
    var i = 0
    var stop = false
    while (i < bRest.length && !stop) {
      val c = bRest.charAt(i)
      if (c == '/' || c == '?' || c == '#') { authEnd = i; stop = true } else i += 1
    }
    val authority = bRest.substring(0, authEnd)
    val bPathQ = bRest.substring(authEnd)
    val bQ = bPathQ.indexOf('?')
    val bHash = { val x = bPathQ.indexOf('#'); if (x >= 0) x else bPathQ.length }
    val bPath = bPathQ.substring(0, math.min(if (bQ >= 0) bQ else bPathQ.length, bHash))

    if (h.startsWith("//")) return scheme + ":" + h
    if (h.startsWith("/")) return scheme + "://" + authority + removeDotSegments(h)
    if (h.startsWith("?")) return scheme + "://" + authority + (if (bPath.isEmpty) "/" else bPath) + h
    if (h.startsWith("#")) return scheme + "://" + authority + bPathQ.substring(0, bHash) + h
    // relative path: merge with base path directory
    val dir = {
      val slash = bPath.lastIndexOf('/')
      if (slash >= 0) bPath.substring(0, slash + 1) else "/"
    }
    scheme + "://" + authority + removeDotSegments(dir + h)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(path: String): String = {
    if (path.isEmpty) return path
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "/..") { in = "/"; if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        val seg = if (next >= 0) in.substring(0, next) else in
        out += seg
        in = if (next >= 0) in.substring(next) else ""
      }
    }
    out.mkString
  }

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == '_' || c == '~'

  /** Normalize percent-encoding: decode unreserved %XX, uppercase the rest. */
  def normalizePct(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = (hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2))
        val ch = v.toChar
        if (isUnreserved(ch)) sb.append(ch)
        else { sb.append('%'); sb.append(Character.toUpperCase(s.charAt(i + 1))); sb.append(Character.toUpperCase(s.charAt(i + 2))) }
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else if (c <= 'F') c - 'A' + 10 else c - 'a' + 10

  /** Path component (incl. leading '/') of a URL; "/" when absent.
    * Query/fragment excluded — robots Disallow prefixes match paths. */
  def pathOf(url: String): String = {
    if (url == null) return "/"
    val schemeEnd = url.indexOf("://")
    if (schemeEnd <= 0) return "/"
    val rest = url.substring(schemeEnd + 3)
    val slash = rest.indexOf('/')
    if (slash < 0) return "/"
    val p = rest.substring(slash)
    val cut = math.min(
      { val q = p.indexOf('?'); if (q >= 0) q else p.length },
      { val h = p.indexOf('#'); if (h >= 0) h else p.length })
    p.substring(0, cut)
  }

  /** Scheme whitelist F1 (`crawler/crawler_node.py:315`). */
  def isHttpUrl(url: String): Boolean =
    url != null && {
      val u = url.trim
      u.regionMatches(true, 0, "http://", 0, 7) || u.regionMatches(true, 0, "https://", 0, 8)
    }
}
