package graft.urlnorm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the URL hot path (SURVEY.md §2.9/§4:
 * canonicalization runs over every discovered link — 10^10-row scale —
 * so it must stay inside whole-stage codegen, not a Scala UDF closure).
 * Each generates a direct static call into [[UrlCanon]] (Scala objects
 * expose static forwarders, so generated Java can call them).
 */
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any = {
    val r = UrlCanon.canonicalize(input.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.urlnorm.UrlCanon.canonicalize($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)
  override def prettyName: String = "canonicalize_url"
}

/** Host extraction over canonical URLs (F7/C2). */
case class UrlHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any = {
    val r = UrlCanon.host(input.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.urlnorm.UrlCanon.host($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): UrlHost =
    copy(child = newChild)
  override def prettyName: String = "url_host"
}

/** RFC 3986 reference resolution — urljoin (F3). Null when unresolvable. */
case class ResolveUrl(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(base: Any, href: Any): Any = {
    val r = UrlCanon.resolve(base.asInstanceOf[UTF8String].toString,
                             href.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // resolve() may return null for non-null inputs — emit an explicit
    // null check instead of defineCodeGen's non-null contract.
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val base = left.genCode(ctx)
    val href = right.genCode(ctx)
    val res = ctx.freshName("resolved")
    ev.copy(code =
      code"""
         |${base.code}
         |${href.code}
         |boolean ${ev.isNull} = true;
         |org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
         |if (!${base.isNull} && !${href.isNull}) {
         |  String $res = graft.urlnorm.UrlCanon.resolve(${base.value}.toString(), ${href.value}.toString());
         |  if ($res != null) {
         |    ${ev.isNull} = false;
         |    ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($res);
         |  }
         |}
         |""".stripMargin)
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ResolveUrl =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "resolve_url"
}

/** Path component extraction (C9 robots-prefix matching base). */
case class UrlPath(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(UrlCanon.pathOf(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.urlnorm.UrlCanon.pathOf($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): UrlPath =
    copy(child = newChild)
  override def prettyName: String = "url_path"
}

/** Scheme whitelist predicate (F1). */
case class IsHttpUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    UrlCanon.isHttpUrl(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.urlnorm.UrlCanon.isHttpUrl($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): IsHttpUrl =
    copy(child = newChild)
  override def prettyName: String = "is_http_url"
}

/** Column-level API for the URL expressions. */
object urlfunctions {
  import org.apache.spark.sql.functions.{concat, length, lit, trim, when}

  def canonicalize_url(c: Column): Column = GraftBridge.column(CanonicalizeUrl(GraftBridge.expression(c)))
  def url_host(c: Column): Column = GraftBridge.column(UrlHost(GraftBridge.expression(c)))
  def url_path(c: Column): Column = GraftBridge.column(UrlPath(GraftBridge.expression(c)))
  def resolve_url(base: Column, href: Column): Column =
    GraftBridge.column(ResolveUrl(GraftBridge.expression(base), GraftBridge.expression(href)))
  def is_http_url(c: Column): Column = GraftBridge.column(IsHttpUrl(GraftBridge.expression(c)))

  /** F8 scheme-default projection (`indexer/indexer_node.py:121-122`):
    * user-entered seeds without an http(s) scheme get "http://" prefixed.
    * Pure built-in column logic — stays in whole-stage codegen. */
  def ensure_scheme(c: Column): Column = {
    val t = trim(c)
    when(t.rlike("(?i)^https?://"), t).otherwise(concat(lit("http://"), t))
  }

  /** F6 empty/whitespace task guard (`crawler/crawler_node.py:390-393`). */
  def non_empty_url(c: Column): Column = c.isNotNull && length(trim(c)) > 0

  /** T50: click-tracking query-parameter strip — the DUST-style
    * canonicalization step (Bar-Yossef et al., "Do Not Crawl in the
    * DUST") that equates URLs differing only in `utm_*`/click-id
    * params. Without it a crawler's seen-set treats every campaign
    * link as a new page and refetches the same content once per
    * tracking token. The reference strips only fragments
    * (`crawler/crawler_node.py:314`); this extends the same
    * normalization family.
    *
    * Pure built-in column logic (split + higher-order `filter` +
    * `array_join`) — evaluated as Catalyst expressions on Tungsten
    * rows, no Scala UDF closure. Empty-after-strip queries drop the
    * '?' entirely; URLs without a query pass through byte-identical,
    * so the function is idempotent (UrlCanonSpec property). A raw
    * (non-canonicalized) URL's `#fragment` is split off before the
    * param filter and re-appended untouched — on canonical input
    * ([[canonicalize_url]] strips fragments) the branch is inert, but
    * raw input must not lose its fragment inside the last query param.
    */
  def strip_tracking_params(c: Column): Column = {
    import org.apache.spark.sql.functions.{array_join, filter => afilter, get, lower, size, split}
    // exact-name click identifiers; utm_* is matched by prefix
    val blocked = Seq("fbclid", "gclid", "msclkid", "mc_eid", "igshid",
      "yclid", "wbraid", "gbraid")
    // `get` (not getItem): a URL without '?' splits to a 1-element
    // array, and under ANSI semantics an out-of-range getItem throws
    // instead of returning null
    val fparts = split(c, "#", 2)
    val nofrag = get(fparts, lit(0))
    val frag = get(fparts, lit(1))
    val parts = split(nofrag, "\\?", 2)
    val base = get(parts, lit(0))
    val query = get(parts, lit(1))
    val kept = afilter(split(query, "&"), p => {
      val key = lower(get(split(p, "=", 2), lit(0)))
      !(key.startsWith("utm_") || key.isin(blocked: _*))
    })
    val stripped = when(query.isNull, nofrag)
      .when(size(kept) === 0, base)
      .otherwise(concat(base, lit("?"), array_join(kept, "&")))
    when(frag.isNull, stripped)
      .otherwise(concat(stripped, lit("#"), frag))
  }

  /** T61: SURT clustering key (Sort-friendly URI Reordering Transform —
    * the Heritrix/Common-Crawl CDX index ordering): host labels
    * reversed and comma-joined, then `)` and the path+query, e.g.
    * `http://news.example.test/a?x=1` → `test,example,news)/a?x=1`.
    *
    * Why a crawl store sorts/partitions by this instead of the raw URL:
    * lexicographic SURT order groups every subdomain of a registered
    * domain into one contiguous key range (`test,example,` is a shared
    * prefix of all `*.example.test` hosts), so per-file min/max footer
    * stats prune whole-domain scans ("everything under example.test")
    * to a handful of files — the same stats-pruning mechanism q97's
    * Z-order key serves for two numeric dimensions, here for the
    * hierarchical string dimension a frontier is actually queried by.
    * Raw-URL order scatters subdomains across the whole keyspace
    * (news.example.test and example.test sort far apart).
    *
    * Pure built-in column logic (split + reverse + array_join +
    * regexp_replace) over the canonical URL — stays in whole-stage
    * codegen; expects [[canonicalize_url]] output (lowercased host,
    * scheme present). */
  def surt_key(c: Column): Column = {
    import org.apache.spark.sql.functions.{array_join, regexp_replace, reverse, split}
    val host = url_host(c)
    val revHost = array_join(reverse(split(host, "\\.")), ",")
    // path + query: strip "scheme://authority"; empty path → "/"
    val rest = regexp_replace(c, "^[a-z][a-z0-9+.-]*://[^/?]*", "")
    when(host.isNull, null)
      .otherwise(concat(revHost, lit(")"),
        when(length(rest) === 0, lit("/")).otherwise(rest)))
  }
}
