package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.search.StemToken
import graft.urlnorm.{CanonicalizeUrl, IsHttpUrl, ResolveUrl, UrlHost, UrlPath}

/**
 * Session extension registering the graft SQL surface, so the URL
 * expressions are usable from `spark.sql(...)` as well as the Column
 * API:
 *
 * {{{
 *   SparkSession.builder().withExtensions(new GraftExtensions)...
 *   spark.sql("SELECT canonicalize_url(url), url_host(url) FROM links")
 * }}}
 *
 * (SURVEY.md §2.9 — custom scalar expressions; also injectable via
 * `spark.sql.extensions=graft.GraftExtensions` on spark-submit.)
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CanonicalizeUrl].getName, null, name, usage, "")

  // wrong arity must fail analysis with a readable message, not an
  // IndexOutOfBoundsException out of args(1)
  private def binary(name: String)(f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"$name requires exactly 2 arguments, got ${args.length}")
    f(args.head, args(1))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("canonicalize_url"),
      info("canonicalize_url", "canonicalize_url(url) - RFC 3986 canonical form"),
      (args: Seq[Expression]) => CanonicalizeUrl(args.head)))
    ext.injectFunction((FunctionIdentifier("url_host"),
      info("url_host", "url_host(url) - lowercased host component"),
      (args: Seq[Expression]) => UrlHost(args.head)))
    ext.injectFunction((FunctionIdentifier("resolve_url"),
      info("resolve_url", "resolve_url(base, href) - RFC 3986 reference resolution"),
      binary("resolve_url")(ResolveUrl.apply)))
    ext.injectFunction((FunctionIdentifier("is_http_url"),
      info("is_http_url", "is_http_url(url) - http(s) scheme whitelist"),
      (args: Seq[Expression]) => IsHttpUrl(args.head)))
    ext.injectFunction((FunctionIdentifier("url_path"),
      info("url_path", "url_path(url) - path component (robots prefix matching)"),
      (args: Seq[Expression]) => UrlPath(args.head)))
    ext.injectFunction((FunctionIdentifier("stem_token"),
      info("stem_token", "stem_token(token) - Porter stem"),
      (args: Seq[Expression]) => StemToken(args.head)))
    ext.injectFunction((FunctionIdentifier("long_dot"),
      info("long_dot", "long_dot(a, b) - integer dot product of integral arrays"),
      binary("long_dot")(graft.functions.LongDot.apply)))
  }
}
