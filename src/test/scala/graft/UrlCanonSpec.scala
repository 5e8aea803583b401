package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.urlnorm.UrlCanon

class UrlCanonSpec extends AnyFunSuite {

  /** Deterministic ScalaCheck sampling (no scalatestplus bridge in the
    * offline cache — we drive Gen directly). */
  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  test("canonicalize: reference behaviors (F1/F2) + north-rule upgrades (C10)") {
    val cases = Seq(
      // fragment strip (crawler_node.py:314)
      "http://a.test/p#frag" -> "http://a.test/p",
      // host + scheme lowercase
      "HTTP://WWW.A.Test/P" -> "http://www.a.test/P",
      // default ports dropped
      "http://a.test:80/x" -> "http://a.test/x",
      "https://a.test:443/x" -> "https://a.test/x",
      "http://a.test:8080/x" -> "http://a.test:8080/x",
      // query param sort
      "http://a.test/x?b=2&a=1&c=3" -> "http://a.test/x?a=1&b=2&c=3",
      // empty query dropped, empty path becomes /
      "http://a.test?" -> "http://a.test/",
      "http://a.test" -> "http://a.test/",
      // dot segments
      "http://a.test/a/b/../c/./d" -> "http://a.test/a/c/d",
      // percent normalization: unreserved decoded, other uppercased
      "http://a.test/%7Efoo%2fbar" -> "http://a.test/~foo%2Fbar",
      // trailing fragment only
      "http://a.test/x?a=1#x?b=2" -> "http://a.test/x?a=1")
    cases.foreach { case (in, want) =>
      assert(UrlCanon.canonicalize(in) == want, s"input: $in")
    }
  }

  test("resolve: RFC 3986 reference cases (F3, urljoin parity)") {
    val base = "http://a.test/b/c/d?q=1"
    val cases = Seq(
      "g" -> "http://a.test/b/c/g",
      "./g" -> "http://a.test/b/c/g",
      "/g" -> "http://a.test/g",
      "//other.test/z" -> "http://other.test/z",
      "?y=2" -> "http://a.test/b/c/d?y=2",
      "#s" -> "http://a.test/b/c/d?q=1#s",
      "../g" -> "http://a.test/b/g",
      "../../g" -> "http://a.test/g",
      "http://abs.test/x" -> "http://abs.test/x")
    cases.foreach { case (href, want) =>
      assert(UrlCanon.resolve(base, href) == want, s"href: $href")
    }
    assert(UrlCanon.resolve(base, "") == null)
    assert(UrlCanon.resolve(base, "mailto:x@y.z") == "mailto:x@y.z") // filtered later by F1
    assert(!UrlCanon.isHttpUrl("mailto:x@y.z"))
    assert(UrlCanon.isHttpUrl("HTTPS://X.test/"))
  }

  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "Https")
    host <- Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaLowerChar, Gen.alphaUpperChar, Gen.const('.')))
      .map(_.mkString.take(20)).suchThat(h => h.nonEmpty && !h.startsWith(".") && !h.contains(".."))
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.listOf(Gen.oneOf("a", "B", "..", ".", "x%41", "%7e", "p1"))
    query <- Gen.oneOf("", "?b=2&a=1", "?z=9&y=8&x=7", "?dup=1&dup=0")
    frag <- Gen.oneOf("", "#f", "#a?b=1")
  } yield s"$scheme://$host$port/${segs.mkString("/")}$query$frag"

  test("property: canonicalize is idempotent") {
    forAll(genUrl) { u =>
      val once = UrlCanon.canonicalize(u)
      assert(UrlCanon.canonicalize(once) == once, s"input: $u canonical: $once")
    }
  }

  test("property: canonical URLs have lowercase scheme+host, no fragment, sorted query") {
    forAll(genUrl) { u =>
      val c = UrlCanon.canonicalize(u)
      assert(!c.contains("#"))
      val schemeEnd = c.indexOf("://")
      assert(c.substring(0, schemeEnd) == c.substring(0, schemeEnd).toLowerCase)
      assert(UrlCanon.host(c) == UrlCanon.host(c).toLowerCase)
      val q = c.indexOf('?')
      if (q >= 0) {
        val parts = c.substring(q + 1).split("&").toSeq
        assert(parts == parts.sorted, s"query not sorted: $c")
      }
    }
  }

  test("property: case-variant and fragment-variant URLs collapse to one key") {
    forAll(genUrl) { u =>
      val noFragBase = u.takeWhile(_ != '#')
      assert(UrlCanon.canonicalize(u) == UrlCanon.canonicalize(noFragBase + "#other"))
    }
  }
}
