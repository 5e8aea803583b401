package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.urlnorm.urlfunctions._
import graft.ops.{Dedup, Frontier}

/** Frontier-hygiene operators: tracking-param strip (T50), crawl-trap
  * template detection (T51), mirror-host pairs (T52). */
class FrontierHygieneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def strip(u: String): String =
    Seq(u).toDF("url").select(strip_tracking_params($"url")).as[String].head()

  test("T50: strip_tracking_params removes utm_*/click-ids, keeps content params in order") {
    assert(strip("http://a.test/p?utm_source=n&a=1&fbclid=Z&b=2") == "http://a.test/p?a=1&b=2")
    // case-insensitive key match, original value untouched
    assert(strip("http://a.test/p?UTM_Medium=email&a=1") == "http://a.test/p?a=1")
    assert(strip("http://a.test/p?GCLID=xyz") == "http://a.test/p")
    // all-tracking query drops the '?' entirely
    assert(strip("http://a.test/p?utm_campaign=x") == "http://a.test/p")
    // no query: byte-identical passthrough
    assert(strip("http://a.test/p") == "http://a.test/p")
    // utm must be a key PREFIX, not a substring; valueless params survive
    assert(strip("http://a.test/p?xutm_source=1&flag") == "http://a.test/p?xutm_source=1&flag")
  }

  test("T50: raw (non-canonicalized) URLs keep their fragment") {
    // the fragment must not ride inside the last query param and get
    // stripped with it — split it off, filter, re-append
    assert(strip("http://a.test/p?utm_source=x#frag") == "http://a.test/p#frag")
    assert(strip("http://a.test/p?utm_source=x&a=1#frag") == "http://a.test/p?a=1#frag")
    assert(strip("http://a.test/p#frag") == "http://a.test/p#frag")
    // fragment containing '#' and '?' survives verbatim
    assert(strip("http://a.test/p?gclid=z#a#b?c") == "http://a.test/p#a#b?c")
  }

  test("T50: strip_tracking_params is idempotent") {
    val urls = Seq(
      "http://a.test/p?utm_source=n&a=1&fbclid=Z",
      "http://a.test/p?a=1&b=2",
      "http://a.test/p?utm_a=1&utm_b=2",
      "http://a.test/p")
    urls.foreach { u =>
      val once = strip(u)
      assert(strip(once) == once, s"not idempotent on $u")
    }
  }

  test("T51: trapTemplates flags only the exploding template") {
    // calendar trap: 30 distinct URLs collapse to one template;
    // article family: 5 distinct; static: 1
    val urls = ((1 to 30).map(i => s"http://h.test/cal/2020/$i") ++
      (1 to 5).map(i => s"http://h.test/article/$i") ++
      Seq.fill(10)("http://h.test/about")).toDF("url")
    val out = Frontier.trapTemplates(urls, "url", minDistinct = 10L)
      .orderBy($"template")
      .as[(String, String, Long, Boolean)].collect()
    assert(out.toSeq == Seq(
      ("h.test", "/about", 1L, false),
      ("h.test", "/article/N", 5L, false),
      ("h.test", "/cal/N/N", 30L, true)))
  }

  test("T52: mirrorHostPairs computes exact jaccard; df-cap drops boilerplate digests") {
    // m1/m2 share {c1,c2,c3}; m1 also has u1, m2 has u2 → J = 3/5.
    // 'boiler' is on all four hosts — df-cap 3 drops it from candidate
    // generation but it still counts in n_pages (the denominators).
    val pages = Seq(
      ("m1", "c1"), ("m1", "c2"), ("m1", "c3"), ("m1", "u1"), ("m1", "boiler"),
      ("m2", "c1"), ("m2", "c2"), ("m2", "c3"), ("m2", "u2"), ("m2", "boiler"),
      ("x1", "boiler"), ("x2", "boiler"),
      // duplicate row: refetched page must count once
      ("m1", "c1")).toDF("host", "digest")
    val out = Dedup.mirrorHostPairs(pages, "host", "digest", dfCap = 3L, minJaccardPpm = 1L)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("m1", "m2", 3L, 5L, 5L, 3000000L / 7)))
  }

  private def quotas(counts: Seq[(String, Int)], cap: Long): Map[String, Long] = {
    val frontier = counts.flatMap { case (h, n) => Seq.fill(n)(h) }.toDF("host")
    Frontier.fairHostQuota(frontier, "host", cap)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
  }

  test("T54: fairHostQuota water level binds hot hosts, serves small hosts fully") {
    // demands 1,3,10,20, capacity 12: level 4 → 1+3+4+4 = 12 exactly
    assert(quotas(Seq(("a", 1), ("b", 3), ("c", 10), ("d", 20)), 12) ==
      Map("a" -> 1L, "b" -> 3L, "c" -> 4L, "d" -> 4L))
    // capacity 13: level 4 uses 12, remainder 1 < hosts-above-level
    // stays unallocated (level 5 would need 14)
    assert(quotas(Seq(("a", 1), ("b", 3), ("c", 10), ("d", 20)), 13) ==
      Map("a" -> 1L, "b" -> 3L, "c" -> 4L, "d" -> 4L))
  }

  test("T54: fairHostQuota — everything fits and over-subscribed edges") {
    // capacity >= total demand: every host gets its full demand
    assert(quotas(Seq(("a", 2), ("b", 5)), 100) == Map("a" -> 2L, "b" -> 5L))
    assert(quotas(Seq(("a", 2), ("b", 5)), 7) == Map("a" -> 2L, "b" -> 5L))
    // capacity below m * min-demand: level under the smallest count
    // (the virtual zero histogram row), uniform floor(C/m)
    assert(quotas(Seq(("a", 4), ("b", 6), ("c", 9)), 8) ==
      Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // zero capacity: all quotas zero
    assert(quotas(Seq(("a", 4), ("b", 6)), 0) == Map("a" -> 0L, "b" -> 0L))
  }

  test("T54: randomized — quotas feasible, max-min shape, level maximal") {
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 6) {
      val demands = (0 until 3 + rnd.nextInt(8)).map(i => s"h$i" -> (1 + rnd.nextInt(30)))
      val total = demands.map(_._2.toLong).sum
      val cap = rnd.nextInt(1 + 2 * total.toInt).toLong
      val q = quotas(demands, cap)
      val d = demands.toMap.view.mapValues(_.toLong).toMap
      // feasible and within demand
      assert(q.values.sum <= cap || total <= cap, s"trial $trial infeasible")
      q.foreach { case (h, v) => assert(v <= d(h) && v >= 0, s"trial $trial $h") }
      if (total <= cap) {
        assert(q == d, s"trial $trial: everything fits but demand unmet")
      } else {
        // max-min shape: some level L with quota = min(demand, L)
        val clamped = q.filter { case (h, v) => v < d(h) }.values
        assert(clamped.toSet.size <= 1, s"trial $trial: clamped hosts at unequal levels: $q")
        val level = clamped.headOption.getOrElse(q.values.max)
        assert(q == d.view.mapValues(_ min level).toMap, s"trial $trial shape")
        // maximality: level+1 would exceed capacity
        assert(d.values.map(_ min (level + 1)).sum > cap,
          s"trial $trial: level $level not maximal for cap $cap")
      }
    }
  }

  private def surt(u: String): String =
    Seq(u).toDF("url").select(surt_key($"url")).as[String].head()

  test("T61: surt_key reverses host labels, keeps path+query, handles edge shapes") {
    assert(surt("http://news.example.test/a/b?x=1") == "test,example,news)/a/b?x=1")
    assert(surt("http://example.test/a") == "test,example)/a")
    // bare-host URL: empty path becomes "/"
    assert(surt("http://example.test") == "test,example)/")
    assert(surt("https://cdn.img.example.test/x") == "test,example,img,cdn)/x")
  }

  test("T61: sorting by surt_key makes each registered domain one contiguous range") {
    val hosts = Seq(
      "example.test", "news.example.test", "www.example.test",
      "examplf.test", "a.examplf.test",
      "other.test", "z.other.test")
    val rows = hosts.map(h => s"http://$h/p").toDF("url")
      .withColumn("surt", surt_key($"url"))
      .withColumn("dom", regexp_extract($"url", "([a-z]+\\.test)/", 1))
    def contiguous(ordered: Seq[String]): Boolean =
      ordered.zipWithIndex.groupBy(_._1).values.forall { g =>
        val idx = g.map(_._2); idx.max - idx.min + 1 == idx.size
      }
    val bySurt = rows.orderBy($"surt").as[(String, String, String)].collect().map(_._3).toSeq
    val byUrl = rows.orderBy($"url").as[(String, String, String)].collect().map(_._3).toSeq
    assert(contiguous(bySurt), s"surt order scattered a domain: $bySurt")
    // raw-URL order interleaves subdomains of different domains
    assert(!contiguous(byUrl), s"expected raw order to scatter: $byUrl")
  }
}
