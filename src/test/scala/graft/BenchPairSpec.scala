package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench.pairStats — the same-window paired-efficiency estimator read
  * by the bench artifact (no Spark involved). */
class BenchPairSpec extends AnyFunSuite {

  private def withFile(lines: Seq[String])(f: java.nio.file.Path => Unit): Unit = {
    val p = java.nio.file.Files.createTempFile("pairs", ".tsv")
    try {
      java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
      f(p)
    } finally java.nio.file.Files.deleteIfExists(p)
  }

  test("regression bars: per-query and suite violations are reported, clean run is empty") {
    // bars pinned in BASELINE.md "Regression bars"; the artifact carries
    // violations mechanically so a plan regression in a heavy query is
    // visible without re-reading the prose
    val clean = Seq("q21_minhash_lsh" -> 1.8, "q95_dup_spans" -> 4.4,
      "q73_image_dup_clusters" -> 2.0, "q01_agg" -> 0.4)
    assert(Bench.barViolations(clean).isEmpty)
    val bad = Seq("q21_minhash_lsh" -> 11.2, "q95_dup_spans" -> 4.4,
      "q73_image_dup_clusters" -> 2.0, "q01_agg" -> 1.0)
    val v = Bench.barViolations(bad)
    assert(v.exists(_.startsWith("q21_minhash_lsh:11.20>10.0")), v.toString)
    assert(v.exists(_.startsWith("total:18.60>18.0")), v.toString)
    // a query with no bar never violates
    assert(!v.exists(_.startsWith("q01")))
  }

  test("median over clean pairs; dirty warmups and other page counts excluded") {
    val lines = Seq(
      "100000\t80.000\t21.0\t25.000\t11.0",  // clean: eff 0.80
      "100000\t90.000\t20.5\t30.000\t10.8",  // clean: eff 0.75
      "100000\t70.000\t21.0\t20.000\t10.7",  // clean: eff 0.875
      "100000\t100.000\t29.0\t35.000\t15.0", // dirty both warmups
      "2000\t8.000\t21.0\t4.000\t10.7")      // other page count
    withFile(lines) { p =>
      val (med, n) = Bench.pairStats(p, 100000L, wbN = 20.0, wb4 = 10.0)
      assert(n == 3)
      assert(math.abs(med - 0.80) < 1e-9) // sorted effs: .75 .80 .875
    }
  }

  test("drain floors gate pairs whose warmups were quiet but drains were not") {
    // a noise burst arriving AFTER the warmup inflates the drain only:
    // with drain floors supplied, such pairs must not count
    val lines = Seq(
      "100000\t80.000\t21.0\t25.000\t11.0",  // clean: eff 0.80
      "100000\t81.000\t21.0\t87.000\t11.0",  // quiet warmups, 4N drain 3.5x floor
      "100000\t140.000\t21.0\t25.000\t11.0") // quiet warmups, N drain 1.75x floor
    withFile(lines) { p =>
      // without drain floors all three count (legacy behavior)
      assert(Bench.pairStats(p, 100000L, 20.0, 10.0)._2 == 3)
      val (med, n) = Bench.pairStats(p, 100000L, 20.0, 10.0,
        sbN = 80.0, sb4 = 25.0)
      assert(n == 1)
      assert(math.abs(med - 0.80) < 1e-9)
    }
  }

  test("drain gate is 1.15x: a 20%-over drain is excluded, 10%-over kept") {
    val lines = Seq(
      "100000\t80.000\t21.0\t27.500\t11.0",  // 4N drain 1.10x floor: kept
      "100000\t80.000\t21.0\t30.000\t11.0")  // 4N drain 1.20x floor: excluded
    withFile(lines) { p =>
      val (med, n) = Bench.pairStats(p, 100000L, 20.0, 10.0,
        sbN = 80.0, sb4 = 25.0)
      assert(n == 1)
      assert(math.abs(med - 80.0 / 27.5 / 4.0) < 1e-9)
    }
  }

  test("one dirty side disqualifies the pair") {
    val lines = Seq("100000\t80.000\t21.0\t25.000\t14.0") // 4N warmup 40% over
    withFile(lines) { p =>
      assert(Bench.pairStats(p, 100000L, 20.0, 10.0) == (-1.0, 0))
    }
  }

  test("a torn line does not discard the valid pairs around it") {
    // the pairs file is appended by concurrent invocations with no
    // locking — a process killed mid-append leaves a partial line
    val lines = Seq(
      "100000\t80.000\t21.0\t25.000\t11.0", // clean: eff 0.80
      "100000\t90.0\t21",                   // torn mid-append
      "100000\t70.000\t21.0\t20.000\t10.7") // clean: eff 0.875
    withFile(lines) { p =>
      val (med, n) = Bench.pairStats(p, 100000L, wbN = 20.0, wb4 = 10.0)
      assert(n == 2)
      assert(math.abs(med - 0.875) < 1e-9)
    }
  }

  test("barViolationsJson: real array only at sf0.1, not_checked elsewhere") {
    val clean = Seq("q21_minhash_lsh" -> 1.8, "q95_dup_spans" -> 4.0)
    assert(Bench.barViolationsJson("/root/testdata/sf0.1", clean) == "[]")
    assert(Bench.barViolationsJson("/root/testdata/sf0.1/", clean) == "[]")
    val bad = Seq("q21_minhash_lsh" -> 11.0, "q95_dup_spans" -> 4.0)
    assert(Bench.barViolationsJson("/root/testdata/sf0.1", bad)
      .contains("q21_minhash_lsh:11.00>10.0"))
    // any other sf must NOT read as "checked and clean"
    assert(Bench.barViolationsJson("target/testdata/sf1.0", clean) == "\"not_checked\"")
    assert(Bench.barViolationsJson("/root/testdata/sf0.01", bad) == "\"not_checked\"")
  }

  test("crawl pair-median bar: flagged below 0.8, clean at/above, absent without pairs") {
    // BASELINE.md's table lists "crawl pair-median >= 0.8" — the
    // artifact must flag its violation mechanically like the query bars
    assert(Bench.crawlViolations(pairMedian = 0.75, nCleanPairs = 12) ==
      Seq("crawl_pair_median:0.750<0.8"))
    assert(Bench.crawlViolations(0.80, 12).isEmpty)
    assert(Bench.crawlViolations(0.841, 53).isEmpty)
    // no clean pairs -> no median exists -> nothing to flag (the
    // artifact's n_clean_pairs:0 carries that state)
    assert(Bench.crawlViolations(-1.0, 0).isEmpty)
    // the crawl entry joins the sf0.1 array and forces a real array at
    // any other sf (crawl bars are sf-independent)
    val clean = Seq("q21_minhash_lsh" -> 1.8)
    assert(Bench.barViolationsJson("/root/testdata/sf0.1", clean,
      Bench.crawlViolations(0.75, 10)) == "[\"crawl_pair_median:0.750<0.8\"]")
    assert(Bench.barViolationsJson("target/testdata/sf1.0", clean,
      Bench.crawlViolations(0.75, 10)) == "[\"crawl_pair_median:0.750<0.8\"]")
    assert(Bench.barViolationsJson("target/testdata/sf1.0", clean,
      Bench.crawlViolations(0.85, 10)) == "\"not_checked\"")
  }

  test("sf gating is exact-segment: xsf0.1 and doubled slashes do not calibrate") {
    val clean = Seq("q21_minhash_lsh" -> 1.8)
    // a dir merely ENDING in the substring must not turn the bars on
    assert(Bench.barViolationsJson("/data/xsf0.1", clean) == "\"not_checked\"")
    // a doubled trailing slash must not turn them off
    assert(Bench.barViolationsJson("/root/testdata/sf0.1//", clean) == "[]")
  }

  test("missing file, malformed lines, unset floors -> (-1, 0)") {
    assert(Bench.pairStats(
      java.nio.file.Paths.get("/tmp/definitely-missing-pairs.tsv"),
      100000L, 20.0, 10.0) == (-1.0, 0))
    withFile(Seq("garbage", "100000\tx\ty\tz\tw")) { p =>
      assert(Bench.pairStats(p, 100000L, 20.0, 10.0) == (-1.0, 0))
    }
    withFile(Seq("100000\t80.000\t21.0\t25.000\t11.0")) { p =>
      assert(Bench.pairStats(p, 100000L, -1.0, 10.0) == (-1.0, 0))
    }
  }
}
