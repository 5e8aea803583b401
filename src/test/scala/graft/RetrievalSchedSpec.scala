package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

import graft.ops.{Recrawl, TextAnalysis}

/** Hand-oracle tests for the sparse-retrieval (T42) and recrawl-
  * scheduling (T44) operators. */
class RetrievalSchedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- tf-idf similar pairs (T42) ----

  test("tfidf pairs: quantized weights on a hand corpus") {
    val docs = Seq(
      (0L, "apple banana apple"),
      (1L, "apple banana"),
      (2L, "cherry solo"),
      (3L, "totally unique words")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfSimilarPairs(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    // apple/banana both have df=2 -> w = tf * (10000 div 2).
    // (0,1): apple 10000*5000 + banana 5000*5000 = 75_000_000, 2 shared.
    // all other tokens are df=1 and pair with nothing.
    assert(got == Set((0L, 1L, 2L, 75000000L)))
  }

  test("tfidf pairs: maxDf drops stopword-like tokens from the join") {
    val docs = Seq(
      (0L, "common alpha"),
      (1L, "common alpha"),
      (2L, "common beta")).toDF("doc_id", "text")
    // df(common)=3 > maxDf=2 -> only alpha (df=2) pairs 0 with 1
    val got = TextAnalysis.tfidfSimilarPairs(docs, "doc_id", "text", maxDf = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 1L, 1L, 25000000L)))
    // without the cap, `common` joins all three docs pairwise
    val uncapped = TextAnalysis
      .tfidfSimilarPairs(docs, "doc_id", "text", maxDf = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(uncapped == Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  // ---- recrawl priority (T44) ----

  private def ev(id: Long, sec: Long, v: Double, eid: Long) =
    (eid, new Timestamp(sec * 1000L), id, v)

  test("recrawl: change-rate x staleness priority on a hand history") {
    val hist = Seq(
      // page 1: 3 fetches, one content change -> rate 1/2
      ev(1L, 0L, 1.0, 10L), ev(1L, 10L, 2.0, 11L), ev(1L, 20L, 2.0, 12L),
      // page 2: 2 fetches, no change; defines the corpus max ts (t=30)
      ev(2L, 0L, 5.0, 20L), ev(2L, 30L, 5.0, 21L),
      // page 3: a single fetch -> zero intervals, zero rate
      ev(3L, 5L, 9.0, 30L))
      .toDF("event_id", "ts", "user_id", "value")
    val got = Recrawl.priority(hist)
      .select("user_id", "n_fetches", "n_changes", "change_rate", "age_s", "priority")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == (1L, 3L, 1L, 500000L, 10L, 5000000L))
    assert(got(2L) == (2L, 2L, 0L, 0L, 0L, 0L))
    assert(got(3L) == (3L, 1L, 0L, 0L, 25L, 0L))
  }

  test("recrawl: ties in ts break on the tiebreak column, not row order") {
    // same ts for both observations: tiebreak event_id orders 1.0 -> 2.0
    // (one change); reversed tiebreak would see the same (still 1 change),
    // so also assert the 3-obs case where order decides 1 vs 2 changes
    val hist = Seq(
      ev(1L, 0L, 1.0, 1L), ev(1L, 0L, 2.0, 2L), ev(1L, 0L, 1.0, 3L))
      .toDF("event_id", "ts", "user_id", "value")
    val got = Recrawl.priority(hist)
      .select("n_changes").as[Long].collect()
    assert(got.toSeq == Seq(2L)) // 1.0 -> 2.0 -> 1.0 in event_id order
  }

  // ---- snapshot diff (T47) ----

  test("snapshotDiff: all four statuses on a hand pair of snapshots") {
    val oldSnap = Seq(
      ("a", "h1"), ("b", "h2"), ("c", "h3")).toDF("url", "digest")
    val newSnap = Seq(
      ("a", "h1"),  // unchanged
      ("b", "hX"),  // changed
      ("d", "h4")). // added; "c" removed
      toDF("url", "digest")
    val got = Recrawl.snapshotDiff(oldSnap, newSnap)
      .select("url", "status").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "unchanged", "b" -> "changed",
                      "c" -> "removed", "d" -> "added"))
  }

  test("snapshotDiff: null digest vs a value is a change, null-null is not") {
    val oldSnap = Seq(
      ("a", null.asInstanceOf[String]), ("b", null.asInstanceOf[String]))
      .toDF("url", "digest")
    val newSnap = Seq(("a", "h1"), ("b", null.asInstanceOf[String]))
      .toDF("url", "digest")
    val got = Recrawl.snapshotDiff(oldSnap, newSnap)
      .select("url", "status").as[(String, String)].collect().toMap
    // a: null -> h1 is 'changed' (=!= would null out and say unchanged);
    // b: null on both sides means nothing observable changed
    assert(got == Map("a" -> "changed", "b" -> "unchanged"))
  }
}
