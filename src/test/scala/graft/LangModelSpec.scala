package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LangModel

/** Character-trigram LM scoring (T34) + DSIR importance resampling
  * (T35) on hand-computed inputs; the DuckDB harness (q75/q76) covers
  * them on `documents`. */
class LangModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("trigramModel: counts and bigram contexts on a hand example") {
    val df = Seq((1L, "abab")).toDF("id", "text")
    val m = LangModel.trigramModel(df, "id", "text")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    // "abab" -> trigrams aba, bab; context ab carries aba (1), ba carries bab (1)
    assert(m.toSeq == Seq(("aba", 1L, 1L), ("bab", 1L, 1L)))
  }

  test("lmScore: add-one-smoothed NLL matches the hand computation") {
    val df = Seq((1L, "abab")).toDF("id", "text")
    val got = LangModel.selfPerplexity(df, "id", "text", threshold = 1.0)
      .as[(Long, Long, Double, Boolean)].head()
    // V=2; both trigrams score (1+1)/(1+2) -> nll = ln(3/2) = 0.405465
    assert(got._2 == 2L)
    assert(math.abs(got._3 - 0.405465) < 1e-9)
    assert(got._4) // 0.405465 <= 1.0
  }

  test("lmScore: documents below trigram length keep null nll, count 0") {
    val df = Seq((1L, "ab"), (2L, "xy!z")).toDF("id", "text")
    val got = LangModel.selfPerplexity(df, "id", "text", threshold = 1.0)
      .select($"id", $"n_tris", $"nll".isNull, $"quality_ok".isNull)
      .as[(Long, Long, Boolean, Boolean)].collect().sortBy(_._1)
    // "xy!z" normalizes to "xy z" -> trigrams "xy ", "y z"; "ab" has none
    assert(got(0) == ((1L, 0L, true, true)))
    assert(got(1)._2 == 2L)
  }

  test("importanceResample: target == source keeps every scorable doc") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark shuffles partitions across the cluster"),
      (3L, "ab"), // no trigrams -> never kept
      (4L, "filter pushdown prunes parquet row groups")).toDF("id", "text")
    val got = LangModel.importanceResample(df, "id", "text", isTarget = lit(true))
      .select($"id", $"log_w", $"p_accept", $"kept")
      .as[(Long, Option[Double], Option[Double], Boolean)].collect().sortBy(_._1)
    for ((id, lw, p, kept) <- got if id != 3L) {
      assert(lw.contains(0.0), s"doc $id: identical models must give log_w 0, got $lw")
      assert(p.contains(1.0), s"doc $id: p_accept must be 1, got $p")
      assert(kept, s"doc $id: certain acceptance must keep")
    }
    val short = got.find(_._1 == 3L).get
    assert(short._2.isEmpty && !short._4)
  }

  test("importanceResample: off-target docs rank below on-target docs") {
    // target rows repeat one alphabet, off-target another; the log-ratio
    // must order every target doc above every off-target doc
    val tgt = (1L to 4L).map(i => (i, "aaa bbb ccc ddd eee " * 3, "en"))
    val off = (11L to 14L).map(i => (i, "zzz yyy xxx www vvv " * 3, "xx"))
    val df = (tgt ++ off).toDF("id", "text", "lang")
    val got = LangModel.importanceResample(df, "id", "text", $"lang" === "en")
      .select($"id", $"log_w").as[(Long, Double)].collect().toMap
    val worstTgt = (1L to 4L).map(got).min
    val bestOff = (11L to 14L).map(got).max
    assert(worstTgt > bestOff,
      s"target docs must outscore off-target: $worstTgt vs $bestOff")
  }
}
