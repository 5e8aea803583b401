package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.TemporalJoin

/** Sequential-oracle edge cases for the temporal joins: the as-of
  * inclusive-tie / no-prior-row / latest-wins rules and the interval
  * join's half-open boundaries, multi-cell spans, overlaps and
  * exactly-once pairing. */
class TemporalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(us: org.apache.spark.sql.Column) = timestamp_micros(us)

  test("asOf: tie is inclusive, latest prior wins, no-prior rows drop") {
    // right (key, t, v): A@10->1, A@20->2; no rows for B
    val right = Seq(("A", 10L, 1.0), ("A", 20L, 2.0))
      .toDF("k", "t_us", "v").select($"k", ts($"t_us").as("rt"), $"v")
    // left (id, key, t): A@5 (no prior), A@10 (tie), A@15, A@25, B@50 (no right)
    val left = Seq((1L, "A", 5L), (2L, "A", 10L), (3L, "A", 15L),
        (4L, "A", 25L), (5L, "B", 50L))
      .toDF("id", "k", "t_us").select($"id", $"k", ts($"t_us").as("lt"))

    val out = TemporalJoin.asOf(left, right, key = "k",
        leftTs = "lt", rightTs = "rt", payload = Seq("v"))
      .select($"id", unix_micros($"asof_ts").as("m_us"), $"v")
      .as[(Long, Long, Double)].collect().toSet

    assert(out === Set((2L, 10L, 1.0), (3L, 10L, 1.0), (4L, 20L, 2.0)))
  }

  test("asOf output keeps every left column, in order") {
    val right = Seq(("A", 1L, 9.0)).toDF("k", "t_us", "v")
      .select($"k", ts($"t_us").as("rt"), $"v")
    val left = Seq((7L, "A", 2L, "x")).toDF("id", "k", "t_us", "extra")
      .select($"id", $"k", ts($"t_us").as("lt"), $"extra")
    val out = TemporalJoin.asOf(left, right, "k", "lt", "rt", Seq("v"))
    assert(out.columns.toSeq === Seq("id", "k", "lt", "extra", "asof_ts", "v"))
    assert(out.count() === 1)
  }

  test("intervalJoin: half-open bounds, multi-cell spans, overlaps, exactly-once") {
    // grid of 10 us; intervals: I1 [100,130) spans 3 cells, I2 [125,125)
    // empty (dropped), I3 [120,140) overlaps I1, I4 [131,133) sub-cell
    val intervals = Seq((1L, 100L, 130L), (2L, 125L, 125L),
        (3L, 120L, 140L), (4L, 131L, 133L))
      .toDF("iid", "s_us", "e_us")
      .select($"iid", ts($"s_us").as("s"), ts($"e_us").as("e"))
    // points: 99 (before all), 100 (I1 start incl), 129 (I1+I3), 130
    // (I1 end excl, I3), 132 (I3+I4), 140 (I3 end excl)
    val points = Seq(99L, 100L, 129L, 130L, 132L, 140L)
      .toDF("p_us").select($"p_us", ts($"p_us").as("p"))

    val out = TemporalJoin.intervalJoin(points, "p", intervals, "s", "e",
        bucketMicros = 10L)
      .select($"p_us", $"iid").as[(Long, Long)].collect().toList

    val expected = Set((100L, 1L), (129L, 1L), (129L, 3L), (130L, 3L),
      (132L, 3L), (132L, 4L))
    assert(out.toSet === expected)
    assert(out.size === expected.size, s"duplicate pairs emitted: $out")
  }

  test("intervalJoin accepts TIMESTAMP_NTZ columns (parquet writes them)") {
    // regression: unix_micros rejects NTZ; the binning must cast through
    // TIMESTAMP (session tz is UTC, so the cast is exact)
    val ntz = (c: org.apache.spark.sql.Column) => c.cast("timestamp_ntz")
    val intervals = Seq((1L, 100L, 130L)).toDF("iid", "s_us", "e_us")
      .select($"iid", ntz(ts($"s_us")).as("s"), ntz(ts($"e_us")).as("e"))
    val points = Seq(99L, 105L).toDF("p_us")
      .select($"p_us", ntz(ts($"p_us")).as("p"))
    val out = TemporalJoin.intervalJoin(points, "p", intervals, "s", "e",
        bucketMicros = 10L)
      .select($"p_us", $"iid").as[(Long, Long)].collect().toSet
    assert(out === Set((105L, 1L)))
  }
}
