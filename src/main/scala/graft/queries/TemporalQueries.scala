package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._
import graft.ops.TemporalJoin

/**
 * Temporal-join coverage (ops/TemporalJoin.scala): the as-of join and
 * the binned interval join, both oracled against DuckDB's native
 * ASOF JOIN / IEJoin range join so the exotic Spark plans are checked
 * against an independent reference implementation of the semantics.
 */
object TemporalQueries {

  /** q77: as-of join — for each purchase event, the latest click by the
    * same user at or before the purchase instant (the crawler's
    * "rules in force at fetch time" lookup shape,
    * `crawler/crawler_node.py:289-302`). Clicks are pre-aggregated to
    * one row per (user_id, ts) to make ties deterministic in both
    * engines. */
  def q77AsofJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts")
      .agg(max($"value").as("click_value"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    TemporalJoin.asOf(purchases, clicks, key = "user_id",
        leftTs = "ts", rightTs = "ts", payload = Seq("click_value"))
      .orderBy($"event_id")
  }

  val q77Sql: String =
    """WITH clicks AS (
      | SELECT user_id, ts, max(value) AS click_value
      | FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      |purchases AS (
      | SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.ts, c.ts AS asof_ts, c.click_value
      |FROM purchases p ASOF JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  /** q78: interval (range) join — purchases attributed to every
    * 60-minute incident window opened by an error event (the monitor's
    * events-under-alert-window attribution, `monitor.py:165-204`).
    * No equi key: the binned-grid equi-join stands in for DuckDB's
    * IEJoin. Decimal-cast sum keeps the double aggregation
    * order-independent and engine-exact. */
  def q78RangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
    val incidents = ev.filter($"event_type" === "error")
      .select($"event_id".as("incident_id"), $"ts".as("start_ts"),
        ($"ts" + expr("INTERVAL 60 MINUTES")).as("end_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"ts".as("p_ts"), $"value")
    TemporalJoin.intervalJoin(purchases, "p_ts",
        incidents, "start_ts", "end_ts", bucketMicros = 60L * 60 * 1000000)
      .groupBy($"incident_id")
      .agg(count(lit(1)).as("n_purchases"),
        sum($"value".cast("decimal(18,6)")).cast("double").as("purchase_value"))
      .orderBy($"incident_id")
  }

  val q78Sql: String =
    """WITH incidents AS (
      | SELECT event_id AS incident_id, ts AS start_ts,
      |        ts + INTERVAL 60 MINUTE AS end_ts
      | FROM events WHERE event_type = 'error'),
      |purchases AS (
      | SELECT ts AS p_ts, value FROM events WHERE event_type = 'purchase')
      |SELECT incident_id, count(*) AS n_purchases,
      | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS purchase_value
      |FROM purchases p JOIN incidents i
      |  ON p.p_ts >= i.start_ts AND p.p_ts < i.end_ts
      |GROUP BY incident_id ORDER BY incident_id""".stripMargin
}
