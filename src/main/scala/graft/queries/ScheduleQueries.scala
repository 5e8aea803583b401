package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Recrawl
import Tables._

/** Recrawl-scheduling coverage (SURVEY §2.10 T44): the events table is
  * read as a fetch history — `user_id` the page, `ts` the fetch time,
  * `value` the observed content fingerprint — and scored with the
  * change-rate x staleness refresh policy (see ops/Recrawl). */
object ScheduleQueries {

  def q86Recrawl(s: SparkSession, d: String): DataFrame =
    Recrawl.priority(events(s, d)).orderBy(col("user_id"))

  val q86Sql: String =
    """WITH flagged AS (
      | SELECT user_id, ts, event_id,
      |  CASE WHEN lag(value) OVER w IS NULL THEN 0
      |       WHEN value != lag(value) OVER w THEN 1 ELSE 0 END AS changed
      | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |per AS (
      | SELECT user_id, count(*) AS n_fetches,
      |  CAST(sum(changed) AS BIGINT) AS n_changes,
      |  max(epoch_us(ts)) AS last_us
      | FROM flagged GROUP BY user_id)
      |SELECT user_id, n_fetches, n_changes, change_rate, age_s,
      | CAST(change_rate * age_s AS BIGINT) AS priority
      |FROM (
      | SELECT user_id, n_fetches, n_changes,
      |  CAST(CASE WHEN n_fetches > 1 THEN 1000000 * n_changes // (n_fetches - 1)
      |            ELSE 0 END AS BIGINT) AS change_rate,
      |  CAST(((SELECT max(last_us) FROM per) - last_us) // 1000000 AS BIGINT) AS age_s
      | FROM per)
      |ORDER BY user_id""".stripMargin
}
