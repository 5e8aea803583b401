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

  /** q89 (T47): incremental-recrawl snapshot delta. Two deterministic
    * crawl snapshots are derived from `documents`: the OLD snapshot
    * drops every 10th doc (pages the first crawl missed), the NEW drops
    * every 7th (pages that 404'd on recrawl), and every 5th doc's
    * content changed between crawls (digest of text || 'v2'). In
    * production these are two IceLite snapshot reads of the fetchlog;
    * the operator (`Recrawl.snapshotDiff`) is one co-partitioned
    * full-outer join either way. */
  def q89CrawlDiff(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val oldSnap = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("digest"))
    val newSnap = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, md5(concat(col("text"), lit("v2"))))
          .otherwise(md5(col("text"))).as("digest"))
    Recrawl.snapshotDiff(oldSnap, newSnap, "doc_id").orderBy(col("doc_id"))
  }

  val q89Sql: String =
    """WITH old AS (
      | SELECT doc_id, md5(text) AS digest FROM documents WHERE doc_id % 10 != 0),
      |new AS (
      | SELECT doc_id,
      |  CASE WHEN doc_id % 5 = 0 THEN md5(text || 'v2') ELSE md5(text) END AS digest
      | FROM documents WHERE doc_id % 7 != 0)
      |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
      | CASE WHEN o.doc_id IS NULL THEN 'added'
      |      WHEN n.doc_id IS NULL THEN 'removed'
      |      WHEN o.digest != n.digest THEN 'changed'
      |      ELSE 'unchanged' END AS status,
      | o.digest AS old_digest, n.digest AS new_digest
      |FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
      |ORDER BY doc_id""".stripMargin
}
