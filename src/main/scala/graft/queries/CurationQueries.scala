package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Curation
import Tables._

/** Corpus-curation coverage: deterministic splits + source mixing. */
object CurationQueries {

  /** q50: stable md5-bucket train/val/test split (80/10/10). */
  def q50HashSplit(s: SparkSession, d: String): DataFrame =
    Curation.hashSplit(documents(s, d), "doc_id").orderBy(col("doc_id"))

  val q50Sql: String =
    """WITH b AS (
      | SELECT doc_id,
      |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
      | FROM documents)
      |SELECT doc_id,
      | CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
      |FROM b ORDER BY doc_id""".stripMargin

  /** q53: alpha-smoothed source-mixing weights (alpha = 0.7). */
  def q53DomainMix(s: SparkSession, d: String): DataFrame =
    Curation.domainMixWeights(documents(s, d), "source", "text")
      .orderBy(col("source"))

  val q53Sql: String =
    """WITH toks AS (
      | SELECT source, len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0)) AS nt
      | FROM documents),
      |per AS (SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens FROM toks GROUP BY 1),
      |tot AS (SELECT sum(pow(CAST(n_tokens AS DOUBLE), 0.7)) AS z FROM per)
      |SELECT source, n_docs, n_tokens,
      | round(pow(CAST(n_tokens AS DOUBLE), 0.7) / z, 6) AS mix_weight
      |FROM per, tot ORDER BY source""".stripMargin
}
