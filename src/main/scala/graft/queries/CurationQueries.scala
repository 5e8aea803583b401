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

  /** q58: the composed corpus-curation pipeline — quality gate →
    * exact-dedup keeper (min doc_id per fingerprint) → deterministic
    * split → per-split doc/token totals. Exercises the operators
    * *chained* the way a real training-data build runs them: one
    * shuffle per stage (quality is map-side, dedup groups on the
    * fingerprint, the final rollup groups on 3 split values), no
    * driver-side state, so the chain costs the same per-row at 100 TB. */
  def q58CurationPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d)
    val kept = graft.ops.TextAnalysis.qualityScore(docs, "doc_id", "text")
      .filter($"len_ok" && $"stop_ratio" <= 0.5)
      .join(graft.ops.TextAnalysis.fingerprint(docs, "doc_id", "text"), "doc_id")
    kept.groupBy($"fp")
      .agg(min($"doc_id").as("doc_id"), min_by($"n_tokens", $"doc_id").as("n_tokens"))
      .withColumn("split", Curation.splitCol($"doc_id"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"))
      .orderBy($"split")
  }

  val q58Sql: String =
    """WITH t AS (
      | SELECT doc_id,
      |  list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tk,
      |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      | FROM documents),
      |q AS (
      | SELECT doc_id, len(tk) AS n_tokens, fp FROM t
      | WHERE len(tk) BETWEEN 20 AND 1000
      |  AND CAST(len(list_filter(tk, x -> x='the' OR x='a' OR x='of' OR x='and' OR x='to' OR x='in')) AS DOUBLE) / len(tk) <= 0.5),
      |k AS (
      | SELECT min(doc_id) AS doc_id, arg_min(n_tokens, doc_id) AS n_tokens FROM q GROUP BY fp),
      |s AS (
      | SELECT n_tokens,
      |  CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
      |       WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
      |       ELSE 'test' END AS split
      | FROM k)
      |SELECT split, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      |FROM s GROUP BY split ORDER BY split""".stripMargin
}
