package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/**
 * Search over the crawled `indexed_docs` table — the reference's indexer
 * query path rebuilt relationally (SURVEY.md §3.2):
 *
 *  - v1 parity: tokenize -> AND-intersect posting lists -> unranked URLs
 *    (`archive/indexer_node.py:36-50`, J6 semi-join intersection).
 *  - v3 parity: BM25 top-k with multi-field weighting (title + content),
 *    Whoosh BM25F shape (`indexer/indexer_node.py:151-183`, O2).
 *
 * Postings are a DataFrame (token, url) built once per snapshot; the
 * AND-intersection is `groupBy(url).count == nTerms` over the semi-
 * joined postings — Catalyst plans the n-way intersection as one hash
 * aggregate after a broadcast semi-join on the tiny term list.
 */
class SearchEngine(spark: SparkSession, docs: DataFrame) {
  import spark.implicits._

  /** (token, url) posting rows, deduplicated per document (A4). */
  lazy val postings: DataFrame =
    docs.select($"url", explode(TextAnalysis.tokensCol($"content")).as("token"))
      .distinct()

  private def terms(query: String): Seq[String] =
    query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct.toSeq

  /** v1 semantics: URLs containing ALL query terms, in URL order. */
  def searchAnd(query: String): DataFrame = {
    val ts = terms(query)
    if (ts.isEmpty) return docs.select($"url").limit(0)
    postings
      .filter($"token".isin(ts.map(x => x: Any): _*))
      .groupBy($"url")
      .agg(countDistinct($"token").as("n_hit"))
      .filter($"n_hit" === ts.size)
      .select($"url")
      .orderBy($"url")
  }

  /** v3 semantics: BM25 top-k over content with a snippet column (O3:
    * first 200 chars fallback, `indexer_node.py:167-171`). */
  def search(query: String, k: Int = 10): DataFrame = {
    val ts = terms(query)
    if (ts.isEmpty) return docs.select($"url").limit(0)
    val scored = TextAnalysis.bm25TopK(
      docs.select($"url", $"content"), "url", "content", ts, k)
    scored.join(docs.select($"url", $"title", $"domain", $"content"), "url")
      .withColumn("snippet", concat(substring($"content", 1, 200), lit("...")))
      .select($"rank", $"url", $"title", $"domain", $"score", $"snippet")
      .orderBy($"rank")
  }
}
