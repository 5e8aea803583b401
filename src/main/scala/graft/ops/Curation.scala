package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators a large-scale training-data pipeline needs
 * around the dedup/quality core: deterministic dataset splits and
 * source-mixing weights. Both are pure column math / one-shuffle
 * aggregations — no UDFs, no driver-side state — so they cost the same
 * per-row at 100 TB as at test scale.
 */
object Curation {

  /** Hash bucket in [0, 100): first 8 hex chars of md5(id-as-string).
    * md5 over the decimal string (not the raw bytes) so any engine —
    * and any resharding of the table — assigns the same bucket to the
    * same id; the split is stable across reruns and engine versions,
    * which is what makes held-out sets trustworthy. */
  private def hashBucket(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 100

  /** The split label as a composable column (for pipelines that tag
    * rows in place rather than projecting down to (id, split)). */
  def splitCol(idCol: Column, trainPct: Int = 80, valPct: Int = 10): Column =
    when(hashBucket(idCol) < trainPct, lit("train"))
      .when(hashBucket(idCol) < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))

  /**
   * Deterministic train/val/test assignment by content-independent id
   * hash (trainPct / valPct / remainder). A `rand()`-based split would
   * differ per run and per partitioning; a mod-on-id split correlates
   * with ingestion order. The md5 bucket is uniform and reproducible —
   * the standard trick for stable held-out sets in data pipelines.
   */
  def hashSplit(df: DataFrame, id: String,
                trainPct: Int = 80, valPct: Int = 10): DataFrame =
    df.select(col(id), splitCol(col(id), trainPct, valPct).as("split"))

  /**
   * Source-mixing weights for corpus sampling: weight(source) ∝
   * (token count)^alpha, normalized. alpha < 1 up-weights small
   * sources relative to proportional sampling — the multilingual /
   * multi-source mixing rule from public LM-training practice (e.g.
   * alpha-smoothed sampling in the mBERT/XLM-R papers). Two hash
   * aggregations (per-source, then a single-row total broadcast back);
   * weights rounded to 6 decimals for cross-engine float stability.
   */
  def domainMixWeights(df: DataFrame, source: String, text: String,
                       alpha: Double = 0.7): DataFrame = {
    val per = df
      .select(col(source), size(TextAnalysis.tokensCol(col(text))).as("nt"))
      .groupBy(col(source))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    val tot = per.agg(sum(pow(col("n_tokens").cast("double"), alpha)).as("z"))
    per.crossJoin(broadcast(tot))
      .select(col(source), col("n_docs"), col("n_tokens"),
        round(pow(col("n_tokens").cast("double"), alpha) / col("z"), 6).as("mix_weight"))
  }
}
