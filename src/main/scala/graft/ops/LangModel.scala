package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-n-gram language-model scoring (SURVEY §2.10 T34) — the
  * CCNet/Gopher-style corpus-quality signal: train n-gram counts in one
  * corpus pass, score every document by its average negative
  * log-likelihood under the model, filter on a perplexity threshold.
  *
  * Scale shape: the model is vocabulary-bounded (≤ 37³ ≈ 5·10⁴ distinct
  * character trigrams over the normalized alphabet) regardless of corpus
  * size, so training is ONE map-side-partial aggregation and scoring is
  * ONE corpus pass with a broadcast hash join against the model — no
  * shuffle of the corpus, no driver-side state. At 100 TB the only big
  * exchange is the per-document average (hash-partial, ~1 row/doc).
  */
object LangModel {

  /** Same normalization as TextAnalysis.fingerprint (C7). */
  private def normCol(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** (id, tri): every character trigram of the normalized text, in
    * position order; documents shorter than 3 normalized chars emit
    * nothing (sequence() would run DESCENDING on a negative span —
    * guarded to an empty array). */
  def charTrigrams(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), normCol(col(text)).as("__s"))
      .select(col(id), explode(
        when(length(col("__s")) >= 3,
          transform(sequence(lit(1), length(col("__s")) - 2),
            i => col("__s").substr(i, lit(3))))
          .otherwise(array())).as("tri"))

  /** Add-one-smoothed trigram model from `df`: (tri, c3, c2) where c2
    * is the count of the trigram's leading bigram as a conditional
    * context (= the sum of c3 over trigrams sharing the prefix — no
    * second corpus pass). Materialized: it feeds the vocab count and
    * the scoring join. */
  def trigramModel(df: DataFrame, id: String, text: String): DataFrame = {
    val mTri = charTrigrams(df, id, text)
      .groupBy(col("tri")).agg(count(lit(1)).as("c3"))
      .localCheckpoint()
    val mBi = mTri.groupBy(substring(col("tri"), 1, 2).as("bi"))
      .agg(sum(col("c3")).as("c2"))
    mTri.withColumn("bi", substring(col("tri"), 1, 2))
      .join(mBi, "bi").select(col("tri"), col("c3"), col("c2"))
  }

  /** Score `df` under `model` (a trigramModel output): per document the
    * trigram count and the average negative log-likelihood
    * `-ln((c3+1)/(c2+V))` (V = model vocab size; unseen trigrams score
    * `-ln(1/V)`), rounded to 6 decimals so the float sum's order
    * nondeterminism can't flip a bit (the repo's libm-path convention),
    * plus `quality_ok = nll <= threshold`. Documents with no trigrams
    * keep null nll. */
  def lmScore(df: DataFrame, id: String, text: String, model: DataFrame,
              threshold: Double): DataFrame = {
    val m = model.localCheckpoint()
    val v = m.count()
    val scored = charTrigrams(df, id, text)
      .join(broadcast(m), Seq("tri"), "left")
      .groupBy(col(id)).agg(
        count(lit(1)).as("n_tris"),
        avg(-log((coalesce(col("c3"), lit(0L)) + 1.0) /
          (coalesce(col("c2"), lit(0L)) + v.toDouble))).as("__nll"))
    df.select(col(id)).join(scored, Seq(id), "left")
      .select(col(id), coalesce(col("n_tris"), lit(0L)).as("n_tris"),
        round(col("__nll"), 6).as("nll"),
        (round(col("__nll"), 6) <= threshold).as("quality_ok"))
  }

  /** Self-perplexity: model trained on the scored corpus itself (the
    * oracle-checked shape; production passes a held-out/reference model
    * to `lmScore`). */
  def selfPerplexity(df: DataFrame, id: String, text: String,
                     threshold: Double): DataFrame =
    lmScore(df, id, text, trigramModel(df, id, text), threshold)
}
