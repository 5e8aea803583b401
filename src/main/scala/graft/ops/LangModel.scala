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

  /** DSIR-style importance resampling (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): estimate the log
    * importance ratio of each document between a TARGET distribution
    * (the `isTarget` subset, e.g. a trusted/high-quality slice) and the
    * SOURCE (the whole corpus) under smoothed character-trigram models,
    * then keep each document with probability min(1, w) — documents the
    * target model likes survive; off-target documents are downsampled
    * proportionally to their likelihood ratio.
    *
    * Scale shape: model training is TWO vocabulary-bounded passes (full
    * corpus + target subset; each ≤ 37³ rows out), merged into ONE
    * broadcast model table, so scoring is a single corpus pass — explode
    * + broadcast hash join + per-doc aggregate, no corpus shuffle. The
    * accept decision is a salted md5 hash of the id (the q50/q71
    * convention): deterministic across runs, engines, and resharding —
    * a resampling decision that changes under repartition would make
    * the kept set irreproducible.
    *
    * Float determinism: per-doc average NLLs are rounded to 6 decimals
    * (libm-path convention — proven hash-exact vs DuckDB in q75); the
    * log-ratio is their difference scaled by the integer trigram count,
    * and the acceptance probability is rounded again before the integer
    * bucket compare, so a sub-ulp libm divergence cannot flip `kept`
    * except exactly at a rounding boundary. */
  def importanceResample(df: DataFrame, id: String, text: String,
                         isTarget: Column): DataFrame = {
    val src = trigramModel(df, id, text).localCheckpoint()
    val tgt = trigramModel(df.filter(isTarget), id, text).localCheckpoint()
    val vS = src.count().toDouble
    val vT = tgt.count().toDouble
    // every corpus trigram is in the source model by construction;
    // target-model misses fall back to the q75 unseen convention
    // (c3=0, c2=0 -> p = 1/V)
    val model = src.select(col("tri"), col("c3").as("c3s"), col("c2").as("c2s"))
      .join(tgt.select(col("tri"), col("c3").as("c3t"), col("c2").as("c2t")),
        Seq("tri"), "left")
    // one scoring pass; the per-doc result (4 numeric cols) is
    // materialized because the normalizer below aggregates over it —
    // an unmaterialized plan would re-run the explode+join per subtree
    val scored = charTrigrams(df, id, text)
      .join(broadcast(model), Seq("tri"), "left")
      .groupBy(col(id)).agg(
        count(lit(1)).as("n_tris"),
        avg(-log((coalesce(col("c3s"), lit(0L)) + 1.0) /
          (coalesce(col("c2s"), lit(0L)) + vS))).as("__ns"),
        avg(-log((coalesce(col("c3t"), lit(0L)) + 1.0) /
          (coalesce(col("c2t"), lit(0L)) + vT))).as("__nt"))
      .select(col(id), col("n_tris"),
        round((round(col("__ns"), 6) - round(col("__nt"), 6)) *
          col("n_tris"), 6).as("log_w"))
      .localCheckpoint()
    // Importance weights are defined up to the normalizing constant Z
    // (DSIR §3: w is estimated per-example, then normalized corpus-wide);
    // with add-one smoothing and a target model a fraction of the source
    // size, raw log-ratios carry a uniform negative bias, so center on
    // the corpus mean: a document is kept with certainty when its ratio
    // beats the average, else with probability exp(log_w - mu). The mean
    // is a 1-row aggregate cross-joined back (broadcast — no window-
    // over-everything single partition).
    val mu = scored.agg(avg(col("log_w")).as("__mu"))
    // guard the null path explicitly: `least` SKIPS nulls, so an
    // unscorable document (no trigrams -> null log_w after the join
    // back) would otherwise get least(1.0, null) = 1.0 and be kept
    // with certainty
    val pAccept = when(col("log_w").isNotNull, round(least(lit(1.0),
      exp(round(col("log_w") - col("__mu"), 6))), 6))
    val bucket = conv(substring(md5(concat(col(id).cast("string"),
      lit(":dsir")).cast("binary")), 1, 8), 16, 10).cast("long") % 1000000L
    df.select(col(id))
      .join(scored.crossJoin(broadcast(mu)), Seq(id), "left")
      .select(col(id), coalesce(col("n_tris"), lit(0L)).as("n_tris"),
        col("log_w"), pAccept.as("p_accept"))
      .withColumn("kept", coalesce(bucket < floor(col("p_accept") * 1000000d),
        lit(false)))
  }
}
