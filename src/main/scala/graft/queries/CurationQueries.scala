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

  /** q71: deterministic stratified sampling — rates are the q53 mix
    * weights normalized to the dominant source (keep the head source
    * whole, downsample the rest toward the alpha-smoothed mix);
    * membership is the salted id-hash bucket, so the kept set is
    * bit-reproducible across engines and reshardings. */
  def q71StratifiedSample(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    // materialized ONCE: w is a full-corpus aggregation feeding both the
    // crossJoin side and its own max — uncheckpointed, the corpus-wide
    // tokenize+sum subtree runs twice
    val w = Curation.domainMixWeights(docs, "source", "text").localCheckpoint()
    val rates = w.crossJoin(broadcast(w.agg(max(col("mix_weight")).as("mw"))))
      .select(col("source"), (col("mix_weight") / col("mw")).as("rate"))
    Curation.stratifiedSample(docs, "doc_id", "source", rates, "rate")
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  val q71Sql: String =
    """WITH toks AS (
      | SELECT source, len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0)) AS nt
      | FROM documents),
      |per AS (SELECT source, CAST(sum(nt) AS BIGINT) AS n_tokens FROM toks GROUP BY 1),
      |tot AS (SELECT sum(pow(CAST(n_tokens AS DOUBLE), 0.7)) AS z FROM per),
      |w AS (SELECT source, round(pow(CAST(n_tokens AS DOUBLE), 0.7) / z, 6) AS mix_weight FROM per, tot),
      |mx AS (SELECT max(mix_weight) AS mw FROM w),
      |r AS (SELECT source, mix_weight / mw AS rate FROM w, mx),
      |b AS (
      | SELECT doc_id, source,
      |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':sample'), 1, 8)) AS BIGINT) % 1000000 AS bucket
      | FROM documents)
      |SELECT b.doc_id, b.source FROM b JOIN r ON r.source = b.source
      |WHERE b.bucket < floor(r.rate * 1000000)
      |ORDER BY b.doc_id""".stripMargin

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

  /** q105 (T64): temperature-weighted source mixing — α=0.5 multinomial
    * sampling shares per source (q_i ∝ √n_i; N^α cancels) with the
    * oversampling factor q/p, all in integer ppm fixed point (the only
    * float op is the correctly-rounded sqrt, floored into a long before
    * any sum — both normalizing sums are integer, so the result is
    * partition-order- and engine-exact). Complements q53's float
    * mix_weight report: this is the sampling-share form a data loader
    * consumes. */
  def q105TemperatureMix(s: SparkSession, d: String): DataFrame =
    Curation.temperatureMix(documents(s, d), "source",
        size(graft.ops.TextAnalysis.tokensCol(col("text"))))
      .orderBy(col("source"))

  val q105Sql: String =
    """WITH dt AS (
      | SELECT source, CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0)) AS BIGINT) AS nt
      | FROM documents),
      |per AS (SELECT source, CAST(sum(nt) AS BIGINT) AS n_tokens FROM dt GROUP BY source),
      |s AS (SELECT source, n_tokens,
      |       CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS s_i FROM per),
      |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS nn, CAST(sum(s_i) AS BIGINT) AS ss FROM s)
      |SELECT source, n_tokens,
      | (n_tokens * 1000000) // (SELECT nn FROM tot) AS p_ppm,
      | (s_i * 1000000) // (SELECT ss FROM tot) AS q_ppm,
      | CASE WHEN (n_tokens * 1000000) // (SELECT nn FROM tot) = 0 THEN NULL
      |      ELSE ((s_i * 1000000) // (SELECT ss FROM tot)) * 1000000 // ((n_tokens * 1000000) // (SELECT nn FROM tot)) END AS oversample_ppm
      |FROM s ORDER BY source""".stripMargin

  /** q107 (T65): curation funnel attribution — q58's filter chain plus
    * an english-only stage, reported as the per-stage funnel (rows
    * reaching / dropped by / passing each stage, first-failure
    * attribution). Stage predicates are integer/equality only
    * (stopword cut as n_stop·2 ≤ n_tokens), so the report is
    * engine-exact. */
  def q107CurationFunnel(s: SparkSession, d: String): DataFrame = {
    // tokenize once per row: two sibling expressions over an inline
    // tokensCol would each re-run the split+filter subtree
    val toks = col("__tk")
    val base = documents(s, d)
      .select(col("doc_id"), col("lang"),
        graft.ops.TextAnalysis.tokensCol(col("text")).as("__tk"))
      .select(col("doc_id"), col("lang"),
      size(toks).as("n_tokens"),
      size(filter(toks, t =>
        t.isin(graft.ops.TextAnalysis.EnStopwords.map(x => x: Any): _*))).as("n_stop"))
    val stages = Seq(
      "len_ok" -> (col("n_tokens") >= 20 && col("n_tokens") <= 1000),
      "stopword" -> (col("n_stop") * 2 <= col("n_tokens")),
      "english" -> (col("lang") === "en"))
    Curation.funnelReport(Curation.funnelLabel(base, stages), stages.map(_._1))
      .orderBy(col("stage_idx"))
  }

  val q107Sql: String =
    """WITH t AS (
      | SELECT doc_id, lang, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tk
      | FROM documents),
      |q AS (
      | SELECT doc_id, lang, len(tk) AS n_tokens,
      |  len(list_filter(tk, x -> x='the' OR x='a' OR x='of' OR x='and' OR x='to' OR x='in')) AS n_stop
      | FROM t),
      |lab AS (
      | SELECT CASE WHEN NOT (n_tokens BETWEEN 20 AND 1000) THEN 'len_ok'
      |             WHEN NOT (n_stop * 2 <= n_tokens) THEN 'stopword'
      |             WHEN NOT (lang = 'en') THEN 'english'
      |        END AS dropped_by
      | FROM q),
      |agg AS (SELECT dropped_by, CAST(count(*) AS BIGINT) AS n_dropped FROM lab GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_dropped) AS BIGINT) AS n_total FROM agg),
      |st AS (SELECT * FROM (VALUES (1, 'len_ok'), (2, 'stopword'), (3, 'english')) s(stage_idx, stage)),
      |rep AS (
      | SELECT st.stage_idx, st.stage, COALESCE(agg.n_dropped, 0) AS n_dropped
      | FROM st LEFT JOIN agg ON agg.dropped_by = st.stage)
      |SELECT stage_idx, stage,
      | CAST((SELECT n_total FROM tot) - COALESCE(sum(n_dropped) OVER (ORDER BY stage_idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_in,
      | CAST(n_dropped AS BIGINT) AS n_dropped,
      | CAST((SELECT n_total FROM tot) - COALESCE(sum(n_dropped) OVER (ORDER BY stage_idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) - n_dropped AS BIGINT) AS n_out
      |FROM rep ORDER BY stage_idx""".stripMargin

  /** q61: benchmark decontamination — every 100th document plays the
    * held-out benchmark; docs sharing >= 50% of their distinct 3-grams
    * with it (the benchmark docs themselves plus their exact/near
    * duplicates) are flagged for removal before training. */
  def q61Decontam(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d)
    Curation.contamination(docs, "doc_id", "text",
        docs.filter($"doc_id" % 100 === 0), "text", n = 3, threshold = 0.5)
      .orderBy($"doc_id")
  }

  val q61Sql: String =
    """WITH toks AS (
      | SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tk
      | FROM documents),
      |sh AS (
      | SELECT DISTINCT doc_id,
      |  unnest(list_transform(range(greatest(len(tk) - 2, 0)), i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS shingle
      | FROM toks),
      |bg AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 100 = 0),
      |agg AS (
      | SELECT s.doc_id, count(*) AS n_grams,
      |  CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
      | FROM sh s LEFT JOIN bg b ON b.shingle = s.shingle
      | GROUP BY s.doc_id)
      |SELECT doc_id, n_grams, n_hit,
      | round(CAST(n_hit AS DOUBLE) / n_grams, 6) AS contam_frac,
      | CAST(n_hit AS DOUBLE) / n_grams >= 0.5 AS contaminated
      |FROM agg ORDER BY doc_id""".stripMargin

  /** q62: sequence packing — documents concatenated in id order and cut
    * into 512-token packs (the LLM pretraining batch-layout step); each
    * doc reports its start offset and the packs it spans. The global
    * prefix sum is distributed (range partition + per-partition offsets),
    * never a single-partition window. */
  def q62PackSequences(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Curation.packSequences(documents(s, d), "doc_id",
        size(graft.ops.TextAnalysis.tokensCol($"text")), budget = 512L)
      .orderBy($"doc_id")
  }

  val q62Sql: String =
    """WITH toks AS (
      | SELECT doc_id,
      |  CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens
      | FROM documents),
      |c AS (
      | SELECT doc_id, n_tokens,
      |  CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
      | FROM toks)
      |SELECT doc_id, n_tokens, start_tok,
      | start_tok // 512 AS pack_first,
      | greatest(start_tok, start_tok + n_tokens - 1) // 512 AS pack_last,
      | greatest(start_tok, start_tok + n_tokens - 1) // 512 - start_tok // 512 + 1 AS n_packs
      |FROM c ORDER BY doc_id""".stripMargin

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

  /** q80: per-source quality calibration — within-source percentile rank
    * of the raw quality signal (n_chars), keep = above the bottom
    * decile OF ITS SOURCE. The cross-source comparability step that runs
    * before any global threshold/mixing decision. */
  def q80QualityCalibrate(s: SparkSession, d: String): DataFrame =
    Curation.calibrateQuality(documents(s, d), "doc_id", "source",
        col("n_chars"), dropBelowPctl = 0.1)
      .orderBy(col("doc_id"))

  val q80Sql: String =
    """SELECT doc_id, source, raw_score, pctl, pctl >= 0.1 AS keep FROM (
      | SELECT doc_id, source, n_chars AS raw_score,
      |  percent_rank() OVER (PARTITION BY source ORDER BY n_chars) AS pctl
      | FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** q81: token-budget selection — greedy highest-avg-token-length-first
    * until the 10k-token budget is spent (37% of the sf0.01 corpus, 4%
    * at sf0.1, so both scales exercise the cut). Exact integer running
    * totals via the distributed prefix sum — no single-partition
    * window. Quality is avg token length in parts-per-million
    * (sum_len·10⁶ div n_tokens): exact integer fixed point on both
    * sides, no float formatting in the oracle compare. */
  def q81TokenBudget(s: SparkSession, d: String): DataFrame = {
    // tokenize once per row (same sibling-expression rationale as q107)
    val toks = col("__tk")
    val qs = documents(s, d)
      .select(col("doc_id"), graft.ops.TextAnalysis.tokensCol(col("text")).as("__tk"))
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("sum_len"))
      .select(col("doc_id"), col("n_tokens"),
        expr("sum_len * 1000000 div n_tokens").as("quality_ppm"))
    Curation.selectUnderBudget(qs, "doc_id", col("n_tokens"),
        col("quality_ppm"), budget = 10000L)
      .orderBy(col("doc_id"))
  }

  val q81Sql: String =
    """WITH t AS (
      | SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tk
      | FROM documents),
      |q AS (
      | SELECT doc_id,
      |  CAST((list_sum(list_transform(tk, x -> len(x))) * 1000000) // len(tk) AS BIGINT) AS quality,
      |  CAST(len(tk) AS BIGINT) AS n_tokens
      | FROM t)
      |SELECT doc_id, quality, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens, cum_tokens <= 10000 AS selected FROM (
      | SELECT doc_id, quality, n_tokens,
      |  sum(n_tokens) OVER (ORDER BY quality DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens
      | FROM q)
      |ORDER BY doc_id""".stripMargin

  /** q82: the IMAGE-PAIR curation pipeline end-to-end — the image
    * analogue of q58's text pipeline, composing the round-2 multimodal
    * operators in the order a LAION-style 100-TB corpus build runs
    * them: (1) banded pHash near-dup clustering keeps one copy per
    * visual cluster (q73 machinery), (2) CLIP-score-style image-text
    * alignment drops mismatched captions (q79), (3) per-source quality
    * calibration drops each source's bottom decile by caption length
    * (q80), then the surviving corpus is summarized per source. The
    * oracle rebuilds every stage in DuckDB — brute-force Hamming pairs
    * + recursive-CTE reachability for the dedup, the same feature-hash
    * caption embedding for the alignment — so a hash match certifies
    * the whole composition, not just each stage in isolation.
    *
    * Scale posture: every pair-generating step is banded/bucketed
    * (never all-pairs), the alignment join is an id equi-join, and the
    * calibration window parallelizes across sources; the stages
    * communicate through id-keyed semi-joins, so nothing widens past
    * the corpus row count. */
  def q82ImageCurationPipe(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val sigs = DedupQueries.plantedPhashes(s, d)
    val pairs = graft.ops.Dedup.signaturePairs(sigs, "doc_id", "phash",
      maxDist = 2, bits = 60)
    val keepers = graft.ops.Dedup
      .connectedComponents(sigs, "doc_id", pairs, "doc_a", "doc_b")
      .filter(col("node") === col("label"))
      .select(col("node").as("doc_id"))
    val aligned = graft.ops.Multimodal.captionAlignment(docs, "doc_id", "text",
        embeddings(s, d), "vec_id", "embedding", dim = 64, minScore = 0.0)
      .filter(col("aligned"))
      .select(col("doc_id"))
    val kept = docs.select(col("doc_id"), col("source"), col("n_chars"))
      .join(keepers, "doc_id")
      .join(aligned, "doc_id")
    Curation.calibrateQuality(kept, "doc_id", "source", col("n_chars"),
        dropBelowPctl = 0.1)
      .filter(col("keep"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_images"),
        sum(col("raw_score").cast("long")).as("total_chars"))
      .orderBy(col("source"))
  }

  val q82Sql: String =
    """WITH RECURSIVE sig AS (
      | SELECT doc_id,
      |  xor(CAST(concat('0x', substr(md5(CAST(doc_id % 50 AS VARCHAR)), 1, 15)) AS BIGINT),
      |      CASE WHEN doc_id % 3 = 0 THEN (CAST(1 AS BIGINT) << CAST(doc_id % 60 AS INT))
      |           ELSE CAST(0 AS BIGINT) END) AS phash
      | FROM documents),
      |edges AS (
      | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      | FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      | WHERE bit_count(xor(a.phash, b.phash)) <= 2),
      |sym AS (SELECT doc_a AS s, doc_b AS t FROM edges UNION ALL SELECT doc_b, doc_a FROM edges),
      |reach(node, lab) AS (
      | SELECT doc_id, doc_id FROM sig
      | UNION
      | SELECT e.t, r.lab FROM reach r JOIN sym e ON e.s = r.node),
      |comp AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node),
      |keepers AS (SELECT doc_id FROM comp WHERE doc_id = cluster_id),
      |tok AS (
      | SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS token
      | FROM documents),
      |sp AS (
      | SELECT doc_id,
      |  CAST(CAST(concat('0x', substr(md5(token), 1, 4)) AS BIGINT) % 64 AS INT) AS bucket,
      |  CASE WHEN CAST(concat('0x', substr(md5(token), 5, 1)) AS INT) % 2 = 0 THEN 1 ELSE -1 END AS sgn
      | FROM tok),
      |cap AS (
      | SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS cnt
      | FROM sp GROUP BY 1, 2 HAVING sum(sgn) <> 0),
      |cn AS (SELECT doc_id, sum(cnt * cnt) AS cn2 FROM cap GROUP BY 1),
      |img AS (
      | SELECT vec_id, list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS s
      | FROM embeddings),
      |imn AS (SELECT vec_id, s, list_sum(list_transform(s, x -> x * x)) AS n2 FROM img),
      |dots AS (
      | SELECT c.doc_id, sum(c.cnt * i.s[c.bucket + 1]) AS dot
      | FROM cap c JOIN imn i ON i.vec_id = c.doc_id GROUP BY 1),
      |align AS (
      | SELECT d.doc_id,
      |  CASE WHEN cn.cn2 IS NULL OR cn.cn2 = 0 THEN 0.0
      |       ELSE CAST(dots.dot AS DOUBLE) / (sqrt(CAST(cn.cn2 AS DOUBLE)) * sqrt(CAST(imn.n2 AS DOUBLE))) END AS align_score
      | FROM documents d
      | JOIN imn ON imn.vec_id = d.doc_id
      | LEFT JOIN cn ON cn.doc_id = d.doc_id
      | LEFT JOIN dots ON dots.doc_id = d.doc_id),
      |kept AS (
      | SELECT d.doc_id, d.source, d.n_chars
      | FROM documents d
      | JOIN keepers k ON k.doc_id = d.doc_id
      | JOIN align a ON a.doc_id = d.doc_id
      | WHERE a.align_score >= 0.0),
      |cal AS (
      | SELECT source, n_chars,
      |  percent_rank() OVER (PARTITION BY source ORDER BY n_chars) AS pctl
      | FROM kept)
      |SELECT source, count(*) AS n_images, CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM cal WHERE pctl >= 0.1
      |GROUP BY source ORDER BY source""".stripMargin

  /** q87 (T45): Efraimidis–Spirakis weighted sampling without
    * replacement, exact integer form (see ops/Curation.weightedSample).
    * Weight = length bucket (1 + n_chars div 256, capped at 8): longer
    * documents are preferentially sampled, a real curation choice. */
  def q87WeightedSample(s: SparkSession, d: String): DataFrame =
    Curation.weightedSample(Tables.documents(s, d), "doc_id",
      expr("least(1 + n_chars div 256, 8)"), 100)

  val q87Sql: String =
    """WITH reps AS (
      | SELECT doc_id, LEAST(1 + n_chars // 256, 8) AS weight, t.c + 1 AS r
      | FROM documents d, range(8) t(c)
      | WHERE t.c < LEAST(1 + n_chars // 256, 8)),
      |keyed AS (
      | SELECT doc_id, weight,
      |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(r AS VARCHAR) || ':es'), 1, 8)) AS BIGINT) AS u
      | FROM reps),
      |agg AS (SELECT doc_id, max(weight) AS weight, max(u) AS es_key FROM keyed GROUP BY 1)
      |SELECT doc_id, weight, es_key FROM agg
      |ORDER BY es_key DESC, doc_id LIMIT 100""".stripMargin

  /** q98 (T56): exact heavy hitters. Three hot hosts carry 20% of rows
    * each; 47 tail hosts carry <1% each. capacity=8 → threshold n/9
    * (~11%): only the hot three survive. The MG candidate set varies
    * with partitioning, but it is always a superset of the answer, and
    * the verified exact counts + the shared integer threshold make the
    * output engine- and partitioning-exact (CurationSpec proves the
    * reshard invariance). */
  def q98HeavyHitters(s: SparkSession, d: String): DataFrame = {
    val host = when(col("doc_id") % 10 < 6,
        concat(lit("h"), (col("doc_id") % 3).cast("string")))
      .otherwise(concat(lit("t"), (col("doc_id") % 47).cast("string")))
    Curation.heavyHitters(documents(s, d).select(host.as("host")), "host", capacity = 8)
      .orderBy(col("host"))
  }

  val q98Sql: String =
    """WITH k AS (
      | SELECT CASE WHEN doc_id % 10 < 6 THEN concat('h', doc_id % 3)
      |  ELSE concat('t', doc_id % 47) END AS host
      | FROM documents),
      |thr AS (SELECT count(*) // 9 AS t FROM k)
      |SELECT host, count(*) AS freq FROM k
      |GROUP BY host HAVING count(*) > (SELECT t FROM thr)
      |ORDER BY host""".stripMargin

  /** q109 (T67): balanced training-shard assignment — rank (token
    * count DESC, id) dealt boustrophedon over 8 shards. The oracle's
    * `row_number` window IS the semantics; the Spark default computes
    * the same rank via the two-pass range-shuffle prefix sum (no
    * single-partition window — PlanAudit holds the plan to that). */
  def q109ShardAssign(s: SparkSession, d: String): DataFrame = {
    val nTok = size(graft.ops.TextAnalysis.tokensCol(col("text")))
    Curation.shardAssign(
        documents(s, d).select(col("doc_id"), nTok.as("n_tok")),
        "doc_id", col("n_tok"), nShards = 8)
      .select(col("doc_id"), col("cost").as("n_tokens"), col("shard"))
      .orderBy(col("doc_id"))
  }

  val q109Sql: String =
    """WITH t AS (
      | SELECT doc_id,
      |  CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens
      | FROM documents),
      |r AS (
      | SELECT doc_id, n_tokens,
      |  row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS rk
      | FROM t)
      |SELECT doc_id, n_tokens,
      | CAST(least(rk % 16, 15 - (rk % 16)) AS INT) AS shard
      |FROM r ORDER BY doc_id""".stripMargin

  /** q112 (T70): fixed-ratio multimodal interleave — image-caption
    * rows (doc_id % 5 = 0, the 20% "image" stream) dealt 1 per cycle
    * of 4 against 3 text rows, each stream in doc_id order. The
    * oracle's per-stream row_number windows ARE the semantics; the
    * Spark default ranks each stream via the two-pass prefix sum. */
  def q112Interleave(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"))
    Curation.interleaveStreams(
        docs.filter(col("doc_id") % 5 === 0),
        docs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", aPer = 1, bPer = 3)
      .orderBy(col("doc_id"))
  }

  val q112Sql: String =
    """WITH a AS (
      | SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS pos
      | FROM documents WHERE doc_id % 5 = 0),
      |b AS (
      | SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS pos
      | FROM documents WHERE doc_id % 5 <> 0)
      |SELECT doc_id, 'a' AS modality, pos, (pos // 1) * 4 + pos % 1 AS slot FROM a
      |UNION ALL
      |SELECT doc_id, 'b' AS modality, pos, (pos // 3) * 4 + 1 + pos % 3 AS slot FROM b
      |ORDER BY doc_id""".stripMargin
}
