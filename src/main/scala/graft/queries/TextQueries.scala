package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis
import Tables._

/** Text-analysis operator coverage over `documents` (SURVEY.md §2.7 C3/C4
  * + the training-data ops: token stats, language-ID, quality scoring,
  * fingerprinting, BM25 search parity for the reference's indexer). */
object TextQueries {

  private val tokSqlCte =
    """WITH toks AS (
      | SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0)) AS token
      | FROM documents)""".stripMargin

  /** q13: token frequency + document frequency (C3/A4 posting stats). */
  def q13TokenFreq(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenFrequency(documents(s, d), "doc_id", "text")
      .orderBy(col("token"))

  val q13Sql: String =
    tokSqlCte +
      """
        |SELECT token, count(*) AS freq, count(DISTINCT doc_id) AS df
        |FROM toks GROUP BY token ORDER BY token""".stripMargin

  /** q51: Gopher-style repetition filters — duplicate-2-gram fraction
    * and top-2-gram coverage per document (boilerplate/spam signal). */
  def q51Repetition(s: SparkSession, d: String): DataFrame =
    TextAnalysis.repetitionStats(documents(s, d), "doc_id", "text", n = 2)
      .orderBy(col("doc_id"))

  val q51Sql: String =
    """WITH toks AS (
      | SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS tk
      | FROM documents),
      |bi AS (
      | SELECT doc_id, unnest(list_transform(range(greatest(len(tk) - 1, 0)), i -> tk[i+1] || ' ' || tk[i+2])) AS bigram
      | FROM toks),
      |cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY 1, 2),
      |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, count(*) AS n_distinct, max(c) AS top_c FROM cnt GROUP BY 1)
      |SELECT doc_id, n_bigrams, n_distinct,
      | 1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS dup_frac,
      | CAST(top_c AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS top_frac
      |FROM agg ORDER BY doc_id""".stripMargin

  /** q65: positional phrase match — documents whose token stream
    * contains "hash join" adjacently, in order (the engine side runs
    * the positions-postings adjacency join SearchEngine phrase queries
    * use; the oracle replicates tokenizer adjacency as a word-boundary
    * regex over the raw text — equivalent because any non-alnum run is
    * exactly one token boundary). */
  def q65PhraseMatch(s: SparkSession, d: String): DataFrame =
    TextAnalysis.phraseMatch(documents(s, d), "doc_id", "text",
        Seq("hash", "join"))
      .orderBy(col("doc_id"))

  val q65Sql: String =
    """SELECT doc_id FROM documents
      |WHERE regexp_matches(lower(text), '\bhash[^a-z0-9]+join\b')
      |ORDER BY doc_id""".stripMargin

  /** q66: BPE merge-step pair counts — adjacent character pairs over the
    * vocabulary weighted by word frequency (argmax = next BPE merge);
    * one corpus pass, vocab-sized explode. */
  def q66BpePairs(s: SparkSession, d: String): DataFrame =
    TextAnalysis.bpePairCounts(documents(s, d), "doc_id", "text")
      .orderBy(col("pair"))

  val q66Sql: String =
    """WITH toks AS (
      | SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0)) AS token
      | FROM documents),
      |tf AS (SELECT token, count(*) AS freq FROM toks GROUP BY 1),
      |p AS (
      | SELECT freq, unnest(list_transform(range(1, len(token)), i -> substr(token, i, 2))) AS pair
      | FROM tf WHERE len(token) >= 2)
      |SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM p
      |GROUP BY pair ORDER BY pair""".stripMargin

  // ---- BPE oracle scaffolding (VERDICT r2 #3): the 20-round training
  // loop statically unrolled as chained DuckDB CTEs — per round, a
  // scalar-subquery argmax (cnt DESC, pair ASC) and a merge replace.
  // Two non-obvious constraints:
  //  * every chain CTE is AS MATERIALIZED — DuckDB inlines CTEs by
  //    default and each v_k is referenced twice (next round's counts +
  //    next round's merge), so the inlined chain re-scans the corpus
  //    2^20 times ("too many open files" long before it finishes);
  //  * DuckDB's regexp is RE2 (no lookbehind), so Spark's
  //    `(?<=^| )a b(?=$| )` replaceAll is reproduced with the
  //    space-doubling sentinel trick: double interior spaces, plain
  //    replace-all of ' a  b ' → ' ab ', collapse doubles, trim.
  //    Doubling preserves a separator between adjacent occurrences, so
  //    non-overlapping left-to-right replacement agrees with Java's
  //    uncomsumed-lookahead scan (verified value-exact vs the Spark
  //    output at sf0.01 before wiring in).
  private def bpeCharsSeq(c: String): String =
    s"array_to_string(list_transform(range(1, len($c)+1), i -> substr($c, i, 1)), ' ')"

  /** One merge round applied to column `seq`, taking the pair from CTE
    * `mk` (a 1-row (pair, cnt) table). */
  private def bpeMergeStep(mk: String): String = {
    // Degenerate-corpus guard: if the corpus admits fewer than n merges,
    // m_k is empty and (SELECT pair FROM m_k) is NULL — replace(seq,
    // NULL, NULL) would null every seq downstream. COALESCE to '_ _', a
    // pair that can never occur (tokens are [a-z0-9]+ only), so an empty
    // merge round is a no-op, matching Spark's early-stop.
    val sel = s"COALESCE((SELECT pair FROM $mk), '_ _')"
    val pat = s"' ' || replace($sel, ' ', '  ') || ' '"
    val rep = s"' ' || replace($sel, ' ', '') || ' '"
    s"trim(replace(replace(' ' || replace(seq, ' ', '  ') || ' ', $pat, $rep), '  ', ' '))"
  }

  /** toks/tf/v0 + (c_k, m_k, v_k) for k = 1..n (v_n omitted — nothing
    * consumes it). */
  private def bpeTrainCtes(n: Int): Seq[String] = {
    val head = Seq(
      "toks AS MATERIALIZED (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0)) AS token FROM documents)",
      "tf AS MATERIALIZED (SELECT token, count(*) AS freq FROM toks GROUP BY 1)",
      s"v0 AS MATERIALIZED (SELECT freq, ${bpeCharsSeq("token")} AS seq FROM tf)")
    head ++ (1 to n).flatMap { k =>
      Seq(
        s"""c$k AS MATERIALIZED (
           | SELECT pair, sum(freq) AS cnt FROM (
           |  SELECT freq, unnest(list_transform(range(1, len(sy)), i -> sy[i] || ' ' || sy[i+1])) AS pair
           |  FROM (SELECT freq, string_split(seq, ' ') AS sy FROM v${k - 1})
           |  WHERE len(sy) >= 2) GROUP BY pair)""".stripMargin,
        s"m$k AS MATERIALIZED (SELECT pair, cnt FROM c$k ORDER BY cnt DESC, pair LIMIT 1)") ++
        (if (k < n) Seq(s"v$k AS MATERIALIZED (SELECT freq, ${bpeMergeStep(s"m$k")} AS seq FROM v${k - 1})")
         else Nil)
    }
  }

  /** q67 oracle: the 20 merges in training order. */
  val q67Sql: String = {
    val n = 20
    val sel = (1 to n)
      .map(k => s"SELECT ${k - 1} AS merge_idx, pair, CAST(cnt AS BIGINT) AS cnt FROM m$k")
      .mkString("\nUNION ALL ")
    "WITH " + bpeTrainCtes(n).mkString(",\n") + "\n" + sel + "\nORDER BY merge_idx"
  }

  /** q72 oracle: re-train the 20 merges (same CTE chain), replay them
    * over the DISTINCT-token vocabulary (e-chain — the bpeEncode
    * shape), join pieces back to the token stream, aggregate per doc. */
  val q72Sql: String = {
    val n = 20
    val enc = Seq(
      s"e0 AS MATERIALIZED (SELECT token, ${bpeCharsSeq("token")} AS seq FROM (SELECT DISTINCT token FROM toks))") ++
      (1 to n).map(k =>
        s"e$k AS MATERIALIZED (SELECT token, ${bpeMergeStep(s"m$k")} AS seq FROM e${k - 1})") ++
      Seq(s"enc AS MATERIALIZED (SELECT token, len(string_split(seq, ' ')) AS n_p FROM e$n)")
    "WITH " + (bpeTrainCtes(n) ++ enc).mkString(",\n") +
      "\nSELECT t.doc_id, count(*) AS n_tokens, CAST(sum(e.n_p) AS BIGINT) AS n_pieces" +
      "\nFROM toks t JOIN enc e USING (token) GROUP BY t.doc_id ORDER BY t.doc_id"
  }

  /** q72: BPE ENCODE — replay the 20 merges trained by q67 over the
    * corpus and report per-document subword counts (the compression the
    * tokenizer buys). Driver-oracled since round 3: the training loop
    * is statically unrolled in [[q72Sql]]; the Sennrich worked example
    * in CurationSpec remains the algorithmic pin. */
  def q72BpeEncode(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    // tokenizer tables are driver/broadcast artifacts by nature: 20 rows
    val merges = TextAnalysis.bpeMerges(docs, "doc_id", "text", 20)
      .orderBy(col("merge_idx")).select(col("pair"))
      .collect().map(_.getString(0)).toIndexedSeq
    TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_pieces")).as("n_pieces"))
      .orderBy(col("doc_id"))
  }

  /** q44: Porter-stemmed token statistics (C4 — the reference's Whoosh
    * StemmingAnalyzer, `indexer/indexer_node.py:63-67`). The Spark side
    * stems via the real PorterStemmer codegen expression; the DuckDB
    * oracle hardcodes the expected stem for the corpus's fixed 31-token
    * vocabulary, so any stemmer regression breaks the hash match. */
  def q44StemmedTokens(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenize(documents(s, d), "doc_id", "text")
      .withColumn("stem", graft.search.searchfunctions.stem_token(col("token")))
      .groupBy(col("stem"))
      .agg(countDistinct(col("token")).as("n_forms"), count(lit(1)).as("freq"))
      .orderBy(col("stem"))

  val q44Sql: String = {
    // vocabulary stems (computed by PorterStemmer, pinned here as the oracle)
    val changed = Map("customer" -> "custom", "key" -> "kei", "merge" -> "merg",
      "query" -> "queri", "table" -> "tabl", "value" -> "valu")
    val cases = changed.map { case (t, st) => s"WHEN '$t' THEN '$st'" }.mkString(" ")
    tokSqlCte +
      s"""
         |SELECT CASE token $cases ELSE token END AS stem,
         | count(DISTINCT token) AS n_forms, count(*) AS freq
         |FROM toks GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q26: marker-stopword language-ID heuristic. */
  def q26LangId(s: SparkSession, d: String): DataFrame =
    TextAnalysis.langId(documents(s, d), "doc_id", "text")
      .select(col("doc_id"), col("lang"), col("lang_pred"), col("is_match"))
      .orderBy(col("doc_id"))

  val q26Sql: String =
    """WITH t AS (
      | SELECT doc_id, lang, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tk
      | FROM documents)
      |SELECT doc_id, lang,
      | CASE WHEN CAST(len(list_filter(tk, x -> x='the' OR x='a' OR x='of' OR x='and' OR x='to' OR x='in')) AS DOUBLE) / len(tk) > 0.05
      |      THEN 'en' ELSE 'unknown' END AS lang_pred,
      | (CASE WHEN CAST(len(list_filter(tk, x -> x='the' OR x='a' OR x='of' OR x='and' OR x='to' OR x='in')) AS DOUBLE) / len(tk) > 0.05
      |      THEN 'en' ELSE 'unknown' END) = lang AS is_match
      |FROM t ORDER BY doc_id""".stripMargin

  /** q27: per-document quality metrics (length/stopword heuristics). */
  def q27Quality(s: SparkSession, d: String): DataFrame =
    TextAnalysis.qualityScore(documents(s, d), "doc_id", "text")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("avg_token_len"), col("stop_ratio"), col("len_ok"))
      .orderBy(col("doc_id"))

  val q27Sql: String =
    """WITH t AS (
      | SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tk
      | FROM documents)
      |SELECT doc_id, len(tk) AS n_tokens,
      | CAST(list_sum(list_transform(tk, x -> len(x))) AS DOUBLE) / len(tk) AS avg_token_len,
      | CAST(len(list_filter(tk, x -> x='the' OR x='a' OR x='of' OR x='and' OR x='to' OR x='in')) AS DOUBLE) / len(tk) AS stop_ratio,
      | len(tk) BETWEEN 20 AND 1000 AS len_ok
      |FROM t ORDER BY doc_id""".stripMargin

  /** q28: corpus-level token statistics (single row). */
  def q28TokenStats(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenize(documents(s, d), "doc_id", "text")
      .agg(count(lit(1)).as("total_tokens"),
           countDistinct(col("token")).as("vocab"),
           countDistinct(col("doc_id")).as("n_docs"))

  val q28Sql: String =
    tokSqlCte +
      """
        |SELECT count(*) AS total_tokens, count(DISTINCT token) AS vocab, count(DISTINCT doc_id) AS n_docs
        |FROM toks""".stripMargin

  /** q29: content fingerprint (md5 + 60-bit integer prefix). */
  def q29Fingerprint(s: SparkSession, d: String): DataFrame =
    TextAnalysis.fingerprint(documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  val q29Sql: String =
    """SELECT doc_id,
      | md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
      | CAST(concat('0x', substr(md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))), 1, 15)) AS BIGINT) AS fp_int
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q34: BM25 top-10 for a fixed query (O2 — the Whoosh search path). */
  def q34Bm25(s: SparkSession, d: String): DataFrame =
    TextAnalysis.bm25TopK(documents(s, d), "doc_id", "text",
        terms = Seq("spark", "join", "fast"), k = 10)
      .select(col("rank").cast("int").as("rank"), col("doc_id"), col("score"))

  /** q46: the full v3 search path — BM25F over title+content with
    * Porter-stemmed index AND query terms ("joins merging" must match
    * docs containing "join"/"merge"), through the real SearchEngine.
    * Title is derived as the first 5 tokens of the text so the oracle
    * can reproduce the field split. */
  def q46Bm25fSearch(s: SparkSession, d: String): DataFrame = {
    val toks = TextAnalysis.tokensCol(col("text"))
    val docs = documents(s, d).select(
      col("doc_id").cast("string").as("url"),
      array_join(slice(toks, 1, 5), " ").as("title"),
      col("text").as("content"),
      col("source").as("domain"))
    new graft.search.SearchEngine(s, docs)
      .search("joins merging", k = 10)
      .select(col("rank"), col("url"), col("score"))
      .orderBy(col("rank"))
  }

  val q46Sql: String = {
    val changed = Map("customer" -> "custom", "key" -> "kei", "merge" -> "merg",
      "query" -> "queri", "table" -> "tabl", "value" -> "valu")
    val stemCase = "CASE token " +
      changed.map { case (t, st) => s"WHEN '$t' THEN '$st'" }.mkString(" ") +
      " ELSE token END"
    // mirrors SearchEngine.search: per-field normalized tf (b=0.75),
    // weight 1.0 both fields, shared saturation (k1=1.2), idf over docs
    // containing the term in any field, score rounded to 6 decimals
    s"""WITH raw AS (
       | SELECT CAST(doc_id AS VARCHAR) AS url,
       |  list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS tk
       | FROM documents),
       |ft AS (
       | SELECT url, 'title' AS field, $stemCase AS stem FROM (
       |  SELECT url, unnest(tk[1:5]) AS token FROM raw)
       | UNION ALL
       | SELECT url, 'content' AS field, $stemCase AS stem FROM (
       |  SELECT url, unnest(tk) AS token FROM raw)),
       |tf AS (SELECT url, field, stem, count(*) AS tf FROM ft
       |       WHERE stem IN ('join', 'merg') GROUP BY 1, 2, 3),
       |fl AS (SELECT url, field, count(*) AS fl FROM ft GROUP BY 1, 2),
       |avgl AS (SELECT field, CAST(sum(fl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgfl
       |         FROM fl GROUP BY field),
       |ndocs AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |tfc AS (
       | SELECT tf.url, tf.stem,
       |  sum(CAST(tf.tf AS DOUBLE) / (0.25 + 0.75 * CAST(fl.fl AS DOUBLE) / avgl.avgfl)) AS tfc
       | FROM tf JOIN fl ON tf.url = fl.url AND tf.field = fl.field
       |         JOIN avgl ON avgl.field = tf.field
       | GROUP BY 1, 2),
       |dfq AS (SELECT stem, count(*) AS doc_freq FROM tfc GROUP BY stem),
       |scored AS (
       | SELECT url, round(sum(
       |   ln(1.0 + (n - CAST(doc_freq AS DOUBLE) + 0.5) / (CAST(doc_freq AS DOUBLE) + 0.5))
       |   * tfc * 2.2 / (1.2 + tfc)), 6) AS score
       | FROM tfc JOIN dfq USING (stem) CROSS JOIN ndocs
       | GROUP BY url)
       |SELECT CAST(row_number() OVER (ORDER BY score DESC, url) AS INT) AS rank, url, score
       |FROM scored ORDER BY score DESC, url LIMIT 10""".stripMargin
  }

  val q34Sql: String =
    tokSqlCte +
      """,
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_tokens FROM dl),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks WHERE token IN ('spark','join','fast') GROUP BY doc_id, token),
        |dfq AS (SELECT token, count(*) AS doc_freq FROM tf GROUP BY token),
        |scored AS (
        | SELECT tf.doc_id, round(sum(
        |   ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(doc_freq AS DOUBLE) + 0.5) / (CAST(doc_freq AS DOUBLE) + 0.5))
        |   * (CAST(tf AS DOUBLE) * 2.2)
        |   / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))
        |  ), 6) AS score
        | FROM tf JOIN dfq USING (token) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
        | GROUP BY tf.doc_id)
        |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank, doc_id, score
        |FROM scored ORDER BY score DESC, doc_id LIMIT 10""".stripMargin

  /** q57: PII-redaction scrub (training-corpus cleaning). The synthetic
    * corpus carries no PII, so the query deterministically plants one
    * email + one phone per row from doc_id, then scrubs and counts them
    * — the operator under test is `TextAnalysis.piiScrub` (pure regexp
    * column logic, map-side only at scale). */
  def q57PiiScrub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select($"doc_id",
        concat_ws(" ", substring($"text", 1, 40),
          concat(lit("user"), $"doc_id", lit("@example.com")),
          concat(lit("+1-555-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0"))).as("raw"))
      .select($"doc_id",
        regexp_count($"raw", lit(TextAnalysis.EmailRe)).cast("long").as("n_emails"),
        regexp_count($"raw", lit(TextAnalysis.PhoneRe)).cast("long").as("n_phones"),
        TextAnalysis.piiScrub($"raw").as("clean"))
      .orderBy($"doc_id")
  }

  /** q60: CCNet/Dolma-style cross-document chunk dedup. The synthetic
    * corpus has no natural boilerplate, so every document gets the same
    * 8-token banner prepended (chunk 0 everywhere → corpus-wide df =
    * n_docs → dropped); the payload chunks shift by exactly one block
    * and stay document-specific. Docs that are exact duplicates of >=
    * maxDupDocs others also lose their shared chunks — both engines
    * compute the same rule. */
  def q60ChunkDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val withBanner = documents(s, d).select($"doc_id",
      concat(lit("copyright footer boilerplate banner repeat chunk eight tokens "),
        $"text").as("text"))
    TextAnalysis.chunkDedup(withBanner, "doc_id", "text", chunkTokens = 8, maxDupDocs = 2)
      .orderBy($"doc_id")
  }

  val q60Sql: String =
    """WITH raw AS (
      | SELECT doc_id,
      |  concat('copyright footer boilerplate banner repeat chunk eight tokens ', text) AS rtext
      | FROM documents),
      |t AS (
      | SELECT doc_id,
      |  list_filter(regexp_split_to_array(lower(rtext), '[^a-z0-9]+'), x -> len(x) > 0) AS tk
      | FROM raw),
      |ch AS (
      | SELECT doc_id, s.i AS chunk_idx, s.c AS chunk FROM (
      |  SELECT doc_id,
      |   unnest(list_transform(range(((len(tk)-1)//8)+1),
      |     i -> {'i': i, 'c': array_to_string(list_slice(tk, i*8+1, i*8+8), ' ')})) AS s
      |  FROM t)),
      |dup AS (SELECT chunk FROM ch GROUP BY chunk HAVING count(DISTINCT doc_id) > 2),
      |kept AS (SELECT * FROM ch WHERE chunk NOT IN (SELECT chunk FROM dup)),
      |tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id),
      |k AS (
      | SELECT doc_id, count(*) AS n_kept,
      |  md5(array_to_string(list(chunk ORDER BY chunk_idx), ' ')) AS clean_fp
      | FROM kept GROUP BY doc_id)
      |SELECT t.doc_id, t.n_chunks, coalesce(k.n_kept, 0) AS n_kept,
      | coalesce(k.clean_fp, md5('')) AS clean_fp
      |FROM tot t LEFT JOIN k ON k.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  val q57Sql: String =
    """WITH raw AS (
      | SELECT doc_id,
      |  concat_ws(' ', substr(text, 1, 40),
      |   concat('user', CAST(doc_id AS VARCHAR), '@example.com'),
      |   concat('+1-555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))) AS raw
      | FROM documents)
      |SELECT doc_id,
      | len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
      | len(regexp_extract_all(raw, '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS n_phones,
      | regexp_replace(
      |   regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |   '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
      |FROM raw ORDER BY doc_id""".stripMargin

  /** q75: CCNet-style LM-perplexity quality filter — character-trigram
    * model trained on the corpus in one pass (vocabulary-bounded, so it
    * broadcasts at any corpus size), every document scored by average
    * negative log-likelihood with add-one smoothing. The 1.02 threshold
    * is demonstrative (splits this synthetic corpus roughly in half —
    * its nll range is 0.91-1.13); production passes a held-out model
    * and threshold to `LangModel.lmScore`. */
  def q75LmPerplexity(s: SparkSession, d: String): DataFrame =
    graft.ops.LangModel.selfPerplexity(documents(s, d), "doc_id", "text",
        threshold = 1.02)
      .orderBy(col("doc_id"))

  val q75Sql: String =
    """WITH norm AS (
      | SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
      | FROM documents),
      |tris AS (
      | SELECT doc_id, unnest(list_transform(range(greatest(len(s) - 2, 0)), i -> substr(s, i + 1, 3))) AS tri
      | FROM norm),
      |m_tri AS (SELECT tri, count(*) AS c3 FROM tris GROUP BY tri),
      |m_bi AS (SELECT substr(tri, 1, 2) AS bi, CAST(sum(c3) AS BIGINT) AS c2 FROM m_tri GROUP BY 1),
      |v AS (SELECT count(*) AS v FROM m_tri),
      |scored AS (
      | SELECT t.doc_id, count(*) AS n_tris,
      |  avg(-ln((m.c3 + 1.0) / (b.c2 + (SELECT v FROM v)))) AS nll_raw
      | FROM tris t JOIN m_tri m ON m.tri = t.tri
      | JOIN m_bi b ON b.bi = substr(t.tri, 1, 2)
      | GROUP BY t.doc_id)
      |SELECT d.doc_id, COALESCE(s.n_tris, 0) AS n_tris,
      | round(s.nll_raw, 6) AS nll,
      | round(s.nll_raw, 6) <= 1.02 AS quality_ok
      |FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** q76: DSIR-style importance resampling — target = the `lang = 'en'`
    * slice (a stand-in for any trusted/high-quality subset), source =
    * the whole corpus; keep each document with probability
    * min(1, exp(log_w - mean(log_w))) decided by its salted id-hash
    * bucket (deterministic across runs/engines/resharding). */
  def q76DsirResample(s: SparkSession, d: String): DataFrame =
    graft.ops.LangModel.importanceResample(documents(s, d), "doc_id", "text",
        isTarget = col("lang") === "en")
      .orderBy(col("doc_id"))

  val q76Sql: String =
    """WITH norm AS (
      | SELECT doc_id, lang, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
      | FROM documents),
      |tris AS (
      | SELECT doc_id, unnest(list_transform(range(greatest(len(s) - 2, 0)), i -> substr(s, i + 1, 3))) AS tri
      | FROM norm),
      |ttris AS (
      | SELECT doc_id, unnest(list_transform(range(greatest(len(s) - 2, 0)), i -> substr(s, i + 1, 3))) AS tri
      | FROM norm WHERE lang = 'en'),
      |m_src AS (SELECT tri, count(*) AS c3s FROM tris GROUP BY tri),
      |m_srcb AS (SELECT substr(tri,1,2) AS bi, CAST(sum(c3s) AS BIGINT) AS c2s FROM m_src GROUP BY 1),
      |m_tgt AS (SELECT tri, count(*) AS c3t FROM ttris GROUP BY tri),
      |m_tgtb AS (SELECT substr(tri,1,2) AS bi, CAST(sum(c3t) AS BIGINT) AS c2t FROM m_tgt GROUP BY 1),
      |vs AS (SELECT count(*) AS v FROM m_src),
      |vt AS (SELECT count(*) AS v FROM m_tgt),
      |model AS (
      | SELECT s.tri, s.c3s, sb.c2s, t.c3t,
      |  CASE WHEN t.tri IS NULL THEN NULL ELSE tb.c2t END AS c2t
      | FROM m_src s JOIN m_srcb sb ON sb.bi = substr(s.tri,1,2)
      | LEFT JOIN m_tgt t ON t.tri = s.tri
      | LEFT JOIN m_tgtb tb ON tb.bi = substr(s.tri,1,2)),
      |scored AS (
      | SELECT t.doc_id, count(*) AS n_tris,
      |  round((round(avg(-ln((m.c3s + 1.0) / (m.c2s + (SELECT v FROM vs)))), 6)
      |       - round(avg(-ln((COALESCE(m.c3t, 0) + 1.0) / (COALESCE(m.c2t, 0) + (SELECT v FROM vt)))), 6))
      |       * count(*), 6) AS log_w
      | FROM tris t JOIN model m ON m.tri = t.tri
      | GROUP BY t.doc_id),
      |cent AS (
      | SELECT doc_id, n_tris, log_w,
      |  round(least(1.0, exp(round(log_w - avg(log_w) OVER (), 6))), 6) AS p_accept
      | FROM scored)
      |SELECT d.doc_id, COALESCE(c.n_tris, 0) AS n_tris, c.log_w, c.p_accept,
      | COALESCE(CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR) || ':dsir'), 1, 8)) AS BIGINT) % 1000000
      |   < floor(c.p_accept * 1000000), false) AS kept
      |FROM documents d LEFT JOIN cent c ON c.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** q84 (T42): tf-idf similar-document pairs — sparse-retrieval
    * complement to the dense ANN queries. Quantized-integer weights,
    * df-capped posting self-join (see ops/TextAnalysis Scaladoc). */
  def q84TfidfPairs(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tfidfSimilarPairs(documents(s, d), "doc_id", "text")
      .orderBy(col("doc_a"), col("doc_b"))

  val q84Sql: String =
    """WITH postings AS (
      | SELECT doc_id, token, count(*) AS tf FROM (
      |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0)) AS token
      |  FROM documents) GROUP BY doc_id, token),
      |dfreq AS (
      | SELECT token, count(*) AS df FROM postings
      | GROUP BY token HAVING count(*) BETWEEN 2 AND 50),
      |w AS (
      | SELECT p.token, p.doc_id AS doc, p.tf * (10000 // d.df) AS w
      | FROM postings p JOIN dfreq d USING (token))
      |SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_shared,
      | CAST(sum(a.w * b.w) AS BIGINT) AS score
      |FROM w a JOIN w b ON a.token = b.token AND a.doc < b.doc
      |GROUP BY 1, 2 HAVING CAST(sum(a.w * b.w) AS BIGINT) >= 1
      |ORDER BY 1, 2""".stripMargin

  /** q95 (T53): exact duplicated-span extraction over the raw corpus —
    * the synthetic documents table carries genuine repeated text
    * (near-dup families feed the minhash/jaccard queries), so any
    * 8-gram occurring twice anywhere yields spans; the oracle rebuilds
    * the same sliding grams + run-merge with raw gram strings (the
    * Spark side shuffles xxhash64 longs — an internal choice the
    * output can't see). */
  def q95DupSpans(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    TextAnalysis.duplicatedSpans(documents(s, d), "doc_id", "text", k = 8)
      .orderBy($"doc_id", $"span_start")
  }

  val q95Sql: String =
    """WITH t AS (
      | SELECT doc_id,
      |  list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tk
      | FROM documents),
      |g AS (
      | SELECT doc_id,
      |  unnest(list_transform(range(len(tk) - 7),
      |    i -> {'p': i, 'g': array_to_string(list_slice(tk, i+1, i+8), ' ')})) AS s
      | FROM t WHERE len(tk) >= 8),
      |pos AS (SELECT doc_id, s.p AS pos, s.g AS gram FROM g),
      |dup AS (SELECT gram FROM pos GROUP BY gram HAVING count(*) >= 2),
      |dp AS (
      | SELECT doc_id, pos,
      |  lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
      | FROM pos WHERE gram IN (SELECT gram FROM dup)),
      |runs AS (
      | SELECT doc_id, pos,
      |  sum(CASE WHEN prev IS NOT NULL AND pos - prev <= 8 THEN 0 ELSE 1 END)
      |   OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      | FROM dp)
      |SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
      | max(pos) - min(pos) + 8 AS span_tokens
      |FROM runs GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin
}
