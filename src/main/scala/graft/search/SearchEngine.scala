package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis
import searchfunctions.stem_token

/**
 * Search over the crawled `indexed_docs` table — the reference's indexer
 * query path rebuilt relationally (SURVEY.md §3.2):
 *
 *  - v1 parity: tokenize -> AND-intersect posting lists -> unranked URLs
 *    (`archive/indexer_node.py:36-50`, J6 semi-join intersection).
 *  - v3 parity: BM25F top-k over title AND content with per-field
 *    weights and length normalization (Whoosh `scoring.BM25F` +
 *    `MultifieldParser(["title","content"])`,
 *    `indexer/indexer_node.py:157-163`, O2), Porter-stemmed on both the
 *    index and the query side (`StemmingAnalyzer`, `indexer_node.py:63-67`
 *    — C4), field-prefixed query terms (`title:foo`), quoted phrase
 *    queries (`"exact words"`, optionally field-prefixed — Whoosh's
 *    default parser treats quoted segments positionally) matched via
 *    positions-postings adjacency joins, and top-2 term-window
 *    highlighted snippets (`result.highlights("content", top=2)`,
 *    `indexer_node.py:166-171` — O3).
 *
 * Postings are a DataFrame (url, field, token) built once per snapshot;
 * stemming runs as a native codegen expression. The AND-intersection is
 * `groupBy(url).count == nTerms` over the semi-joined postings —
 * Catalyst plans it as one hash aggregate after a broadcast semi-join
 * on the tiny term list.
 */
class SearchEngine(spark: SparkSession, docs: DataFrame,
                   fieldWeights: Map[String, Double] = Map("title" -> 1.0, "content" -> 1.0)) {
  import spark.implicits._

  private val K1 = 1.2
  private val B = 0.75
  private val Fields = Seq("title", "content")

  private def stemmedTokens(c: Column): Column =
    transform(TextAnalysis.tokensCol(c), t => stem_token(t))

  /** (url, field, token) rows, stemmed, one per occurrence. */
  lazy val fieldTokens: DataFrame =
    Fields.map { f =>
      docs.select($"url", lit(f).as("field"), explode(stemmedTokens(col(f))).as("token"))
    }.reduce(_ unionByName _)

  /** (url, field, pos, token) rows — postings with positions, for
    * phrase queries. */
  lazy val fieldPositions: DataFrame =
    Fields.map { f =>
      docs.select($"url", lit(f).as("field"),
        posexplode(stemmedTokens(col(f))).as(Seq("pos", "token")))
    }.reduce(_ unionByName _)

  /** (token, url) posting rows over content, deduplicated (A4) — v1's
    * inverted index `defaultdict(list)` (`archive/indexer_node.py:15-17`). */
  lazy val postings: DataFrame =
    fieldTokens.filter($"field" === "content").select($"token", $"url").distinct()

  /** Parsed query term: optional field restriction + stemmed term —
    * `MultifieldParser` field-prefix syntax (`title:foo bar`). */
  case class QTerm(field: Option[String], term: String)

  /** Quoted phrase, optionally field-restricted (`title:"exact words"`)
    * — Whoosh's default parser treats quoted segments as positional
    * phrase queries. Terms are stemmed like everything else. */
  case class QPhrase(field: Option[String], terms: Seq[String])

  private val PhraseRe = """(?:(title|content):)?"([^"]*)"""".r

  private[search] def parse(query: String): Seq[QTerm] =
    query.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { raw =>
      val (fld, body) = raw.split(":", 2) match {
        case Array(f, rest) if Fields.contains(f) => (Some(f), rest)
        case _ => (None, raw)
      }
      body.split("[^a-z0-9]+").filter(_.nonEmpty).map(t => QTerm(fld, PorterStemmer.stem(t)))
    }.distinct

  /** Full parse: quoted segments become `QPhrase`s, the remainder plain
    * terms. */
  private[search] def parseFull(query: String): (Seq[QTerm], Seq[QPhrase]) = {
    val q = query.toLowerCase
    val phrases = PhraseRe.findAllMatchIn(q).flatMap { m =>
      val ts = m.group(2).split("[^a-z0-9]+").filter(_.nonEmpty)
        .map(PorterStemmer.stem).toSeq
      if (ts.isEmpty) None else Some(QPhrase(Option(m.group(1)), ts))
    }.toSeq
    (parse(PhraseRe.replaceAllIn(q, " ")), phrases)
  }

  /** Distinct URLs whose `field` token stream contains the phrase
    * adjacently, in order (positions adjacency join — see
    * `TextAnalysis.adjacencyMatch`). */
  private def phraseUrls(p: QPhrase): DataFrame = {
    val flds = p.field.map(Seq(_)).getOrElse(Fields)
    TextAnalysis.adjacencyMatch(
        fieldPositions.filter($"field".isin(flds.map(x => x: Any): _*)),
        Seq("url", "field"), p.terms)
      .select($"url").distinct()
  }

  /** v1 semantics: URLs containing ALL query terms (stemmed on both
    * sides, so "joins" finds documents containing "join"), URL order.
    * Quoted segments additionally require positional adjacency. */
  def searchAnd(query: String): DataFrame = {
    val (qterms, phrases) = parseFull(query)
    // v1 postings are content-only: field-restricted phrases constrain
    // via their positional match alone, not the content AND-set
    val ts = (qterms.map(_.term) ++
      phrases.filter(_.field.forall(_ == "content")).flatMap(_.terms)).distinct
    if (ts.isEmpty && phrases.isEmpty) return docs.select($"url").limit(0)
    val byTerms =
      if (ts.isEmpty) docs.select($"url")
      else postings
        .filter($"token".isin(ts.map(x => x: Any): _*))
        .groupBy($"url")
        .agg(countDistinct($"token").as("n_hit"))
        .filter($"n_hit" === ts.size)
        .select($"url")
    phrases.foldLeft(byTerms)((acc, p) =>
        acc.join(phraseUrls(p), Seq("url"), "left_semi"))
      .orderBy($"url")
  }

  /** v3 semantics: BM25F top-k over title+content with highlighted
    * snippets. Scores rounded to 6 decimals before ranking (ln() ulp
    * reproducibility, as TextAnalysis.bm25TopK). */
  def search(query: String, k: Int = 10): DataFrame = {
    val (plainTerms, phrases) = parseFull(query)
    // phrase terms score like plain terms (Whoosh scores phrase matches
    // by term weight too), carrying the phrase's field restriction; the
    // adjacency requirement is enforced as a candidate filter below
    val qterms = (plainTerms ++
      phrases.flatMap(p => p.terms.map(QTerm(p.field, _)))).distinct
    // empty/no-token query: empty result with the NORMAL schema, so
    // callers can select/write uniformly
    if (qterms.isEmpty) return docs
      .select(lit(0).cast("int").as("rank"), $"url", $"title", $"domain",
        lit(0.0).as("score"), lit("").as("snippet"))
      .limit(0)
    val allTerms = qterms.map(_.term).distinct

    // per-(url, field, term) tf over query terms only
    val tf = fieldTokens
      .filter($"token".isin(allTerms.map(x => x: Any): _*))
      .groupBy($"url", $"field", $"token").agg(count(lit(1)).as("tf"))
    // per-(url, field) length + per-field average length
    val fieldLen = fieldTokens.groupBy($"url", $"field").agg(count(lit(1)).as("fl"))
    val avgLen = fieldLen.groupBy($"field")
      .agg((sum($"fl").cast("double") / count(lit(1)).cast("double")).as("avgfl"))
    val nDocs = docs.count().toDouble

    // field restrictions: a term counts in a field iff unrestricted or
    // restricted to exactly that field
    val restricted = qterms.filter(_.field.isDefined)
      .map(q => (q.term, q.field.get)).toDF("token", "only_field")
    val wCol = Fields.map(f => when($"field" === f, lit(fieldWeights.getOrElse(f, 1.0))))
      .reduce(_ otherwise _)

    // BM25F (Robertson/Zaragoza): per-field normalized tf, weighted sum,
    // shared saturation
    val tfn = tf
      .join(fieldLen, Seq("url", "field"))
      .join(broadcast(avgLen), Seq("field"))
      .join(broadcast(restricted), Seq("token"), "left")
      .filter($"only_field".isNull || $"only_field" === $"field")
      .withColumn("w", wCol)
      .withColumn("tfn",
        $"w" * $"tf".cast("double") /
          (lit(1.0 - B) + lit(B) * $"fl".cast("double") / $"avgfl"))
      .groupBy($"url", $"token").agg(sum($"tfn").as("tfc"))
    // document frequency per term (any counted field)
    val dfreq = tfn.groupBy($"token").agg(count(lit(1)).as("doc_freq"))
    val scored = tfn
      .join(broadcast(dfreq), "token")
      .withColumn("idf",
        log(lit(1.0) + (lit(nDocs) - $"doc_freq".cast("double") + lit(0.5))
          / ($"doc_freq".cast("double") + lit(0.5))))
      .withColumn("tscore", $"idf" * $"tfc" * lit(K1 + 1.0) / (lit(K1) + $"tfc"))
      .groupBy($"url")
      .agg(round(sum($"tscore"), 6).as("score"))
    // positional phrase constraint: candidates must contain every quoted
    // phrase adjacently (semi-join against the tiny matched-url sets),
    // applied BEFORE the top-k cut
    val phrased = phrases.foldLeft(scored)((acc, p) =>
      acc.join(phraseUrls(p), Seq("url"), "left_semi"))
    val topk = phrased
      .orderBy($"score".desc, $"url")
      .limit(k)

    val contentTerms = qterms.filter(_.field.forall(_ == "content")).map(_.term).distinct
    // Scala UDF is acceptable ONLY here: it runs strictly after the
    // top-k cut, over <= k presentation rows — never corpus-wide (the
    // scoring path above is all built-in column logic).
    val hl = SearchEngine.highlightUdf
    topk
      .join(docs.select($"url", $"title", $"domain", $"content"), "url")
      .withColumn("snippet", hl($"content", typedLit(contentTerms)))
      .select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"score".desc, $"url")).as("rank"),
        $"url", $"title", $"domain", $"score", $"snippet")
      .orderBy($"rank")
  }
}

object SearchEngine {
  /** Top-2 term-window highlight (O3, `indexer_node.py:166-171`): up to
    * two ~80-char fragments centered on stem-matched tokens, matched
    * terms wrapped in <b></b>; falls back to the first 200 chars
    * (`indexer_node.py:167-171`) when nothing matches. */
  def highlight(content: String, stemmedTerms: Seq[String], top: Int = 2, window: Int = 40): String = {
    if (content == null) return null
    val matches = scala.collection.mutable.ArrayBuffer[(Int, Int)]() // (start, end)
    val re = java.util.regex.Pattern.compile("[a-zA-Z0-9]+")
    val m = re.matcher(content)
    val terms = stemmedTerms.toSet
    while (m.find() && matches.size < top) {
      if (terms.contains(PorterStemmer.stem(m.group().toLowerCase)))
        matches += ((m.start(), m.end()))
    }
    if (matches.isEmpty)
      return content.substring(0, math.min(200, content.length)) + "..."
    matches.map { case (s, e) =>
      val from = math.max(0, s - window)
      val to = math.min(content.length, e + window)
      val pre = content.substring(from, s)
      val hit = content.substring(s, e)
      val post = content.substring(e, to)
      s"$pre<b>$hit</b>$post"
    }.mkString(" ... ")
  }

  private[search] val highlightUdf =
    org.apache.spark.sql.functions.udf((c: String, ts: Seq[String]) => highlight(c, ts))
}
