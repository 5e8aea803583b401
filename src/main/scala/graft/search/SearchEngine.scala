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

  // ---- Boolean query AST (Whoosh `MultifieldParser` operator support:
  // uppercase OR / AND / NOT keywords + parenthesized grouping,
  // `indexer/indexer_node.py:159-163`). Whoosh's infix operators bind
  // their immediate neighbors tighter than the implicit AND between
  // adjacent words: `a b OR c` parses as a AND (b OR c). A standalone
  // `NOT x` is complement semantics (all docs minus x's matches).
  private[search] sealed trait QNode
  private[search] case class QTermNode(t: QTerm) extends QNode
  private[search] case class QPhraseNode(p: QPhrase) extends QNode
  private[search] case class QAnd(children: Seq[QNode]) extends QNode
  private[search] case class QOr(children: Seq[QNode]) extends QNode
  private[search] case class QNot(child: QNode) extends QNode

  private[search] sealed trait Tok
  private[search] case object TOpen extends Tok
  private[search] case object TClose extends Tok
  private[search] case object TOr extends Tok
  private[search] case object TAnd extends Tok
  private[search] case object TNot extends Tok
  private[search] case class TPhrase(p: QPhrase) extends Tok
  private[search] case class TTerms(ts: Seq[QTerm]) extends Tok

  // Field prefix matches case-insensitively on the prefix ONLY (the
  // query is no longer lowercased before lexing — OR/AND/NOT must stay
  // uppercase-sensitive), so `Title:"a b"` is the same field phrase as
  // `title:"a b"`; the captured field is lowercased before building
  // QPhrase.
  private val QTokRe = """(?:((?i:title|content)):)?"([^"]*)"|\(|\)|[^\s()]+""".r

  /** Lex the raw query. Operators are recognized UPPERCASE only (Whoosh:
    * lowercase `or` is an ordinary term). Returns the token stream plus
    * whether any boolean operator / paren was seen — plain queries keep
    * the legacy (and plan-audited) physical shape. */
  private[search] def lexQuery(query: String): (IndexedSeq[Tok], Boolean) = {
    var sawOp = false
    val toks = QTokRe.findAllMatchIn(query).flatMap { m =>
      val s = m.matched
      if (s == "(") { sawOp = true; Some(TOpen) }
      else if (s == ")") { sawOp = true; Some(TClose) }
      else if (m.group(2) != null) {
        val ts = m.group(2).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
          .map(PorterStemmer.stem).toSeq
        if (ts.isEmpty) None
        else Some(TPhrase(QPhrase(Option(m.group(1)).map(_.toLowerCase), ts)))
      }
      else if (s == "OR") { sawOp = true; Some(TOr) }
      else if (s == "AND") { sawOp = true; Some(TAnd) }
      else if (s == "NOT") { sawOp = true; Some(TNot) }
      else {
        val raw = s.toLowerCase
        val (fld, body) = raw.split(":", 2) match {
          case Array(f, rest) if Fields.contains(f) => (Some(f), rest)
          case _ => (None, raw)
        }
        val ts = body.split("[^a-z0-9]+").filter(_.nonEmpty)
          .map(t => QTerm(fld, PorterStemmer.stem(t))).toSeq
        if (ts.isEmpty) None else Some(TTerms(ts))
      }
    }.toIndexedSeq
    (toks, sawOp)
  }

  private def andOf(cs: Seq[QNode]): QNode =
    if (cs.size == 1) cs.head else QAnd(cs)

  /** Recursive-descent parse. Grammar (Whoosh-shaped):
    *   top  := (unit)*            -- implicit AND between units
    *   unit := not ((OR|AND) not)*  -- infix ops bind tight, left-assoc
    *   not  := NOT not | atom
    *   atom := '(' top ')' | phrase | word
    * Dangling operators and empty groups are dropped, as Whoosh's
    * parser repairs them. */
  private[search] class BoolParser(toks: IndexedSeq[Tok]) {
    private var i = 0
    private def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None

    def parseTop(): QNode = {
      val units = scala.collection.mutable.ArrayBuffer[QNode]()
      while (i < toks.length) {
        if (toks(i) == TClose) i += 1 // stray ')' at top level: skip
        else parseUnit().foreach(units += _)
      }
      andOf(units.toSeq)
    }

    private def parseGroup(): QNode = {
      val units = scala.collection.mutable.ArrayBuffer[QNode]()
      while (peek.exists(_ != TClose)) parseUnit().foreach(units += _)
      andOf(units.toSeq)
    }

    private def parseUnit(): Option[QNode] = {
      var left = parseNot()
      var cont = true
      while (cont) peek match {
        case Some(TOr) | Some(TAnd) =>
          val op = toks(i); i += 1
          parseNot() match {
            case Some(r) =>
              left = Some(left match {
                case Some(l) => if (op == TOr) QOr(Seq(l, r)) else QAnd(Seq(l, r))
                case None => r
              })
            case None => // dangling trailing operator: drop
          }
        case _ => cont = false
      }
      left
    }

    private def parseNot(): Option[QNode] = peek match {
      case Some(TNot) => i += 1; parseNot().map(QNot)
      case _ => parseAtom()
    }

    private def parseAtom(): Option[QNode] = peek match {
      case Some(TOpen) =>
        i += 1
        val g = parseGroup()
        if (peek.contains(TClose)) i += 1
        g match { case QAnd(Seq()) => None; case x => Some(x) }
      case Some(TPhrase(p)) => i += 1; Some(QPhraseNode(p))
      case Some(TTerms(ts)) =>
        i += 1
        Some(andOf(ts.map(QTermNode)))
      case Some(TOr) | Some(TAnd) => i += 1; parseAtom() // leading op: drop
      case _ => None // TClose / end: caller handles
    }
  }

  private[search] def parseBool(query: String): (QNode, Boolean) = {
    val (toks, sawOp) = lexQuery(query)
    (new BoolParser(toks).parseTop(), sawOp)
  }

  /** Leaves NOT under an (odd) NOT — the terms/phrases that score. */
  private[search] def positives(n: QNode, neg: Boolean = false): (Seq[QTerm], Seq[QPhrase]) =
    n match {
      case QTermNode(t) => if (neg) (Nil, Nil) else (Seq(t), Nil)
      case QPhraseNode(p) => if (neg) (Nil, Nil) else (Nil, Seq(p))
      case QAnd(cs) =>
        cs.map(positives(_, neg)).foldLeft((Seq.empty[QTerm], Seq.empty[QPhrase])) {
          (a, b) => (a._1 ++ b._1, a._2 ++ b._2) }
      case QOr(cs) =>
        cs.map(positives(_, neg)).foldLeft((Seq.empty[QTerm], Seq.empty[QPhrase])) {
          (a, b) => (a._1 ++ b._1, a._2 ++ b._2) }
      case QNot(c) => positives(c, !neg)
    }

  private def allUrls: DataFrame = docs.select($"url").distinct()

  /** v1 membership eval: content-only postings (field restrictions on
    * plain terms are ignored, as v1's single-field index did); phrase
    * leaves are their positional match (which implies term presence).
    * AND of plain terms keeps the one-aggregate countDistinct shape
    * rather than a semi-join per term. */
  private def evalV1(n: QNode): DataFrame = n match {
    case QTermNode(t) =>
      postings.filter($"token" === t.term).select($"url")
    case QPhraseNode(p) =>
      // v1's index is content-only: an unrestricted phrase must match in
      // content — a title-only adjacency hit is invisible to v1. Without
      // the pin, phraseUrls searches title AND content (v3 semantics).
      phraseUrls(p.copy(field = p.field.orElse(Some("content"))))
    case QAnd(cs) =>
      val termLeaves = cs.collect { case QTermNode(t) => t.term }.distinct
      val rest = cs.filterNot(_.isInstanceOf[QTermNode])
      val byTerms =
        if (termLeaves.isEmpty) None
        else Some(postings
          .filter($"token".isin(termLeaves.map(x => x: Any): _*))
          .groupBy($"url").agg(countDistinct($"token").as("n_hit"))
          .filter($"n_hit" === termLeaves.size)
          .select($"url"))
      val parts = byTerms.toSeq ++ rest.map(evalV1)
      if (parts.isEmpty) allUrls
      else parts.reduce((a, b) => a.join(b, Seq("url"), "left_semi"))
    case QOr(cs) =>
      if (cs.isEmpty) allUrls.limit(0)
      else cs.map(evalV1).reduce(_ unionByName _).distinct()
    case QNot(c) => allUrls.join(evalV1(c), Seq("url"), "left_anti")
  }

  /** v3 membership eval: field-aware term presence (unrestricted terms
    * match title OR content, `MultifieldParser` semantics). */
  private def evalV3(n: QNode): DataFrame = n match {
    case QTermNode(QTerm(fld, t)) =>
      val flds = fld.map(Seq(_)).getOrElse(Fields)
      fieldTokens
        .filter($"token" === t && $"field".isin(flds.map(x => x: Any): _*))
        .select($"url").distinct()
    case QPhraseNode(p) => phraseUrls(p)
    case QAnd(cs) =>
      if (cs.isEmpty) allUrls
      else cs.map(evalV3).reduce((a, b) => a.join(b, Seq("url"), "left_semi"))
    case QOr(cs) =>
      if (cs.isEmpty) allUrls.limit(0)
      else cs.map(evalV3).reduce(_ unionByName _).distinct()
    case QNot(c) => allUrls.join(evalV3(c), Seq("url"), "left_anti")
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
    * Quoted segments additionally require positional adjacency.
    * Uppercase OR / AND / NOT and parens are boolean operators
    * (Whoosh parser parity); everything else keeps the legacy plan
    * (AND of terms = one countDistinct aggregate, not N semi-joins). */
  def searchAnd(query: String): DataFrame = {
    val (ast, _) = parseBool(query)
    if (ast == QAnd(Seq.empty)) return docs.select($"url").limit(0)
    // evalV1 invariants keep every branch's url set distinct already
    evalV1(ast).select($"url").orderBy($"url")
  }

  /** v3 semantics: BM25F top-k over title+content with highlighted
    * snippets. Scores rounded to 6 decimals before ranking (ln() ulp
    * reproducibility, as TextAnalysis.bm25TopK). Boolean operators
    * (uppercase OR / AND / NOT, parens) restrict the candidate set via
    * the query AST; scoring always uses the positive (non-negated)
    * terms, Whoosh-style. Results carry `crawl_date` when the doc
    * table has one ("unknown" otherwise — `indexer_node.py:173-180`). */
  def search(query: String, k: Int = 10): DataFrame = {
    val (ast, sawOp) = parseBool(query)
    val (posTerms, phrases) = positives(ast)
    // phrase terms score like plain terms (Whoosh scores phrase matches
    // by term weight too), carrying the phrase's field restriction; the
    // adjacency requirement is enforced as a candidate filter below
    val qterms = (posTerms ++
      phrases.flatMap(p => p.terms.map(QTerm(p.field, _)))).distinct
    // empty/no-token/pure-negative query: empty result with the NORMAL
    // schema, so callers can select/write uniformly
    if (qterms.isEmpty) return docs
      .select(lit(0).cast("int").as("rank"), $"url", $"title", $"domain",
        lit(0.0).as("score"), lit("").as("snippet"),
        lit("").as("crawl_date"))
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
    // candidate restriction BEFORE the top-k cut: boolean queries
    // semi-join the AST's matched-url set (which subsumes phrase
    // adjacency — phrase leaves evaluate to their positional match);
    // plain queries keep the legacy per-phrase semi-join fold
    val phrased =
      if (sawOp) scored.join(evalV3(ast), Seq("url"), "left_semi")
      else phrases.foldLeft(scored)((acc, p) =>
        acc.join(phraseUrls(p), Seq("url"), "left_semi"))
    val topk = phrased
      .orderBy($"score".desc, $"url")
      .limit(k)

    val contentTerms = qterms.filter(_.field.forall(_ == "content")).map(_.term).distinct
    // stored-field crawl_date (reference returns it per result;
    // "unknown" when the snapshot predates the column)
    val dateCol = docs.schema.fields.find(_.name == "crawl_date") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.StringType =>
        $"crawl_date"
      case Some(_) => date_format($"crawl_date", "yyyy-MM-dd HH:mm:ss").as("crawl_date")
      case None => lit("unknown").as("crawl_date")
    }
    val docCols = Seq($"url", $"title", $"domain", $"content") ++
      (if (docs.columns.contains("crawl_date")) Seq(col("crawl_date")) else Nil)
    // Scala UDF is acceptable ONLY here: it runs strictly after the
    // top-k cut, over <= k presentation rows — never corpus-wide (the
    // scoring path above is all built-in column logic).
    val hl = SearchEngine.highlightUdf
    topk
      .join(docs.select(docCols: _*), "url")
      .withColumn("snippet", hl($"content", typedLit(contentTerms)))
      .select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"score".desc, $"url")).as("rank"),
        $"url", $"title", $"domain", $"score", $"snippet", dateCol)
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
