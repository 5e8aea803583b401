package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Graph
import Tables._

/** Link-graph coverage: PageRank over a deterministic synthetic link
  * graph derived from `documents` (doc d links to 1 + d%3 targets drawn
  * by an LCG-style integer hash, self-loops displaced to the next id) —
  * the authority score a production frontier prioritizes by. */
object GraphQueries {

  /** Deterministic synthetic link graph over `documents` (doc d links
    * to 1 + d%3 targets drawn by an LCG-style integer hash, self-loops
    * displaced to the next id) — shared by q74 (PageRank) and q85
    * (HITS) so both scores describe the same graph. */
  private def syntheticEdges(docs: DataFrame, n: Long): DataFrame =
    docs.select(col("doc_id"))
      .withColumn("c", explode(sequence(lit(0L), col("doc_id") % 3L)))
      .select(col("doc_id").as("src"),
        ((col("doc_id") * 48271L + (col("c") + 1L) * 1013904223L) % n).as("t0"))
      .select(col("src"),
        when(col("t0") === col("src"), (col("t0") + 1L) % n)
          .otherwise(col("t0")).as("dst"))

  private val edgesSqlCte: String =
    """edges AS (
      | SELECT src, CASE WHEN t0 = src THEN (t0 + 1) % (SELECT n FROM nn) ELSE t0 END AS dst
      | FROM (
      |  SELECT d.doc_id AS src,
      |   ((d.doc_id * 48271 + (t.c + 1) * 1013904223) % (SELECT n FROM nn)) AS t0
      |  FROM documents d, range(3) t(c)
      |  WHERE t.c < 1 + d.doc_id % 3))""".stripMargin

  /** q74: 5 damped rounds, integer fixed-point (see ops/Graph). */
  def q74PageRank(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val n = docs.count()
    val edges = syntheticEdges(docs, n)
    // n was already counted above (a zero-column parquet count) — pass it
    // through so pageRank doesn't run a second count job over the nodes
    Graph.pageRank(docs.select("doc_id"), edges, "doc_id", nKnown = Some(n))
      .select(col("node_id").as("doc_id"), col("rank").as("pagerank"))
      .orderBy("doc_id")
  }

  val q74Sql: String = {
    val S = "1000000000000"
    val head =
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
         |$edgesSqlCte,
         |od AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |r0 AS (SELECT doc_id, CAST($S // (SELECT n FROM nn) AS BIGINT) AS rank FROM documents)""".stripMargin
    val rounds = (1 to 5).map { k =>
      s""",
         |r$k AS (
         | SELECT d.doc_id,
         |  CAST((15 * ($S // (SELECT n FROM nn))) // 100
         |  + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS rank
         | FROM documents d LEFT JOIN (
         |  SELECT e.dst AS doc_id, sum(r.rank // o.deg) AS m
         |  FROM edges e JOIN r${k - 1} r ON r.doc_id = e.src JOIN od o ON o.src = e.src
         |  GROUP BY e.dst) s ON s.doc_id = d.doc_id)""".stripMargin
    }.mkString
    head + rounds + "\nSELECT doc_id, rank AS pagerank FROM r5 ORDER BY doc_id"
  }

  /** q85 (T43): HITS hubs & authorities over the same link graph —
    * 3 rounds, max-renormalized integer fixed-point (see ops/Graph). */
  def q85Hits(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val n = docs.count()
    Graph.hits(docs.select("doc_id"), syntheticEdges(docs, n), "doc_id")
      .select(col("node_id").as("doc_id"), col("hub"), col("auth"))
      .orderBy("doc_id")
  }

  val q85Sql: String = {
    val S = "1000000"
    val head =
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
         |$edgesSqlCte,
         |h0 AS (SELECT doc_id, CAST($S AS BIGINT) AS hub FROM documents)""".stripMargin
    val rounds = (1 to 3).map { k =>
      s""",
         |a${k}r AS (
         | SELECT d.doc_id, COALESCE(s.m, 0) AS raw
         | FROM documents d LEFT JOIN (
         |  SELECT e.dst AS doc_id, sum(h.hub) AS m
         |  FROM edges e JOIN h${k - 1} h ON h.doc_id = e.src
         |  GROUP BY e.dst) s ON s.doc_id = d.doc_id),
         |a$k AS (
         | SELECT doc_id, CAST(raw * $S // (SELECT max(raw) FROM a${k}r) AS BIGINT) AS auth
         | FROM a${k}r),
         |h${k}r AS (
         | SELECT d.doc_id, COALESCE(s.m, 0) AS raw
         | FROM documents d LEFT JOIN (
         |  SELECT e.src AS doc_id, sum(a.auth) AS m
         |  FROM edges e JOIN a$k a ON a.doc_id = e.dst
         |  GROUP BY e.src) s ON s.doc_id = d.doc_id),
         |h$k AS (
         | SELECT doc_id, CAST(raw * $S // (SELECT max(raw) FROM h${k}r) AS BIGINT) AS hub
         | FROM h${k}r)""".stripMargin
    }.mkString
    head + rounds +
      "\nSELECT h.doc_id, h.hub, a.auth FROM h3 h JOIN a3 a ON a.doc_id = h.doc_id ORDER BY h.doc_id"
  }

  /** The q74/q85 link graph with an anchor term on each edge: the
    * anchor is a deterministic token drawn from the SOURCE page's text
    * (position (src*7 + link ordinal) mod token count — link extraction
    * in the reference yields the `<a>` text the same way, a substring
    * of the fetched page). Computed in the same single pass that
    * generates the edges, so no join back to `documents` is needed. */
  private def anchoredEdges(docs: DataFrame, n: Long): DataFrame =
    docs.select(col("doc_id"),
        graft.ops.TextAnalysis.tokensCol(col("text")).as("toks"))
      .withColumn("c", explode(sequence(lit(0L), col("doc_id") % 3L)))
      .select(col("doc_id").as("src"), col("c"), col("toks"),
        ((col("doc_id") * 48271L + (col("c") + 1L) * 1013904223L) % n).as("t0"))
      .select(col("src"),
        when(col("t0") === col("src"), (col("t0") + 1L) % n)
          .otherwise(col("t0")).as("dst"),
        when(size(col("toks")) > 0,
          element_at(col("toks"),
            ((col("src") * 7L + col("c")) % size(col("toks"))).cast("int") + 1))
          .as("anchor"))

  /** q88 (T46): anchor-text aggregation — per target page, in-link
    * count and the most frequent anchor term (see ops/Graph). */
  def q88AnchorText(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val n = docs.count()
    Graph.anchorSummary(anchoredEdges(docs, n))
      .withColumnRenamed("dst", "doc_id")
      .orderBy("doc_id")
  }

  /** q90 (T48): exact in/out-degree distribution of the q74/q85 link
    * graph, zero-degree nodes included (see ops/Graph). */
  def q90DegreeDist(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val n = docs.count()
    Graph.degreeDistribution(docs.select("doc_id"), syntheticEdges(docs, n), "doc_id")
      .orderBy(col("direction"), col("degree"))
  }

  val q90Sql: String =
    s"""WITH nn AS (SELECT count(*) AS n FROM documents),
       |$edgesSqlCte,
       |outd AS (
       | SELECT COALESCE(g.deg, 0) AS degree
       | FROM documents d LEFT JOIN (
       |  SELECT src, count(*) AS deg FROM edges GROUP BY src) g ON g.src = d.doc_id),
       |ind AS (
       | SELECT COALESCE(g.deg, 0) AS degree
       | FROM documents d LEFT JOIN (
       |  SELECT dst, count(*) AS deg FROM edges GROUP BY dst) g ON g.dst = d.doc_id)
       |SELECT direction, degree, n_nodes FROM (
       | SELECT 'out' AS direction, degree, count(*) AS n_nodes FROM outd GROUP BY degree
       | UNION ALL
       | SELECT 'in' AS direction, degree, count(*) AS n_nodes FROM ind GROUP BY degree)
       |ORDER BY direction, degree""".stripMargin

  val q88Sql: String =
    """WITH nn AS (SELECT count(*) AS n FROM documents),
      |tk AS (
      | SELECT doc_id,
      |  list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS toks
      | FROM documents),
      |e AS (
      | SELECT src, CASE WHEN t0 = src THEN (t0 + 1) % (SELECT n FROM nn) ELSE t0 END AS dst, anchor
      | FROM (
      |  SELECT d.doc_id AS src,
      |   ((d.doc_id * 48271 + (t.c + 1) * 1013904223) % (SELECT n FROM nn)) AS t0,
      |   CASE WHEN len(d.toks) > 0
      |        THEN d.toks[CAST((d.doc_id * 7 + t.c) % len(d.toks) AS INT) + 1] END AS anchor
      |  FROM tk d, range(3) t(c)
      |  WHERE t.c < 1 + d.doc_id % 3)),
      |cnts AS (
      | SELECT dst, anchor, count(*) AS cnt FROM e
      | WHERE anchor IS NOT NULL GROUP BY 1, 2),
      |ranked AS (
      | SELECT dst, anchor, cnt,
      |  sum(cnt) OVER (PARTITION BY dst) AS n_inlinks,
      |  row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, anchor) AS rk
      | FROM cnts)
      |SELECT dst AS doc_id, CAST(n_inlinks AS BIGINT) AS n_inlinks,
      | anchor AS top_anchor, cnt AS top_anchor_count
      |FROM ranked WHERE rk = 1 ORDER BY doc_id""".stripMargin

  /** q99 (T57): exact triangle count. Nodes 0..29; each doc contributes
    * edge (doc_id % 30, (doc_id div 30) % 30) — a dense deterministic
    * graph (complete at sf0.1) with a large exact triangle count. The
    * oracle counts by the canonical a<b<c triple join; the Spark side
    * uses degree-ordered orientation — same number by construction. */
  def q99Triangles(s: SparkSession, d: String): DataFrame = {
    val edges = documents(s, d).select(
      (col("doc_id") % 30).as("src"),
      expr("(doc_id div 30) % 30").as("dst"))
    Graph.triangleCount(edges)
  }

  val q99Sql: String =
    """WITH e AS (
      | SELECT DISTINCT least(doc_id % 30, (doc_id // 30) % 30) AS a,
      |  greatest(doc_id % 30, (doc_id // 30) % 30) AS b
      | FROM documents
      | WHERE doc_id % 30 <> (doc_id // 30) % 30)
      |SELECT count(*) AS n_triangles
      |FROM e e1
      |JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
      |JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b""".stripMargin
}
