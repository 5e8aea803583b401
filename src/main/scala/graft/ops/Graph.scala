package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over crawl link tables (SURVEY §2.10 T33).
  *
  * A web crawl's highest-value derived dataset is its link graph: the
  * reference stores extracted links per page (`crawler/crawler_node.py`
  * link extraction; our `outlinks`/`fetchlog` tables) and a production
  * frontier prioritizes by link authority. PageRank is the canonical
  * such score.
  *
  * The arithmetic is integer-quantized: ranks live in `scale`
  * fixed-point units and every division is integral, so results are
  * bit-reproducible across engines, partitionings and row orders —
  * float sums are order-dependent, and a 100-TB shuffle reorders rows
  * nondeterministically. The quantization error is bounded by one unit
  * per division (≤ 2 units/node/round, ~1e-12 of total mass at the
  * default scale).
  */
object Graph {

  /** `iters` rounds of damped PageRank (d = 0.85) over `edges`
    * (`src`, `dst` — multigraph, parallel edges each carry mass) for
    * the node set `nodes(idCol)`. Nodes with no in-links keep the
    * teleport mass; every node here has out-degree ≥ 1 (no dangling
    * redistribution — callers with dangling nodes add self-loops).
    * Returns (`node_id`, `rank`) in `scale` fixed-point units.
    *
    * Scale shape: each round is ONE shuffle (groupBy dst) plus a join
    * of the rank table to the edge table on src — both sides hash on
    * the same key, and AQE picks broadcast when ranks fit. Out-degrees
    * are folded into the edge table once and materialized, so no round
    * re-runs the degree aggregation (the q21 recompute lesson); rank
    * lineage is truncated every `checkpointEvery` rounds so the plan
    * never nests O(iters) joins deep (on a cluster this would be a
    * reliable checkpoint, not a localCheckpoint).
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, idCol: String = "id",
               iters: Int = 5, scale: Long = 1000000000000L,
               checkpointEvery: Int = 2, nKnown: Option[Long] = None): DataFrame = {
    // node ids materialized ONCE: the per-round left join re-reads them,
    // and an unmaterialized projection would re-scan the node table every
    // round (5 scans of a 10^10-row table for a 5-round rank). Callers
    // that already counted the node table pass nKnown — the count here is
    // otherwise a full pass of its own.
    val nodeIds = nodes.select(col(idCol).as("node_id")).localCheckpoint()
    val n = nKnown.getOrElse(nodeIds.count())
    val base = scale / n
    val teleport = 15L * base / 100L
    val e = edges
      .join(edges.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint()
    var ranks = nodeIds.select(col("node_id"), lit(base).as("rank"))
    for (k <- 1 to iters) {
      val contrib = e.join(ranks, e("src") === ranks("node_id"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("m"))
      ranks = nodeIds
        .join(contrib, col("node_id") === col("dst"), "left")
        .select(col("node_id"),
          (lit(teleport) + expr("(85 * coalesce(m, CAST(0 AS BIGINT))) div 100")).as("rank"))
      if (k % checkpointEvery == 0 && k < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** HITS hubs & authorities (SURVEY §2.10 T43) — the second classic
    * link-authority score (Kleinberg): a good HUB links to good
    * authorities, a good AUTHORITY is linked from good hubs. A crawl
    * frontier uses hubs to find link-rich seed pages and authorities to
    * prioritize fetch order; PageRank (above) measures global standing,
    * HITS the hub/authority split within a topic subgraph.
    *
    * Integer fixed-point like pageRank: scores live in `scale` units and
    * each round renormalizes by the round's max via integer division
    * (`v * scale div max`), so results are bit-reproducible across
    * engines and row orders. Overflow bound: the normalize multiply is
    * raw * scale with raw <= max_in_degree * scale, so it needs
    * max_degree * scale^2 < 2^63 — the default 10^6 scale allows degree
    * up to ~9*10^6 (a 100-TB web graph's hottest page sits well under
    * that after the standard intra-host link dedup).
    *
    * Scale shape: per round, two key-hashed aggregations (sum over in-
    * edges, sum over out-edges) and two joins of the score table to the
    * edge table — same-key hash both sides, AQE broadcasts when scores
    * fit. The max is a 1-row agg crossJoined back (broadcast, no driver
    * action). Edges are materialized once; score lineage is checkpoint-
    * truncated every `checkpointEvery` rounds like pageRank. */
  def hits(nodes: DataFrame, edges: DataFrame, idCol: String = "id",
           iters: Int = 3, scale: Long = 1000000L,
           checkpointEvery: Int = 2): DataFrame = {
    val nodeIds = nodes.select(col(idCol).as("node_id")).localCheckpoint()
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    def renorm(raw: DataFrame, v: String): DataFrame = {
      val m = raw.agg(max(col(v)).as("mx"))
      raw.crossJoin(broadcast(m))
        .select(col("node_id"), expr(s"$v * $scale div mx").as(v))
    }
    var hubs = nodeIds.select(col("node_id"), lit(scale).as("hub"))
    for (k <- 1 to iters) {
      val authRaw = nodeIds.join(
          e.join(hubs, e("src") === hubs("node_id"))
            .groupBy(col("dst")).agg(sum(col("hub")).as("raw")),
          col("node_id") === col("dst"), "left")
        .select(col("node_id"), coalesce(col("raw"), lit(0L)).as("auth"))
      val auths = renorm(authRaw, "auth")
      val hubRaw = nodeIds.join(
          e.join(auths, e("dst") === auths("node_id"))
            .groupBy(col("src")).agg(sum(col("auth")).as("raw")),
          col("node_id") === col("src"), "left")
        .select(col("node_id"), coalesce(col("raw"), lit(0L)).as("hub"))
      hubs = renorm(hubRaw, "hub")
      if (k % checkpointEvery == 0 && k < iters) hubs = hubs.localCheckpoint()
      // the final auths of the last round are what we report alongside
      if (k == iters) {
        return hubs.join(auths, "node_id")
          .select(col("node_id"), col("hub"), col("auth"))
      }
    }
    hubs
  }

  /** Anchor-text aggregation: the classic web-search relevance signal
    * (anchor words of in-links describe the TARGET page better than its
    * own text — Brin & Page §2.2). Input is an anchored edge table
    * (`dst`, `anchor`); output is one row per target: total in-link
    * count plus the most frequent anchor term (ties broken by the
    * lexicographically smallest anchor, so the result is total-order
    * deterministic).
    *
    * Scale shape: two shuffles — a (dst, anchor) hash-agg with map-side
    * partial counts (the explode-heavy side never crosses the wire raw),
    * then one dst-keyed exchange that serves BOTH window functions (the
    * in-link sum and the frequency rank share the partition key, so
    * Catalyst plans them over a single exchange). Skew: anchors of a
    * hot page all land in one partition — bounded, because the first
    * agg already collapsed them to distinct-anchor counts (a 10^6-inlink
    * page with 10^2 distinct anchors is 10^2 rows here). */
  def anchorSummary(edges: DataFrame, dst: String = "dst",
                    anchor: String = "anchor"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = edges.filter(col(anchor).isNotNull)
      .groupBy(col(dst), col(anchor)).agg(count(lit(1)).as("cnt"))
    val byDst = Window.partitionBy(col(dst))
    counts
      .withColumn("n_inlinks", sum(col("cnt")).over(byDst))
      .withColumn("rk", row_number().over(
        byDst.orderBy(col("cnt").desc, col(anchor))))
      .filter(col("rk") === 1)
      .select(col(dst), col("n_inlinks"),
        col(anchor).as("top_anchor"), col("cnt").as("top_anchor_count"))
  }

  /** Exact in/out-degree distribution (T48): one row per
    * (direction, degree) with the node count — the first diagnostic run
    * over any web graph (power-law exponent check, spam-farm bumps,
    * crawler-trap tails). Zero-degree nodes are counted (a crawl's
    * no-outlink leaves and never-linked seeds are real signal), which
    * is why the node table participates.
    *
    * Scale shape: per direction, a key-hashed edge aggregation with
    * map-side partial counts, a left join of nodes to the per-node
    * degrees (AQE broadcasts the degree side when it fits — distinct
    * URLs with in-links is far smaller than the edge table), then a
    * tiny second hash-agg on the degree value (at most O(max_degree)
    * distinct groups — a 10^10-edge graph has ~10^4 distinct degrees).
    * Exact integer degrees, no log-bucket floats, so the result is
    * bit-identical across engines. */
  def degreeDistribution(nodes: DataFrame, edges: DataFrame,
                         idCol: String = "id"): DataFrame = {
    val nodeIds = nodes.select(col(idCol).as("node_id"))
    def side(key: String, direction: String): DataFrame =
      nodeIds
        .join(edges.groupBy(col(key)).agg(count(lit(1)).as("deg")),
          col("node_id") === col(key), "left")
        .select(coalesce(col("deg"), lit(0L)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
        .select(lit(direction).as("direction"), col("degree"), col("n_nodes"))
    side("src", "out").unionAll(side("dst", "in"))
  }

  /** T57: exact triangle counting by degree-ordered orientation (the
    * standard distributed algorithm — Suri & Vassilvitskii's MR
    * "node-iterator++" / Cohen's orientation trick). Triangle density
    * separates organic link neighborhoods from link farms (spam cliques
    * are triangle-dense; Becchetti et al. use local triangle counts for
    * web-spam detection), so a crawl prioritizer wants this over the
    * outlink graph.
    *
    * The naive wedge join explodes on hubs: a degree-d node contributes
    * d² wedges (a 10^6-degree hub → 10^12 rows). Orienting every edge
    * from its lower-(degree, id) endpoint to its higher one caps
    * oriented out-degree at O(√m), so the wedge join is bounded by
    * Σ outdeg² = O(m^1.5) TOTAL — the optimal bound — and each triangle
    * is generated exactly once (its unique lowest-order corner). Input
    * edges are canonicalized first (self-loops dropped, direction and
    * duplicates collapsed); the oriented edge table is materialized
    * ONCE and feeds both wedge sides and the closing semi-join.
    * Returns one row: (n_triangles). Exact integers.
    */
  def triangleCount(edges: DataFrame, src: String = "src",
                    dst: String = "dst"): DataFrame = {
    // canon feeds three consumers (degrees, orientation, the closing
    // probe); oriented feeds both wedge sides — materialize each once
    val canon = edges
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val deg = canon.select(col("a").as("v"))
      .unionAll(canon.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // total order (deg, v): orient u -> w iff (deg_u, u) < (deg_w, w)
    val oriented = canon
      .join(deg.select(col("v").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("deg_b")), "b")
      .select(
        when(col("deg_a") < col("deg_b") ||
            (col("deg_a") === col("deg_b") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("w")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))
      .localCheckpoint()
    val wedges = oriented.select(col("u"), col("w").as("v1"))
      .join(oriented.select(col("u"), col("w").as("v2")), "u")
      .filter(col("v1") < col("v2"))
    // the wedge pair is id-ordered, so the closing undirected edge is
    // exactly a canonical (min-id, max-id) row — no direction probing
    wedges.join(canon,
        col("v1") === col("a") && col("v2") === col("b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }
}
