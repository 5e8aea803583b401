package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Graph

/** PageRank semantics on hand graphs, pinned against a sequential
  * integer-arithmetic reference (same quantization: fixed-point units,
  * every division integral). */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Sequential reference: identical quantized recurrence. */
  private def refRank(n: Int, edges: Seq[(Long, Long)], iters: Int,
                      scale: Long): Map[Long, Long] = {
    val base = scale / n
    val teleport = 15L * base / 100L
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = (0 until n).map(i => i.toLong -> base).toMap
    for (_ <- 1 to iters) {
      val m = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((s, d) <- edges) m(d) += r(s) / deg(s)
      r = (0 until n).map(i => i.toLong ->
        (teleport + 85L * m(i.toLong) / 100L)).toMap
    }
    r
  }

  private def run(n: Int, edges: Seq[(Long, Long)], iters: Int = 5,
                  scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val e = edges.toDF("src", "dst")
    Graph.pageRank(nodes, e, "id", iters = iters, scale = scale)
      .as[(Long, Long)].collect().toMap
  }

  test("star graph: hub collects mass; spokes keep teleport share") {
    // 0 <- {1,2,3}, 0 -> 1 (so 0 has out-degree too)
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L))
    val got = run(4, edges)
    assert(got == refRank(4, edges, 5, 1000000000000L))
    assert(got(0L) > got(2L) && got(2L) == got(3L))
    // spokes 2,3 have no in-links: exactly the teleport mass
    assert(got(2L) == 15L * (1000000000000L / 4) / 100L)
  }

  test("cycle: symmetric graph stays uniform (up to quantization)") {
    val n = 6
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
    val got = run(n, edges)
    assert(got == refRank(n, edges, 5, 1000000000000L))
    assert(got.values.toSet.size == 1) // all equal by symmetry
  }

  test("multigraph: parallel edges each carry mass; matches reference") {
    val edges = Seq((0L, 1L), (0L, 1L), (0L, 2L), (1L, 0L), (2L, 0L))
    val got = run(3, edges)
    assert(got == refRank(3, edges, 5, 1000000000000L))
    assert(got(1L) > got(2L)) // doubled edge -> more mass
  }

  test("mass is conserved within quantization loss; deep iters with checkpointing") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = (0 until n).flatMap { i =>
      (0 to rnd.nextInt(3)).map(_ => (i.toLong, rnd.nextInt(n).toLong))
    }.map { case (s, d) => if (s == d) (s, (d + 1) % n) else (s, d) }
    val scale = 1000000000000L
    val iters = 9 // crosses multiple checkpointEvery boundaries
    val got = run(n, edges, iters = iters, scale = scale)
    assert(got == refRank(n, edges, iters, scale))
    val mass = got.values.sum
    // each node loses < 2 units per round to integral division
    assert(mass <= scale && mass >= scale - 2L * n * iters - n)
  }

  // ---- HITS (T43) ----

  /** Sequential HITS reference: identical quantized recurrence
    * (per-round max renormalization, integral division). */
  private def refHits(n: Int, edges: Seq[(Long, Long)], iters: Int,
                      scale: Long): Map[Long, (Long, Long)] = {
    var hub = (0 until n).map(i => i.toLong -> scale).toMap
    var auth = Map[Long, Long]()
    for (_ <- 1 to iters) {
      val ar = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((s, d) <- edges) ar(d) += hub(s)
      val maxA = (0 until n).map(i => ar(i.toLong)).max
      auth = (0 until n).map(i => i.toLong -> ar(i.toLong) * scale / maxA).toMap
      val hr = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((s, d) <- edges) hr(s) += auth(d)
      val maxH = (0 until n).map(i => hr(i.toLong)).max
      hub = (0 until n).map(i => i.toLong -> hr(i.toLong) * scale / maxH).toMap
    }
    (0 until n).map(i => i.toLong -> (hub(i.toLong), auth(i.toLong))).toMap
  }

  private def runHits(n: Int, edges: Seq[(Long, Long)],
                      iters: Int = 3): Map[Long, (Long, Long)] = {
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val e = edges.toDF("src", "dst")
    Graph.hits(nodes, e, "id", iters = iters)
      .as[(Long, Long, Long)].collect()
      .map { case (id, h, a) => id -> (h, a) }.toMap
  }

  test("hits: bipartite hub/authority split matches the reference") {
    // hubs {0,1} -> authorities {2,3}; 2 has both in-links, 3 only one;
    // 2,3 link back weakly so every score stays defined
    val edges = Seq((0L, 2L), (0L, 3L), (1L, 2L), (2L, 0L), (3L, 0L))
    val got = runHits(4, edges)
    assert(got == refHits(4, edges, 3, 1000000L))
    val (h0, a0) = got(0L); val (h1, _) = got(1L)
    val (_, a2) = got(2L);  val (h3, a3) = got(3L)
    assert(a2 > a3)           // two in-links from hubs beat one
    assert(h0 > h1)           // 0 links to both authorities, 1 to one
    assert(h0 > h3 && a0 > 0) // back-links give 2,3 some hub mass
  }

  test("hits: deeper iters cross the checkpoint boundary and still match") {
    val rnd = new scala.util.Random(11)
    val n = 30
    val edges = (0 until n).flatMap { i =>
      (0 to rnd.nextInt(3)).map(_ => (i.toLong, rnd.nextInt(n).toLong))
    }.map { case (s, d) => if (s == d) (s, (d + 1) % n) else (s, d) }
    val got = runHits(n, edges, iters = 5)
    assert(got == refHits(n, edges, 5, 1000000L))
    // renormalization keeps the max at exactly `scale` each round
    assert(got.values.map(_._1).max == 1000000L)
    assert(got.values.map(_._2).max == 1000000L)
  }

  test("anchorSummary: top anchor by count, ties to smallest term, nulls dropped") {
    val edges = Seq(
      (1L, 10L, "alpha"), (2L, 10L, "beta"), (3L, 10L, "alpha"),
      (4L, 11L, "beta"), (5L, 11L, "alpha"), // tie at 1 each -> "alpha"
      (6L, 12L, null.asInstanceOf[String]), (7L, 12L, "gamma"))
      .toDF("src", "dst", "anchor")
    val got = Graph.anchorSummary(edges)
      .as[(Long, Long, String, Long)].collect().sortBy(_._1).toSeq
    // null-anchor links carry no anchor signal: dst 12 counts 1, not 2
    assert(got == Seq(
      (10L, 3L, "alpha", 2L),
      (11L, 2L, "alpha", 1L),
      (12L, 1L, "gamma", 1L)))
  }

  test("degreeDistribution: zero-degree nodes counted, exact histogram") {
    // 0 -> 1, 0 -> 2, 1 -> 2, 3 isolated (no in, no out)
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")
    val got = Graph.degreeDistribution(nodes, edges)
      .as[(String, Long, Long)].collect().toSet
    // out-degrees: 0->2, 1->1, 2->0, 3->0 ; in-degrees: 0->0, 1->1, 2->2, 3->0
    assert(got == Set(
      ("out", 2L, 1L), ("out", 1L, 1L), ("out", 0L, 2L),
      ("in", 2L, 1L), ("in", 1L, 1L), ("in", 0L, 2L)))
  }

  test("degreeDistribution matches a brute-force reference on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 50
    val edges = (0 until 120).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val outRef = (0 until n).map(i => edges.count(_._1 == i).toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val inRef = (0 until n).map(i => edges.count(_._2 == i).toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Graph.degreeDistribution(
        (0 until n).map(_.toLong).toDF("id"), edges.toDF("src", "dst"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    assert(got("out") == outRef)
    assert(got("in") == inRef)
  }

  private def triangles(edges: Seq[(Long, Long)]): Long =
    Graph.triangleCount(edges.toDF("src", "dst")).as[Long].head()

  test("triangleCount: known shapes — triangle, square, K4, K5, no-triangle cycle") {
    // one triangle + a dangling edge
    assert(triangles(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))) == 1L)
    // a 4-cycle has no triangle
    assert(triangles(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == 0L)
    // K4 = C(4,3) = 4; K5 = C(5,3) = 10
    def clique(n: Long) = for (a <- 0L until n; b <- a + 1 to n - 1) yield (a, b)
    assert(triangles(clique(4)) == 4L)
    assert(triangles(clique(5)) == 10L)
    // two disjoint triangles
    assert(triangles(Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L))) == 2L)
  }

  test("triangleCount: self-loops, duplicates and reversed duplicates collapse") {
    assert(triangles(Seq(
      (1L, 1L),           // self-loop dropped
      (1L, 2L), (2L, 1L), // both directions = one edge
      (1L, 2L),           // duplicate
      (2L, 3L), (3L, 1L))) == 1L)
  }

  test("triangleCount matches a brute-force reference on a pseudo-random graph") {
    // deterministic edge set over 20 nodes (same generator family as q99)
    val edges = (0 until 300).map(i => ((i * 13L) % 20, (i * 7L + 3) % 20))
    val canon = edges.map { case (a, b) => (a min b, a max b) }
      .filter { case (a, b) => a != b }.distinct
    val es = canon.toSet
    val nodes = canon.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
    var ref = 0L
    for {
      i <- nodes.indices; j <- i + 1 until nodes.length; k <- j + 1 until nodes.length
      a = nodes(i); b = nodes(j); c = nodes(k)
      if es((a, b)) && es((a, c)) && es((b, c))
    } ref += 1
    assert(triangles(edges) == ref, s"expected $ref triangles")
  }
}
