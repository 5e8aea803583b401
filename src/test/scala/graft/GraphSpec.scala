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
}
