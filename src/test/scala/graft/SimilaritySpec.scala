package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/**
 * Certifies the bucketed default near-dup operator
 * ([[Similarity.lshNearestNeighbor]], q25) against the brute-force NN
 * oracle ([[Similarity.nearestNeighbor]] — TEST ORACLE ONLY, an O(N²)
 * cross join), the same oracle relationship q59 uses for pHash pairs:
 * the scale-path operator must be EXACT within its candidate structure,
 * and must agree with the global brute force wherever the bucketing
 * did not exclude the true neighbor.
 */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val (dim, nPlanes) = (64, 4)

  private lazy val emb = graft.queries.Tables.embeddings(spark, sf)

  test("lshNearestNeighbor == brute force restricted to the query's bucket") {
    val buckets = Similarity.signLshBucket(emb, "vec_id", "embedding", dim, nPlanes)
      .select($"vec_id".cast("long"), $"bucket").as[(Long, Int)].collect().toMap
    val bucketed = Similarity.lshNearestNeighbor(emb, "vec_id", "embedding", dim, nPlanes)
      .select($"vec_id".cast("long"), $"nn_id".cast("long"), $"sim")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // brute-force ALL pair sims (oracle): rank within the query's bucket
    val allPairs = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding",
        k = emb.count().toInt)
      .select($"query_id".cast("long"), $"neighbor_id".cast("long"), $"sim")
      .as[(Long, Long, Double)].collect()
    val wantByQuery = allPairs.groupBy(_._1).map { case (q, rows) =>
      val inBucket = rows.filter(r => buckets(r._2) == buckets(q))
        .sortBy(r => (-r._3, r._2))
      q -> inBucket.headOption.map(r => (r._2, r._3))
    }
    // exactness: the bucketed operator returns precisely the within-
    // bucket argmax for every vector, and no row for bucket singletons
    wantByQuery.foreach { case (q, want) =>
      assert(bucketed.get(q) == want, s"vec $q: got ${bucketed.get(q)} want $want")
    }
    assert(bucketed.nonEmpty, "bucketed NN returned nothing — fixture too small")
    // the structure must actually bind at this size: at least one vector
    // has its TRUE nn outside its bucket (else the test proves nothing)
    val globalNn = allPairs.groupBy(_._1).map { case (q, rows) =>
      q -> rows.minBy(r => (-r._3, r._2))._2
    }
    assert(globalNn.exists { case (q, nn) => buckets(nn) != buckets(q) },
      "every true NN shares its query's bucket — shrink nPlanes to make bucketing bind")
    // recall contract: where the true NN IS in the query's bucket, the
    // bucketed answer equals the global brute-force answer
    globalNn.foreach { case (q, nn) =>
      if (buckets(nn) == buckets(q))
        assert(bucketed(q)._1 == nn, s"vec $q: bucketed ${bucketed(q)._1} != global $nn")
    }
  }

  test("kmeansAssign matches a driver-side Lloyd reference and is reshard-invariant") {
    val (k, rounds) = (8, 2)
    val data: Array[(Long, Array[Long])] = Similarity.withScaled(emb, "embedding")
      .select($"vec_id".cast("long"), $"scaled")
      .as[(Long, Seq[Long])].collect().map { case (id, s) => (id, s.toArray) }
      .sortBy(_._1)

    // independent driver-side Lloyd on the same integer grid
    def d2(x: Array[Long], c: Array[Long]): Long =
      x.indices.map(i => (x(i) - c(i)) * (x(i) - c(i))).sum
    def argmin(x: Array[Long], cents: Array[Array[Long]]): (Int, Long) =
      cents.zipWithIndex.map { case (c, cid) => (d2(x, c), cid) }.min match {
        case (d, cid) => (cid, d)
      }
    var cents = data.take(k).map(_._2)
    for (_ <- 1 to rounds) {
      val byCell = data.groupBy { case (_, x) => argmin(x, cents)._1 }
      cents = cents.zipWithIndex.map { case (old, c) =>
        byCell.get(c).map { members =>
          val dim = old.length
          (0 until dim).map { i =>
            members.map(_._2(i)).sum / members.length // truncating, like the op
          }.toArray
        }.getOrElse(old)
      }
    }
    val want = data.map { case (id, x) =>
      val (cid, d) = argmin(x, cents); (id, cid, d)
    }.toSet

    val got = Similarity.kmeansAssign(emb, "vec_id", "embedding", k, rounds)
      .select($"vec_id".cast("long"), $"cell", $"dist2")
      .as[(Long, Int, Long)].collect().toSet
    assert(got == want, s"kmeans mismatch: ${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
    // the clustering must actually bind: >1 cell in use, and some vector
    // moved cells between init and trained centroids
    assert(got.map(_._2).size > 1)
    val init = data.map { case (id, x) => (id, argmin(x, data.take(k).map(_._2))._1) }.toMap
    assert(got.exists { case (id, cell, _) => init(id) != cell },
      "no vector changed cells after training — rounds are a no-op on this fixture")

    // partition-order invariance (the integer-grid determinism claim)
    val re = Similarity.kmeansAssign(emb.repartition(7), "vec_id", "embedding", k, rounds)
      .select($"vec_id".cast("long"), $"cell", $"dist2")
      .as[(Long, Int, Long)].collect().toSet
    assert(re == got)
  }

  test("kmeans large-k broadcast-join path is bit-identical to the literal path") {
    // 600 deterministic pseudo-random vectors (dim 8) — enough rows for
    // k=512, where the literal argmin's generated code would outgrow
    // codegen limits at real dims and the join path must take over
    val big = spark.range(600).select(
      $"id".as("vec_id"),
      expr("transform(sequence(0, 7), i -> " +
        "cast((pmod(xxhash64(id * 8 + i), 1000) - 500) / 500.0 as float))")
        .as("embedding"))
    def run(k: Int, literalMaxK: Int): Set[(Long, Int, Long)] =
      Similarity.kmeansAssign(big, "vec_id", "embedding", k, rounds = 2,
          literalMaxK = literalMaxK)
        .select($"vec_id".cast("long"), $"cell", $"dist2")
        .as[(Long, Int, Long)].collect().toSet
    // same k through both paths: literalMaxK above k forces literals,
    // 0 forces the broadcast join — results must agree bit-for-bit
    val viaLiteral = run(k = 16, literalMaxK = Int.MaxValue)
    val viaJoin = run(k = 16, literalMaxK = 0)
    assert(viaJoin == viaLiteral,
      s"path divergence: ${viaJoin.diff(viaLiteral).take(3)} vs ${viaLiteral.diff(viaJoin).take(3)}")
    assert(viaLiteral.map(_._2).size > 1)
    // k=512 engages the join path by DEFAULT (512 > DefaultLiteralMaxK)
    // and completes; cells actually spread
    val k512 = Similarity.kmeansAssign(big, "vec_id", "embedding", k = 512, rounds = 1)
      .select($"vec_id".cast("long"), $"cell", $"dist2")
      .as[(Long, Int, Long)].collect()
    assert(k512.length == 600)
    assert(k512.map(_._2).distinct.length > 100, "k=512 barely used any cells")
    // and the default path SELECTION is the documented threshold: the
    // k=512 plan joins, the k<=128 plan stays a literal projection
    val bigPlan = Similarity.kmeansAssign(big, "vec_id", "embedding", 512, 1)
      .queryExecution.executedPlan.toString
    assert(bigPlan.contains("Join"), s"k=512 did not take the join path:\n${bigPlan.take(1500)}")
    val smallPlan = Similarity.kmeansAssign(big, "vec_id", "embedding", 16, 1)
      .queryExecution.executedPlan.toString
    assert(!smallPlan.contains("Join"), s"k=16 left the literal path:\n${smallPlan.take(1500)}")
  }
}
