package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.storage.ZOrder

/** Z-order clustering (T55): the Morton key against a bit-by-bit
  * reference, and the data-skipping property it exists for — per-chunk
  * min/max envelopes stay tight on BOTH dimensions after a key sort. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Bit-by-bit reference interleave: bit i of a → 2i, bit i of b → 2i+1. */
  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zkey matches the bit-by-bit reference; full-domain keys stay non-negative") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 0L), (0L, 255L),
      (12345L, 54321L), (0x7FFFFFFFL, 0L), (0L, 0x7FFFFFFFL),
      (0x7FFFFFFFL, 0x7FFFFFFFL), (0x12345678L, 0x1ABCDEF0L))
    val got = cases.toDF("a", "b")
      .select($"a", $"b", ZOrder.zkey($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == mortonRef(a, b), s"zkey($a, $b)")
      // a signed sort of the key must BE curve order — a key with the
      // sign bit set would order the domain's top half first
      assert(z >= 0L, s"zkey($a, $b) negative")
    }
    // dims above 31 bits are masked off, matching the documented domain
    val masked = Seq((0x1FFFFFFFFL, 0xFFFFFFFFL)).toDF("a", "b")
      .select(ZOrder.zkey($"a", $"b")).as[Long].head()
    assert(masked == mortonRef(0x7FFFFFFFL, 0x7FFFFFFFL))
  }

  test("sorting a full grid by zkey yields perfect quadrant envelopes per chunk") {
    // 64x64 grid, 16 equal key-range chunks: z-order gives each chunk
    // exactly one 16x16 quadrant (envelope 16 on BOTH dims); sorting by
    // `a` alone leaves every chunk spanning the full 64 b-range
    val n = 64
    val grid = (0 until n * n).map(i => (i.toLong / n, i.toLong % n))
    val ranked = grid.map { case (a, b) => (a, b, mortonRef(a, b)) }.sortBy(_._3)
    val chunks = ranked.grouped(n * n / 16).toSeq
    assert(chunks.length == 16)
    chunks.foreach { c =>
      val (as, bs) = (c.map(_._1), c.map(_._2))
      assert(as.max - as.min == 15, s"a-envelope ${as.min}..${as.max}")
      assert(bs.max - bs.min == 15, s"b-envelope ${bs.min}..${bs.max}")
    }
    // the linear-sort baseline: same chunking over an `a` sort spans
    // the full b-range in every chunk — 4x the a-envelope, 4x area
    val linear = grid.sortBy(identity).grouped(n * n / 16).toSeq
    linear.foreach { c =>
      assert(c.map(_._2).max - c.map(_._2).min == 63)
    }
  }
}
