package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.ImageCodec
import graft.corpus.SyntheticWeb

class CodecSpec extends AnyFunSuite {

  test("rawg8 roundtrip is bitwise lossless") {
    val px = SyntheticWeb.pixelsFor(42L, 1L, 32, 48)
    val enc = ImageCodec.encodeRaw(px, 32, 48)
    val (dec, w, h) = ImageCodec.decode(enc)
    assert(w == 32 && h == 48)
    assert(dec.sameElements(px))
    assert(ImageCodec.format(enc) == ImageCodec.FmtRaw)
    assert(ImageCodec.psnr(px, dec).isPosInfinity)
  }

  test("qdct roundtrip meets the PSNR >= 40 dB invariant") {
    for (i <- 0 until 20) {
      val (w, h) = (Seq(16, 32, 64)(i % 3), Seq(16, 32, 48)(i % 3))
      val px = SyntheticWeb.pixelsFor(42L, 100L + i, w, h)
      val enc = ImageCodec.encodeQdct(px, w, h)
      val (dec, dw, dh) = ImageCodec.decode(enc)
      assert(dw == w && dh == h)
      val p = ImageCodec.psnr(px, dec)
      assert(p >= 40.0, s"image $i psnr=$p")
      assert(ImageCodec.format(enc) == ImageCodec.FmtQdct)
    }
  }

  test("legacy fixed-short 'QD' streams still decode; current magic is 'QV'") {
    // current encoder tags the varlen stream 'QV'
    val px = SyntheticWeb.pixelsFor(42L, 1L, 16, 16)
    val now = ImageCodec.encodeQdct(px, 16, 16)
    assert(now(0) == 'Q'.toByte && now(1) == 'V'.toByte)
    assert(ImageCodec.format(now) == ImageCodec.FmtQdct)
    // hand-built legacy stream: 8x8 flat gray -> all-zero DCT
    // coefficients as fixed 2-byte shorts; must decode to 128s, not be
    // misread as a varint stream
    val legacy = new Array[Byte](10 + 64 * 2)
    legacy(0) = 'Q'.toByte; legacy(1) = 'D'.toByte
    legacy(5) = 8.toByte; legacy(9) = 8.toByte // big-endian w = h = 8
    val (out, w, h) = ImageCodec.decode(legacy)
    assert(w == 8 && h == 8)
    assert(out.forall(_ == 128.toByte))
  }

  test("decode is deterministic (bit-identical across calls)") {
    val px = SyntheticWeb.pixelsFor(7L, 5L, 64, 48)
    val enc = ImageCodec.encodeQdct(px, 64, 48)
    val a = ImageCodec.decode(enc)._1
    val b = ImageCodec.decode(enc)._1
    assert(a.sameElements(b))
  }

  test("phash: stable for same pixels, differs across images, robust to qdct loss") {
    val a = SyntheticWeb.pixelsFor(42L, 1L, 64, 48)
    val b = SyntheticWeb.pixelsFor(42L, 2L, 64, 48)
    val ha = ImageCodec.phash64(a, 64, 48)
    assert(ha == ImageCodec.phash64(a, 64, 48))
    assert(ha != ImageCodec.phash64(b, 64, 48))
    // lossy roundtrip stays inside the near-dup band (<=10 of 63 bits;
    // unrelated images average ~32), measured max 8 on the noisy corpus
    val (dec, _, _) = ImageCodec.decode(ImageCodec.encodeQdct(a, 64, 48))
    val hd = ImageCodec.phash64(dec, 64, 48)
    assert(java.lang.Long.bitCount(ha ^ hd) <= 10,
      s"hamming=${java.lang.Long.bitCount(ha ^ hd)}")
    assert(java.lang.Long.bitCount(ha ^ ImageCodec.phash64(b, 64, 48)) > 10,
      "unrelated images should not look like near-dups")
  }

  test("resizePool: deterministic, dimension-exact, mean-preserving") {
    val px = graft.corpus.SyntheticWeb.pixelsFor(7L, 1L, 64, 48)
    val a = ImageCodec.resizePool(px, 64, 48, 16, 16)
    val b = ImageCodec.resizePool(px, 64, 48, 16, 16)
    assert(a.sameElements(b), "resize must be bit-deterministic")
    assert(a.length == 16 * 16)
    def mean(p: Array[Byte]) = p.map(_ & 0xff).sum.toDouble / p.length
    assert(math.abs(mean(a) - mean(px)) < 2.0, "average-pool must preserve mean luminance")
  }

  test("phash near-dup pairs: 64-bit banded join == brute-force Hamming scan") {
    // image near-dup dedup at scale: 9-band pigeonhole equi-join over
    // phash64 must find EXACTLY the pairs a full O(n^2) Hamming scan
    // finds at maxDist=8. Near-dups are planted as qdct re-encodes
    // (lossy but phash-stable); the rest are unrelated images.
    val spark = SparkTestBase.spark
    import spark.implicits._
    val imgs: Seq[(Long, Long)] = (0 until 40).map { i =>
      val base = SyntheticWeb.pixelsFor(42L, (i / 2).toLong, 64, 48)
      val px = if (i % 2 == 1) ImageCodec.decode(ImageCodec.encodeQdct(base, 64, 48))._1
               else base
      (i.toLong, ImageCodec.phash64(px, 64, 48))
    }
    val brute = (for {
      (ia, ha) <- imgs; (ib, hb) <- imgs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 8
    } yield (ia, ib, d)).toSet
    assert(brute.nonEmpty, "fixture must contain planted near-dups")
    assert(brute.size < imgs.size * (imgs.size - 1) / 4, "fixture must not be all-pairs")
    val got = graft.ops.Dedup.signaturePairs(
        imgs.toDF("img_id", "phash"), "img_id", "phash", maxDist = 8, bits = 64)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute)
  }

  test("quadrant phash pairs match brute-force quadrant-agreement counts") {
    // Per-quadrant near-dup voting (T49): hash each image quadrant
    // separately; a pair is a dup when >= 2 of 4 quadrants agree within
    // maxDist=2. Fixture: 20 images in 10 clone-pairs; the odd member
    // of each pair gets (i%3) bits flipped in quadrants 0-2 (sensor
    // noise, still within tolerance for i%3<=2) and quadrant 3 replaced
    // wholesale (a localized crop) — whole-image hashing would see a
    // huge combined distance, quadrant voting still pairs them.
    val spark = SparkTestBase.spark
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def h60(): Long = rnd.nextLong() & ((1L << 60) - 1)
    val rows: Seq[(Long, Int, Long)] = (0 until 10).flatMap { c =>
      val base = Array.fill(4)(h60())
      val a = (2L * c, base)
      val noisy = base.zipWithIndex.map { case (h, q) =>
        if (q == 3) h60() // quadrant 3 cropped/replaced on the clone
        else {
          var x = h
          for (k <- 0 until (c % 3)) x ^= 1L << ((c * 7 + q * 3 + k) % 60)
          x
        }
      }
      val b = (2L * c + 1, noisy)
      Seq(a, b).flatMap { case (id, hs) =>
        hs.zipWithIndex.map { case (h, q) => (id, q, h) }
      }
    }
    // brute force: per-pair count of quadrants with hamming <= 2
    val byId = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val ids = byId.keys.toSeq.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
      n = (0 until 4).count(q => java.lang.Long.bitCount(byId(a)(q) ^ byId(b)(q)) <= 2)
      if n >= 2
    } yield (a, b, n.toLong)).toSet
    assert(brute.nonEmpty && brute.size < ids.size * (ids.size - 1) / 4)
    val got = graft.ops.Dedup.quadrantSignaturePairs(
        rows.toDF("img_id", "quad", "phash"), "img_id", "quad", "phash",
        maxDist = 2, bits = 60, minAgree = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute)
  }

  test("corrupted payload is detected by the PSNR invariant") {
    val px = SyntheticWeb.pixelsFor(42L, 9L, 32, 32)
    val bad = px.clone()
    for (i <- bad.indices by 3) bad(i) = (bad(i) + 64).toByte
    assert(ImageCodec.psnr(px, bad) < 40.0)
  }
}
