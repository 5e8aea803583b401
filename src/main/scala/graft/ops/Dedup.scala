package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines, ordered by cost:
 *
 *  - exact: hash-groupBy on a content digest — one shuffle on the digest.
 *  - MinHash+LSH: shingle → k minhashes → banded bucket join. Candidate
 *    generation never compares all pairs: the self-join is on
 *    (band_id, band_hash), so at 100 TB the shuffle is bounded by bucket
 *    sizes, not n². Hot buckets are exactly-duplicate clusters, which is
 *    the output we want anyway.
 *  - SimHash: 16-bit signature via per-bit weighted sums; near-dup =
 *    small Hamming distance (bit_count(xor)) within candidate buckets.
 *  - n-gram Jaccard: exact verification for LSH candidates (shingle
 *    equi-join, integer intersection/union counts).
 *
 * Hash functions are md5-derived so results are engine-independent
 * (reference content-addressing analogue: `crawler/crawler_node.py:253`).
 */
object Dedup {

  /** Exact dedup (first-seen-wins, `master/master_node.py:119-127`):
    * groups by content digest, keeps min(id) as the canonical row. */
  def exact(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), md5(lower(col(text))).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(id)).as("keeper"), count(lit(1)).as("n_dups"))

  /** Word n-gram shingles as an array column (empty if too few tokens). */
  def shinglesCol(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokensCol(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (1 to n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array())
  }

  /** (id, shingle) distinct rows. */
  def shingles(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    df.select(col(id), explode(shinglesCol(col(text), n)).as("shingle")).distinct()

  /** MinHash signatures: k md5-derived min-hashes per document. */
  def minhashSignatures(df: DataFrame, id: String, text: String, n: Int, k: Int): DataFrame = {
    val sh = shingles(df, id, text, n)
    val aggs = (0 until k).map(j => min(md5(concat(col("shingle"), lit(s"#$j")))).as(s"mh$j"))
    sh.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: rows (id, band_id, band_hash); rowsPerBand minhashes
    * are concatenated and re-hashed per band. */
  def lshBands(sigs: DataFrame, id: String, k: Int, rowsPerBand: Int): DataFrame = {
    val nBands = k / rowsPerBand
    val bands = (0 until nBands).map { bnd =>
      val parts = (0 until rowsPerBand).map(r => col(s"mh${bnd * rowsPerBand + r}"))
      sigs.select(col(id), lit(bnd).as("band_id"), md5(concat(parts: _*)).as("band_hash"))
    }
    bands.reduce(_ unionByName _)
  }

  /** Candidate near-duplicate pairs (a < b) sharing at least one LSH band. */
  def minhashCandidates(df: DataFrame, id: String, text: String,
                        n: Int = 3, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val bands = lshBands(minhashSignatures(df, id, text, n, k), id, k, rowsPerBand)
    val a = bands.select(col("band_id"), col("band_hash"), col(id).as("doc_a"))
    val b = bands.select(col("band_id"), col("band_hash"), col(id).as("doc_b"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** 16-bit SimHash per document. Bit i of a token's hash = parity of the
    * i-th md5 hex char; signature bit = sign of the frequency-weighted sum. */
  def simhash16(df: DataFrame, id: String, text: String): DataFrame = {
    val tf = TextAnalysis.tokenize(df, id, text)
      .groupBy(col(id), col("token")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", md5(col("token")))
    val bitSums = (0 until 16).map { i =>
      sum(col("cnt") * (ascii(substring(col("h"), i + 1, 1)) % 2 * 2 - 1)).as(s"s$i")
    }
    tf.groupBy(col(id))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(id),
        (0 until 16).map(i => when(col(s"s$i") > 0, lit(1 << i)).otherwise(lit(0)))
          .reduce(_ + _).cast("int").as("simhash"))
  }

  /** SimHash near-dup pairs within a bucket column: hamming(simhash) <= maxDist. */
  def simhashPairs(sigs: DataFrame, id: String, bucket: Option[String], maxDist: Int): DataFrame = {
    val a = sigs.select((bucket.toSeq.map(col) :+ col(id).as("doc_a") :+ col("simhash").as("sh_a")): _*)
    val b = sigs.select((bucket.toSeq.map(col) :+ col(id).as("doc_b") :+ col("simhash").as("sh_b")): _*)
    val joined = bucket match {
      case Some(bc) => a.join(b, Seq(bc))
      case None     => a.crossJoin(b)
    }
    joined.filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard similarity for pairs that share >=1 shingle
    * (integer set arithmetic — |∩| via equi-join, |∪| = |A|+|B|-|∩|). */
  def ngramJaccard(df: DataFrame, id: String, text: String, n: Int, minJaccard: Double): DataFrame = {
    val sh = shingles(df, id, text, n)
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("sz"))
    val a = sh.select(col("shingle"), col(id).as("doc_a"))
    val b = sh.select(col("shingle"), col(id).as("doc_b"))
    val inter = a.join(b, "shingle")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col(id).as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sizes.select(col(id).as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("sz_a") + col("sz_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
