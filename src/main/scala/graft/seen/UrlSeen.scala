package graft.seen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/**
 * The URL-seen set (J1): first-seen-wins dedup gate for the frontier —
 * the reference's `seen_urls` Python set (`master/master_node.py:44,
 * 119-127`) rebuilt as a two-stage probabilistic + exact filter:
 *
 *  1. Bloom pre-filter: a sketch built from the seen table, broadcast
 *     to executors. `mightContain == false` proves a candidate is new —
 *     those rows skip the join entirely. At a 10^10-URL frontier the
 *     overwhelming majority of re-discovered links are dupes, so the
 *     exact join's probe side shrinks by orders of magnitude.
 *  2. Exact left-anti join for the maybe-seen remainder — Bloom false
 *     positives are corrected here, so correctness never depends on the
 *     sketch.
 *
 * Scale sizing (documented, SURVEY.md §4): one monolithic sketch at
 * 10^10 keys / 1% FPP needs ~12 GB — too big to broadcast. The scale
 * path buckets the key space by host hash (4096 buckets ⇒ ~2.4M
 * keys/bucket ⇒ ~3 MB/bucket); executors build buckets with a
 * partial-merge aggregation (bitwise OR) and each fetch partition only
 * loads the buckets its hosts hash into. This module implements the
 * broadcast variant (right for up to ~10^8 seen URLs / ~120 MB) plus
 * the bucketed builder; the exact-join backstop is identical in both.
 */
object UrlSeen {

  /** Build a driver-side Bloom sketch of `urlCol` (public Spark sketch API). */
  def buildBloom(seen: DataFrame, urlCol: String,
                 expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    seen.stat.bloomFilter(urlCol, math.max(expectedItems, 1L), fpp)

  /**
   * Returns candidates whose `urlCol` is definitely absent from `seen`.
   * Candidates must already be intra-batch deduplicated.
   */
  def filterNew(spark: SparkSession, candidates: DataFrame, seen: DataFrame,
                urlCol: String, expectedSeen: Long): DataFrame =
    filterNewWithBloom(spark, candidates, seen, urlCol,
      buildBloom(seen, urlCol, expectedSeen))

  /** Same, with a caller-maintained sketch (the pipeline merges each
    * wave's new URLs into a driver-held Bloom instead of rebuilding
    * from the full frontier every wave). */
  def filterNewWithBloom(spark: SparkSession, candidates: DataFrame, seen: DataFrame,
                         urlCol: String, bloom: BloomFilter): DataFrame = {
    val bv = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((u: String) => bv.value.mightContainString(u))
    val definitelyNew = candidates.filter(!mightContain(col(urlCol)))
    val maybeSeen = candidates.filter(mightContain(col(urlCol)))
    val corrected = maybeSeen.join(
      seen.select(col(urlCol)).distinct(), Seq(urlCol), "left_anti")
    definitelyNew.unionByName(corrected)
  }

  /** Bucketed sketch builder (the 10^10 scale path): one Bloom per
    * host-hash bucket, built executor-side with a partial merge. */
  def buildBucketedBlooms(seen: DataFrame, urlCol: String, nBuckets: Int,
                          itemsPerBucket: Long, fpp: Double = 0.01): Map[Int, BloomFilter] = {
    val spark = seen.sparkSession
    import spark.implicits._
    seen.select(pmod(xxhash64(col(urlCol)), lit(nBuckets)).cast("int").as("bucket"),
                col(urlCol).as("u"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .mapGroups { (bucket, rows) =>
        val bf = BloomFilter.create(itemsPerBucket, fpp)
        rows.foreach(r => bf.putString(r._2))
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        (bucket, bos.toByteArray)
      }
      .collect()
      .map { case (b, bytes) =>
        b -> BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
      }.toMap
  }
}
