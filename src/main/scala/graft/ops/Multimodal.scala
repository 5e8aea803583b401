package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata (the reference stores payloads opaquely,
 * content-addressed — `crawler/crawler_node.py:246-284`; the graft's
 * image payload schema comes from BASELINE.json input_hint).
 *
 * The Spark-side plumbing (schema, batch iteration, partitioning) is
 * real; the actual codec calls are STUBBED deterministically because no
 * image/audio libraries exist in this container. `graft.codec.QdctCodec`
 * provides the real, in-repo deterministic image codec used by the
 * crawl pipeline; this module is the generic binary-column operator
 * surface (decode-meta, frame-sample, feature-extract).
 */
object Multimodal {

  /** Decoded metadata for an opaque media blob. */
  case class MediaMeta(w: Int, h: Int, fmt: String, n_frames: Int)

  /**
   * STUB decode: derives metadata deterministically from the first bytes
   * of the blob. A real deployment would replace the body with an actual
   * codec probe (libjpeg/ffprobe); the signature, null handling and
   * batch shape are what the pipeline relies on.
   */
  def decodeMetaStub(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.length < 4) return MediaMeta(0, 0, "unknown", 0)
    val b0 = bytes(0) & 0xff
    val b1 = bytes(1) & 0xff
    val b2 = bytes(2) & 0xff
    val b3 = bytes(3) & 0xff
    MediaMeta(
      w = 16 + (b0 % 64),
      h = 16 + (b1 % 64),
      fmt = (b2 % 3) match { case 0 => "png"; case 1 => "jpeg"; case _ => "webp" },
      n_frames = 1 + (b3 % 7))
  }

  /**
   * Adds decoded-metadata columns for a binary column. Implemented with
   * mapPartitions over the typed row iterator — the batch shape a real
   * decoder needs (per-partition codec init, row-batch decode) — rather
   * than a per-row UDF closure.
   */
  def withDecodedMeta(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col(bytesCol)).as[(Long, Array[Byte])]
    val metas = pairs.mapPartitions { it =>
      // per-partition "codec" init would go here (one-time, not per row)
      it.map { case (id, bytes) =>
        val m = decodeMetaStub(bytes)
        (id, m.w, m.h, m.fmt, m.n_frames)
      }
    }.toDF(idCol, "w", "h", "fmt", "n_frames")
    df.join(metas, idCol)
  }

  /**
   * REAL resize over in-repo codec binaries (not a stub — the container
   * has no image libraries, but the crawl payloads use graft's own
   * deterministic codec): decode → average-pool to (tw, th) → re-encode
   * lossless. Same mapPartitions batch shape as a libjpeg-backed
   * implementation would use.
   */
  def withResized(df: DataFrame, idCol: String, bytesCol: String,
                  tw: Int, th: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = graft.codec.ImageCodec.decode(bytes)
          val small = graft.codec.ImageCodec.resizePool(px, w, h, tw, th)
          (id, graft.codec.ImageCodec.encodeRaw(small, tw, th), tw, th)
        }
      }.toDF(idCol, "resized", "rw", "rh")
  }

  /**
   * REAL feature extraction over codec binaries: decoded dimensions,
   * integer mean luminance, and the 64-bit perceptual hash — the columns
   * an embedding/quality pipeline joins on downstream.
   */
  def withImageFeatures(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (px, w, h) = graft.codec.ImageCodec.decode(bytes)
          var sum = 0L
          var i = 0
          while (i < px.length) { sum += (px(i) & 0xff); i += 1 }
          val mean = if (px.length == 0) 0L else (sum + px.length / 2) / px.length
          (id, w, h, mean, graft.codec.ImageCodec.phash64(px, w, h))
        }
      }.toDF(idCol, "w", "h", "mean_lum", "phash")
  }

  /** Frame sampling: one row per sampled frame index (stride `every`),
    * with a deterministic per-frame content key. Video analogue of the
    * link-explode Generator (F10). */
  def frameSample(metaDf: DataFrame, idCol: String, every: Int): DataFrame =
    metaDf
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1, lit(every))))
      .withColumn("frame_key", md5(concat(col(idCol).cast("string"), lit(":"), col("frame_idx").cast("string"))))
      .select(col(idCol), col("frame_idx"), col("frame_key"))

  /**
   * CLIP-score-style image-text alignment (the LAION-400M/5B curation
   * filter, public practice: keep an (image, caption) pair iff the
   * cosine between the caption embedding and the image embedding clears
   * a threshold). No CLIP model exists in this container, so the
   * caption side uses a deterministic feature-hash embedding (the
   * "hashing trick"): token t adds ±1 (md5-derived sign) to dimension
   * md5(t) % dim. The image side is the real embedding column. The
   * Spark shape is exactly what a model-backed scorer needs — sparse
   * caption vectors from one explode + map-side-combined hash
   * aggregate, one long-keyed equi-join against the image embeddings,
   * an exact-integer dot — so swapping the hash embed for a batched
   * model UDF changes nothing else in the plan.
   *
   * Determinism: caption counts are exact integers; image vectors use
   * the 2^20 fixed-point scaling ([[Similarity]]); the per-pair dot is
   * an integer sum over map entries (order-free), so the score is
   * bit-identical across engines and partitionings (the scale factors
   * cancel in the cosine). Captionless or fully-sign-cancelled
   * captions score 0.0.
   *
   * Scale: tokenize/explode and the bucket hash are map-side; the wide
   * ops are the (id, bucket) partial-agg shuffle, the per-id gather,
   * and the id equi-join — never all-pairs, and the shuffled caption
   * vectors are sparse (≤ caption-token entries, not `dim`).
   */
  /** Sparse feature-hash caption embedding shared by [[captionAlignment]]
    * and [[crossModalSearch]]: per id, a `cvec` map (hash bucket →
    * signed token count, zero entries dropped) and its exact squared
    * norm `cn2`. Ids whose captions have no tokens (or fully cancel)
    * produce no row. */
  private def hashCaptionVec(docs: DataFrame, id: String, text: String,
                             dim: Int): DataFrame = {
    val h = md5(col("token"))
    TextAnalysis.tokenize(docs, id, text)
      .withColumn("bucket",
        (conv(substring(h, 1, 4), 16, 10).cast("long") % dim).cast("int"))
      .withColumn("sgn",
        when(conv(substring(h, 5, 1), 16, 10).cast("long") % 2 === 0, 1L).otherwise(-1L))
      .groupBy(col(id), col("bucket"))
      .agg(sum(col("sgn")).as("cnt"))
      .filter(col("cnt") =!= 0)
      .groupBy(col(id))
      .agg(
        map_from_entries(collect_list(struct(col("bucket"), col("cnt")))).as("cvec"),
        sum(col("cnt") * col("cnt")).as("cn2"))
  }

  /** Exact integer dot between a sparse caption map and a dense scaled
    * vector column (order-free sum over map entries). Interpreted HOF,
    * but over ≤ caption-token entries — never `dim` — per row. */
  private def sparseDot(cvec: Column, dense: Column): Column =
    aggregate(map_entries(cvec), lit(0L),
      (acc, e) => acc + e.getField("value") * element_at(dense, e.getField("key") + 1))

  def captionAlignment(docs: DataFrame, id: String, text: String,
                       emb: DataFrame, embId: String, embCol: String,
                       dim: Int = 64, minScore: Double = 0.0): DataFrame = {
    val cap = hashCaptionVec(docs, id, text, dim)
    val img = Similarity.withScaled(emb, embCol)
      .select(col(embId).as(id), col("scaled"), col("norm2"))
    docs.select(col(id))
      .join(img, Seq(id))
      .join(cap, Seq(id), "left")
      .withColumn("dot", coalesce(sparseDot(col("cvec"), col("scaled")), lit(0L)))
      .withColumn("align_score",
        when(coalesce(col("cn2"), lit(0L)) === 0L, lit(0.0))
          .otherwise(Similarity.cosine(col("dot"), col("cn2"), col("norm2"))))
      .withColumn("aligned", col("align_score") >= minScore)
      .select(col(id), col("align_score"), col("aligned"))
  }

  /**
   * Cross-modal retrieval: text query → top-k images. The SEARCH shape
   * of the modality pair (captionAlignment is the filter shape): each
   * query caption is hash-embedded into the image-embedding space (same
   * feature-hash trick, so a model-backed encoder slots in without plan
   * changes), the image corpus is sign-LSH bucketed
   * ([[Similarity.signLshBucket]]), and the query probes ONLY its own
   * bucket — recall is governed by nPlanes (fewer planes → bigger
   * buckets → higher recall, more compute), exactness within the probed
   * bucket is total.
   *
   * Scale: bucketing the corpus is one map-side pass (codegen long_dot
   * against literal planes); the probe is a bucket equi-join, so the
   * shuffle is bounded by bucket sizes — never |Q|×|N|. Query-side
   * plane projections run an interpreted HOF over the SPARSE caption
   * map (≤ tokens entries), and |Q| ≪ |N|. Queries with empty or
   * fully-cancelled captions return no rows (nothing to embed).
   *
   * Determinism: integer dots + IEEE division/sqrt; ranking ties break
   * on image id — bit-identical across engines and partitionings.
   */
  def crossModalSearch(queries: DataFrame, qid: String, text: String,
                       images: DataFrame, imgId: String, embCol: String,
                       dim: Int = 64, nPlanes: Int = 4, k: Int = 5): DataFrame = {
    val cap = hashCaptionVec(queries, qid, text, dim)
    val qBucket = (0 until nPlanes).map { p =>
      val plane = array(Similarity.planeArray(p, dim).toIndexedSeq.map(lit(_)): _*)
      when(sparseDot(col("cvec"), plane) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _).cast("int")
    val q = cap.withColumn("bucket", qBucket)
      .select(col(qid).as("query_id"), col("cvec"), col("cn2"), col("bucket"))
    val img = Similarity.signLshBucket(images, imgId, embCol, dim, nPlanes)
      .select(col(imgId).as("image_id"), col("scaled"), col("norm2"), col("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("image_id"))
    q.join(img, "bucket")
      .withColumn("sim",
        Similarity.cosine(sparseDot(col("cvec"), col("scaled")), col("cn2"), col("norm2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("image_id"), col("sim"))
  }

  /**
   * Aspect-ratio bucket batching (SDXL/NovelAI-style bucketing, public
   * practice): variable-aspect images cannot share a training batch —
   * each image snaps to the NEAREST of a fixed aspect-bucket list and
   * fixed-size batches are cut within each bucket in id order, so a
   * batch always holds same-aspect images and the leftover per bucket
   * is at most batchSize−1 rows.
   *
   * Exact nearest bucket on integers: |w/h − bwᵢ/bhᵢ| ∝
   * |w·bhᵢ − bwᵢ·h| / bhᵢ; multiplying through by L = lcm(bhᵢ) gives
   * the all-integer key |w·bhᵢ − bwᵢ·h| · (L/bhᵢ) — engine-exact
   * argmin via the same `array_min (key, idx)` struct tie-break the
   * k-means assignment uses (ties → smaller bucket index).
   *
   * Scale: bucket choice is a pure projection (buckets are literals);
   * the within-bucket position comes from ONE global
   * (bucket, id)-ordered rank — the [[Curation.runningOffset]]
   * two-pass range-shuffle prefix sum, so the dominant bucket (most
   * web images are landscape-ish) spreads over many range partitions
   * instead of hash-routing into one window task — minus the bucket's
   * start offset, a buckets-sized broadcast frame. batch = pos div
   * batchSize, slot = pos mod batchSize; all integer, deterministic.
   */
  def aspectBucketBatches(df: DataFrame, id: String, wCol: Column,
                          hCol: Column, buckets: Seq[(Int, Int)],
                          batchSize: Int): DataFrame = {
    Curation.requireIdFree("aspectBucketBatches", id,
      "w", "h", "bucket", "n_tokens", "start_tok", "pos",
      "bucket_w", "bucket_h", "batch_id", "slot")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val L = buckets.map(_._2.toLong).foldLeft(1L)((a, b) => a / gcd(a, b) * b)
    val alts = buckets.zipWithIndex.map { case ((bw, bh), i) =>
      val key = abs(col("w") * bh - lit(bw.toLong) * col("h")) * lit(L / bh)
      struct(key.as("dist"), lit(i).as("idx"))
    }
    val chosen = df
      .select(col(id), wCol.cast("long").as("w"), hCol.cast("long").as("h"))
      .withColumn("bucket", array_min(array(alts.toIndexedSeq: _*)).getField("idx"))
    val ranked = Curation.runningOffset(
      chosen.withColumn("n_tokens", lit(1L)), Seq(col("bucket"), col(id)))
    val starts = ranked.groupBy(col("bucket"))
      .agg(min(col("start_tok")).as("bstart"))
    val bwLit = typedLit(buckets.map(_._1))
    val bhLit = typedLit(buckets.map(_._2))
    ranked.join(broadcast(starts), "bucket")
      .withColumn("pos", col("start_tok") - col("bstart"))
      .select(col(id), col("w"), col("h"), col("bucket"),
        element_at(bwLit, col("bucket") + 1).as("bucket_w"),
        element_at(bhLit, col("bucket") + 1).as("bucket_h"),
        expr(s"pos div $batchSize").as("batch_id"),
        pmod(col("pos"), lit(batchSize.toLong)).cast("int").as("slot"))
  }
}
