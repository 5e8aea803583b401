package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, Similarity}
import Tables._

/** Similarity-search + multimodal-column operator coverage. */
object SimQueries {

  /** q24: brute-force cosine top-10 for a query subset (vec_id % 25 = 0).
    * Fixed-point dot products keep sim bit-identical to the oracle. */
  def q24KnnCosine(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    Similarity.bruteForceTopK(
        emb.filter(col("vec_id") % 25 === 0), emb, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"), col("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  val q24Sql: String =
    """WITH sc AS (
      | SELECT vec_id, list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS s
      | FROM embeddings),
      |n AS (SELECT vec_id, s, list_sum(list_transform(s, x -> x * x)) AS n2 FROM sc),
      |dots AS (
      | SELECT t.qid AS query_id, t.nid AS neighbor_id, t.qn AS qn, t.cn AS cn, sum(t.ae * t.be) AS dot
      | FROM (SELECT q.vec_id AS qid, c.vec_id AS nid, q.n2 AS qn, c.n2 AS cn,
      |              unnest(q.s) AS ae, unnest(c.s) AS be
      |       FROM n q JOIN n c ON q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id) t
      | GROUP BY 1, 2, 3, 4),
      |ranked AS (
      | SELECT query_id, neighbor_id,
      |  CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS sim,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) DESC, neighbor_id) AS INT) AS rank
      | FROM dots)
      |SELECT query_id, rank, neighbor_id, sim FROM ranked WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** q39: sign-LSH bucketed ANN — the scale path for similarity search:
    * same-bucket pairs only (bucket equi-join bounds the shuffle; the
    * brute-force cross join of q24 is the correctness baseline). */
  def q39LshCosinePairs(s: SparkSession, d: String): DataFrame =
    Similarity.lshCosinePairs(embeddings(s, d), "vec_id", "embedding",
        dim = 64, nPlanes = 8, minSim = 0.0)
      .orderBy(col("vec_a"), col("vec_b"))

  val q39Sql: String = {
    val dim = 64; val nPlanes = 8
    // Same md5-derived hyperplanes as Similarity.signLshBucket, embedded
    // as list literals so DuckDB computes identical buckets.
    val planeLits = (0 until nPlanes).map { p =>
      (0 until dim).map { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p:$i".getBytes("UTF-8"))
        if ((h(0) & 1) == 1) "1" else "-1"
      }.mkString("[", ",", "]")
    }
    val bucketTerms = (0 until nPlanes).map { p =>
      s"(CASE WHEN list_sum(list_transform(range($dim), i -> s[i+1] * (${planeLits(p)})[i+1])) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH sc AS (
       | SELECT vec_id, list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS s
       | FROM embeddings),
       |n AS (SELECT vec_id, s, list_sum(list_transform(s, x -> x * x)) AS n2 FROM sc),
       |b AS (SELECT vec_id, s, n2, CAST($bucketTerms AS INT) AS bucket FROM n)
       |SELECT vec_a, vec_b, sim FROM (
       | SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
       |  CAST(list_sum(list_transform(range($dim), i -> a.s[i+1] * c.s[i+1])) AS DOUBLE)
       |    / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS sim
       | FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
       |WHERE sim >= 0.0 ORDER BY vec_a, vec_b""".stripMargin
  }

  /** q45: IVF-Flat ANN — the cell-probed scale path for similarity
    * search (every 8th vector is a coarse centroid, queries probe their
    * 2 nearest cells, top-5 within the probed inverted lists). */
  def q45IvfAnn(s: SparkSession, d: String): DataFrame =
    Similarity.ivfTopK(embeddings(s, d), "vec_id", "embedding",
        centEvery = 8, nProbe = 2, querySel = col("vec_id") % 25 === 0, k = 5)
      .orderBy(col("query_id"), col("rank"))

  val q45Sql: String =
    """WITH sc AS (
      | SELECT vec_id, list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS s
      | FROM embeddings),
      |n AS (SELECT vec_id, s, list_sum(list_transform(s, x -> x * x)) AS n2 FROM sc),
      |cents AS (SELECT vec_id AS cid, s AS cs, n2 AS cn2 FROM n WHERE vec_id % 8 = 0),
      |simc AS (
      | SELECT n.vec_id, cents.cid,
      |  CAST(list_sum(list_transform(range(64), i -> n.s[i+1] * cents.cs[i+1])) AS DOUBLE)
      |    / (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(cents.cn2 AS DOUBLE))) AS sim_c
      | FROM n, cents),
      |ranked_c AS (
      | SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim_c DESC, cid) AS rn
      | FROM simc),
      |assigned AS (SELECT vec_id, cid AS cell FROM ranked_c WHERE rn = 1),
      |qprobe AS (
      | SELECT vec_id AS query_id, cid AS cell FROM ranked_c
      | WHERE vec_id % 25 = 0 AND rn <= 2),
      |cand AS (
      | SELECT q.query_id, a.vec_id AS neighbor_id
      | FROM qprobe q JOIN assigned a ON a.cell = q.cell AND a.vec_id <> q.query_id),
      |sims AS (
      | SELECT c.query_id, c.neighbor_id,
      |  CAST(list_sum(list_transform(range(64), i -> qn.s[i+1] * cn.s[i+1])) AS DOUBLE)
      |    / (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE))) AS sim
      | FROM cand c JOIN n qn ON qn.vec_id = c.query_id JOIN n cn ON cn.vec_id = c.neighbor_id)
      |SELECT query_id, rank, neighbor_id, sim FROM (
      | SELECT query_id, neighbor_id, sim,
      |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
      | FROM sims) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** q63: SemDeDup-style semantic dedup — IVF-cell assignment (every 8th
    * vector a centroid, as q45) then within-cell cosine >= threshold
    * against lower-id cellmates; one representative per near-dup group
    * survives. The pair join is cell-bounded, never corpus-all-pairs.
    * (The synthetic embeddings carry no planted near-identical pairs —
    * max within-cell cosine ≈ 0.47 at sf0.01 — so the query uses a
    * demonstrative 0.4 threshold to exercise the dup/keeper path; the
    * operator's threshold is a free parameter.) */
  def q63SemanticDedup(s: SparkSession, d: String): DataFrame =
    Similarity.semanticDedup(embeddings(s, d), "vec_id", "embedding",
        centEvery = 8, minSim = 0.4)
      .orderBy(col("vec_id"))

  val q63Sql: String =
    """WITH sc AS (
      | SELECT vec_id, list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS s
      | FROM embeddings),
      |n AS (SELECT vec_id, s, list_sum(list_transform(s, x -> x * x)) AS n2 FROM sc),
      |cents AS (SELECT vec_id AS cid, s AS cs, n2 AS cn2 FROM n WHERE vec_id % 8 = 0),
      |simc AS (
      | SELECT n.vec_id, cents.cid,
      |  CAST(list_sum(list_transform(range(64), i -> n.s[i+1] * cents.cs[i+1])) AS DOUBLE)
      |    / (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(cents.cn2 AS DOUBLE))) AS sim_c
      | FROM n, cents),
      |ranked_c AS (
      | SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY sim_c DESC, cid) AS rn
      | FROM simc),
      |cells AS (
      | SELECT r.vec_id, r.cid AS cell, n.s, n.n2
      | FROM ranked_c r JOIN n ON n.vec_id = r.vec_id WHERE r.rn = 1),
      |pairs AS (
      | SELECT x.vec_id AS lo, y.vec_id AS hi,
      |  CAST(list_sum(list_transform(range(64), i -> x.s[i+1] * y.s[i+1])) AS DOUBLE)
      |    / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE))) AS sim
      | FROM cells x JOIN cells y ON x.cell = y.cell AND x.vec_id < y.vec_id),
      |d AS (SELECT hi, min(lo) AS dup_of FROM pairs WHERE sim >= 0.4 GROUP BY hi)
      |SELECT c.vec_id, c.cell, d.dup_of, d.dup_of IS NOT NULL AS is_dup
      |FROM cells c LEFT JOIN d ON d.hi = c.vec_id
      |ORDER BY c.vec_id""".stripMargin

  /** q68: symmetric int8 scalar quantization (FAISS-SQ8-style) — per
    * vector the scale, quantized norm, max |q| (must reach 127 at the
    * max element) and the max reconstruction error. Every output is
    * exact integer math or single-rounding IEEE ops, so no rounding
    * fudge is needed vs the oracle. */
  def q68QuantizeInt8(s: SparkSession, d: String): DataFrame = {
    val qz = Similarity.quantizeInt8(embeddings(s, d), "embedding")
    qz.select(
        col("vec_id"),
        col("qscale"),
        Similarity.norm2Col(col("q")).as("qnorm2"),
        array_max(transform(col("q"), x => abs(x.cast("int")))).as("qmax"),
        array_max(zip_with(
          transform(col("embedding"), v => v.cast("double")), col("q"),
          (v, q) => abs(v - q.cast("double") * col("qscale")))).as("max_err"))
      .orderBy(col("vec_id"))
  }

  val q68Sql: String =
    """WITH v AS (
      | SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd FROM embeddings),
      |s AS (
      | SELECT vec_id, vd, list_max(list_transform(vd, x -> abs(x))) / 127 AS qscale FROM v),
      |qt AS (
      | SELECT vec_id, vd, qscale,
      |  CASE WHEN qscale = 0 THEN list_transform(vd, x -> CAST(0 AS BIGINT))
      |       ELSE list_transform(vd, x -> CAST(round(x / qscale) AS BIGINT)) END AS q
      | FROM s)
      |SELECT vec_id, qscale,
      | CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS qnorm2,
      | CAST(list_max(list_transform(q, x -> abs(x))) AS INT) AS qmax,
      | list_max(list_transform(range(64), i -> abs(vd[i+1] - CAST(q[i+1] AS DOUBLE) * qscale))) AS max_err
      |FROM qt ORDER BY vec_id""".stripMargin

  /** q69: brute-force cosine top-10 over the QUANTIZED vectors (per-
    * vector scales cancel in the cosine) — the int8 index answers the
    * same queries as q24 at 1/4 the vector bytes; byte arrays go
    * through the same codegen long_dot kernel. */
  def q69QuantizedKnn(s: SparkSession, d: String): DataFrame =
    Similarity.quantizedTopK(embeddings(s, d), "vec_id", "embedding",
        querySel = col("vec_id") % 25 === 0, k = 10)
      .orderBy(col("query_id"), col("rank"))

  val q69Sql: String =
    """WITH v AS (
      | SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd FROM embeddings),
      |s AS (
      | SELECT vec_id, vd, list_max(list_transform(vd, x -> abs(x))) / 127 AS qscale FROM v),
      |qt AS (
      | SELECT vec_id,
      |  CASE WHEN qscale = 0 THEN list_transform(vd, x -> CAST(0 AS BIGINT))
      |       ELSE list_transform(vd, x -> CAST(round(x / qscale) AS BIGINT)) END AS q
      | FROM s),
      |n AS (SELECT vec_id, q, list_sum(list_transform(q, x -> x * x)) AS n2 FROM qt),
      |dots AS (
      | SELECT t.qid AS query_id, t.nid AS neighbor_id, t.qn AS qn, t.cn AS cn, sum(t.ae * t.be) AS dot
      | FROM (SELECT a.vec_id AS qid, c.vec_id AS nid, a.n2 AS qn, c.n2 AS cn,
      |              unnest(a.q) AS ae, unnest(c.q) AS be
      |       FROM n a JOIN n c ON a.vec_id % 25 = 0 AND a.vec_id <> c.vec_id) t
      | GROUP BY 1, 2, 3, 4),
      |ranked AS (
      | SELECT query_id, neighbor_id,
      |  CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS qsim,
      |  CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) DESC, neighbor_id) AS INT) AS rank
      | FROM dots)
      |SELECT query_id, rank, neighbor_id, qsim FROM ranked WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** q36: multimodal metadata decode over a binary column (stubbed codec;
    * real mapPartitions plumbing over unhex(md5(text)) blobs). */
  def q36MultimodalMeta(s: SparkSession, d: String): DataFrame = {
    val withBytes = documents(s, d).select(col("doc_id"), unhex(md5(col("text"))).as("blob"))
    Multimodal.withDecodedMeta(withBytes, "doc_id", "blob")
      .select(col("doc_id"), col("w"), col("h"), col("fmt"), col("n_frames"))
      .orderBy(col("doc_id"))
  }

  val q36Sql: String =
    """SELECT doc_id,
      | 16 + (CAST(concat('0x', substr(md5(text), 1, 2)) AS INT) % 64) AS w,
      | 16 + (CAST(concat('0x', substr(md5(text), 3, 2)) AS INT) % 64) AS h,
      | CASE (CAST(concat('0x', substr(md5(text), 5, 2)) AS INT) % 3)
      |   WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS fmt,
      | 1 + (CAST(concat('0x', substr(md5(text), 7, 2)) AS INT) % 7) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q47: REAL multimodal decode/resize/feature-extract over in-repo
    * codec binaries synthesized deterministically per document (half
    * lossless, half lossy-DCT). DuckDB cannot run the codec, so the
    * oracle is the COMMITTED golden fixture `fixtures/image_truth.parquet`
    * — generated once by [[graft.corpus.ImageTruthGen]] from this same
    * computation over doc_id 0..49999 (a superset of every sf's id
    * domain; the features are pure functions of doc_id) and pinned in
    * git. Any codec or feature regression breaks the driver hash
    * against the fixture; CodecSpec remains the algorithmic pin
    * (PSNR/pHash vectors). */
  def q47ImageFeatures(s: SparkSession, d: String): DataFrame =
    imageFeaturesForIds(s, documents(s, d).select(col("doc_id")))

  /** The q47 computation over an arbitrary doc_id frame — shared by the
    * query and the golden-fixture generator so the pinned truth is the
    * literal same code path. */
  def imageFeaturesForIds(s: SparkSession, ids: DataFrame): DataFrame = {
    import s.implicits._
    import graft.codec.ImageCodec
    val withBytes = ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val px = graft.corpus.SyntheticWeb.pixelsFor(42L, 700000L + id, 48, 32)
          val bytes =
            if (id % 2 == 1) ImageCodec.encodeQdct(px, 48, 32)
            else ImageCodec.encodeRaw(px, 48, 32)
          (id, bytes)
        }
      }.toDF("doc_id", "img")
    val feats = Multimodal.withImageFeatures(withBytes, "doc_id", "img")
    val resized = Multimodal.withResized(withBytes, "doc_id", "img", 16, 16)
      .select(col("doc_id"), col("rw"), col("rh"), md5(col("resized")).as("resized_md5"))
    feats.join(resized, "doc_id").orderBy(col("doc_id"))
  }

  /** q47 oracle: plain DuckDB join of the documents frame against the
    * committed codec-truth fixture (see [[q47ImageFeatures]]). The
    * fixture path resolves at oracle-dump time, first via the
    * GRAFT_REPO_ROOT env var / graft.repo.root system property, then
    * the JVM's working directory (sbt forks in the repo root) — and the
    * resolved file's EXISTENCE is checked so a tool launched from
    * outside the repo fails here with a clear message instead of an
    * opaque read_parquet error from the oracle runner. */
  lazy val q47Sql: String = {
    val rel = "fixtures/image_truth.parquet"
    val roots = (sys.env.get("GRAFT_REPO_ROOT") ++
      sys.props.get("graft.repo.root") ++ Seq(".")).toSeq
    val truth = roots.map(r => new java.io.File(r, rel))
      .find(_.isFile)
      .getOrElse(throw new IllegalStateException(
        s"q47 oracle fixture $rel not found under any of $roots — " +
          "launch from the repo root or set GRAFT_REPO_ROOT"))
      .getAbsolutePath
    s"""SELECT t.doc_id, t.w, t.h, t.mean_lum, t.phash, t.rw, t.rh, t.resized_md5
       |FROM read_parquet('$truth') t
       |JOIN documents d ON d.doc_id = t.doc_id
       |ORDER BY t.doc_id""".stripMargin
  }

  /** q79: CLIP-score-style image-text alignment filter (LAION-style
    * multimodal curation): cosine between a deterministic feature-hash
    * caption embedding (64 buckets, md5-derived ±1 signs) and the image
    * embedding, pairs keyed doc_id = vec_id. Threshold 0.0 is
    * demonstrative — the synthetic captions/embeddings are independent,
    * so scores center on 0 and ~half the pairs pass; the operator's
    * threshold is a free parameter. */
  def q79ClipAlign(s: SparkSession, d: String): DataFrame =
    Multimodal.captionAlignment(documents(s, d), "doc_id", "text",
        embeddings(s, d), "vec_id", "embedding", dim = 64, minScore = 0.0)
      .orderBy(col("doc_id"))

  val q79Sql: String =
    """WITH tok AS (
      | SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS token
      | FROM documents),
      |sp AS (
      | SELECT doc_id,
      |  CAST(CAST(concat('0x', substr(md5(token), 1, 4)) AS BIGINT) % 64 AS INT) AS bucket,
      |  CASE WHEN CAST(concat('0x', substr(md5(token), 5, 1)) AS INT) % 2 = 0 THEN 1 ELSE -1 END AS sgn
      | FROM tok),
      |cap AS (
      | SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS cnt
      | FROM sp GROUP BY 1, 2 HAVING sum(sgn) <> 0),
      |cn AS (SELECT doc_id, sum(cnt * cnt) AS cn2 FROM cap GROUP BY 1),
      |img AS (
      | SELECT vec_id, list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS s
      | FROM embeddings),
      |imn AS (SELECT vec_id, s, list_sum(list_transform(s, x -> x * x)) AS n2 FROM img),
      |dots AS (
      | SELECT c.doc_id, sum(c.cnt * i.s[c.bucket + 1]) AS dot
      | FROM cap c JOIN imn i ON i.vec_id = c.doc_id GROUP BY 1)
      |SELECT doc_id, align_score, align_score >= 0.0 AS aligned FROM (
      | SELECT d.doc_id,
      |  CASE WHEN cn.cn2 IS NULL OR cn.cn2 = 0 THEN 0.0
      |       ELSE CAST(dots.dot AS DOUBLE) / (sqrt(CAST(cn.cn2 AS DOUBLE)) * sqrt(CAST(imn.n2 AS DOUBLE))) END AS align_score
      | FROM documents d
      | JOIN imn ON imn.vec_id = d.doc_id
      | LEFT JOIN cn ON cn.doc_id = d.doc_id
      | LEFT JOIN dots ON dots.doc_id = d.doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q37: frame sampling (stride 2) — generator over multimodal metadata. */
  def q37FrameSample(s: SparkSession, d: String): DataFrame = {
    val meta = q36MultimodalMeta(s, d)
    Multimodal.frameSample(meta, "doc_id", every = 2)
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val q37Sql: String =
    """WITH meta AS (
      | SELECT doc_id, 1 + (CAST(concat('0x', substr(md5(text), 7, 2)) AS INT) % 7) AS n_frames
      | FROM documents)
      |SELECT doc_id, CAST(unnest(range(0, n_frames, 2)) AS INT) AS frame_idx,
      | md5(concat(doc_id, ':', unnest(range(0, n_frames, 2)))) AS frame_key
      |FROM meta ORDER BY doc_id, frame_idx""".stripMargin

  /** q83: cross-modal retrieval — text caption → top-5 images through a
    * sign-LSH single-bucket probe (the SEARCH shape of the image-text
    * pair; q79 is the filter shape). Every 50th document's caption is a
    * query; 4 planes → 16 buckets over the image corpus; exact integer
    * cosine inside the probed bucket. The oracle replays the hash
    * embedding, the plane projections, and the bucket probe, so a hash
    * match certifies query and corpus land in the same buckets AND the
    * within-bucket ranking is exact. */
  def q83CrossmodalSearch(s: SparkSession, d: String): DataFrame =
    Multimodal.crossModalSearch(
        documents(s, d).filter(col("doc_id") % 50 === 0), "doc_id", "text",
        embeddings(s, d), "vec_id", "embedding", dim = 64, nPlanes = 4, k = 5)
      .orderBy(col("query_id"), col("rank"))

  val q83Sql: String = {
    val dim = 64; val nPlanes = 4
    val planeLits = (0 until nPlanes).map { p =>
      graft.ops.Similarity.planeArray(p, dim).mkString("[", ",", "]")
    }
    // query-side plane projections over the SPARSE caption map
    val qDots = (0 until nPlanes).map { p =>
      s"sum(cnt * (${planeLits(p)})[hb+1]) AS d$p"
    }.mkString(", ")
    val qBucket = (0 until nPlanes).map { p =>
      s"(CASE WHEN d$p > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")
    // image-side projections over the dense scaled vector (as q39)
    val iBucket = (0 until nPlanes).map { p =>
      s"(CASE WHEN list_sum(list_transform(range($dim), i -> s[i+1] * (${planeLits(p)})[i+1])) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH tok AS (
       | SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS token
       | FROM documents WHERE doc_id % 50 = 0),
       |sp AS (
       | SELECT doc_id,
       |  CAST(CAST(concat('0x', substr(md5(token), 1, 4)) AS BIGINT) % $dim AS INT) AS hb,
       |  CASE WHEN CAST(concat('0x', substr(md5(token), 5, 1)) AS INT) % 2 = 0 THEN 1 ELSE -1 END AS sgn
       | FROM tok),
       |cap AS (
       | SELECT doc_id, hb, CAST(sum(sgn) AS BIGINT) AS cnt
       | FROM sp GROUP BY 1, 2 HAVING sum(sgn) <> 0),
       |cn AS (SELECT doc_id, sum(cnt * cnt) AS cn2 FROM cap GROUP BY 1),
       |qb AS (
       | SELECT doc_id, CAST($qBucket AS INT) AS bucket
       | FROM (SELECT doc_id, $qDots FROM cap GROUP BY doc_id)),
       |sc AS (
       | SELECT vec_id, list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS s
       | FROM embeddings),
       |n AS (SELECT vec_id, s, list_sum(list_transform(s, x -> x * x)) AS n2 FROM sc),
       |b AS (SELECT vec_id, s, n2, CAST($iBucket AS INT) AS bucket FROM n),
       |cand AS (
       | SELECT qb.doc_id AS query_id, b.vec_id AS image_id, b.s, b.n2
       | FROM qb JOIN b ON b.bucket = qb.bucket),
       |dots AS (
       | SELECT cand.query_id, cand.image_id, sum(c.cnt * cand.s[c.hb+1]) AS dot,
       |  any_value(cand.n2) AS n2
       | FROM cand JOIN cap c ON c.doc_id = cand.query_id GROUP BY 1, 2),
       |ranked AS (
       | SELECT query_id, image_id,
       |  CAST(dot AS DOUBLE) / (sqrt(CAST(cn.cn2 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) AS sim,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(cn.cn2 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) DESC, image_id) AS INT) AS rank
       | FROM dots JOIN cn ON cn.doc_id = dots.query_id)
       |SELECT query_id, rank, image_id, sim FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** q108: k-means IVF training (T66) — 2 Lloyd iterations over the
    * integer grid (k=8, init = the 8 smallest vec_ids), then the final
    * cell assignment with its exact squared distance. The oracle
    * unrolls both rounds; truncating division (`//`) and the
    * (dist2, cid) tie-break mirror the Scala exactly. */
  def q108KmeansIvf(s: SparkSession, d: String): DataFrame =
    Similarity.kmeansAssign(embeddings(s, d), "vec_id", "embedding",
        k = 8, rounds = 2)
      .orderBy(col("vec_id"))

  val q108Sql: String = {
    // one Lloyd round in SQL: assign against c{r-1}, recenter into c{r}
    def assign(r: Int, cents: String) =
      s"""d$r AS (
         | SELECT sc.vec_id, $cents.cid,
         |  CAST(list_sum(list_transform(range(64), i -> (s[i+1]-cs[i+1])*(s[i+1]-cs[i+1]))) AS BIGINT) AS d2
         | FROM sc, $cents),
         |a$r AS MATERIALIZED (
         | SELECT vec_id, cid AS cell, d2 FROM (
         |  SELECT vec_id, cid, d2, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d$r)
         | WHERE rn = 1)""".stripMargin
    def recenter(r: Int, prev: String) =
      s"""e$r AS (
         | SELECT a$r.cell, t.i, CAST(sum(s[t.i+1]) AS BIGINT) AS sv, count(*) AS cnt
         | FROM a$r JOIN sc USING (vec_id), range(64) t(i) GROUP BY a$r.cell, t.i),
         |c$r AS MATERIALIZED (
         | SELECT $prev.cid, COALESCE(n.cs2, $prev.cs) AS cs FROM $prev
         | LEFT JOIN (SELECT cell AS cid, list(sv // cnt ORDER BY i) AS cs2 FROM e$r GROUP BY cell) n USING (cid))""".stripMargin
    s"""WITH sc AS MATERIALIZED (
       | SELECT vec_id, list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS s
       | FROM embeddings),
       |c0 AS MATERIALIZED (
       | SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, s AS cs
       | FROM (SELECT vec_id, s FROM sc ORDER BY vec_id LIMIT 8)),
       |${assign(1, "c0")},
       |${recenter(1, "c0")},
       |${assign(2, "c1")},
       |${recenter(2, "c1")},
       |${assign(3, "c2")}
       |SELECT vec_id, CAST(cell AS INT) AS cell, d2 AS dist2
       |FROM a3 ORDER BY vec_id""".stripMargin
  }

  /** q111 (T69): aspect-ratio bucket batching. The corpus carries no
    * image dims, so each doc gets deterministic planted dims
    * (w = 128 + 7·id mod 512, h = 128 + 13·id mod 512 — aspect ratios
    * spread ~0.2–5, every bucket populated), snapped to the 7-bucket
    * SDXL-style list and cut into batches of 16. The oracle's
    * row_number windows ARE the semantics; the Spark default ranks via
    * the two-pass prefix sum (PlanAudit: no corpus-wide window). */
  def q111AspectBuckets(s: SparkSession, d: String): DataFrame = {
    val dims = documents(s, d).select(col("doc_id"),
      (lit(128L) + pmod(col("doc_id") * 7, lit(512L))).as("w"),
      (lit(128L) + pmod(col("doc_id") * 13, lit(512L))).as("h"))
    Multimodal.aspectBucketBatches(dims, "doc_id", col("w"), col("h"),
        buckets = Seq((1, 1), (4, 3), (3, 4), (16, 9), (9, 16), (3, 2), (2, 3)),
        batchSize = 16)
      .orderBy(col("doc_id"))
  }

  val q111Sql: String =
    """WITH dims AS (
      | SELECT doc_id,
      |  CAST(128 + (doc_id * 7) % 512 AS BIGINT) AS w,
      |  CAST(128 + (doc_id * 13) % 512 AS BIGINT) AS h
      | FROM documents),
      |bk(idx, bw, bh, mul) AS (
      | VALUES (0, 1, 1, 144), (1, 4, 3, 48), (2, 3, 4, 36), (3, 16, 9, 16),
      |        (4, 9, 16, 9), (5, 3, 2, 72), (6, 2, 3, 48)),
      |scored AS (
      | SELECT d.doc_id, d.w, d.h, bk.idx, bk.bw, bk.bh,
      |  abs(d.w * bk.bh - bk.bw * d.h) * bk.mul AS dist
      | FROM dims d, bk),
      |chosen AS (
      | SELECT doc_id, w, h, idx, bw, bh FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY dist, idx) AS rn FROM scored)
      | WHERE rn = 1),
      |ranked AS (
      | SELECT *, row_number() OVER (ORDER BY idx, doc_id) - 1 AS rk FROM chosen),
      |starts AS (SELECT idx, min(rk) AS bstart FROM ranked GROUP BY idx)
      |SELECT r.doc_id, r.w, r.h, CAST(r.idx AS INT) AS bucket,
      | CAST(r.bw AS INT) AS bucket_w, CAST(r.bh AS INT) AS bucket_h,
      | CAST((r.rk - s.bstart) // 16 AS BIGINT) AS batch_id,
      | CAST((r.rk - s.bstart) % 16 AS INT) AS slot
      |FROM ranked r JOIN starts s USING (idx) ORDER BY r.doc_id""".stripMargin
}
