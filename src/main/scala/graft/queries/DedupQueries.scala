package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}
import Tables._

/** Deduplication operator coverage: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding near-dup (training-data pipeline ops). */
object DedupQueries {

  private val tokCte =
    """WITH toks AS (
      | SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS tk
      | FROM documents)""".stripMargin

  /** q20: exact dedup by content digest, first-seen-wins keeper. */
  def q20DedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(documents(s, d), "doc_id", "text")
      .orderBy(col("content_hash"))

  val q20Sql: String =
    """SELECT md5(lower(text)) AS content_hash, min(doc_id) AS keeper, count(*) AS n_dups
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** q21: MinHash+LSH candidate pairs (k=8 hashes, 4 bands of 2). */
  def q21MinhashLsh(s: SparkSession, d: String): DataFrame =
    Dedup.minhashCandidates(documents(s, d), "doc_id", "text", n = 3, k = 8, rowsPerBand = 2)
      .orderBy(col("doc_a"), col("doc_b"))

  val q21Sql: String =
    tokCte +
      """,
        |sh AS (
        | SELECT DISTINCT doc_id,
        |  unnest(list_transform(range(greatest(len(tk) - 2, 0)), i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS shingle
        | FROM toks),
        |sig AS (
        | SELECT doc_id,
        |  min(md5(shingle || '#0')) AS mh0, min(md5(shingle || '#1')) AS mh1,
        |  min(md5(shingle || '#2')) AS mh2, min(md5(shingle || '#3')) AS mh3,
        |  min(md5(shingle || '#4')) AS mh4, min(md5(shingle || '#5')) AS mh5,
        |  min(md5(shingle || '#6')) AS mh6, min(md5(shingle || '#7')) AS mh7
        | FROM sh GROUP BY doc_id),
        |bands AS (
        | SELECT doc_id, 0 AS band_id, md5(mh0 || mh1) AS band_hash FROM sig
        | UNION ALL SELECT doc_id, 1, md5(mh2 || mh3) FROM sig
        | UNION ALL SELECT doc_id, 2, md5(mh4 || mh5) FROM sig
        | UNION ALL SELECT doc_id, 3, md5(mh6 || mh7) FROM sig)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin

  /** q22: 16-bit SimHash signature per document. */
  def q22Simhash(s: SparkSession, d: String): DataFrame =
    Dedup.simhash16(documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  private val simhashBitsSql: String =
    (0 until 16).map(i =>
      s"sum(cnt * (ascii(substr(h, ${i + 1}, 1)) % 2 * 2 - 1)) AS s$i").mkString(",\n  ")
  private val simhashSumSql: String =
    (0 until 16).map(i => s"CASE WHEN s$i > 0 THEN ${1 << i} ELSE 0 END").mkString(" + ")

  val q22Sql: String =
    s"""WITH tf AS (
       | SELECT doc_id, token, count(*) AS cnt, md5(token) AS h FROM (
       |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0)) AS token
       |  FROM documents)
       | GROUP BY doc_id, token),
       |bits AS (
       | SELECT doc_id,
       |  $simhashBitsSql
       | FROM tf GROUP BY doc_id)
       |SELECT doc_id, CAST($simhashSumSql AS INT) AS simhash
       |FROM bits ORDER BY doc_id""".stripMargin

  /** q38: SimHash near-dup pairs via pigeonhole banding (hamming <= 2,
    * 3 bands — any qualifying pair agrees exactly on >= 1 band, so the
    * join is a band equi-join, never a cross join). */
  def q38SimhashPairs(s: SparkSession, d: String): DataFrame =
    Dedup.simhashPairs(Dedup.simhash16(documents(s, d), "doc_id", "text"),
        "doc_id", maxDist = 2)
      .orderBy(col("doc_a"), col("doc_b"))

  val q38Sql: String = {
    val maxDist = 2; val bits = 16
    val nBands = maxDist + 1; val bandBits = bits / nBands
    val bandSelects = (0 until nBands).map { b =>
      val lo = b * bandBits
      val width = if (b == nBands - 1) bits - lo else bandBits
      s"SELECT doc_id, simhash, $b AS band_id, (simhash >> $lo) & ${(1 << width) - 1} AS band_val FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH tf AS (
       | SELECT doc_id, token, count(*) AS cnt, md5(token) AS h FROM (
       |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0)) AS token
       |  FROM documents)
       | GROUP BY doc_id, token),
       |bits AS (
       | SELECT doc_id,
       |  $simhashBitsSql
       | FROM tf GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST($simhashSumSql AS INT) AS simhash FROM bits),
       |banded AS ($bandSelects)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       | CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM banded a JOIN banded b ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDist
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** q23: exact 2-gram Jaccard >= 0.05 over shingle-sharing pairs.
    * The oracle mirrors the operator's df-cap (shingles on > 10000 docs
    * are excluded from candidates/intersection — never binding at test
    * scale, but the capped semantics are what ships, so the oracle
    * certifies them). */
  def q23NgramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccard(documents(s, d), "doc_id", "text", n = 2,
        minJaccard = 0.05, dfCap = 10000L)
      .orderBy(col("doc_a"), col("doc_b"))

  val q23Sql: String =
    tokCte +
      """,
        |sh AS (
        | SELECT DISTINCT doc_id,
        |  unnest(list_transform(range(greatest(len(tk) - 1, 0)), i -> tk[i+1] || ' ' || tk[i+2])) AS shingle
        | FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |kept AS (
        | SELECT sh.doc_id, sh.shingle FROM sh JOIN (
        |  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) BETWEEN 2 AND 10000
        | ) d USING (shingle)),
        |inter AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        | FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        | CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.05
        |ORDER BY doc_a, doc_b""".stripMargin

  /** q49: duplicate clusters — connected components over the exact
    * 2-gram-Jaccard edge list (>= 0.5), min-id keeper per cluster.
    * The pair->cluster->keeper step that completes the dedup pipeline:
    * candidates (q21/q38) -> verification (q23) -> clusters (here). */
  def q49DupClusters(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val edges = Dedup.ngramJaccard(docs, "doc_id", "text", n = 2, minJaccard = 0.5)
    val cc = Dedup.connectedComponents(docs, "doc_id", edges, "doc_a", "doc_b")
    val sizes = cc.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "label")
      .select(col("node").as("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"), (col("node") === col("label")).as("is_keeper"))
      .orderBy(col("doc_id"))
  }

  /** Min-reachable-id per node via recursive CTE == min-label propagation. */
  val q49Sql: String =
    """WITH RECURSIVE toks AS (
      | SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS tk
      | FROM documents),
      |sh AS (
      | SELECT DISTINCT doc_id,
      |  unnest(list_transform(range(greatest(len(tk) - 1, 0)), i -> tk[i+1] || ' ' || tk[i+2])) AS shingle
      | FROM toks),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (
      | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      | FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      | GROUP BY 1, 2),
      |edges AS (
      | SELECT doc_a, doc_b FROM inter
      | JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
      | WHERE CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.5),
      |sym AS (SELECT doc_a AS s, doc_b AS t FROM edges UNION ALL SELECT doc_b, doc_a FROM edges),
      |reach(node, lab) AS (
      | SELECT doc_id, doc_id FROM documents
      | UNION
      | SELECT e.t, r.lab FROM reach r JOIN sym e ON e.s = r.node),
      |comp AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node)
      |SELECT doc_id, cluster_id,
      | count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
      | doc_id = cluster_id AS is_keeper
      |FROM comp ORDER BY doc_id""".stripMargin

  /** q59: 64-bit image-pHash near-dup pairs through the SAME pigeonhole
    * band join as q38 but on the wide-signature path
    * (`Dedup.signaturePairs`, bits=60, maxDist=2 → 3 bands of 20 bits)
    * that image dedup at 100 TB runs on (`codec/ImageCodec.phash64`).
    * The corpus carries no images, so each doc gets a deterministic
    * planted pHash: a 60-bit cluster base from md5(doc_id % 50) with
    * one bit flipped for every third doc — intra-cluster hamming 0-2,
    * cross-cluster ~30. The oracle is the BRUTE-FORCE all-pairs scan,
    * so a match certifies the banded equi-join is exact (finds every
    * pair within maxDist), not merely approximate. */
  /** The deterministic planted-pHash table shared by q59/q73: a 60-bit
    * cluster base from md5(doc_id % 50), one bit flipped for every
    * third doc. */
  private[queries] def plantedPhashes(s: SparkSession, d: String): DataFrame = {
    val base = conv(substring(md5((col("doc_id") % 50).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val flip = when(col("doc_id") % 3 === 0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 60 AS INT))"))
      .otherwise(lit(0L))
    documents(s, d).select(col("doc_id"), base.bitwiseXOR(flip).as("phash"))
  }

  def q59PhashPairs(s: SparkSession, d: String): DataFrame =
    Dedup.signaturePairs(plantedPhashes(s, d), "doc_id", "phash", maxDist = 2, bits = 60)
      .orderBy(col("doc_a"), col("doc_b"))

  val q59Sql: String =
    """WITH sig AS (
      | SELECT doc_id,
      |  xor(CAST(concat('0x', substr(md5(CAST(doc_id % 50 AS VARCHAR)), 1, 15)) AS BIGINT),
      |      CASE WHEN doc_id % 3 = 0 THEN (CAST(1 AS BIGINT) << CAST(doc_id % 60 AS INT))
      |           ELSE CAST(0 AS BIGINT) END) AS phash
      | FROM documents)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      | CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
      |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.phash, b.phash)) <= 2
      |ORDER BY doc_a, doc_b""".stripMargin

  /** q73: the IMAGE dedup pipeline end-to-end — banded pHash pair join
    * (q59) → connected components → min-id keeper per visual cluster:
    * what a 100-TB image corpus runs to keep one copy of each
    * near-identical image. The oracle rebuilds it from BRUTE-FORCE
    * all-pairs Hamming + recursive-CTE reachability, certifying both
    * the banded candidate join and the O(diameter) label propagation
    * are exact. */
  def q73ImageDupClusters(s: SparkSession, d: String): DataFrame = {
    val sigs = plantedPhashes(s, d)
    val pairs = Dedup.signaturePairs(sigs, "doc_id", "phash", maxDist = 2, bits = 60)
    val cc = Dedup.connectedComponents(sigs, "doc_id", pairs, "doc_a", "doc_b")
    val sizes = cc.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "label")
      .select(col("node").as("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"), (col("node") === col("label")).as("is_keeper"))
      .orderBy(col("doc_id"))
  }

  val q73Sql: String =
    """WITH RECURSIVE sig AS (
      | SELECT doc_id,
      |  xor(CAST(concat('0x', substr(md5(CAST(doc_id % 50 AS VARCHAR)), 1, 15)) AS BIGINT),
      |      CASE WHEN doc_id % 3 = 0 THEN (CAST(1 AS BIGINT) << CAST(doc_id % 60 AS INT))
      |           ELSE CAST(0 AS BIGINT) END) AS phash
      | FROM documents),
      |edges AS (
      | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      | FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      | WHERE bit_count(xor(a.phash, b.phash)) <= 2),
      |sym AS (SELECT doc_a AS s, doc_b AS t FROM edges UNION ALL SELECT doc_b, doc_a FROM edges),
      |reach(node, lab) AS (
      | SELECT doc_id, doc_id FROM sig
      | UNION
      | SELECT e.t, r.lab FROM reach r JOIN sym e ON e.s = r.node),
      |comp AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node)
      |SELECT doc_id, cluster_id,
      | count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
      | doc_id = cluster_id AS is_keeper
      |FROM comp ORDER BY doc_id""".stripMargin

  /** q91 (T49): crop-robust image near-dup via PER-QUADRANT pHashes —
    * pairs agreeing (hamming <= 2) in >= 2 of 4 quadrants. The planted
    * table models the real failure mode whole-image pHash has: each
    * doc's 4 quadrant hashes share a 60-bit per-(cluster, quadrant)
    * base from md5, every third doc flips one bit per quadrant (sensor
    * noise), and quadrant (doc_id % 4) is REPLACED by a doc-unique hash
    * (a crop/watermark localized to that quadrant). In-cluster pairs
    * still agree in the >= 2 untouched quadrants; a full-64-bit hash
    * would be ~15 bits apart and missed. Oracle is brute-force
    * all-pairs over all quadrants, certifying the per-quadrant banded
    * join is exact. */
  private[queries] def plantedQuadPhashes(s: SparkSession, d: String): DataFrame = {
    val q = explode(sequence(lit(0), lit(3))).as("quad")
    documents(s, d).select(col("doc_id"), q)
      .select(col("doc_id"), col("quad"),
        when(col("doc_id") % 4 === col("quad"),
          conv(substring(md5(concat(lit("x"), col("doc_id").cast("string"),
              lit("-"), col("quad").cast("string"))), 1, 15), 16, 10)
            .cast("long"))
        .otherwise(
          conv(substring(md5(concat((col("doc_id") % 50).cast("string"),
              lit("-"), col("quad").cast("string"))), 1, 15), 16, 10)
            .cast("long")
            .bitwiseXOR(when(col("doc_id") % 3 === 0,
                expr("shiftleft(CAST(1 AS BIGINT), CAST((doc_id + quad) % 60 AS INT))"))
              .otherwise(lit(0L))))
        .as("phash"))
  }

  def q91QuadPhash(s: SparkSession, d: String): DataFrame =
    Dedup.quadrantSignaturePairs(plantedQuadPhashes(s, d), "doc_id", "quad",
        "phash", maxDist = 2, bits = 60, minAgree = 2)
      .orderBy(col("doc_a"), col("doc_b"))

  val q91Sql: String =
    """WITH sig AS (
      | SELECT d.doc_id, t.quad,
      |  CASE WHEN d.doc_id % 4 = t.quad
      |   THEN CAST(concat('0x', substr(md5('x' || d.doc_id || '-' || t.quad), 1, 15)) AS BIGINT)
      |   ELSE xor(
      |    CAST(concat('0x', substr(md5((d.doc_id % 50) || '-' || t.quad), 1, 15)) AS BIGINT),
      |    CASE WHEN d.doc_id % 3 = 0
      |         THEN (CAST(1 AS BIGINT) << CAST((d.doc_id + t.quad) % 60 AS INT))
      |         ELSE CAST(0 AS BIGINT) END)
      |  END AS phash
      | FROM documents d, range(4) t(quad))
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_quads_agree
      |FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND a.quad = b.quad
      |WHERE bit_count(xor(a.phash, b.phash)) <= 2
      |GROUP BY 1, 2
      |HAVING count(*) >= 2
      |ORDER BY doc_a, doc_b""".stripMargin

  /** q25: embedding near-dup — BUCKETED top-1 cosine neighbor per
    * vector (sign-LSH bucket equi-join, the scale path; fixed-point dot
    * product, bit-identical across engines). The brute-force all-pairs
    * NN ([[Similarity.nearestNeighbor]]) is the test oracle for the
    * bucketed operator (SimilaritySpec), not a driver query: a corpus
    * cross join is not a 100-TB plan. 4 planes = 16 buckets — wide
    * enough that bucketing binds at sf0.01, coarse enough that most
    * vectors keep a candidate. */
  def q25EmbedNearest(s: SparkSession, d: String): DataFrame =
    Similarity.lshNearestNeighbor(embeddings(s, d), "vec_id", "embedding",
        dim = 64, nPlanes = 4)
      .orderBy(col("vec_id"))

  val q25Sql: String = {
    val dim = 64; val nPlanes = 4
    // Same md5-derived hyperplanes as Similarity.signLshBucket (the q39
    // pattern), embedded as list literals so DuckDB computes identical
    // buckets.
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
       |b AS (SELECT vec_id, s, n2, CAST($bucketTerms AS INT) AS bucket FROM n),
       |sims AS (
       | SELECT a.vec_id AS vec_id, c.vec_id AS nn_id,
       |  CAST(list_sum(list_transform(range($dim), i -> a.s[i+1] * c.s[i+1])) AS DOUBLE)
       |    / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS sim
       | FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id),
       |ranked AS (
       | SELECT vec_id, nn_id, sim,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nn_id) AS rn
       | FROM sims)
       |SELECT vec_id, nn_id, sim FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin
  }

  /** q94 (T52): mirror-host detection. Six synthesized hosts share a
    * 40-key content pool (a key reaches host h iff key ≡ h mod 2, so
    * same-parity hosts mirror each other and opposite-parity hosts
    * share nothing); every 7th page is unique content, shrinking the
    * Jaccard below 1 without touching candidate generation. Exact
    * integer ppm so the threshold is engine-stable. */
  def q94MirrorHosts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val key = when($"doc_id" % 7 === 0, concat(lit("u"), $"doc_id".cast("string")))
      .otherwise(($"doc_id" % 40).cast("string"))
    val pages = documents(s, d).select(
      concat(lit("h"), ($"doc_id" % 6).cast("string")).as("host"),
      md5(key).as("digest"))
    Dedup.mirrorHostPairs(pages, "host", "digest",
        dfCap = 6L, minJaccardPpm = 200000L)
      .orderBy($"host_a", $"host_b")
  }

  val q94Sql: String =
    """WITH hd AS (
      | SELECT DISTINCT concat('h', doc_id % 6) AS host,
      |  md5(CASE WHEN doc_id % 7 = 0 THEN concat('u', doc_id)
      |           ELSE CAST(doc_id % 40 AS VARCHAR) END) AS digest
      | FROM documents),
      |sizes AS (SELECT host, count(*) AS n_pages FROM hd GROUP BY host),
      |dfreq AS (
      | SELECT digest FROM hd GROUP BY digest
      | HAVING count(*) >= 2 AND count(*) <= 6),
      |kept AS (SELECT hd.host, hd.digest FROM hd JOIN dfreq USING (digest)),
      |pairs AS (
      | SELECT a.host AS host_a, b.host AS host_b, count(*) AS shared
      | FROM kept a JOIN kept b ON a.digest = b.digest AND a.host < b.host
      | GROUP BY 1, 2)
      |SELECT host_a, host_b, shared, sa.n_pages AS n_a, sb.n_pages AS n_b,
      | (shared * 1000000) // (sa.n_pages + sb.n_pages - shared) AS jaccard_ppm
      |FROM pairs
      |JOIN sizes sa ON sa.host = pairs.host_a
      |JOIN sizes sb ON sb.host = pairs.host_b
      |WHERE (shared * 1000000) // (sa.n_pages + sb.n_pages - shared) >= 200000
      |ORDER BY host_a, host_b""".stripMargin

  /** q101: asymmetric 2-gram containment (Broder) >= 40% in either
    * direction — catches short-doc-inside-long-doc dups that symmetric
    * Jaccard (q23) under-scores. */
  def q101Containment(s: SparkSession, d: String): DataFrame =
    Dedup.containment(documents(s, d), "doc_id", "text", n = 2,
        minContainPpm = 400000L, dfCap = 10000L)
      .orderBy(col("doc_a"), col("doc_b"))

  val q101Sql: String =
    tokCte +
      """,
        |sh AS (
        | SELECT DISTINCT doc_id,
        |  unnest(list_transform(range(greatest(len(tk) - 1, 0)), i -> tk[i+1] || ' ' || tk[i+2])) AS shingle
        | FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |kept AS (
        | SELECT sh.doc_id, sh.shingle FROM sh JOIN (
        |  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) BETWEEN 2 AND 10000
        | ) d USING (shingle)),
        |inter AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        | FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        | GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_inter,
        | (n_inter * 1000000) // sa.sz AS cont_a_in_b_ppm,
        | (n_inter * 1000000) // sb.sz AS cont_b_in_a_ppm
        |FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE greatest((n_inter * 1000000) // sa.sz, (n_inter * 1000000) // sb.sz) >= 400000
        |ORDER BY doc_a, doc_b""".stripMargin

  /** q104 (T62): incremental dedup — the batch (doc_id % 11 = 3)
    * against the rest of the corpus. Candidates from a batch-vs-corpus
    * band join (never a corpus self-join), exact 3-gram Jaccard >= 0.5
    * verification restricted to the candidates, and a per-batch-doc
    * keep/drop verdict — the decision a recurring ingest actually
    * emits. */
  def q104IncrementalDedup(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val batch = docs.filter(col("doc_id") % 11 === 3)
    val corpus = docs.filter(col("doc_id") % 11 =!= 3)
    val cands = Dedup.incrementalCandidates(batch, corpus, "doc_id", "text",
      n = 3, k = 8, rowsPerBand = 2)
    val verified = Dedup.jaccardForPairs(docs, "doc_id", "text", n = 3,
      cands, "batch_id", "corpus_id")
    val perDoc = cands.groupBy(col("batch_id"))
      .agg(countDistinct(col("corpus_id")).as("n_candidates"))
    val dupCounts = verified.filter(col("jaccard_ppm") >= 500000)
      .groupBy(col("batch_id")).agg(count(lit(1)).as("n_dups"))
    batch.select(col("doc_id"))
      .join(perDoc.withColumnRenamed("batch_id", "doc_id"), Seq("doc_id"), "left")
      .join(dupCounts.withColumnRenamed("batch_id", "doc_id"), Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_candidates", "n_dups"))
      .withColumn("kept", col("n_dups") === 0)
      .orderBy(col("doc_id"))
  }

  val q104Sql: String =
    tokCte +
      """,
        |sh AS (
        | SELECT DISTINCT doc_id,
        |  unnest(list_transform(range(greatest(len(tk) - 2, 0)), i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])) AS shingle
        | FROM toks),
        |sig AS (
        | SELECT doc_id,
        |  min(md5(shingle || '#0')) AS mh0, min(md5(shingle || '#1')) AS mh1,
        |  min(md5(shingle || '#2')) AS mh2, min(md5(shingle || '#3')) AS mh3,
        |  min(md5(shingle || '#4')) AS mh4, min(md5(shingle || '#5')) AS mh5,
        |  min(md5(shingle || '#6')) AS mh6, min(md5(shingle || '#7')) AS mh7
        | FROM sh GROUP BY doc_id),
        |bands AS (
        | SELECT doc_id, 0 AS band_id, md5(mh0 || mh1) AS band_hash FROM sig
        | UNION ALL SELECT doc_id, 1, md5(mh2 || mh3) FROM sig
        | UNION ALL SELECT doc_id, 2, md5(mh4 || mh5) FROM sig
        | UNION ALL SELECT doc_id, 3, md5(mh6 || mh7) FROM sig),
        |cand AS (
        | SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS corpus_id
        | FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
        | WHERE a.doc_id % 11 = 3 AND b.doc_id % 11 <> 3),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (
        | SELECT c.batch_id, c.corpus_id, count(*) AS n_inter
        | FROM cand c
        | JOIN sh a ON a.doc_id = c.batch_id
        | JOIN sh b ON b.doc_id = c.corpus_id AND b.shingle = a.shingle
        | GROUP BY 1, 2),
        |verified AS (
        | SELECT batch_id, count(*) AS n_dups
        | FROM inter JOIN sizes sa ON sa.doc_id = batch_id JOIN sizes sb ON sb.doc_id = corpus_id
        | WHERE (n_inter * 1000000) // (sa.sz + sb.sz - n_inter) >= 500000
        | GROUP BY 1),
        |ncand AS (SELECT batch_id, count(DISTINCT corpus_id) AS n_candidates FROM cand GROUP BY 1)
        |SELECT d.doc_id,
        | coalesce(ncand.n_candidates, 0) AS n_candidates,
        | coalesce(verified.n_dups, 0) AS n_dups,
        | coalesce(verified.n_dups, 0) = 0 AS kept
        |FROM documents d
        |LEFT JOIN ncand ON ncand.batch_id = d.doc_id
        |LEFT JOIN verified ON verified.batch_id = d.doc_id
        |WHERE d.doc_id % 11 = 3
        |ORDER BY d.doc_id""".stripMargin

  /** q110 (T68): quality-aware canonical retention over the q49
    * duplicate clusters — keep the LONGEST member (token count, ties →
    * smaller id) instead of q49's arbitrary min-id keeper, and weight
    * every member 1/cluster_size ppm for soft dedup. Same recursive-CTE
    * reachability oracle as q49 + an argmax window. */
  def q110CanonicalDedup(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val edges = Dedup.ngramJaccard(docs, "doc_id", "text", n = 2, minJaccard = 0.5)
    val cc = Dedup.connectedComponents(docs, "doc_id", edges, "doc_a", "doc_b")
    val quality = docs.select(col("doc_id"),
      size(graft.ops.TextAnalysis.tokensCol(col("text"))).as("n_tok"))
    Dedup.retainCanonical(cc, "node", "label", quality, "doc_id", col("n_tok"))
      .select(col("node").as("doc_id"), col("cluster_id"), col("quality"),
        col("cluster_size"), col("is_canonical"), col("weight_ppm"))
      .orderBy(col("doc_id"))
  }

  val q110Sql: String =
    """WITH RECURSIVE toks AS (
      | SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS tk
      | FROM documents),
      |sh AS (
      | SELECT DISTINCT doc_id,
      |  unnest(list_transform(range(greatest(len(tk) - 1, 0)), i -> tk[i+1] || ' ' || tk[i+2])) AS shingle
      | FROM toks),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (
      | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      | FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      | GROUP BY 1, 2),
      |edges AS (
      | SELECT doc_a, doc_b FROM inter
      | JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
      | WHERE CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.5),
      |sym AS (SELECT doc_a AS s, doc_b AS t FROM edges UNION ALL SELECT doc_b, doc_a FROM edges),
      |reach(node, lab) AS (
      | SELECT doc_id, doc_id FROM documents
      | UNION
      | SELECT e.t, r.lab FROM reach r JOIN sym e ON e.s = r.node),
      |comp AS (SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node),
      |m AS (
      | SELECT comp.doc_id, comp.cluster_id, CAST(len(tk) AS BIGINT) AS quality
      | FROM comp JOIN toks USING (doc_id)),
      |best AS (
      | SELECT cluster_id, doc_id AS best FROM (
      |  SELECT cluster_id, doc_id, row_number() OVER (PARTITION BY cluster_id ORDER BY quality DESC, doc_id) AS rn
      |  FROM m) WHERE rn = 1),
      |st AS (SELECT cluster_id, count(*) AS cluster_size FROM m GROUP BY cluster_id)
      |SELECT m.doc_id, m.cluster_id, m.quality, st.cluster_size,
      | m.doc_id = best.best AS is_canonical,
      | CAST(1000000 // st.cluster_size AS INT) AS weight_ppm
      |FROM m JOIN st USING (cluster_id) JOIN best USING (cluster_id)
      |ORDER BY m.doc_id""".stripMargin
}
