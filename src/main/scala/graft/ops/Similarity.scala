package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over embedding columns (`Array[Float]`).
 *
 * Determinism: embeddings are scaled to 2^20-fixed-point longs before
 * the dot product, so dot and norms are exact integers (float→double is
 * exact; ×2^20 is exact; products ≤2^48 fit a long) and the resulting
 * cosine is bit-identical across engines and partition orders. sqrt is
 * IEEE-754 correctly rounded, so the final double is too.
 *
 * Scale path: brute-force top-k is the correctness baseline (cross join
 * — O(Q·N), fine for small Q). The LSH-bucketed variant (`lshCosine*`)
 * hashes vectors to sign-buckets over md5-derived pseudo-random
 * hyperplanes; the join is then bucket-equi, bounding the shuffle the
 * same way MinHash-LSH does for text.
 */
object Similarity {

  private val Scale = 1048576L // 2^20

  /** Fixed-point scaled copy of an Array[Float] embedding column. */
  def scaledCol(emb: Column): Column =
    transform(emb, v => round(v.cast("double") * Scale).cast("long"))

  /** Exact integer dot product of two scaled vectors — a native codegen
    * expression ([[graft.functions.LongDot]]): the declarative
    * aggregate(zip_with) form runs interpreted (higher-order functions
    * have no codegen) and dominated the IVF assignment's
    * |corpus|×|centroids| dot products. Same ascending-index long
    * accumulation, bit-identical results. */
  def dotCol(a: Column, b: Column): Column =
    graft.functions.LongDot.column(a, b)

  /** Squared L2 norm (exact integer) of a scaled vector. */
  def norm2Col(a: Column): Column =
    graft.functions.LongDot.column(a, a)

  /** Adds `scaled` and `norm2` columns. */
  def withScaled(df: DataFrame, emb: String): DataFrame = {
    val sc = scaledCol(col(emb))
    df.withColumn("scaled", sc).withColumn("norm2", norm2Col(col("scaled")))
  }

  /** Deterministic cosine similarity between two pre-scaled rows. */
  def cosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double")))

  /**
   * Brute-force cosine top-k: for each query row, the k nearest
   * non-self candidates, ranked (sim DESC, candidate id ASC).
   */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, id: String,
                     emb: String, k: Int): DataFrame = {
    val q = withScaled(queries, emb)
      .select(col(id).as("query_id"), col("scaled").as("q_scaled"), col("norm2").as("q_norm2"))
    val c = withScaled(candidates, emb)
      .select(col(id).as("neighbor_id"), col("scaled").as("c_scaled"), col("norm2").as("c_norm2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(dotCol(col("q_scaled"), col("c_scaled")), col("q_norm2"), col("c_norm2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Exact nearest-neighbor per row — TEST ORACLE ONLY. This is the
    * corpus cross join (O(N²) candidate rows): it certifies
    * [[lshNearestNeighbor]] on small data the way the brute-force pair
    * scan certifies the pHash band join (q59), and must never be the
    * default at corpus scale. Production near-dup goes through the
    * bucketed [[lshNearestNeighbor]] / [[ivfTopK]] / [[semanticDedup]]
    * scale paths. */
  def nearestNeighbor(df: DataFrame, id: String, emb: String): DataFrame =
    bruteForceTopK(df, df, id, emb, k = 1)
      .select(col("query_id").as(id), col("neighbor_id").as("nn_id"), col("sim"))

  /** Bucketed top-1 embedding near-dup — the DEFAULT near-dup operator:
    * sign-LSH bucket assignment (the [[signLshBucket]] machinery), then
    * top-1 cosine within the bucket (sim DESC, id ASC). The join is a
    * bucket equi-join — shuffle bounded by bucket sizes, never all-pairs
    * across the corpus. A vector alone in its bucket emits no row (no
    * candidate ⇒ not a near-dup), which is the semantics a dedup
    * pipeline wants; recall is governed by `nPlanes` (fewer planes →
    * bigger buckets → higher recall, more compare work).
    *
    * The bucketed projection is materialized ONCE (localCheckpoint)
    * before the self-join so Catalyst cannot inline the
    * scale + norm + plane math into both sides. */
  def lshNearestNeighbor(df: DataFrame, id: String, emb: String,
                         dim: Int, nPlanes: Int): DataFrame = {
    val b = signLshBucket(df, id, emb, dim, nPlanes)
      .select(col("bucket"), col(id), col("scaled"), col("norm2"))
      .localCheckpoint()
    val a = b.select(col("bucket"), col(id).as("query_id"),
      col("scaled").as("sa"), col("norm2").as("na"))
    val c = b.select(col("bucket"), col(id).as("nn_id"),
      col("scaled").as("sb"), col("norm2").as("nb"))
    a.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("nn_id"))
      .withColumn("sim", cosine(dotCol(col("sa"), col("sb")), col("na"), col("nb")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("nn_id"))))
      .filter(col("rn") === 1)
      .select(col("query_id").as(id), col("nn_id"), col("sim"))
  }

  /**
   * Sign-LSH bucket assignment: `nPlanes` pseudo-random hyperplanes with
   * md5-derived ±1 components; bucket = bit-packed signs of the
   * projections. Vectors in the same bucket are near-duplicate
   * candidates — at scale the cross join becomes a bucket equi-join.
   */
  /** Hyperplane `p`'s ±1 sign components (deterministic, tiny — built on
    * the driver and embedded as literals): component i = +1 if
    * md5("p:i")'s first byte is odd else -1. Shared by [[signLshBucket]]
    * and the cross-modal query-side bucketing
    * ([[Multimodal.crossModalSearch]]) so text queries land in the same
    * buckets as the images they probe. */
  def planeArray(p: Int, dim: Int): Array[Long] =
    (0 until dim).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$p:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1L else -1L
    }.toArray

  def signLshBucket(df: DataFrame, id: String, emb: String, dim: Int, nPlanes: Int): DataFrame = {
    val scaled = withScaled(df, emb)
    val planeArrays = (0 until nPlanes).map(p => planeArray(p, dim))
    val bucketExpr = (0 until nPlanes).map { p =>
      val plane = array(planeArrays(p).map(lit(_)).toIndexedSeq: _*)
      when(dotCol(col("scaled"), plane) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    scaled.withColumn("bucket", bucketExpr.cast("int"))
  }

  /**
   * IVF-Flat ANN: a deterministic coarse quantizer (every `centEvery`-th
   * vector is a centroid — the k-means-free data-sampled variant)
   * partitions vectors into cells; a query probes its `nProbe` nearest
   * cells and ranks ONLY those inverted lists. At scale: assignment is
   * a broadcast join against K ≪ N centroids followed by one map-side
   * argmax aggregation; the probe is a cell equi-join, so the shuffle
   * is bounded by cell sizes (like LSH bands) while recall is governed
   * by nProbe rather than hash collisions.
   */
  /** Data-sampled coarse centroids (every `centEvery`-th vector — the
    * k-means-free deterministic quantizer). */
  private def centroidsOf(base: DataFrame, id: String, centEvery: Int): DataFrame =
    base.filter(col(id) % centEvery === 0)
      .select(col(id).as("cid"), col("scaled").as("cs"), col("norm2").as("cn2"))

  private def simToCent: Column =
    cosine(dotCol(col("scaled"), col("cs")), col("norm2"), col("cn2"))

  /** Cell assignment: argmax centroid similarity, ties -> smaller cid.
    * max(struct(sim, -cid)) is a map-side-combinable aggregate — no
    * window shuffle over the full vector set; the centroid table
    * broadcasts (K ≪ N). */
  private def cellAssign(base: DataFrame, id: String, cents: DataFrame): DataFrame =
    base.crossJoin(broadcast(cents))
      .withColumn("sim_c", simToCent)
      .groupBy(col(id))
      .agg(max(struct(col("sim_c"), (-col("cid")).as("ncid"))).as("m"))
      .select(col(id), (-col("m.ncid")).as("cell"))

  def ivfTopK(df: DataFrame, id: String, emb: String, centEvery: Int,
              nProbe: Int, querySel: Column, k: Int): DataFrame = {
    // (id, scaled, norm2) is consumed by four subtrees (centroid pick,
    // assignment, cell side of the probe join, query side); materialize
    // it once — the IVF staging table every real ANN index keeps anyway.
    val base = withScaled(df, emb).select(col(id), col("scaled"), col("norm2"))
      .localCheckpoint()
    val cents = centroidsOf(base, id, centEvery)
    val assigned = cellAssign(base, id, cents)
    val cells = base.join(assigned, id)
    val qprobe = base.filter(querySel)
      .crossJoin(broadcast(cents))
      .withColumn("sim_c", simToCent)
      .withColumn("pr", row_number().over(
        Window.partitionBy(col(id)).orderBy(col("sim_c").desc, col("cid"))))
      .filter(col("pr") <= nProbe)
      .select(col(id).as("query_id"), col("scaled").as("qs"), col("norm2").as("qn2"),
        col("cid").as("cell"))
    // each vector lives in exactly one cell and probed cells are distinct,
    // so a (query, neighbor) pair appears at most once — no dedup needed
    qprobe
      .join(cells.select(col(id).as("neighbor_id"), col("scaled").as("ns"),
        col("norm2").as("nn2"), col("cell")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(dotCol(col("qs"), col("ns")), col("qn2"), col("nn2")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("sim"))
  }

  /**
   * SemDeDup-style semantic dedup (Abbas et al. 2023, public): vectors
   * are assigned to IVF cells (broadcast argmax over data-sampled
   * centroids, shared with `ivfTopK`), and a vector is a semantic
   * duplicate iff some LOWER-id vector in the SAME cell has cosine >=
   * `minSim`; `dup_of` is the smallest such id, so exactly one
   * representative per near-dup group survives (`is_dup = false`).
   *
   * Scale: assignment is broadcast + map-side argmax; the pair join is
   * a cell equi-join bounded by cell sizes — never all-pairs across the
   * corpus. The cell table is materialized once (localCheckpoint) so
   * the self-join does not recompute scaling/assignment per side; on a
   * cluster the same effect comes from staging the assignment table.
   */
  def semanticDedup(df: DataFrame, id: String, emb: String, centEvery: Int,
                    minSim: Double): DataFrame = {
    val base = withScaled(df, emb).select(col(id), col("scaled"), col("norm2"))
      .localCheckpoint()
    val cents = centroidsOf(base, id, centEvery)
    val cells = base.join(cellAssign(base, id, cents), id).localCheckpoint()
    val a = cells.select(col("cell"), col(id).as("lo"), col("scaled").as("sa"), col("norm2").as("na"))
    val b = cells.select(col("cell"), col(id).as("hi"), col("scaled").as("sb"), col("norm2").as("nb"))
    val dupOf = a.join(b, Seq("cell"))
      .filter(col("lo") < col("hi"))
      .withColumn("sim", cosine(dotCol(col("sa"), col("sb")), col("na"), col("nb")))
      .filter(col("sim") >= minSim)
      .groupBy(col("hi")).agg(min(col("lo")).as("dup_of"))
    cells.select(col(id), col("cell"))
      .join(dupOf.withColumnRenamed("hi", id), Seq(id), "left")
      .withColumn("is_dup", col("dup_of").isNotNull)
  }

  /**
   * Symmetric per-vector int8 quantization (the standard vector-index
   * compression: FAISS SQ8 / scalar quantization, public). Each vector
   * gets `qscale = max|v| / 127` and `q[i] = round(v[i] / qscale)` in
   * [-127, 127], stored as `array<tinyint>` — 4× smaller than float32,
   * which at 100-TB corpus scale is the difference between an ANN index
   * that fits executor memory and one that doesn't.
   *
   * Determinism: float→double is exact, the division and round are
   * single IEEE ops, so `q` and `qscale` are bit-identical across
   * engines — no rounding fudge needed in the oracle. Zero vectors
   * quantize to zeros (qscale 0 guard).
   */
  def quantizeInt8(df: DataFrame, emb: String): DataFrame = {
    val vd = transform(col(emb), v => v.cast("double"))
    df.withColumn("qscale", array_max(transform(vd, v => abs(v))) / 127d)
      .withColumn("q",
        when(col("qscale") === 0d, transform(col(emb), _ => lit(0).cast("byte")))
          .otherwise(transform(vd, v => round(v / col("qscale")).cast("byte"))))
  }

  /**
   * Brute-force cosine top-k over int8-QUANTIZED vectors: per-vector
   * scales cancel in the cosine (dot(qa,qb)·sa·sb / (‖qa‖sa · ‖qb‖sb)),
   * so the quantized similarity is pure integer math + sqrt — exactly
   * oracle-checkable like the float path, at 1/4 the vector bytes. The
   * byte arrays run through the same codegen `long_dot` kernel.
   */
  def quantizedTopK(df: DataFrame, id: String, emb: String,
                    querySel: Column, k: Int): DataFrame = {
    // materialize the quantized table ONCE before the self-join —
    // without it Catalyst inlines the quantize + norm subtree into both
    // join sides and scans the corpus twice (the q21-class recompute)
    val qz = quantizeInt8(df, emb)
      .select(col(id), col("q"), norm2Col(col("q")).as("qn2"))
      .localCheckpoint()
    val q = qz.filter(querySel)
      .select(col(id).as("query_id"), col("q").as("qa"), col("qn2").as("na"))
    val c = qz.select(col(id).as("neighbor_id"), col("q").as("qb"), col("qn2").as("nb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qsim").desc, col("neighbor_id"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("qsim", cosine(dotCol(col("qa"), col("qb")), col("na"), col("nb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("qsim"))
  }

  /** LSH-bucketed near-dup pairs: same bucket, cosine >= minSim.
    *
    * The bucketed projection is materialized ONCE (localCheckpoint)
    * before the self-join — without it Catalyst inlines the
    * scale + norm + nPlanes-dot-product bucket subtree into both join
    * sides (2 full scans and 2× the plane math). On a cluster the same
    * effect comes from persisting or staging the bucket table. */
  def lshCosinePairs(df: DataFrame, id: String, emb: String, dim: Int,
                     nPlanes: Int, minSim: Double): DataFrame = {
    val b = signLshBucket(df, id, emb, dim, nPlanes)
      .select(col("bucket"), col(id), col("scaled"), col("norm2"))
      .localCheckpoint()
    val a = b.select(col("bucket"), col(id).as("vec_a"), col("scaled").as("sa"), col("norm2").as("na"))
    val c = b.select(col("bucket"), col(id).as("vec_b"), col("scaled").as("sb"), col("norm2").as("nb"))
    a.join(c, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", cosine(dotCol(col("sa"), col("sb")), col("na"), col("nb")))
      .filter(col("sim") >= minSim)
      .select(col("vec_a"), col("vec_b"), col("sim"))
  }

  /**
   * Lloyd's k-means over the 2^20 fixed-point grid — the trained
   * refinement of [[ivfTopK]]'s data-sampled coarse quantizer (FAISS
   * trains its IVF centroids the same way; reference analogue: the
   * index build step, `indexer/indexer_node.py:91-98`, is where the
   * reference's only "model fit" lives).
   *
   * Determinism (both engines, any partition order): vectors and
   * centroids are integer-scaled, so squared L2 distances are exact
   * integers; assignment ties break to the smaller cid via
   * `array_min` over `(dist2, cid)` structs; re-centering sums are
   * integer and the per-dimension mean uses TRUNCATING division
   * (Scala `Long./`, = DuckDB `//`, = Spark `div`), so new centroids
   * land back on the integer grid bit-identically. Init = the k
   * smallest-id vectors. A cell that loses every member keeps its
   * previous centroid (mirrored in the oracle with COALESCE).
   *
   * Scale: each round is ONE corpus scan (assignment against k
   * LITERAL centroid arrays — k·dim longs, collected to the driver
   * like bpeMerges' vocab-sized per-round top-1) and ONE
   * k-row-wide groupBy whose 64 elementwise sums partial-aggregate
   * map-side; no window, no N×N join, rounds ≪ 10. The distance
   * kernel is the codegen [[graft.functions.LongDot]] expansion
   * dist2 = n2x − 2·dot + n2c, so assignment stays inside
   * whole-stage codegen.
   *
   * Large k: the literal argmin embeds k·dim long literals per
   * alternative — past a few hundred centroids the generated method
   * outgrows the JVM/codegen limits (Spark falls back to interpreted)
   * and the plan itself balloons. Above `literalMaxK` (default 128,
   * the coarse-quantizer regime where the codegen win is real)
   * assignment switches to a broadcast join against a k-row centroid
   * table (the [[ivfTopK]] cellAssign shape): dist2 per (vector,
   * centroid) pair, then a map-side-combinable `min(struct(dist2,
   * cid))` argmin — same exact integers, same smaller-cid tie-break,
   * bit-identical cells, k bounded only by broadcast size (k·dim·8
   * bytes — a 65k×64 codebook is 33 MB).
   */
  // Empirically pinned (r6, sf0.1 embeddings, dim 64, 1 round + final
  // assignment, local[32] — VERDICT r5 item 6): literal vs join path
  // k=64: 1.21/1.20 s; k=128: 1.26/1.03 s; k=256: 2.83/1.47 s (the
  // literal plan's generated method now fails Janino compilation —
  // InternalCompilerException — and runs interpreted); k=512:
  // 3.95/1.28 s. Codegen blowup onset sits between 128 and 256, so 128
  // stays the default; raising it is never a win at dim 64.
  private[graft] val DefaultLiteralMaxK = 128

  def kmeansCentroids(df: DataFrame, id: String, emb: String, k: Int,
                      rounds: Int,
                      literalMaxK: Int = DefaultLiteralMaxK): Array[Array[Long]] = {
    val base = withScaled(df, emb).select(col(id), col("scaled"), col("norm2"))
    val dim = base.select(size(col("scaled"))).head().getInt(0)
    var cents: Array[Array[Long]] = base.orderBy(col(id)).select(col("scaled"))
      .head(k)
      .map(_.getSeq[Long](0).toArray)
    for (_ <- 1 to rounds) {
      // assignment + recenter in ONE corpus scan (literal path: the
      // argmin struct is a projection) or scan + broadcast join (large
      // k); either way the dim sums partial-aggregate map-side into k
      // rows
      val assigned =
        if (cents.length <= literalMaxK)
          base.select(col("scaled"), minCellStruct(cents).getField("cid").as("cell"))
        else
          joinAssign(base, id, cents).select(col("scaled"), col("cell"))
      val sums = assigned
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("cnt"),
          (0 until dim).map(i => sum(col("scaled").getItem(i)).as(s"s$i")): _*)
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), (0 until dim).map(i => r.getLong(2 + i)).toArray))
        .toMap
      cents = cents.zipWithIndex.map { case (old, c) =>
        sums.get(c).map { case (cnt, sv) => sv.map(_ / cnt) }.getOrElse(old)
      }
    }
    cents
  }

  /** Broadcast-join cell assignment for large k (see [[kmeansCentroids]]):
    * returns (id, scaled, cell:int, dist2:bigint). The k-row centroid
    * table broadcasts; the per-id argmin is `min(struct(dist2, cid))` —
    * map-side combinable, ties to the smaller cid exactly like
    * [[minCellStruct]]'s `array_min`. `first(scaled)` is deterministic:
    * every joined row of an id carries the same scaled vector. */
  private def joinAssign(base: DataFrame, id: String,
                         cents: Array[Array[Long]]): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val cdf = cents.zipWithIndex
      .map { case (c, cid) => (cid, c.toSeq, c.map(x => x * x).sum) }
      .toSeq.toDF("cid", "cs", "cn2")
    base.crossJoin(broadcast(cdf))
      .withColumn("dist2",
        col("norm2") - lit(2L) * dotCol(col("scaled"), col("cs")) + col("cn2"))
      .groupBy(col(id))
      .agg(min(struct(col("dist2"), col("cid"))).as("m"),
        first(col("scaled")).as("scaled"))
      .select(col(id), col("scaled"), col("m.cid").as("cell"),
        col("m.dist2").as("dist2"))
  }

  /** Exact-integer argmin over literal centroids: a struct column
    * (dist2, cid) — `array_min` is the engine-neutral tie-break
    * (smaller cid wins at equal distance). */
  private def minCellStruct(cents: Array[Array[Long]]): Column = {
    val alts = cents.zipWithIndex.map { case (c, cid) =>
      val cLit = typedLit(c.toSeq)
      val cn2 = c.map(x => x * x).sum
      val d2 = col("norm2") - lit(2L) * dotCol(col("scaled"), cLit) + lit(cn2)
      struct(d2.as("dist2"), lit(cid).as("cid"))
    }
    array_min(array(alts.toIndexedSeq: _*))
  }

  /** Final k-means cell assignment after `rounds` Lloyd iterations:
    * (id, cell:int, dist2:bigint) for every vector. Chooses the literal
    * or broadcast-join assignment path by `literalMaxK` exactly like
    * [[kmeansCentroids]] — both paths are bit-identical. */
  def kmeansAssign(df: DataFrame, id: String, emb: String, k: Int,
                   rounds: Int,
                   literalMaxK: Int = DefaultLiteralMaxK): DataFrame = {
    val cents = kmeansCentroids(df, id, emb, k, rounds, literalMaxK)
    val base = withScaled(df, emb).select(col(id), col("scaled"), col("norm2"))
    if (cents.length <= literalMaxK)
      base.select(col(id), minCellStruct(cents).as("m"))
        .select(col(id), col("m.cid").as("cell"), col("m.dist2").as("dist2"))
    else
      joinAssign(base, id, cents).select(col(id), col("cell"), col("dist2"))
  }
}
