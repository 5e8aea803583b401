package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-plan audits: the 100-TB posture is a property of the PLAN,
 * not the output, so these assertions pin it — filters reach the
 * parquet scan, small dims broadcast, top-k avoids full sorts, and the
 * LSH self-join never re-scans the corpus (the round-1 8x-recompute
 * regression, VERDICT.md "What's wrong" #2, stays dead).
 */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q12: filter + projection push into the parquet scan") {
    val p = plan("q12_scan_prune")
    assert(p.contains("PushedFilters: ["), s"no pushed filters:\n$p")
    assert(p.contains("l_shipdate"), "shipdate predicate not pushed")
    // projection pruning: the scan schema must NOT include unused wide columns
    assert(!p.contains("l_comment"), "scan reads unused columns")
  }

  test("q02: dimension joins broadcast, fact scan stays shuffle-free on dims") {
    val p = plan("q02_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("q07: global top-k plans TakeOrderedAndProject (no full sort)") {
    val p = plan("q07_topk")
    assert(p.contains("TakeOrderedAndProject"), s"top-k fell back to a full sort:\n$p")
  }

  test("q21: MinHash LSH self-join scans `documents` at most once") {
    // the signature table is materialized (localCheckpoint) before the
    // band self-join; an inlined plan re-scans documents once per band
    // per side (16 scans at k=8/rowsPerBand=2 — 94% of the round-1 bench)
    val p = plan("q21_minhash_lsh")
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans <= 1, s"q21 scans documents $scans times:\n${p.take(2000)}")
  }

  test("q34: BM25 top-k keeps stats broadcast and plans TakeOrderedAndProject") {
    val p = plan("q34_bm25_search")
    assert(p.contains("TakeOrderedAndProject") || p.contains("GlobalLimit"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
  }

  test("q39/q45: ANN scale paths join the materialized table, not the corpus") {
    // lshCosinePairs/ivfTopK localCheckpoint their (id, scaled, norm2[,
    // bucket]) projections before self-joining: the executed plan must
    // read the materialized RDD on every side and never re-scan the
    // embeddings parquet (the q21-class re-compute regression for vectors)
    for (name <- Seq("q39_lsh_cosine_pairs", "q45_ivf_ann")) {
      val p = plan(name)
      val scans = "Scan parquet".r.findAllIn(p).length
      assert(scans == 0, s"$name re-scans the corpus $scans times:\n${p.take(2000)}")
    }
  }

  test("q25: default embedding near-dup is bucket equi-joined, never all-pairs") {
    // lshNearestNeighbor replaced the brute-force NN as the default
    // (VERDICT r2 #4): the pair join must be a bucket equi-join over the
    // materialized (bucket, id, scaled, norm2) table — no cartesian /
    // nested-loop over the corpus, no parquet re-scan
    val p = plan("q25_embed_nearest")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q25 near-dup is all-pairs:\n${p.take(2000)}")
    assert("Scan parquet".r.findAllIn(p).isEmpty,
      s"q25 re-scans the corpus:\n${p.take(2000)}")
  }

  test("boolean search: AND stays one aggregate (no join), OR/NOT stay equi-joined") {
    // the r3 boolean AST must not regress the v1 plan shapes: a plain
    // AND query is the single countDistinct aggregate over the
    // filtered postings (zero joins), and boolean combinators evaluate
    // as union/semi/anti set algebra — never a cartesian
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    val docs = Seq(("u1", "t", "alpha beta", "d", 1), ("u2", "t", "beta gamma", "d", 1))
      .toDF("url", "title", "content", "domain", "crawl_wave")
    val se = new graft.search.SearchEngine(spark2, docs)
    val andPlan = se.searchAnd("alpha beta").queryExecution.executedPlan.toString
    assert(!andPlan.contains("Join"), s"plain AND query plans a join:\n$andPlan")
    for (q <- Seq("alpha OR beta", "alpha NOT beta", "(alpha OR beta) NOT gamma")) {
      val p = se.searchAnd(q).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"boolean query '$q' plans a cartesian:\n$p")
    }
  }

  test("q63: semantic-dedup pair join is cell-bounded over the materialized table") {
    // semanticDedup localCheckpoints (id, scaled, norm2) and the cell
    // assignment before the within-cell self-join: the executed plan
    // must never re-scan the embeddings parquet (q21-class recompute)
    // and the pair join must be a cell equi-join, never all-pairs
    val p = plan("q63_semantic_dedup")
    assert("Scan parquet".r.findAllIn(p).isEmpty,
      s"q63 re-scans the corpus:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q63 pair join is not an equi-join:\n${p.take(2000)}")
  }

  test("q75: LM scoring is one corpus pass with a broadcast model join") {
    // trigramModel materializes the (vocab-bounded) model, so the
    // executed plan holds exactly the scoring pass + the join-back to
    // all docs: two corpus scans, model joined by broadcast hash — a
    // shuffled model join would shuffle the exploded trigram stream
    // (~1000x the doc count) at 100-TB scale
    val p = plan("q75_lm_perplexity")
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans <= 2, s"q75 scans documents $scans times:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"), s"model join not broadcast:\n${p.take(2000)}")
  }

  test("q76: DSIR plan joins materialized scores; the mean is a 1-row broadcast") {
    // model training and the scoring pass are checkpoint-materialized,
    // so the final plan scans the corpus once (the join-back) and joins
    // the 1-row normalizer via broadcast — never a full cartesian
    val p = plan("q76_dsir_resample")
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans <= 1, s"q76 re-scans documents $scans times:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"), s"mean join degraded:\n${p.take(2000)}")
  }

  test("q60: chunk-dedup consumers read the materialized chunk table, not the corpus") {
    // chunkDedup localCheckpoints the exploded chunk table before the
    // df aggregate and the reassembly join — an inlined plan re-scans
    // and re-explodes the corpus once per consumer (q21-class recompute)
    val p = plan("q60_chunk_dedup")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"q60 re-scans the corpus $scans times:\n${p.take(2000)}")
  }

  test("q59: wide-signature pHash pair join is an equi-join on a materialized table") {
    // signaturePairs localCheckpoints the (id, sig) projection then
    // band-explodes and self-joins on (band_id, band_val): the plan must
    // never re-scan the documents parquet (both sides read the
    // materialized RDD) and never degrade to an all-pairs join — at
    // image scale a cartesian Hamming scan is n² over 10^10 rows
    val p = plan("q59_phash_pairs")
    assert("Scan parquet".r.findAllIn(p).isEmpty,
      s"q59 re-scans the corpus:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q59 pair join is not an equi-join:\n${p.take(2000)}")
  }

  test("q77: as-of join plans as one window pass — no join operator at all") {
    // asOf union-tags both sides and runs a single per-key running
    // window; a Join node here means the implementation degraded to a
    // per-row lookup or an inequality join (O(L·R) per key at 10^10 rows)
    val p = plan("q77_asof_join")
    assert(!p.contains("Join"), s"as-of degraded to a join:\n${p.take(2000)}")
    assert(p.contains("Window"), s"no window pass found:\n${p.take(2000)}")
    // exactly one hash shuffle on the as-of key (__k) for the keyed
    // window; more means the union sides shuffled separately. (q77's
    // clicks pre-aggregation owns its own (user_id, ts) exchange — that
    // one is the query's, not the operator's.)
    val kEx = "hashpartitioning\\(__k".r.findAllIn(p).length
    assert(kEx == 1, s"as-of shuffles the tagged union $kEx times:\n${p.take(2000)}")
  }

  test("q78: interval join is a binned equi-join, never a nested-loop range scan") {
    val p = plan("q78_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"interval join degraded to all-pairs:\n${p.take(2000)}")
  }

  test("similarity dot products run the codegen long_dot kernel, not interpreted HOFs") {
    // aggregate(zip_with(...)) has no doGenCode — it boxes through eval
    // per element. The similarity ops must plan the native expression
    // (round-2 finding: the interpreted form was 4.1 s of q45's 4.3 s).
    for (name <- Seq("q24_knn_cosine", "q45_ivf_ann", "q69_quantized_knn")) {
      val p = plan(name)
      assert(p.contains("long_dot"), s"$name does not plan the codegen kernel:\n${p.take(1500)}")
      assert(!p.contains("aggregate(zip_with"),
        s"$name still has an interpreted HOF dot:\n${p.take(1500)}")
    }
  }

  test("q71: stratified sample joins broadcast rates over a single corpus scan") {
    // the weights table is materialized before the rate normalization
    // (its corpus-wide tokenize+sum would otherwise run twice), so the
    // executed plan scans documents exactly once — the sample pass; the
    // per-source rates reach it through a broadcast join, never an SMJ
    val p = plan("q71_stratified_sample")
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans <= 1, s"q71 scans documents $scans times:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"), s"rates join is not broadcast:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"), s"rates join shuffles the corpus:\n${p.take(1500)}")
  }

  test("q69/q72: quantized-knn and bpe-encode join materialized tables, not the corpus") {
    // quantizedTopK localCheckpoints the quantized (id, q, qn2) table
    // before its self-join; bpeEncode localCheckpoints the token stream
    // feeding both the vocab side and the join-back side — either one
    // uncheckpointed re-scans the corpus per consumer (q21-class)
    for (name <- Seq("q69_quantized_knn", "q72_bpe_encode")) {
      val p = plan(name)
      val scans = "Scan parquet".r.findAllIn(p).length
      assert(scans == 0, s"$name re-scans the corpus $scans times:\n${p.take(2000)}")
    }
  }

  test("q74: pagerank rounds join materialized tables, not the node/edge derivations") {
    // pageRank localCheckpoints the node-id projection and the edge+degree
    // table once, and truncates rank lineage every 2 rounds — the final
    // round's plan must read only materialized RDDs, never re-scan the
    // documents parquet (an unmaterialized node projection re-scans the
    // node table once per round; q21-class)
    val p = plan("q74_pagerank")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"q74 re-scans the corpus $scans times:\n${p.take(2000)}")
  }

  test("q55: robots rules broadcast; prefix predicate is pure column logic") {
    val p = plan("q55_robots_filter")
    assert(p.contains("BroadcastHashJoin"), s"robots join is not broadcast:\n$p")
    assert(!p.contains("ScalaUDF"), "robots predicate fell back to a UDF")
  }

  test("bucketed co-located join: zero shuffle Exchanges in the join plan") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("bucket-audit").toString
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val ord = spark.read.parquet(s"$sf/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"))
      graft.storage.Bucketing.writeBucketed(li, "audit_li_b", s"$root/li", "l_orderkey", 4)
      graft.storage.Bucketing.writeBucketed(ord, "audit_ord_b", s"$root/ord", "o_orderkey", 4)
      // disable auto-broadcast so the join genuinely exercises the
      // bucketed-SMJ path (at 100 TB neither fact side broadcasts)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("audit_li_b")
        .join(spark.table("audit_ord_b"), col("l_orderkey") === col("o_orderkey"))
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() == expected)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected bucketed SMJ:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS audit_li_b")
      spark.sql("DROP TABLE IF EXISTS audit_ord_b")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("q79: caption-alignment is id equi-joined, sparse side aggregated once") {
    // captionAlignment's wide ops are the (id, bucket) partial-agg
    // shuffle and the id equi-join against the image embeddings; a
    // CartesianProduct / BNLJ here means the pair scoring degraded to
    // all-pairs — n² over 10^10 image rows
    val p = plan("q79_clip_align")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q79 alignment join is not an equi-join:\n${p.take(2000)}")
    // the caption tokenize+hash aggregate (the heavy subtree) feeds the
    // plan exactly once: one documents scan for it plus one pruned
    // id-only scan for the join spine
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans <= 2, s"q79 scans documents $scans times:\n${p.take(2000)}")
  }

  test("q80: calibration uses the range-partition two-pass rank, never a stratum window") {
    // Window.partitionBy(source) hash-routes a whole stratum into ONE
    // task's sort — dump-skewed corpora make that a single-task sort of
    // ~everything. calibrateQuality's default is the range-partition
    // prefix-sum rank, so the plan must contain NO Window node at all
    // (the window form survives only as the DuckDB oracle), and no
    // exchange may hash-partition on the raw stratum column.
    val p = plan("q80_quality_calibrate")
    assert(!p.contains("Window"), s"q80 regressed to a stratum window sort:\n${p.take(2000)}")
    assert("hashpartitioning\\(source[#,]".r.findAllIn(p).isEmpty,
      s"q80 exchanges on the raw stratum key:\n${p.take(2000)}")
  }

  test("q81: budget selection runs the distributed prefix sum, not a global window") {
    // selectUnderBudget's running total is the two-pass range-shuffle
    // prefix sum; a Window node here means it regressed to the
    // single-partition running-sum window (one task scans the corpus)
    val p = plan("q81_token_budget")
    assert(!p.contains("Window"), s"q81 regressed to a window running sum:\n${p.take(2000)}")
    assert(!p.contains("SinglePartition"), s"q81 funnels through one partition:\n${p.take(2000)}")
  }

  test("q83: cross-modal probe is a bucket equi-join with codegen image bucketing") {
    // the text→image search must probe by sign-LSH bucket (equi-join),
    // never score |Q|×|N| pairs, and the corpus-side plane projections
    // must run the codegen long_dot kernel (the interpreted HOF is
    // reserved for the sparse query side, |Q| ≪ |N|)
    val p = plan("q83_crossmodal")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q83 probe degraded to all-pairs:\n${p.take(2000)}")
    assert(p.contains("long_dot"), s"image bucketing lost the codegen kernel:\n${p.take(1500)}")
  }

  test("q82: composed image-curation pipeline keeps every join keyed") {
    // the capstone composition must inherit each stage's posture: no
    // stage may degrade to all-pairs, and the calibration window stays
    // per-source
    val p = plan("q82_image_curation")
    assert(!p.contains("CartesianProduct"),
      s"a q82 stage degraded to all-pairs:\n${p.take(2000)}")
    assert("hashpartitioning\\(source".r.findAllIn(p).nonEmpty,
      s"q82 calibration window not partitioned by source:\n${p.take(2000)}")
  }

  test("q84: tf-idf posting self-join reads the materialized weights, not the corpus") {
    // tfidfSimilarPairs localCheckpoints the weighted posting table
    // before the self-join — an inlined plan would run the tokenize +
    // two aggregations once per join side (the q21 recompute class)
    val p = plan("q84_tfidf_pairs")
    assert("Scan parquet".r.findAllIn(p).isEmpty,
      s"q84 re-scans the corpus:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q84 pair join is not a token equi-join:\n${p.take(2000)}")
  }

  test("q85: HITS rounds renormalize via broadcast, never a driver action or cartesian blowup") {
    // the per-round max is a 1-row agg crossJoined back: it must plan as
    // a broadcast nested-loop over ONE row, and the score/edge joins as
    // hash joins — any CartesianProduct means a round degenerated
    val p = plan("q85_hits")
    assert(!p.contains("CartesianProduct"),
      s"q85 has a cartesian stage:\n${p.take(2000)}")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"q85 renormalize lost its broadcast shape:\n${p.take(2000)}")
  }

  test("q86: recrawl lag-window partitioning is reused by the aggregation") {
    // one page-keyed shuffle serves both the per-page fetch-order window
    // and the groupBy that follows: exactly one exchange hashes on the
    // page id (plus the 1-row corpus-max broadcast, which adds none)
    val p = plan("q86_recrawl")
    val pageHashes = "hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(pageHashes >= 1, s"q86 lost its page-keyed shuffle:\n${p.take(2000)}")
    val exchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(exchanges <= 1,
      s"q86 shuffles on the page id $exchanges times (window partitioning not reused):\n${p.take(2000)}")
  }

  test("q87: weighted sample is one id-keyed shuffle feeding a top-k heap") {
    // explode -> map-side partial MAX -> ONE exchange on the id -> final
    // agg -> TakeOrderedAndProject; a full Sort would spill the corpus
    val p = plan("q87_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"q87 top-k fell back to a full sort:\n${p.take(2000)}")
    val exchanges = "Exchange hashpartitioning\\(doc_id".r.findAllIn(p).length
    assert(exchanges <= 1,
      s"q87 shuffles on the id $exchanges times:\n${p.take(2000)}")
  }

  test("q88: anchor aggregation is two keyed shuffles, both windows share one") {
    // hash-agg on (dst, anchor) with partial counts, then ONE dst-keyed
    // exchange serving BOTH window functions (in-link sum + rank), plus
    // the final presentation range exchange — never a cartesian
    val p = plan("q88_anchor_text")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q88 degenerated to an unkeyed join:\n${p.take(2000)}")
    val exchanges = "Exchange hashpartitioning\\(dst".r.findAllIn(p).length
    assert(exchanges <= 2,
      s"q88 hashes on dst $exchanges times (windows not sharing):\n${p.take(2000)}")
  }

  test("crawl seen-probe: native might_contain, no Scala UDF filter") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // parquet-backed frames: a tiny LocalRelation would be constant-
    // folded at planning and hide the probe expression
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(concat(lit("http://a.test/"), col("doc_id")).as("url"))
    val seen = docs.filter(col("url").endsWith("0"))
    val bloom = graft.seen.UrlSeen.buildBloom(seen, "url", 1000)
    val out = graft.seen.UrlSeen.filterNewWithBloom(spark, docs, seen, "url", bloom)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"probe is not the native expression:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
      "seen probe fell back to a UDF")
    val total = docs.count()
    val kept = out.count()
    val seenN = seen.count()
    assert(kept == total - seenN, s"expected ${total - seenN} new urls, got $kept")
  }

  test("q95: span consumers read the materialized gram table; grams shuffle as longs") {
    // both consumers (occurrence count + run merge) must read the
    // localCheckpoint'd gram table — an inlined plan re-explodes the
    // corpus per consumer (the q21 recompute class)
    val p = plan("q95_dup_spans")
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans == 0, s"q95 re-scans documents $scans times past the checkpoint:\n${p.take(2000)}")
    // the gram equi-join/agg key is the 64-bit hash, not the gram string
    assert(p.contains("gram_h"), s"gram hash column missing from plan:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q98: heavy-hitter verification joins the broadcast candidate set") {
    // the exact pass must prune via a broadcast semi-join on the tiny
    // candidate table — a shuffled join would drag the full tail into
    // an exchange, exactly what the sketch exists to avoid
    val p = plan("q98_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"candidate prune is not a broadcast semi-join:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q99: triangle wedge join reads materialized tables, never a cartesian") {
    val p = plan("q99_triangles")
    // canon + oriented are localCheckpoint'd: past them the corpus
    // never re-scans, and every join is keyed
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans == 0, s"q99 re-scans documents $scans times past the checkpoints:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"triangle join degenerated to an unkeyed join:\n${p.take(2000)}")
  }

  test("q100: composed frontier-hygiene pipeline keeps every join keyed") {
    // the anti-join stages are materialized inside the checkpoints (and
    // audited via their component ops); the FINAL plan must read the
    // checkpointed frontier — zero corpus re-scans — and join the
    // 1-row quota level as a broadcast, never a shuffled cartesian
    val p = plan("q100_frontier_pipe")
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans == 0, s"q100 re-scans documents $scans times past the checkpoints:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"),
      s"q100 degenerated to a cartesian:\n${p.take(2000)}")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"quota level join is not broadcast:\n${p.take(2000)}")
  }

  test("q96: fair quota joins a 1-row broadcast level; frontier shuffles once on host") {
    val p = plan("q96_fair_quota")
    // the level side is a 1-row broadcast, not a shuffled join
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"level join is not broadcast:\n${p.take(2000)}")
    // past the materialized counts, the frontier itself never re-scans
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans == 0, s"q96 re-scans the frontier $scans times past the checkpoint:\n${p.take(2000)}")
  }

  test("q101: containment pair join reads the materialized shingle table once") {
    // same invariant as q21/q23: the shingle explode is localCheckpointed,
    // so the corpus parquet never appears in the pair-join plan
    val p = plan("q101_containment")
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans == 0, s"q101 re-scans documents $scans times past the checkpoint:\n${p.take(2000)}")
  }

  test("q102: HLL sketch aggregate is partial (map-side) before the group exchange") {
    val p = plan("q102_hll_distinct")
    assert(p.contains("approx_count_distinct"), s"no HLL aggregate in plan:\n${p.take(2000)}")
    // one scan of events feeds both the exact gate and the sketch
    val scans = "events\\.parquet".r.findAllIn(p).length
    assert(scans == 1, s"q102 scans events $scans times:\n${p.take(2000)}")
  }

  test("q104: incremental dedup never re-derives signatures past their materialization") {
    // batch/corpus band tables and the verification shingle table are
    // all checkpointed; the only live documents scans left in the plan
    // are the semi-join id reduction and the final batch projection —
    // the q21 lesson applied to the two-sided join
    val p = plan("q104_incr_dedup")
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans <= 2, s"q104 re-scans documents $scans times:\n${p.take(2000)}")
  }

  test("q103: surt key is pure column logic — no UDF, scan prunes to doc_id") {
    val p = plan("q103_surt_key")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"surt path fell out of codegen:\n${p.take(2000)}")
    // URLs are synthesized from doc_id only; column pruning must drop `text`
    assert(!p.contains("text"), s"q103 scan reads unused text column:\n${p.take(2000)}")
  }

  test("q105: temperature mix — one corpus pass, 1-row broadcast totals, no window") {
    // per-source sums reduce map-side; the corpus-wide normalizers join
    // back as a broadcast 1-row frame (the only sanctioned BNLJ shape) —
    // never a window over the per-source frame or a second corpus scan
    val p = plan("q105_temperature_mix")
    assert(!p.contains("Window"), s"q105 normalizes via a window:\n${p.take(2000)}")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"q105 totals are not broadcast:\n${p.take(2000)}")
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans <= 1, s"q105 scans documents $scans times:\n${p.take(2000)}")
  }

  test("q106: ordered robots predicate — broadcast rules join, pure codegen predicate") {
    // the per-host rules table broadcasts (it is robots-cache-sized, not
    // corpus-sized) and the ordered first-match predicate is column
    // logic — a UDF here would put the hot allow/deny path outside
    // whole-stage codegen for every crawled URL
    val p = plan("q106_robots_ordered")
    assert(p.contains("BroadcastHashJoin"), s"q106 rules join not broadcast:\n${p.take(2000)}")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"q106 predicate fell back to a UDF:\n${p.take(2000)}")
  }

  test("q107: funnel attribution — single corpus pass, map-side label aggregate") {
    // one coalesce(when…) label projection + one groupBy(label) with a
    // partial aggregate; the cumulative window runs on the stages-sized
    // report frame only. A second documents scan means the label subtree
    // was recomputed per consumer.
    val p = plan("q107_curation_funnel")
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans <= 1, s"q107 scans documents $scans times:\n${p.take(2000)}")
    assert(p.contains("HashAggregate"), s"q107 label counts are not hash-aggregated:\n${p.take(2000)}")
  }

  test("q108: k-means final assignment — one scan against literal centroids, no join") {
    // the trained centroids are LITERAL arrays (collected k·dim longs),
    // so the final assignment must be a pure projection over one
    // embeddings scan: a Join or Window here means centroids leaked back
    // in as a dataframe and the argmin is shuffling the corpus
    val p = plan("q108_kmeans_ivf")
    val scans = "embeddings\\.parquet".r.findAllIn(p).length
    assert(scans <= 1, s"q108 scans embeddings $scans times:\n${p.take(2000)}")
    assert(!p.contains("Join"), s"q108 assignment joins instead of projecting:\n${p.take(2000)}")
    assert(!p.contains("Window"), s"q108 uses a window:\n${p.take(2000)}")
  }

  test("q109: shard assignment — no window anywhere (two-pass prefix-sum rank)") {
    // the global rank must come from the range-shuffle prefix sum; a
    // Window in this plan means the empty-partition-key global sort is
    // back (single-task rank over the whole corpus — the q80-class
    // scale-killer)
    val p = plan("q109_shard_assign")
    assert(!p.contains("Window"), s"q109 ranks via a window:\n${p.take(2000)}")
  }

  test("q111: aspect bucketing — bucket offsets broadcast, no corpus-wide window") {
    // the bucket argmin is a literal projection and the within-bucket
    // position is prefix-sum rank minus a broadcast buckets-sized
    // offset frame; a Window here means the per-bucket rank regressed
    // to a window sort (dominant-bucket single-task at scale)
    val p = plan("q111_aspect_buckets")
    assert(!p.contains("Window"), s"q111 ranks via a window:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"), s"q111 bucket offsets not broadcast:\n${p.take(2000)}")
  }

  test("q112: interleave — per-stream prefix-sum ranks, no window") {
    val p = plan("q112_interleave")
    assert(!p.contains("Window"), s"q112 ranks via a window:\n${p.take(2000)}")
  }

  test("q110: canonical retention — keyed joins only, no cartesian") {
    // cluster stats join back on cluster_id and quality joins on the id;
    // a cartesian/BNLJ means the argmax escaped its aggregate
    val p = plan("q110_canonical_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q110 has an unkeyed join:\n${p.take(2000)}")
  }
}
