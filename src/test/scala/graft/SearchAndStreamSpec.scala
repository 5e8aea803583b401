package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.search.SearchEngine
import graft.streaming.StreamOps

class SearchAndStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val docs = Seq(
    ("http://a.test/1", "spark joins", "spark makes the join fast and the scan fast", "a.test", 1),
    ("http://a.test/2", "slow scans", "the scan is slow but the join is ok", "a.test", 1),
    ("http://b.test/1", "sparkles", "spark spark spark join", "b.test", 2),
    ("http://c.test/1", "nothing", "completely unrelated words here", "c.test", 2)
  ).toDF("url", "title", "content", "domain", "crawl_wave")

  test("searchAnd: v1 AND-intersection of posting lists") {
    val se = new SearchEngine(spark, docs)
    val got = se.searchAnd("spark join").as[String].collect().toSeq
    assert(got == Seq("http://a.test/1", "http://b.test/1"))
    assert(se.searchAnd("the scan").as[String].collect().toSeq ==
      Seq("http://a.test/1", "http://a.test/2"))
    assert(se.searchAnd("absent-term").count() == 0)
  }

  test("search: BM25 ranks the term-dense doc first, snippets attached") {
    val se = new SearchEngine(spark, docs)
    val got = se.search("spark join", k = 3)
      .select($"rank", $"url", $"snippet").as[(Int, String, String)].collect()
    assert(got.length == 3)
    assert(got.head._2 == "http://b.test/1") // highest tf for both terms
    // O3: snippets highlight the matched terms in term-window fragments
    assert(got.forall(r => r._3.contains("<b>")))
    assert(got.head._3.contains("<b>spark</b>"))
  }

  test("search: stemming — 'joins' finds docs containing 'join' (C4)") {
    val se = new SearchEngine(spark, docs)
    assert(se.searchAnd("joins").as[String].collect().toSeq ==
      Seq("http://a.test/1", "http://a.test/2", "http://b.test/1"))
    val ranked = se.search("joining sparked", k = 4)
      .select($"url").as[String].collect()
    assert(ranked.nonEmpty && ranked.head == "http://b.test/1")
  }

  test("search: field-prefixed terms restrict the matched field") {
    val se = new SearchEngine(spark, docs)
    // "sparkles" stems to "sparkl", so only b.test/1's TITLE matches;
    // title:scan must NOT match a.test/1 (scan in content only)
    val got = se.search("title:scans", k = 4).select($"url").as[String].collect()
    assert(got.toSeq == Seq("http://a.test/2"))
  }

  test("phrase queries: quoted segments require positional adjacency") {
    val se = new SearchEngine(spark, docs)
    // "join fast" is adjacent only in a.test/1 ("the join fast and");
    // a.test/2 has both words but not adjacent ("join is ok ... slow")
    assert(se.searchAnd("\"join fast\"").as[String].collect().toSeq ==
      Seq("http://a.test/1"))
    // order matters: reversed phrase matches nothing
    assert(se.searchAnd("\"fast join\"").count() == 0)
    // ranked search: the phrase filters candidates BEFORE the top-k cut —
    // b.test/1 (highest spark tf) lacks "the scan" and must be excluded
    val ranked = se.search("spark \"the scan\"", k = 4)
      .select($"url").as[String].collect().toSeq
    assert(ranked.toSet == Set("http://a.test/1", "http://a.test/2"))
    // field-restricted phrase: title:"slow scans" only matches a.test/2
    assert(se.search("title:\"slow scans\"", k = 4)
      .select($"url").as[String].collect().toSeq == Seq("http://a.test/2"))
    // stemmed phrase: "joins fasts" stems to the same adjacent pair
    assert(se.searchAnd("\"joins fasts\"").as[String].collect().toSeq ==
      Seq("http://a.test/1"))
    // v1 is content-only: "spark joins" is adjacent in a.test/1's TITLE
    // and b.test/1's CONTENT — searchAnd (v1) must see only the content
    // hit, while v3's field-unrestricted phrase sees both
    assert(se.searchAnd("\"spark joins\"").as[String].collect().toSeq ==
      Seq("http://b.test/1"))
    assert(se.search("\"spark joins\"", k = 4)
      .select($"url").as[String].collect().toSet ==
      Set("http://a.test/1", "http://b.test/1"))
    // the field prefix is case-insensitive even though operators are
    // uppercase-only: Title:"..." is the same field phrase
    assert(se.search("Title:\"slow scans\"", k = 4)
      .select($"url").as[String].collect().toSeq == Seq("http://a.test/2"))
  }

  test("boolean operators: OR / NOT / parens (Whoosh parser parity)") {
    val se = new SearchEngine(spark, docs)
    // a OR b: union of posting sets
    assert(se.searchAnd("spark OR slow").as[String].collect().toSeq ==
      Seq("http://a.test/1", "http://a.test/2", "http://b.test/1"))
    // a NOT b: difference — scan∈{a1,a2}, slow∈{a2}
    assert(se.searchAnd("scan NOT slow").as[String].collect().toSeq ==
      Seq("http://a.test/1"))
    // Whoosh precedence: infix OR binds its neighbors tighter than the
    // implicit AND — `spark fast OR slow` is spark AND (fast OR slow),
    // NOT (spark AND fast) OR slow (which would include a.test/2)
    assert(se.searchAnd("spark fast OR slow").as[String].collect().toSeq ==
      Seq("http://a.test/1"))
    // parens group: (scan OR unrelated) NOT slow
    assert(se.searchAnd("(scan OR unrelated) NOT slow").as[String].collect().toSeq ==
      Seq("http://a.test/1", "http://c.test/1"))
    // standalone NOT is complement semantics
    assert(se.searchAnd("NOT spark").as[String].collect().toSeq ==
      Seq("http://a.test/2", "http://c.test/1"))
    // operators are UPPERCASE-only: lowercase 'or' is an ordinary term
    // (stems to 'or', present nowhere) — the query becomes a 3-way AND
    assert(se.searchAnd("spark or join").count() == 0)
  }

  test("boolean operators: ranked search restricts candidates, scores positives") {
    val se = new SearchEngine(spark, docs)
    // OR: all three matching docs rank; the unrelated doc is excluded
    val or = se.search("spark OR slow", k = 10).select($"url").as[String].collect()
    assert(or.toSet == Set("http://a.test/1", "http://a.test/2", "http://b.test/1"))
    // NOT excludes a doc that WOULD have scored on the positive term
    val not = se.search("scan NOT slow", k = 10).select($"url").as[String].collect()
    assert(not.toSeq == Seq("http://a.test/1"))
    // field-restricted boolean: title:spark hits only a.test/1's title
    // ('sparkles' stems to 'sparkl'); NOT title:slow would drop a.test/2
    val fld = se.search("title:spark NOT title:slow", k = 10)
      .select($"url").as[String].collect()
    assert(fld.toSeq == Seq("http://a.test/1"))
    // explicit AND enforces conjunction in ranked search: fast∈{a1} only
    val and = se.search("spark AND fast", k = 10).select($"url").as[String].collect()
    assert(and.toSeq == Seq("http://a.test/1"))
  }

  test("boolean search: 200 random structured queries match a set-algebra model") {
    // model-based check: generate a random query AST as a STRING
    // (compounds always parenthesized, so precedence — pinned by the
    // deterministic cases above — is out of scope here) and compute the
    // expected url set recursively alongside; searchAnd must agree on
    // every one. Vocabulary chosen so no two words share a Porter stem.
    val vocab = Vector("apple", "banana", "cherry", "dragon", "elephant", "falcon")
    val rnd = new scala.util.Random(1234)
    val corpus: Map[String, Set[String]] = (1 to 8).map { i =>
      s"http://m.test/$i" -> (0 until 3 + rnd.nextInt(3)).map(_ => vocab(rnd.nextInt(vocab.size))).toSet
    }.toMap
    val mdocs = corpus.toSeq.map { case (u, ws) =>
      (u, "t", ws.mkString(" "), "m.test", 1) }
      .toDF("url", "title", "content", "domain", "crawl_wave")
    val se = new SearchEngine(spark, mdocs)
    val all = corpus.keySet
    def gen(depth: Int): (String, Set[String]) =
      if (depth == 0 || rnd.nextInt(3) == 0) {
        val w = vocab(rnd.nextInt(vocab.size))
        (w, corpus.filter(_._2.contains(w)).keySet)
      } else rnd.nextInt(4) match {
        case 0 => // implicit AND
          val (qa, sa) = gen(depth - 1); val (qb, sb) = gen(depth - 1)
          (s"($qa $qb)", sa intersect sb)
        case 1 =>
          val (qa, sa) = gen(depth - 1); val (qb, sb) = gen(depth - 1)
          (s"($qa OR $qb)", sa union sb)
        case 2 =>
          val (qa, sa) = gen(depth - 1)
          (s"(NOT $qa)", all diff sa)
        case _ =>
          val (qa, sa) = gen(depth - 1); val (qb, sb) = gen(depth - 1)
          (s"($qa AND $qb)", sa intersect sb)
      }
    for (_ <- 1 to 200) {
      val (q, want) = gen(2 + rnd.nextInt(2))
      val got = se.searchAnd(q).as[String].collect().toSet
      assert(got == want, s"query <$q>: got $got want $want")
    }
  }

  test("search results carry crawl_date (stored-field parity, C5 format)") {
    // docs without the column: reference's stored-field default
    val se = new SearchEngine(spark, docs)
    val noDate = se.search("spark", k = 2).select($"crawl_date").as[String].collect()
    assert(noDate.nonEmpty && noDate.forall(_ == "unknown"))
    // docs with a timestamp column: formatted %Y-%m-%d %H:%M:%S
    val dated = docs.withColumn("crawl_date",
      to_timestamp(lit("2025-06-01 12:34:56")))
    val se2 = new SearchEngine(spark, dated)
    val got = se2.search("spark", k = 2).select($"crawl_date").as[String].collect()
    assert(got.nonEmpty && got.forall(_ == "2025-06-01 12:34:56"))
    // pre-formatted string column passes through untouched
    val dated3 = docs.withColumn("crawl_date", lit("2025-06-01 12:34:56"))
    val got3 = new SearchEngine(spark, dated3).search("spark", k = 2)
      .select($"crawl_date").as[String].collect()
    assert(got3.nonEmpty && got3.forall(_ == "2025-06-01 12:34:56"))
  }

  test("search: BM25F field weights change the ranking") {
    // query 'spark': b.test/1 has 3x 'spark' in content (no title match
    // — 'sparkles' stems to 'sparkl'); a.test/1 has it in the title.
    // Content-heavy weights rank b.test/1 first; title-heavy must flip
    // the order (Whoosh BM25F field boosts).
    val contentHeavy = new SearchEngine(spark, docs, Map("title" -> 0.01, "content" -> 1.0))
    val titleHeavy = new SearchEngine(spark, docs, Map("title" -> 10.0, "content" -> 0.01))
    val c = contentHeavy.search("spark", k = 2).select($"url").as[String].collect()
    val t = titleHeavy.search("spark", k = 2).select($"url").as[String].collect()
    assert(c.head == "http://b.test/1") // 3x 'spark' in content
    assert(t.head == "http://a.test/1") // 'spark' in title wins under boost
  }

  test("highlight: top-2 fragments, fallback to 200-char prefix") {
    val h = SearchEngine.highlight("the quick join runs then another join appears later", Seq("join"))
    assert(h.split("<b>join</b>").length >= 2, s"expected 2 highlighted fragments: $h")
    val fb = SearchEngine.highlight("no matching words at all", Seq("join"))
    assert(fb == "no matching words at all...")
  }

  test("streaming: windowed event counts over a file stream (AvailableNow)") {
    val dir = Files.createTempDirectory("stream-in").toString
    graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    // event-time watermarks require TIMESTAMP (with local tz); the parquet
    // roundtrip infers TIMESTAMP_NTZ, so normalize the column first
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", $"ts".cast("timestamp"))
    // complete mode: a single AvailableNow batch never advances the
    // watermark past its own data, so append would emit zero rows
    val q = StreamOps.windowedEventCounts(stream, "6 hours")
      .writeStream.format("memory").queryName("wincounts")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("wincounts")
    val batch = graft.queries.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", $"ts".cast("timestamp"))
      .groupBy(window($"ts", "6 hours"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("window_start"), $"event_type", $"n")
    val gotSet = got.select($"window_start", $"event_type", $"n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batchSet = batch.as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(gotSet == batchSet, "streamed windows must equal the batch computation")
    assert(gotSet.nonEmpty)
  }

  test("GraftExtensions: URL expressions callable from SQL") {
    val row = spark.sql(
      """SELECT canonicalize_url('HTTP://A.Test:80/x/../y?b=2&a=1#f') AS c,
        |       url_host('https://WWW.B.test/z') AS h,
        |       resolve_url('http://a.test/d/e', 'g') AS r,
        |       is_http_url('mailto:x@y') AS m""".stripMargin)
      .as[(String, String, String, Boolean)].head()
    assert(row == (("http://a.test/y?a=1&b=2", "www.b.test", "http://a.test/d/g", false)))
    val d = spark.sql("SELECT long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .as[Long].head()
    assert(d == 4L + 10L + 18L)
  }

  test("streaming: first-seen URL dedup, watermark-bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, java.sql.Timestamp)]
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    val q = StreamOps.firstSeenUrls(in.toDS().toDF("url", "ts"))
      .writeStream.format("memory").queryName("firstseen")
      .outputMode("append").start()
    in.addData(("http://a.test/1", t(0)), ("http://a.test/2", t(1)),
      ("http://a.test/1", t(2)))
    q.processAllAvailable()
    in.addData(("http://a.test/1", t(3)), ("http://a.test/3", t(4)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("firstseen").select($"url").as[String].collect().sorted
    assert(got.toSeq == Seq("http://a.test/1", "http://a.test/2", "http://a.test/3"))
  }

  test("streaming: session_window closes sessions once the watermark passes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    // gap 5 min, zero watermark delay: sessions close as soon as a later
    // event pushes max-event-time past session_end = last_ts + gap
    val q = StreamOps.sessionizedCounts(
        in.toDS().toDF("user_id", "ts"), gap = "5 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    in.addData((1L, t(0)), (1L, t(60)), (2L, t(100)))
    q.processAllAvailable()
    // sentinel far in the future advances the watermark past both sessions
    in.addData((9L, t(100000)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions")
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().sortBy(_._1)
    // u1: events at 0 and 60 merge (gap < 5 min) -> [0, 60+300); u2 -> [100, 400)
    assert(got.toSeq == Seq(
      (1L, t(0), t(360), 2L),
      (2L, t(100), t(400), 1L)), s"got ${got.toSeq}")
  }

  test("streaming: flatMapGroupsWithState flags hosts exceeding a budget") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[StreamOps.FetchEvent]
    val q = StreamOps.hostBudgetState(in.toDS(), budget = 2)
      .writeStream.format("memory").queryName("breaches")
      .outputMode("append").start()
    in.addData(
      StreamOps.FetchEvent("hot.test", "u1"), StreamOps.FetchEvent("hot.test", "u2"),
      StreamOps.FetchEvent("hot.test", "u3"), StreamOps.FetchEvent("cold.test", "u4"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("breaches").as[StreamOps.BudgetBreach].collect()
    assert(got.toSeq == Seq(StreamOps.BudgetBreach("hot.test", 3)))
  }

  test("streaming: stream-stream task correlation joins within the lag bound (J5)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sent = MemoryStream[(Long, java.sql.Timestamp)]
    val done = MemoryStream[(Long, java.sql.Timestamp)]
    // base well past epoch: the initial watermark is epoch-0, and with a
    // 0 s delay an epoch-0 event is dropped as late in the first batch
    def t(s: Long) = new java.sql.Timestamp((100000L + s) * 1000L)
    val q = StreamOps.taskCorrelation(
        sent.toDS().toDF("task_id", "ts"), done.toDS().toDF("task_id", "ts"),
        maxLag = "1 minute", watermark = "0 seconds")
      .writeStream.format("memory").queryName("correlated")
      .outputMode("append").start()
    // task 1 completes in 30 s (match); task 2's completion arrives 90 s
    // after dispatch (beyond the 60 s bound — no match); task 3 never
    // completes; a completion for unknown task 9 matches nothing
    sent.addData((1L, t(0)), (2L, t(10)), (3L, t(20)))
    done.addData((1L, t(30)), (2L, t(100)), (9L, t(40)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("correlated")
      .select($"task_id", $"lag_sec").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 30L)), s"got ${got.toSeq}")
  }

  test("streaming: foreachBatch snapshot sink commits batches once, replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("icesink").toString
    val ice = new graft.icelite.IceLite(root)
    val in = MemoryStream[Long]
    val sink = StreamOps.snapshotSink(ice, "events")
    val q = in.toDS().toDF("v").writeStream.foreachBatch(sink)
      .outputMode("append").start()
    in.addData(1L, 2L, 3L)
    q.processAllAvailable()
    in.addData(4L, 5L)
    q.processAllAvailable()
    q.stop()
    val snaps = ice.history.length
    assert(snaps == 2, s"expected 2 snapshot commits, got $snaps")
    assert(ice.read(spark, "events").count() == 5)
    // recovery replay: re-delivering the LAST batch id must not commit
    sink(Seq(4L, 5L).toDF("v"), 1L)
    assert(ice.history.length == 2, "replayed batch created a duplicate commit")
    assert(ice.read(spark, "events").count() == 5)
    // an interleaved NON-stream commit (another writer, no batch-id
    // meta) must not reset the guard: the replay check walks history
    ice.commit(Seq("other" -> Seq(9L).toDF("v")))
    sink(Seq(4L, 5L).toDF("v"), 1L)
    assert(ice.read(spark, "events").count() == 5,
      "replay after an interleaved foreign commit double-committed")
    // the next batch id commits normally
    sink(Seq(6L).toDF("v"), 2L)
    assert(ice.read(spark, "events").count() == 6)
  }

  test("streaming: near-dup candidates match the batch LSH pair set, emitted on arrival") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // docs 1/3 are exact copies; 2 unrelated; 4 (arrives later) copies 1
    val d1 = (1L, "alpha beta gamma delta epsilon zeta")
    val d2 = (2L, "one two three four five six seven")
    val d3 = (3L, "alpha beta gamma delta epsilon zeta")
    val d4 = (4L, "alpha beta gamma delta epsilon zeta")
    val in = MemoryStream[StreamOps.DocEvent]
    val q = StreamOps.streamingNearDup(in.toDS(), n = 3, k = 8, rowsPerBand = 2)
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    in.addData(StreamOps.DocEvent(d1._1, d1._2), StreamOps.DocEvent(d2._1, d2._2),
      StreamOps.DocEvent(d3._1, d3._2))
    q.processAllAvailable()
    val afterFirst = spark.table("neardup").as[StreamOps.DupCandidate].collect()
      .map(c => (c.docId min c.priorId, c.docId max c.priorId)).toSet
    assert(afterFirst == Set((1L, 3L)), s"got $afterFirst")
    // the dup candidate appears in the micro-batch its doc arrives in
    in.addData(StreamOps.DocEvent(d4._1, d4._2))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("neardup").as[StreamOps.DupCandidate].collect()
      .map(c => (c.docId min c.priorId, c.docId max c.priorId)).toSet
    // parity: the same md5 banding scheme gives the same pair set as
    // the batch path over the full corpus
    val batchPairs = graft.ops.Dedup.minhashCandidates(
        Seq(d1, d2, d3, d4).toDF("doc_id", "text"), "doc_id", "text",
        n = 3, k = 8, rowsPerBand = 2)
      .as[(Long, Long)].collect().toSet
    assert(streamed == batchPairs, s"stream $streamed != batch $batchPairs")
    assert(streamed == Set((1L, 3L), (1L, 4L), (3L, 4L)))
  }

  test("streaming: near-dup bucket state stays capped; overflow docs still match") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 6 identical docs through a cap of 2: every bucket holds <= 2 ids,
    // yet each arrival still emits candidates against the capped prefix
    val text = "alpha beta gamma delta epsilon zeta"
    val in = MemoryStream[StreamOps.DocEvent]
    val q = StreamOps.streamingNearDup(in.toDS(), n = 3, k = 8, rowsPerBand = 2,
        maxBucket = 2)
      .writeStream.format("memory").queryName("neardup_cap")
      .outputMode("append").start()
    (1L to 6L).foreach { id => in.addData(StreamOps.DocEvent(id, text)); q.processAllAvailable() }
    q.stop()
    val perDoc = spark.table("neardup_cap").as[StreamOps.DupCandidate].collect()
      .groupBy(_.docId).map { case (id, cs) => id -> cs.map(_.priorId).distinct.sorted.toSeq }
    // docs 3..6 each matched against exactly the 2 retained bucket members
    // (the cap keeps the newest-first prefix; doc 2 matched the only prior)
    assert(perDoc(2L) == Seq(1L))
    (3L to 6L).foreach { id =>
      assert(perDoc(id).size == 2, s"doc $id matched ${perDoc(id)} — cap not applied")
    }
  }
}
