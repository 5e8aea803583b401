package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/**
 * Relational operator coverage (SURVEY.md §2.2–§2.6): scans with
 * pushdown, broadcast joins, anti/semi joins, first-seen/latest-per-key
 * dedup (the reference's seen-set + Whoosh-upsert semantics,
 * `master/master_node.py:119-127`, `indexer/indexer_node.py:91-98`),
 * top-k, windows, per-key budgets (§2.8 politeness analogue),
 * sessionization and tumbling event windows.
 *
 * Determinism contract with the DuckDB oracle: sums of doubles go
 * through DECIMAL casts (exact, order-independent); doubles in output
 * are either raw column values or derived from exact integers/decimals
 * so both engines produce bit-identical values; every query has a total
 * ORDER BY.
 */
object Relational {
  private val DEC = "decimal(18,4)"

  /** q1: TPC-H Q1-shaped scan+filter+hash-aggregate (A1; pushdown). */
  def q1Agg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity".cast(DEC)).cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast(DEC)).cast("double").as("sum_base_price"),
        // round the scale-8 decimal sum to scale 2 BEFORE the double
        // cast: at sf0.1 the scale-8 significand exceeds 2^53 and the
        // decimal->double conversion double-rounds differently per
        // engine (1-ulp hash drift); at scale 2 the significand is
        // exact in a double and the final /100 is one IEEE op
        round(sum(($"l_extendedprice".cast(DEC) * (lit(1).cast(DEC) - $"l_discount".cast(DEC)))
          .cast("decimal(28,8)")), 2).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      | CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(28,8))), 2) AS DOUBLE) AS sum_disc_price,
      | count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q2: star join with broadcast dims (J3 robots-broadcast analogue). */
  def q2JoinBroadcast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .join(orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(customer(s, d)), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(
        // scale-2 round before the double cast — same 2^53-significand
        // rationale as q1's sum_disc_price
        round(sum(($"l_extendedprice".cast(DEC) * (lit(1).cast(DEC) - $"l_discount".cast(DEC)))
          .cast("decimal(28,8)")), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"n_name")
  }

  val q2Sql: String =
    """SELECT n_name,
      | CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(28,8))), 2) AS DOUBLE) AS revenue,
      | count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q3: left-anti join — the frontier seen-set gate (J1). */
  def q3AntiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bigOrders = orders(s, d).filter($"o_totalprice" > 300000).select($"o_custkey")
    customer(s, d)
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val q3Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  /** q4: left-semi join (J6 AND-intersection shape). */
  def q4SemiJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val expensive = lineitem(s, d).filter($"l_extendedprice" > 80000).select($"l_partkey")
    part(s, d)
      .join(expensive, $"p_partkey" === $"l_partkey", "left_semi")
      .select($"p_partkey", $"p_brand")
      .orderBy($"p_partkey")
  }

  val q4Sql: String =
    """SELECT p_partkey, p_brand FROM part
      |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_extendedprice > 80000)
      |ORDER BY p_partkey""".stripMargin

  /** q5: first-seen-wins per key — the reference's `seen_urls` first-discovery
    * semantics (`master/master_node.py:119-127`). */
  def q5FirstSeen(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // min(struct(ts, event_id)) IS row_number()=1 over (ts, event_id) —
    // struct ordering is field-lexicographic — but as a map-side-
    // combinable aggregate: no per-key sort, no window exchange over the
    // full event stream, and a hot user partial-aggregates across
    // partitions instead of sorting in one task (guide §2.4/§2.5)
    events(s, d)
      .groupBy($"user_id")
      .agg(min(struct($"ts", $"event_id")).as("m"))
      .select($"user_id", $"m.event_id".as("first_event"), $"m.ts".as("first_ts"))
      .orderBy($"user_id")
  }

  val q5Sql: String =
    """SELECT user_id, event_id AS first_event, ts AS first_ts FROM (
      | SELECT user_id, event_id, ts,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      | FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** q6: latest-per-key — Whoosh `update_document` upsert semantics (S7). */
  def q6LatestUpsert(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // max(struct(ts, event_id, payload)) == row_number()=1 over
    // (ts DESC, event_id DESC): event_id is unique per event, so the
    // trailing payload field never decides the ordering — it just rides
    // along. Same no-sort map-side-combinable shape as q5.
    events(s, d)
      .groupBy($"user_id")
      .agg(max(struct($"ts", $"event_id", $"event_type")).as("m"))
      .select($"user_id", $"m.event_id".as("last_event"), $"m.event_type".as("last_type"))
      .orderBy($"user_id")
  }

  val q6Sql: String =
    """SELECT user_id, event_id AS last_event, event_type AS last_type FROM (
      | SELECT user_id, event_id, event_type,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      | FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** q7: global top-k with deterministic tie-break (O2 BM25-top-k shape —
    * Spark plans TakeOrderedAndProject, no full sort). */
  def q7TopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice".as("total"))
      .limit(20)
  }

  val q7Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice AS total
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** q8: running sum per key (decimal-exact) — cumulative counters (A1). */
  def q8RunningSum(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("running_value", sum($"value".cast("decimal(18,6)")).over(w).cast("double"))
      .select($"user_id", $"event_id", $"running_value")
      .orderBy($"user_id", $"event_id")
  }

  val q8Sql: String =
    """SELECT user_id, event_id,
      | CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
      |   PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** q9: per-key budget rank ≤ k — the politeness budget window (§2.8:
    * row_number over host ≤ floor(wave/crawl_delay)). */
  def q9BudgetRank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"user_id", $"event_id", $"rn")
      .orderBy($"user_id", $"rn")
  }

  val q9Sql: String =
    """SELECT user_id, event_id, rn FROM (
      | SELECT user_id, event_id,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      | FROM events) WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin

  /** q10: exact distinct count per group (A2 visited-count). */
  def q10DistinctCount(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    nation(s, d)
      .join(customer(s, d), $"c_nationkey" === $"n_nationkey", "left")
      .groupBy($"n_name")
      .agg(countDistinct($"c_custkey").as("n_cust"),
           count($"c_custkey").as("n_rows"))
      .orderBy($"n_name")
  }

  val q10Sql: String =
    """SELECT n_name, count(DISTINCT c_custkey) AS n_cust, count(c_custkey) AS n_rows
      |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q102: A2's 10^10-frontier scale path — per-group distinct
    * cardinality by HyperLogLog++ sketch (`approx_count_distinct`,
    * Heule et al. 2013) instead of exact count(DISTINCT ...). Exact
    * distinct shuffles every key to its group (at a 10^10-URL frontier
    * the "visited per host" key set IS the frontier); the HLL sketch
    * is a few KB per group, built map-side and merged — the only thing
    * that crosses the wire is sketches, and the same sketch merge is
    * what a monitor node would hold incrementally.
    *
    * The query is its own error gate: it emits a group only if the
    * estimate lands within 5 standard errors (rsd=0.02) of the exact
    * count computed alongside, and PROJECTS the exact count — so a
    * broken sketch drops rows and the DuckDB hash compare (which
    * re-derives the exact counts) goes red. Spark's HLL++ is
    * deterministic for fixed data, but its estimates are
    * implementation-specific, so the estimate itself stays out of the
    * compared columns (DuckDB's approx_distinct uses a different
    * sketch; comparing estimates cross-engine would be meaningless). */
  def q102HllDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_exact"),
           approx_count_distinct($"user_id", rsd = 0.02).as("__n_hll"))
      .filter(abs($"__n_hll" - $"n_exact") <=
        lit(5) * lit(0.02) * $"n_exact" + lit(1))
      .select($"event_type", $"n_exact")
      .orderBy($"event_type")
  }

  val q102Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_exact
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q11: UNION ALL + group (frontier += new links, §2.6). */
  def q11Union(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val a = orders(s, d).select($"o_custkey".as("custkey"))
    val b = customer(s, d).select($"c_custkey".cast("long").as("custkey"))
    a.unionByName(b)
      .groupBy($"custkey")
      .agg(count(lit(1)).as("appearances"))
      .orderBy($"custkey")
  }

  val q11Sql: String =
    """SELECT custkey, count(*) AS appearances FROM (
      | SELECT o_custkey AS custkey FROM orders
      | UNION ALL SELECT CAST(c_custkey AS BIGINT) FROM customer)
      |GROUP BY custkey ORDER BY custkey""".stripMargin

  /** q12: scan with projection+filter pushdown to parquet (S1/S2 scan). */
  def q12ScanPrune(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
              $"l_shipdate" < lit("1995-02-01").cast("timestamp"))
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val q12Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1995-02-01 00:00:00'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q30: tumbling event-time window (A5/O5 rate-per-bucket analogue). */
  def q30Tumbling(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy(date_trunc("hour", $"ts").as("hour_bucket"), $"event_type")
      .agg(count(lit(1)).as("n"),
           sum($"value".cast("decimal(18,6)")).cast("double").as("sum_value"))
      .orderBy($"hour_bucket", $"event_type")
  }

  val q30Sql: String =
    """SELECT date_trunc('hour', ts) AS hour_bucket, event_type, count(*) AS n,
      | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q64: crawl-rate alarm classification — the monitor's severity rules
    * (`performance_optimizer.py:173-188`: < 1 URL/min HIGH, < 5 MEDIUM)
    * over per-minute activity buckets, INCLUDING silent minutes (the
    * reference measures rate over wall time, so a dead crawler reads 0
    * and must alarm HIGH): the minute axis is generated from the global
    * min/max (one tiny agg row, exploded), left-joined to the bucket
    * counts. One corpus aggregation + one join against the generated
    * axis — no windows, no driver loops. */
  def q64CrawlAlerts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
    val counts = ev.groupBy(date_trunc("minute", $"ts").as("minute_bucket"))
      .agg(count(lit(1)).as("n"))
    val minutes = ev
      .agg(date_trunc("minute", min($"ts")).as("t0"), date_trunc("minute", max($"ts")).as("t1"))
      .select(explode(sequence($"t0", $"t1", expr("interval 1 minute"))).as("minute_bucket"))
    minutes.join(counts, Seq("minute_bucket"), "left")
      .select($"minute_bucket", coalesce($"n", lit(0L)).as("n"),
        when(coalesce($"n", lit(0L)) < 1, "HIGH")
          .when(coalesce($"n", lit(0L)) < 5, "MEDIUM")
          .otherwise("OK").as("severity"))
      .orderBy($"minute_bucket")
  }

  val q64Sql: String =
    """WITH b AS (
      | SELECT date_trunc('minute', ts) AS minute_bucket, count(*) AS n
      | FROM events GROUP BY 1),
      |bounds AS (
      | SELECT date_trunc('minute', min(ts)) AS t0, date_trunc('minute', max(ts)) AS t1 FROM events),
      |minutes AS (
      | SELECT unnest(generate_series(t0, t1, INTERVAL '1 minute')) AS minute_bucket FROM bounds)
      |SELECT m.minute_bucket, COALESCE(b.n, 0) AS n,
      | CASE WHEN COALESCE(b.n, 0) < 1 THEN 'HIGH'
      |      WHEN COALESCE(b.n, 0) < 5 THEN 'MEDIUM'
      |      ELSE 'OK' END AS severity
      |FROM minutes m LEFT JOIN b ON b.minute_bucket = m.minute_bucket
      |ORDER BY m.minute_bucket""".stripMargin

  /** q31: sessionize with 30-min inactivity gap (streaming-state shape,
    * §2.8 — lag + cumulative flag, all-integer arithmetic). */
  def q31Sessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(s, d)
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_s",
        when($"prev_ts".isNull ||
             (unix_timestamp($"ts") - unix_timestamp($"prev_ts")) > 1800, 1).otherwise(0))
      .groupBy($"user_id")
      .agg(sum($"new_s").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  val q31Sql: String =
    """SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
      | SELECT user_id,
      |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |        OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
      |       THEN 1 ELSE 0 END AS new_s
      | FROM events) GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q70: the NATIVE session-window operator (`session_window(ts, gap)`)
    * — the idiomatic Spark form of q31's manual lag+flag sessionization,
    * and the one that runs unchanged under Structured Streaming with
    * state-store-backed merging. Semantics: each event extends its
    * session's end to ts + gap; a gap >= 30 min starts a new session,
    * so session_end = last_ts + gap. The oracle rebuilds that with
    * gaps-and-islands at microsecond precision. */
  def q70SessionWindow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("session_start"), $"w.end".as("session_end"),
        $"n_events")
      .orderBy($"user_id", $"session_start")
  }

  val q70Sql: String =
    """WITH x AS (
      | SELECT user_id, ts, event_id,
      |  CASE WHEN lag(ts) OVER w IS NULL
      |        OR date_diff('microsecond', lag(ts) OVER w, ts) >= 1800000000
      |       THEN 1 ELSE 0 END AS new_s
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      | SELECT user_id, ts,
      |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
      | FROM x)
      |SELECT user_id, min(ts) AS session_start,
      | max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** q41: response-time-style stats (A6: `performance_optimizer.py:88-96`) —
    * n/min/max/mean plus an EXACT median (row_number-selected middle
    * values, decimal-exact midpoint) instead of percentile_approx, so the
    * DuckDB oracle matches bit-for-bit. */
  def q41ResponseStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
    val rankW = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    val cntW = Window.partitionBy($"event_type")
    val med = ev.select($"event_type", $"value", $"event_id")
      .withColumn("rn", row_number().over(rankW))
      .withColumn("cnt", count(lit(1)).over(cntW))
      .filter($"rn" === expr("(cnt + 1) div 2") || $"rn" === expr("(cnt + 2) div 2"))
      .groupBy($"event_type")
      .agg((sum($"value".cast("decimal(18,6)")).cast("double") /
            count(lit(1)).cast("double")).as("median_value"))
    ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        min($"value").as("min_value"),
        max($"value").as("max_value"),
        (sum($"value".cast("decimal(18,6)")).cast("double") /
         count(lit(1)).cast("double")).as("mean_value"))
      .join(med, "event_type")
      .orderBy($"event_type")
  }

  val q41Sql: String =
    """WITH ranked AS (
      | SELECT event_type, value,
      |  row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
      |  count(*) OVER (PARTITION BY event_type) AS cnt
      | FROM events),
      |med AS (
      | SELECT event_type,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS median_value
      | FROM ranked WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
      | GROUP BY event_type),
      |stats AS (
      | SELECT event_type, count(*) AS n, min(value) AS min_value, max(value) AS max_value,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_value
      | FROM events GROUP BY event_type)
      |SELECT stats.event_type, n, min_value, max_value, mean_value, median_value
      |FROM stats JOIN med ON stats.event_type = med.event_type
      |ORDER BY stats.event_type""".stripMargin

  /** q42: JSON boundary codec (C8: every reference message crosses a
    * to_json/from_json boundary, `master/master_node.py:89,151`) —
    * encode a struct, decode it back with an explicit schema, verify
    * the roundtrip columns. */
  def q42JsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType)))
    events(s, d)
      .select($"event_id", to_json(struct($"user_id", $"event_type")).as("payload"))
      .withColumn("parsed", from_json($"payload", schema))
      .select($"event_id", $"payload",
        $"parsed.user_id".as("user_id_rt"), $"parsed.event_type".as("event_type_rt"))
      .orderBy($"event_id")
  }

  val q42Sql: String =
    """SELECT event_id,
      | to_json(struct_pack(user_id := user_id, event_type := event_type)) AS payload,
      | user_id AS user_id_rt, event_type AS event_type_rt
      |FROM events ORDER BY event_id""".stripMargin

  /** q48: timestamp formats + elapsed-time math (C5/C6: the reference's
    * `"%Y-%m-%d %H:%M:%S"` crawl_date format `indexer_node.py:96`, epoch
    * seconds `crawler_node.py:258`, and the crawl-rate computation
    * Δcount/Δminutes `test_system.py:421-424`). */
  def q48TimeMath(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy($"event_type")
      .agg(
        date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts_str"),
        unix_timestamp(max($"ts")).as("last_epoch"),
        (unix_timestamp(max($"ts")) - unix_timestamp(min($"ts"))).as("elapsed_s"),
        count(lit(1)).as("n"))
      .withColumn("per_minute",
        $"n".cast("double") * 60.0 / $"elapsed_s".cast("double"))
      .orderBy($"event_type")
  }

  val q48Sql: String =
    """SELECT event_type,
      | strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts_str,
      | CAST(floor(epoch(max(ts))) AS BIGINT) AS last_epoch,
      | CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS elapsed_s,
      | count(*) AS n,
      | CAST(count(*) AS DOUBLE) * 60.0 / CAST(CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS DOUBLE) AS per_minute
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q56: heartbeat-liveness probe (J7): the reference master marks a
    * crawler dead when no heartbeat arrived within the timeout window
    * (30 s cadence / 60 s timeout, `crawler/crawler_node.py:123-138`,
    * `master/master_node.py:189-201`). Analogue over the events table:
    * per reporter (user_id), last-seen epoch vs the global max, dead
    * when silent longer than the timeout (24 h here — the table spans
    * 30 days at ~10 h inter-event gaps, so the scaled window yields a
    * live/dead mix like the reference's). The global max is a one-row
    * broadcast — no second shuffle and no window function; the per-key
    * agg is the only exchange, so the plan holds at any reporter count. */
  def q56Liveness(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
    val globalMax = ev.agg(unix_timestamp(max($"ts")).as("global_max_epoch"))
    ev.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        unix_timestamp(max($"ts")).as("last_epoch"))
      .crossJoin(broadcast(globalMax))
      .withColumn("status",
        when($"last_epoch" < $"global_max_epoch" - 86400L, lit("dead"))
          .otherwise(lit("alive")))
      .select($"user_id", $"n_events", $"last_epoch", $"status")
      .orderBy($"user_id")
  }

  val q56Sql: String =
    """WITH g AS (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS global_max_epoch FROM events)
      |SELECT user_id, count(*) AS n_events,
      | CAST(floor(epoch(max(ts))) AS BIGINT) AS last_epoch,
      | CASE WHEN CAST(floor(epoch(max(ts))) AS BIGINT) < (SELECT global_max_epoch FROM g) - 86400
      |      THEN 'dead' ELSE 'alive' END AS status
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q32: error/success routing counts (F12: route by outcome class). */
  def q32ErrorRouting(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .withColumn("outcome", when($"event_type" === "error", lit("failed")).otherwise(lit("ok")))
      .groupBy($"outcome")
      .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("n_users"))
      .orderBy($"outcome")
  }

  val q32Sql: String =
    """SELECT CASE WHEN event_type = 'error' THEN 'failed' ELSE 'ok' END AS outcome,
      | count(*) AS n, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
}
