package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.urlnorm.urlfunctions._

/** Frontier-analytics operators — diagnostics a production crawl runs
  * over its own frontier/fetchlog tables to keep the URL space sane.
  * The reference has no defense against crawler traps (its frontier
  * grows unboundedly through calendar pages, session-id links, infinite
  * pagination — `master/master_node.py:163-175` enqueues every unseen
  * link); at 10^10-URL scale trap detection is what keeps the seen-set
  * sizing math valid.
  */
object Frontier {

  /** T51: crawl-trap detection by URL-template explosion (the classic
    * heuristic from Heydon & Najork's Mercator crawler: collapse digit
    * runs in the path and count distinct URLs per (host, template) —
    * calendar/pagination/session traps produce one template with
    * unbounded fill, real content families stay small).
    *
    * Returns every (host, template) with its distinct-URL count and a
    * `trap` flag at `minDistinct`. Downstream the flag gates frontier
    * admission (join on host+template, drop or depth-cap trapped
    * families).
    *
    * Scale shape: host/path/template are per-row projections
    * (whole-stage codegen, the url expressions are native Catalyst);
    * the count-distinct is ONE hash aggregation keyed on
    * (host, template, path) partial-agg'd map-side, then a second agg
    * to (host, template) — Spark plans distinct-agg exactly this way,
    * no row explosion. Skew: a trapped host concentrates rows on one
    * (host, template) key, but partial aggregation collapses each
    * partition's duplicates before the exchange, so the shuffle
    * carries at most (distinct paths) rows — which is the quantity
    * being measured; a key too hot to aggregate IS a trap and shows up
    * as such.
    */
  def trapTemplates(urls: DataFrame, urlCol: String, minDistinct: Long): DataFrame =
    urls
      .select(url_host(col(urlCol)).as("host"), url_path(col(urlCol)).as("path"))
      .withColumn("template", regexp_replace(col("path"), "[0-9]+", "N"))
      .groupBy(col("host"), col("template"))
      .agg(countDistinct(col("path")).as("n_urls"))
      .withColumn("trap", col("n_urls") >= minDistinct)

  /** T54: max-min-fair per-host wave allocation (water-filling). Given
    * a frontier and a global wave capacity C, pick per-host quotas
    * a_h = min(pending_h, L) with L the largest level whose total fits
    * C — the classic max-min fairness solution. A proportional split
    * (C * pending_h / total) hands a hot host most of the wave (the
    * north-rule skew failure); a flat cap C/m starves nothing but
    * wastes capacity on hosts with fewer pages than the cap. Max-min
    * gives every host its full demand until the budget binds, then a
    * uniform level — exactly the fairness a politeness-bound crawler
    * wants (cf. the reference's flat `max(1, len(urls) // count)` split,
    * `master/master_node.py:163-175`, which over-allocates small hosts).
    *
    * The level is found WITHOUT driver iteration, in closed form over
    * the pending-count histogram: for each distinct count c (ascending,
    * with a virtual c=0 row so an over-subscribed budget still lands),
    * total(c) = sum_{c_i<=c} c_i*n_i + hosts_gt(c)*c is the capacity a
    * level-c allocation uses; the binding row is the max feasible c,
    * and L = c + (C - total(c)) div hosts_gt(c) (everything fits when
    * hosts_gt = 0 → L = c_max). Monotonicity of total(c) makes the
    * closed form exact — if the division pushed L past the next
    * distinct count, that row would itself be feasible.
    *
    * Scale shape: one host-keyed count shuffle (the frontier never
    * moves further); the histogram has O(distinct pending values) rows
    * — bounded like degreeDistribution's second agg — so its ordered
    * prefix-sum window on a single partition is O(small); the 1-row
    * level broadcasts back onto the per-host counts. All integers.
    */
  def fairHostQuota(frontier: DataFrame, hostCol: String, capacity: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = frontier.groupBy(col(hostCol).as("host"))
      .agg(count(lit(1)).as("pending"))
      .localCheckpoint() // feeds the histogram AND the quota join
    val hist = counts.groupBy(col("pending").as("c"))
      .agg(count(lit(1)).as("n_hosts"))
      .unionByName(frontier.sparkSession.range(1)
        .select(lit(0L).as("c"), lit(0L).as("n_hosts")))
    val w = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val level = hist
      .withColumn("sum_le", sum(col("c") * col("n_hosts")).over(w))
      .withColumn("hosts_gt", sum(col("n_hosts")).over(all) - sum(col("n_hosts")).over(w))
      .withColumn("total_at", col("sum_le") + col("hosts_gt") * col("c"))
      .withColumn("c_max", max(col("c")).over(all))
      .filter(col("total_at") <= capacity)
      .orderBy(col("c").desc).limit(1)
      // `div`, not `/`: Spark's / on longs is double division, and a
      // >2^53 capacity would round the level
      .select(when(col("hosts_gt") === 0, col("c_max"))
        .otherwise(col("c") + expr(s"(${capacity}L - total_at) div hosts_gt"))
        .as("level"))
    counts.crossJoin(broadcast(level))
      .select(col("host"), col("pending"),
        least(col("pending"), col("level")).as("quota"))
  }
}
