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
}
