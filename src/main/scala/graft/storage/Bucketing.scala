package graft.storage

import org.apache.spark.sql.DataFrame

/**
 * Write-side bucketing for co-located joins — the scale path for
 * fact-to-fact joins that are too big to broadcast and too frequent to
 * re-shuffle per query (e.g. frontier ⋈ fetchlog on url, lineitem ⋈
 * orders on orderkey). Both sides hash-partitioned into the same number
 * of buckets on the join key at WRITE time; every later equi-join on
 * that key reads bucket i against bucket i directly — Catalyst plans a
 * sort-merge join with zero Exchange operators (PlanAuditSpec pins
 * this). At 100 TB this converts the dominant per-query shuffle into a
 * one-time layout cost amortized across every downstream query.
 *
 * The analogue in the reference is content-addressed S3 placement
 * (`crawler/crawler_node.py:252-277`) — a fixed hash layout that later
 * readers exploit; here the layout is the hash-bucket file structure
 * plus catalog metadata.
 */
object Bucketing {

  /** Write `df` as a parquet table bucketed (and sorted) on `bucketCol`
    * at `path`, registered in the session catalog as `tableName`
    * (external table; the catalog holds only the bucket spec). */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
                    bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(tableName)
}
