package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.icelite.IceLite
import Tables._

/** Snapshot-metadata statistics coverage (A3/A7): the reference's
  * status/monitoring reads — index size, doc counts, S3 object counts
  * per prefix (`indexer/indexer_node.py:188-215`, `monitor.py:165-204`)
  * — answered from IceLite manifest stats with zero data I/O. */
object StorageQueries {

  /** q40: commit the test tables into a scratch IceLite store, then
    * answer per-table row counts purely from the manifest file stats
    * (the parquet data is never re-scanned — footer metadata recorded
    * at commit time is the only source). */
  def q40StorageStats(s: SparkSession, d: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("q40-icelite").toString
    val store = new IceLite(root)
    store.commit(Seq(
      "documents"  -> documents(s, d),
      "embeddings" -> embeddings(s, d)))
    val out = store.storageStats(s)
      .groupBy(col("table_name"))
      .agg(sum(col("n_rows")).as("n_rows"))
      .orderBy(col("table_name"))
    // storageStats rows come from the manifest (already materialized
    // driver-side), so the scratch store can be removed immediately.
    val rows = out.collect()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    s.createDataFrame(s.sparkContext.parallelize(rows.toIndexedSeq), out.schema)
  }

  val q40Sql: String =
    """SELECT 'documents' AS table_name, count(*) AS n_rows FROM documents
      |UNION ALL SELECT 'embeddings', count(*) FROM embeddings
      |ORDER BY table_name""".stripMargin
}
