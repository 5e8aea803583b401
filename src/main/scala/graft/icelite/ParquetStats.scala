package graft.icelite

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/**
 * Per-directory parquet statistics from file footers — the manifest
 * stats Iceberg carries per data file (A3/A7: the reference walks the
 * index dir summing sizes, `indexer/indexer_node.py:188-200`, and lists
 * S3 prefixes, `monitor.py:165-204`). Footer reads are driver-side
 * metadata only (a few KB per file); no Spark job is launched, which
 * also lets the wave loop skip whole count() jobs.
 */
object ParquetStats {
  case class DirStat(dir: String, rows: Long, bytes: Long, files: Int)

  private val hconf = new Configuration()

  /** Row/byte/file counts for one delta dir of part-*.parquet files. */
  def dirStat(dir: String): DirStat = {
    val parts = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    var rows = 0L
    var bytes = 0L
    parts.foreach { f =>
      bytes += f.length()
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), hconf))
      try rows += reader.getRecordCount
      finally reader.close()
    }
    DirStat(dir, rows, bytes, parts.length)
  }
}
