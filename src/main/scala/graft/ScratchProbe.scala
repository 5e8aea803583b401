package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement probe for the optimization round — compares
  * expression variants on the real sf tables. Not part of any contract;
  * delete when the round closes. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("scratch")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.Tables.documents(spark, sfDir)

    def timeIt(name: String, reps: Int = 5)(f: => Unit): Unit = {
      f // warm
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name min=${ts.min}%.3f med=${ts.sorted.apply(reps / 2)}%.3f")
    }

    import graft.ops.{Dedup, TextAnalysis}

    // A/B: minhash signature aggregation, fused kernel vs composed built-ins
    def sigsBuiltin(k: Int): DataFrame = {
      val sh = docs
        .select(col("doc_id"), TextAnalysis.tokensCol(col("text")).as("__toks"))
        .select(col("doc_id"), explode(
          when(size(col("__toks")) >= 3,
            transform(sequence(lit(1), size(col("__toks")) - 2),
              i => array_join(slice(col("__toks"), i, lit(3)), " "))))
            .as("shingle"))
      val aggs = (0 until k).map(j => min(md5(concat(col("shingle"), lit(s"#$j")))).as(s"mh$j"))
      sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    }
    timeIt("sigs_builtin")(sigsBuiltin(8).write.format("noop").mode("overwrite").save())
    timeIt("sigs_fused")(Dedup.minhashSignatures(docs, "doc_id", "text", 3, 8)
      .write.format("noop").mode("overwrite").save())
    timeIt("q21_full")(graft.queries.DedupQueries.q21MinhashLsh(spark, sfDir).count())
    timeIt("q73_full")(graft.queries.DedupQueries.q73ImageDupClusters(spark, sfDir).count())

    spark.stop()
  }
}
