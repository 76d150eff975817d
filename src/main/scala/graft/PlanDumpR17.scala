package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Transient plan-evidence dumper for OPTIMIZATION_r17 (not part of the
  * library surface; removed after the round's plans/r17 artifacts are
  * committed). Usage: runMain graft.PlanDumpR17 <sfDir> <suffix>
  */
object PlanDumpR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val suffix = args(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val out = s"plans/r17/${name}_$suffix.txt"
      val w = new java.io.PrintWriter(out)
      try w.write(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      finally w.close()
      System.err.println(s"[plandump] wrote $out")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    dump("dedup_minhash_lsh", SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir))
    dump("text_winnow_neardup", SparkEntry.queries("text_winnow_neardup")(spark, sfDir))
    dump("dedup_incremental", SparkEntry.queries("dedup_incremental")(spark, sfDir))
    dump("ngram_jaccard_prefix",
      graft.operators.Dedup.ngramJaccardPairs(docs, 0.8, method = "prefix"))
    spark.stop()
  }
}
