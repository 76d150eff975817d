package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway microbenchmark (r18, not shipped — lives under tools/): times
  * the epochs-probe planning pieces directly, outside the bench harness's
  * cold-JVM noise, to attribute the probe floor (signature walk vs listing
  * vs the probe job itself).
  */
object ProbePlanBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val lex = SparkEntry.buildEpochTextIndex(spark, dir, "ppb")
    val ivf = SparkEntry.buildEpochIvfIndex(spark, dir, "ppb")

    def time(n: Int)(f: => Unit): Double = {
      val t0 = System.nanoTime(); (1 to n).foreach(_ => f)
      (System.nanoTime() - t0) / 1e9 / n
    }
    // warm
    operators.TextIndex.bm25TopK(spark, lex, Seq("dup", "vector", "join", "slow"), 20).count()
    operators.IvfIndex.probe(spark, ivf,
      spark.read.parquet(s"$dir/embeddings.parquet").filter(col("vec_id") < 10), 5).count()

    println(f"signature(lexRoot)   ${time(50)(graft.util.IndexMetaCache.signature(spark, lex))}%8.5f s")
    println(f"signature(ivfRoot)   ${time(50)(graft.util.IndexMetaCache.signature(spark, ivf))}%8.5f s")
    println(f"lex liveTrees(cached)${time(50)(operators.TextIndex.liveTrees(spark, lex))}%8.5f s")
    println(f"lex bm25 plan-only   ${time(20)(operators.TextIndex.bm25TopK(spark, lex, Seq("dup", "vector", "join", "slow"), 20))}%8.5f s")
    println(f"lex bm25 count       ${time(20)(operators.TextIndex.bm25TopK(spark, lex, Seq("dup", "vector", "join", "slow"), 20).count())}%8.5f s")
    val q = spark.read.parquet(s"$dir/embeddings.parquet").filter(col("vec_id") < 10)
    println(f"ivf probe plan-only  ${time(20)(operators.IvfIndex.probe(spark, ivf, q, 5))}%8.5f s")
    println(f"ivf probe count      ${time(20)(operators.IvfIndex.probe(spark, ivf, q, 5).count())}%8.5f s")
    spark.stop()
  }
}
