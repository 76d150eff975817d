package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cores-vs-seconds scaling witness (r18, r17 verdict #7): the full-sweep
  * 8-vs-32-core comparison at sf0.1 reads ≈1 everywhere but renko because
  * at that scale almost every entry is planning/scheduling-bound — more
  * cores cannot shrink fixed per-query constants. This harness times the
  * three operator families with the largest 100 TB exposure — index BUILD
  * (text + IVF), LSH dedup pair generation, and the batch curation chain —
  * at sf1 (the 10x synthetic scale-up [[BenchSf1]] prepares), where the
  * data term dominates, under whatever core count `SPARK_GRAFT_CPUS`
  * grants. Run it once per core count; each run writes
  * `BENCH_CORES_<cpus>.json`, and the committed `BENCH_CORES.json` merges
  * the runs with t(low)/t(high) ratios.
  *
  * Methodology matches Bench: local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, clearCache + GC per rep, min-of-2 reps,
  * count() as the timed action (builds time the write itself).
  */
object BenchCores {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.SparkLogNoise.suppressAccumulatorUpdateErrors()

    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sf1 = s"${System.getProperty("java.io.tmpdir")}/graft_sf1"
    BenchSf1.prepare(spark, base, sf1)

    def docs = spark.read.parquet(s"$sf1/documents.parquet")
    def emb = spark.read.parquet(s"$sf1/embeddings.parquet")
    def freshDir(tag: String): String = {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_cores_$tag"
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) fs.delete(hp, true)
      p
    }

    // one unit of work per family; each returns a row count so the timed
    // action is never dead code
    val workloads: Seq[(String, () => Long)] = Seq(
      "index_build_text" -> (() => {
        operators.TextIndex.write(docs, freshDir("lex"))
        0L
      }),
      "index_build_ivf" -> (() => {
        operators.IvfIndex.write(emb, freshDir("ivf"))
        0L
      }),
      "dedup_minhash_lsh" ->
        (() => SparkEntry.queries("dedup_minhash_lsh")(spark, sf1).count()),
      "pipeline_curate" ->
        (() => SparkEntry.queries("pipeline_curate")(spark, sf1).count()))

    // warmup (JIT/codegen/session)
    docs.limit(100).count()
    emb.limit(100).count()

    val rows = workloads.map { case (name, fn) =>
      def rep(): Double = {
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        fn()
        (System.nanoTime() - t0) / 1e9
      }
      val best = (1 to 2).map(_ => rep()).min
      System.err.println(f"[cores] $name%-20s $best%8.3f s  (cpus=$cpus)")
      name -> best
    }

    val json = rows.map { case (n, s) => f""""$n":$s%.3f""" }.mkString("{", ",", "}")
    val out = s"BENCH_CORES_$cpus.json"
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(s"""{"cpus":$cpus,"sf1":"$sf1","queries":$json}""")
    finally w.close()
    System.err.println(s"[cores] wrote $out")
    spark.stop()
  }
}
