package graft

import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The persisted IVF index: bit-identity with the in-plan operator, and the
  * property that justifies its existence — a probe's list scan is PARTITION
  * PRUNED to the nprobe'd cids (non-probed inverted lists are never read).
  */
class IvfIndexSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // descends through AQE wrappers (query stages hold their subplan outside
  // `children`, so a naive tree walk misses every stage's interior)
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(allNodes)
  }

  private def listsScan(p: SparkPlan): Option[FileSourceScanExec] =
    allNodes(p).collectFirst {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("lists")) => s
    }

  test("probe == in-plan ivfTopK bit-exact; scan is partition-pruned; rebuild idempotent") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString

    IvfIndex.write(emb, path, nlist = 16)
    val probe = IvfIndex.probe(spark, path, queries, k = 5, nprobe = 4)
    val direct = Similarity.ivfTopK(emb, queries, k = 5, nlist = 16, nprobe = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(rows(probe) == rows(direct), "indexed probe must be bit-identical to ivfTopK")

    // the layout really is one directory per inverted list
    val dirs = new java.io.File(s"$path/lists").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cid=")).map(_.getName).toSet
    assert(dirs.nonEmpty && dirs.size <= 16, s"expected <= nlist cid dirs, got $dirs")

    // partition pruning: the lists scan carries a cid partition filter and
    // selects strictly fewer directories than exist (nprobe=4 of 16 lists
    // per query; 10 queries can union to at most 16 but the planted corpus
    // concentrates them well below the full set)
    probe.collect()
    val scan = listsScan(probe.queryExecution.executedPlan)
      .getOrElse(fail(s"no lists scan in:\n${probe.queryExecution.executedPlan}"))
    assert(scan.partitionFilters.nonEmpty,
      s"probe scan must carry a cid partition filter:\n$scan")
    val selected = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
      .map(_.values).size
    assert(selected < dirs.size,
      s"probe must read fewer lists ($selected) than exist (${dirs.size})")

    // rebuild over the same corpus overwrites in place; probes unchanged
    IvfIndex.write(emb, path, nlist = 16)
    assert(rows(IvfIndex.probe(spark, path, queries, k = 5, nprobe = 4)) == rows(direct))
  }

  test("probe with nprobe = nlist scans every list and matches brute force (filesPerList > 1)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") >= 490)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-full").toString
    IvfIndex.write(emb, path, nlist = 8, filesPerList = 2)
    // the hot-list dial bounds files per list directory
    new java.io.File(s"$path/lists").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cid=")).foreach { d =>
        val n = d.listFiles().count(_.getName.endsWith(".parquet"))
        assert(n >= 1 && n <= 2, s"${d.getName}: expected 1..2 files, got $n")
      }
    val full = IvfIndex.probe(spark, path, queries, k = 3, nprobe = 8)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(rows(full) == rows(brute),
      "nprobe = nlist probe is exhaustive and must equal exact brute force")
  }
}
