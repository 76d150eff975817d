package graft

import graft.operators.{IvfIndex, Search}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Index-served hybrid retrieval: the RRF fusion whose semantic arm reads
  * the persisted IVF index instead of brute-forcing the embedding table.
  * The exactness contract: with nprobe = nlist the probe is exhaustive, so
  * the fusion must be bit-identical to the brute-force `hybridRrfTopK`; at
  * a serving nprobe the semantic pool is the IVF approximation (replayed
  * exactly by the oracle) and the probe scan must stay partition-pruned.
  */
class SearchIndexedSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val terms = Seq("dup", "vector", "join", "slow")

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(allNodes)
  }

  test("nprobe = nlist fusion is bit-identical to the brute-force hybridRrfTopK") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft-hyb-ivf").toString
    IvfIndex.write(emb, path, nlist = 8)
    val indexed = Search.hybridRrfTopKIndexed(
      docs, emb.filter(col("vec_id") === 0L), path, terms, nprobe = 8)
    val brute = Search.hybridRrfTopK(docs, emb, terms, queryVecId = 0L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("rank")).collect().toSeq
    assert(rows(indexed) == rows(brute),
      "exhaustive-probe indexed fusion must equal brute-force fusion")
  }

  test("serving nprobe keeps the lists scan partition-pruned and the contract shape") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft-hyb-ivf-serve").toString
    IvfIndex.write(emb, path, nlist = 16)
    val fused = Search.hybridRrfTopKIndexed(
      docs, emb.filter(col("vec_id") === 0L), path, terms, k = 20, nprobe = 4)
    val out = fused.orderBy(col("rank")).collect()
    assert(out.nonEmpty && out.length <= 20, s"rank-bounded output, got ${out.length}")
    assert(out.map(_.getLong(1)).toSeq == (1L to out.length), "dense ranks from 1")
    // every row came from at least one arm
    assert(out.forall(r => r.getLong(3) >= 1 || r.getLong(4) >= 1),
      "a fused row must be in at least one arm's pool")
    val scans = allNodes(fused.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("lists")) => s
    }
    assert(scans.nonEmpty && scans.forall(
        _.relation.location.rootPaths.forall(_.toString.matches(".*lists/cid=\\d+$"))),
      "the semantic arm's lists scan must read only driver-pruned cid directories")
  }
}
