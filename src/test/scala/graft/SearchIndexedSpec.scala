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

  test("filtered served fusion == RRF of the two filtered probes, per-arm") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val lexPath = java.nio.file.Files.createTempDirectory("graft-hyb-lexf").toString
    val ivfPath = java.nio.file.Files.createTempDirectory("graft-hyb-ivff").toString
    graft.operators.TextIndex.write(docs, lexPath, keepCols = Seq("lang"))
    IvfIndex.write(emb, ivfPath, nlist = 16, keepCols = Seq("label"))

    val queries = emb.filter(col("vec_id") === 0L)
    val fused = Search.hybridRrfTopKServed(spark, lexPath, ivfPath, queries, terms,
        k = 20, poolK = 50, nprobe = 4,
        lexPredicate = Some(col("lang") === "en"),
        semPredicate = Some(col("label") === 1))
      .orderBy(col("rank")).collect()
    assert(fused.nonEmpty, "filtered fusion must return rows")

    // replicate the fusion from the two FILTERED arm probes directly
    val lexPool = graft.operators.TextIndex.bm25TopK(spark, lexPath, terms, 50,
        predicate = Some(col("lang") === "en"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val semPool = IvfIndex.probe(spark, ivfPath, queries, 50, nprobe = 4,
        predicate = Some(col("label") === 1))
      .collect().map(r => r.getLong(2) -> r.getInt(1).toLong).toMap
    val expect = (lexPool.keySet ++ semPool.keySet).toSeq
      .map { d =>
        val rrf = lexPool.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          semPool.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (d, BigDecimal(rrf).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (d, rrf) => (-rrf, d) }.take(20)
    assert(fused.map(r => (r.getLong(0), r.getDouble(2))).toSeq == expect,
      "served fusion must equal the RRF of the two filtered arm pools")
    // and the arm memberships honor their predicates
    val en = docs.filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val lbl1 = emb.filter(col("label") === 1).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    fused.foreach { r =>
      if (r.getLong(3) >= 1) assert(en(r.getLong(0)), "lex arm must honor lang='en'")
      if (r.getLong(4) >= 1) assert(lbl1(r.getLong(0)), "sem arm must honor label=1")
    }
  }
}
