package graft

import graft.operators.CorpusDiff
import graft.streaming.DriftMonitor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming drift monitor: each micro-batch scored against the summed
  * count store of everything before it; stream across a restart equals
  * the doc-level fold, and a replayed epoch rewrites itself without
  * double-counting into the reference distribution.
  */
class DriftMonitorSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame) =
    df.select(col("epoch"), col("source"), col("n_tokens_old"),
      col("n_tokens_new"), col("vocab_union"), col("kl"))
      .orderBy(col("epoch"), col("source")).collect().toSeq

  test("stream with mid-run restart == doc-level fold; replayed epoch is idempotent") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("source"), col("text"))

    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = docs.as[(Long, String, String)].collect().sortBy(_._1)
    val (firstHalf, secondHalf) = all.splitAt(all.length / 2)

    // doc-level fold reference: counts of a union == summed epoch counts,
    // so driftReport over accumulated docs is the store's semantics
    def df(half: Seq[(Long, String, String)]) =
      spark.createDataset(half.toIndexedSeq).toDF("doc_id", "source", "text")
    val fold =
      CorpusDiff.driftReport(df(Nil), df(firstHalf)).withColumn("epoch", lit(0L))
        .unionByName(
          CorpusDiff.driftReport(df(firstHalf), df(secondHalf)).withColumn("epoch", lit(1L)))

    val store = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-drift-ckpt").toString
    val source = MemoryStream[(Long, String, String)]
    def stream = source.toDF().toDF("doc_id", "source", "text")
      .select(col("source"), col("text"))

    source.addData(firstHalf.toIndexedSeq)
    val q1 = DriftMonitor.start(stream, store, ckpt)
    q1.processAllAvailable(); q1.stop()

    source.addData(secondHalf.toIndexedSeq)
    val q2 = DriftMonitor.start(stream, store, ckpt)
    q2.processAllAvailable(); q2.stop()

    val reports = DriftMonitor.readReports(spark, store)
      .getOrElse(fail("no committed reports"))
    assert(rows(reports) == rows(fold),
      "streamed drift reports must equal the doc-level fold")
    // the second epoch's drift is real: reference non-empty, KL positive
    assert(reports.filter(col("epoch") === 1L && col("kl") > 0.0).count() > 0,
      "expected positive drift against a non-empty reference")

    // replay epoch 1: uncommit-and-rewrite, reports and store unchanged
    DriftMonitor.admitEpoch(store,
      df(secondHalf).select(col("source"), col("text")), batchId = 1L)
    assert(rows(DriftMonitor.readReports(spark, store).get) == rows(fold),
      "replayed epoch must not double-count into the reference")

    // store compaction: count deltas SUM into one epoch (additivity), the
    // next batch's drift against the compacted reference equals the
    // uncompacted fold's
    DriftMonitor.compactStore(spark, store, 2)
    val dirs = new java.io.File(s"$store/counts").listFiles().map(_.getName).toSeq
    assert(dirs.size == 1 && dirs.head.startsWith("batch=compact-"),
      s"sweep must leave only the compact epoch, got $dirs")
    assert(rows(DriftMonitor.readReports(spark, store).get) == rows(fold),
      "reports unchanged by compaction")
    DriftMonitor.admitEpoch(store, df(firstHalf).select(col("source"), col("text")), batchId = 2L)
    val want2 = rows(CorpusDiff.driftReport(df(all.toIndexedSeq), df(firstHalf))
      .withColumn("epoch", lit(2L)))
    assert(rows(DriftMonitor.readReports(spark, store).get
      .filter(col("epoch") === 2L)) == want2,
      "post-compaction drift must score against the same summed reference")
  }
}
