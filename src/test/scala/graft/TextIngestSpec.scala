package graft

import graft.operators.{Search, TextIndex}
import graft.streaming.TextIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming lexical-index ingest: micro-batches accrete as deterministic
  * committed posting epochs. Pins the three contracts — stream result ==
  * in-plan BM25 over everything ingested, mid-stream restart continues the
  * same index, and a replayed micro-batch overwrites its own epoch instead
  * of double-serving it.
  */
class TextIngestSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val terms = Seq("dup", "vector", "join", "slow")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("rank")).collect().toSeq

  test("stream with mid-run restart == in-plan bm25; replayed batch is idempotent") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val want = rows(Search.bm25TopK(docs, terms, k = 20))

    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val (firstHalf, secondHalf) = all.splitAt(all.length / 2)

    val path = java.nio.file.Files.createTempDirectory("graft-texting").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-texting-ckpt").toString
    val source = MemoryStream[(Long, String)]
    def stream = source.toDF().toDF("doc_id", "text")

    // run 1: bootstrap batch, then stop — the restart must pick up from
    // the checkpoint, not re-bootstrap
    source.addData(firstHalf.toIndexedSeq)
    val q1 = TextIngest.start(stream, path, ckpt)
    q1.processAllAvailable(); q1.stop()

    source.addData(secondHalf.toIndexedSeq)
    val q2 = TextIngest.start(stream, path, ckpt)
    q2.processAllAvailable(); q2.stop()

    assert(rows(TextIndex.bm25TopK(spark, path, terms, k = 20)) == want,
      "streamed index must answer identically to the in-plan scan of the union")

    // at-least-once replay: re-applying a batch under its deterministic
    // epoch id overwrites, never duplicates
    val epochsBefore = new java.io.File(s"$path/epochs").listFiles().map(_.getName).toSet
    TextIngest.ingestBatch(
      spark.createDataset(secondHalf.toIndexedSeq).toDF("doc_id", "text"),
      path, batchId = 1L)
    val epochsAfter = new java.io.File(s"$path/epochs").listFiles().map(_.getName).toSet
    assert(epochsAfter == epochsBefore, s"replay must not add epochs: $epochsBefore -> $epochsAfter")
    assert(rows(TextIndex.bm25TopK(spark, path, terms, k = 20)) == want,
      "replayed batch must leave probes unchanged (no double-counted documents)")
  }
}
