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

    // BOOTSTRAP replay with committed epochs live is IMPOSSIBLE for a
    // genuine crash-replay (batch 1 committing proves batch 0's checkpoint
    // committed) — it means a FRESH checkpoint was pointed at a populated
    // index. Re-writing the base would silently serve new-base + stale
    // epochs, so the ingest must refuse loudly.
    val boom = intercept[IllegalArgumentException] {
      TextIngest.ingestBatch(
        spark.createDataset(firstHalf.toIndexedSeq).toDF("doc_id", "text"),
        path, batchId = 0L)
    }
    assert(boom.getMessage.contains("re-bootstrap"), boom.getMessage)
    assert(rows(TextIndex.bm25TopK(spark, path, terms, k = 20)) == want,
      "the refused re-bootstrap must leave the index untouched")

    // a GENUINE bootstrap replay (crash between write() and the checkpoint
    // commit: base committed, no epochs yet) must re-bootstrap — overwrite
    // the base, not append itself as an epoch
    val path2 = java.nio.file.Files.createTempDirectory("graft-texting-rb").toString
    val firstDf = spark.createDataset(firstHalf.toIndexedSeq).toDF("doc_id", "text")
    TextIngest.ingestBatch(firstDf, path2, batchId = 0L)
    TextIngest.ingestBatch(firstDf, path2, batchId = 0L)
    assert(!new java.io.File(s"$path2/epochs").exists() ||
      new java.io.File(s"$path2/epochs").listFiles().isEmpty,
      "a genuine bootstrap replay must overwrite the base, not append an epoch")
    assert(rows(TextIndex.bm25TopK(spark, path2, terms, k = 20)) ==
      rows(Search.bm25TopK(firstDf, terms, k = 20)),
      "the re-bootstrapped base must serve exactly the replayed batch")
  }

  test("auto-compaction bounds live trees; probes stay bit-exact; newest epoch survives for replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val want = rows(Search.bm25TopK(docs, terms, k = 20))
    val path = java.nio.file.Files.createTempDirectory("graft-texting-ac").toString
    // 8 batches through the ingest decision with a tight tree bound
    for (i <- 0 until 8)
      TextIngest.ingestBatch(docs.filter(col("doc_id") % 8 === i), path,
        batchId = i.toLong, maxLiveTrees = 3)
    assert(rows(TextIndex.bm25TopK(spark, path, terms, k = 20)) == want,
      "auto-compacted streamed index must answer identically to the full scan")
    // live trees bounded: compact epoch(s) + at most maxLiveTrees ordinaries
    val epochs = new java.io.File(s"$path/epochs").listFiles().map(_.getName).toSeq
    assert(epochs.count(!_.startsWith("compact-")) <= 3,
      s"ordinary epochs must stay bounded by maxLiveTrees, got $epochs")
    // the newest batch's epoch is never folded away (keepLatest = 1), so
    // its replay rewrites only itself
    assert(epochs.exists(_ == "batch-00000007"),
      s"newest epoch must survive compaction for replay safety, got $epochs")
    TextIngest.ingestBatch(docs.filter(col("doc_id") % 8 === 7), path,
      batchId = 7L, maxLiveTrees = 3)
    assert(rows(TextIndex.bm25TopK(spark, path, terms, k = 20)) == want,
      "replay of the newest batch after auto-compaction must not double-serve")
  }

  test("empty append/delete are no-ops: no epoch dir, probes unchanged, later compaction survives") {
    // the poison pill this guards: a slice matching NOTHING used to write
    // a footer-less zero-row epoch dir — unreadable by probe/compaction
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft-texting-empty").toString
    TextIndex.write(docs, path)
    val want = rows(TextIndex.bm25TopK(spark, path, terms, k = 20))
    val epochsBefore = Option(new java.io.File(s"$path/epochs").listFiles())
      .map(_.length).getOrElse(0)
    TextIndex.append(docs.filter(col("doc_id") < -1), path)        // empty
    TextIndex.delete(docs.filter(col("doc_id") < -1), path)
    TextIngest.ingestBatch(docs.filter(col("doc_id") < -1), path,
      batchId = 99L, maxLiveTrees = 2)
    val epochsAfter = Option(new java.io.File(s"$path/epochs").listFiles())
      .map(_.length).getOrElse(0)
    assert(epochsAfter == epochsBefore, "an empty batch must not create an epoch")
    assert(!new java.io.File(s"$path/tombstones").exists() ||
      new java.io.File(s"$path/tombstones").listFiles().isEmpty,
      "an empty delete must not create a tombstone epoch")
    assert(rows(TextIndex.bm25TopK(spark, path, terms, k = 20)) == want)
    // a real append + forced compaction after the empty ops still works
    TextIngest.ingestBatch(docs.filter(col("doc_id") < 20), path,
      batchId = 100L, maxLiveTrees = 2)
    TextIndex.bm25TopK(spark, path, terms, k = 20).count()
  }

  test("keepCols at bootstrap: streamed epochs carry metadata, filtered probes work") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("lang"))
    val path = java.nio.file.Files.createTempDirectory("graft-texting-kc").toString
    // fold form of the stream: bootstrap with keepCols, then two appends
    // that must infer and carry the metadata from the base schema
    TextIngest.ingestBatch(docs.filter(col("doc_id") % 3 === 0), path, 0L,
      keepCols = Seq("lang"))
    TextIngest.ingestBatch(docs.filter(col("doc_id") % 3 === 1), path, 1L)
    TextIngest.ingestBatch(docs.filter(col("doc_id") % 3 === 2), path, 2L)
    val en = docs.filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val got = TextIndex.bm25TopK(spark, path, terms, k = 20,
      predicate = Some(col("lang") === "en")).collect()
    assert(got.nonEmpty && got.forall(r => en(r.getLong(0))),
      "filtered probe over a streamed index must serve only matching docs")
    // includes docs from the APPENDED epochs (metadata carried, not null)
    assert(got.exists(r => r.getLong(0) % 3 != 0),
      "appended epochs' docs must be servable under the predicate")
  }
}
