package graft

import graft.operators.IvfIndex
import graft.streaming.IvfIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming IVF ingest: micro-batches accrete as deterministic committed
  * epochs under the frozen coarse quantizer. Pins the three contracts —
  * stream result == full-rebuild probe, mid-stream restart continues the
  * same index, and a replayed micro-batch overwrites its own epoch instead
  * of double-serving it.
  */
class IvfIngestSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("query_id"), col("rank")).collect().toSeq

  test("stream with mid-run restart == full-rebuild probe; replayed batch is idempotent") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val full = java.nio.file.Files.createTempDirectory("graft-ivfing-full").toString
    IvfIndex.write(emb, full, nlist = 16)
    val want = rows(IvfIndex.probe(spark, full, queries, k = 5, nprobe = 4))

    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vecs = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (firstHalf, secondHalf) = vecs.splitAt(vecs.length / 2)

    val path = java.nio.file.Files.createTempDirectory("graft-ivfing").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ivfing-ckpt").toString
    val source = MemoryStream[(Long, Array[Float])]
    def stream = source.toDF().toDF("vec_id", "embedding")

    // run 1: bootstrap batch (contains every centroid-donor id, so the
    // frozen quantizer equals the full build's), then stop — the restart
    // must pick up from the checkpoint, not re-bootstrap
    source.addData(firstHalf.toIndexedSeq)
    val q1 = IvfIngest.start(stream, path, ckpt, nlist = 16)
    q1.processAllAvailable(); q1.stop()

    source.addData(secondHalf.toIndexedSeq)
    val q2 = IvfIngest.start(stream, path, ckpt, nlist = 16)
    q2.processAllAvailable(); q2.stop()

    assert(rows(IvfIndex.probe(spark, path, queries, k = 5, nprobe = 4)) == want,
      "streamed index must probe identically to a full rebuild")

    // at-least-once replay: re-applying a batch under its deterministic
    // epoch id overwrites, never duplicates
    val epochsBefore = new java.io.File(s"$path/epochs").listFiles().map(_.getName).toSet
    IvfIngest.ingestBatch(
      spark.createDataset(secondHalf.toIndexedSeq).toDF("vec_id", "embedding"),
      path, batchId = 1L)
    val epochsAfter = new java.io.File(s"$path/epochs").listFiles().map(_.getName).toSet
    assert(epochsAfter == epochsBefore, s"replay must not add epochs: $epochsBefore -> $epochsAfter")
    assert(rows(IvfIndex.probe(spark, path, queries, k = 5, nprobe = 4)) == want,
      "replayed batch must leave probes unchanged (no double-served vectors)")

    // BOOTSTRAP replay with committed epochs live is IMPOSSIBLE for a
    // genuine crash-replay (batch 1 committing proves batch 0's checkpoint
    // committed) — it means a FRESH checkpoint over a populated index; the
    // ingest must refuse loudly rather than serve new-base + stale epochs.
    val boom = intercept[IllegalArgumentException] {
      IvfIngest.ingestBatch(
        spark.createDataset(firstHalf.toIndexedSeq).toDF("vec_id", "embedding"),
        path, batchId = 0L)
    }
    assert(boom.getMessage.contains("re-bootstrap"), boom.getMessage)
    assert(rows(IvfIndex.probe(spark, path, queries, k = 5, nprobe = 4)) == want,
      "the refused re-bootstrap must leave the index untouched")

    // a GENUINE bootstrap replay (base committed, no epochs yet) must
    // re-bootstrap — overwrite the base, not append itself as an epoch
    val path2 = java.nio.file.Files.createTempDirectory("graft-ivfing-rb").toString
    val firstDf = spark.createDataset(firstHalf.toIndexedSeq).toDF("vec_id", "embedding")
    IvfIngest.ingestBatch(firstDf, path2, batchId = 0L, nlist = 16)
    IvfIngest.ingestBatch(firstDf, path2, batchId = 0L, nlist = 16)
    assert(!new java.io.File(s"$path2/epochs").exists() ||
      new java.io.File(s"$path2/epochs").listFiles().isEmpty,
      "a genuine bootstrap replay must overwrite the base, not append an epoch")
    val fullFirst = java.nio.file.Files.createTempDirectory("graft-ivfing-rb-full").toString
    IvfIndex.write(firstDf, fullFirst, nlist = 16)
    assert(rows(IvfIndex.probe(spark, path2, queries, k = 5, nprobe = 4)) ==
      rows(IvfIndex.probe(spark, fullFirst, queries, k = 5, nprobe = 4)),
      "the re-bootstrapped base must serve exactly the replayed batch")
  }

  test("auto-compaction bounds live trees; probes stay bit-exact; newest epoch survives for replay") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val full = java.nio.file.Files.createTempDirectory("graft-ivfing-ac-full").toString
    IvfIndex.write(emb, full, nlist = 16)
    val want = rows(IvfIndex.probe(spark, full, queries, k = 5, nprobe = 4))

    val n = emb.count()
    val path = java.nio.file.Files.createTempDirectory("graft-ivfing-ac").toString
    // 8 range batches (batch 0 carries the centroid donors) with a tight
    // tree bound so the ingester compacts mid-stream
    val step = (n + 7) / 8
    for (i <- 0 until 8) {
      val lo = i * step
      val hi = if (i == 7) n else math.min(n, lo + step)
      if (lo < hi)
        IvfIngest.ingestBatch(
          emb.filter(col("vec_id") >= lo && col("vec_id") < hi), path,
          batchId = i.toLong, nlist = 16, maxLiveTrees = 3)
    }
    assert(rows(IvfIndex.probe(spark, path, queries, k = 5, nprobe = 4)) == want,
      "auto-compacted streamed index must probe identically to a full rebuild")
    val epochs = new java.io.File(s"$path/epochs").listFiles().map(_.getName).toSeq
    assert(epochs.count(!_.startsWith("compact-")) <= 3,
      s"ordinary epochs must stay bounded by maxLiveTrees, got $epochs")
    assert(epochs.contains("batch-00000007"),
      s"newest epoch must survive compaction for replay safety, got $epochs")
    IvfIngest.ingestBatch(
      emb.filter(col("vec_id") >= 7 * step), path,
      batchId = 7L, nlist = 16, maxLiveTrees = 3)
    assert(rows(IvfIndex.probe(spark, path, queries, k = 5, nprobe = 4)) == want,
      "replay of the newest batch after auto-compaction must not double-serve")
  }

  test("empty append/delete are no-ops: no epoch dir, probes unchanged, later compaction survives") {
    // the data-dependent poison pill this guards: an upstream slice that
    // matches NOTHING (ingest range past the corpus end, empty micro-batch)
    // used to write a zero-row epoch directory with no parquet footers —
    // unreadable by every later probe/compaction
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfing-empty").toString
    IvfIndex.write(emb, path, nlist = 16)
    val want = rows(IvfIndex.probe(spark, path, queries, k = 5, nprobe = 4))
    val epochsBefore = Option(new java.io.File(s"$path/epochs").listFiles())
      .map(_.length).getOrElse(0)
    IvfIndex.append(emb.filter(col("vec_id") < -1), path)          // empty
    IvfIndex.delete(emb.filter(col("vec_id") < -1).select("vec_id"), path)
    IvfIngest.ingestBatch(emb.filter(col("vec_id") < -1), path,
      batchId = 99L, maxLiveTrees = 2)                              // empty, compaction dial armed
    val epochsAfter = Option(new java.io.File(s"$path/epochs").listFiles())
      .map(_.length).getOrElse(0)
    assert(epochsAfter == epochsBefore, "an empty batch must not create an epoch")
    assert(!new java.io.File(s"$path/tombstones").exists() ||
      new java.io.File(s"$path/tombstones").listFiles().isEmpty,
      "an empty delete must not create a tombstone epoch")
    assert(rows(IvfIndex.probe(spark, path, queries, k = 5, nprobe = 4)) == want)
    // a real append + forced compaction after the empty ops still works
    IvfIngest.ingestBatch(emb.filter(col("vec_id") < 20), path,
      batchId = 100L, maxLiveTrees = 2)
    IvfIndex.probe(spark, path, queries, k = 5, nprobe = 4).count()
  }
}
