package graft

import graft.operators.Clustering
import graft.streaming.EmbStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming embedding moments: the epoch-store fold answers the exact
  * full-corpus covariance / top-k PCA on every prefix (integer additivity
  * of the moment sums), survives restart and replay, and compaction
  * leaves the answer bit-identical.
  */
class EmbStatsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def covRows(df: DataFrame) =
    df.orderBy(col("pos_i"), col("pos_j")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq

  private def pcaRows(df: DataFrame) =
    df.orderBy(col("component"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq

  test("stream with mid-run restart == batch covariance/PCA; replay idempotent; compaction invisible") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")

    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (firstHalf, secondHalf) = all.splitAt(all.length / 2)
    def df(half: Seq[(Long, Array[Float])]) =
      spark.createDataset(half.toIndexedSeq).toDF("vec_id", "embedding")

    val store = java.nio.file.Files.createTempDirectory("graft-embstats").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-embstats-ckpt").toString
    val source = MemoryStream[(Long, Array[Float])]
    def stream = source.toDF().toDF("vec_id", "embedding")

    // prefix exactness: after the first batch alone, the store answers
    // the batch covariance of exactly that prefix
    source.addData(firstHalf.toIndexedSeq)
    val q1 = EmbStats.start(stream, store, ckpt)
    q1.processAllAvailable(); q1.stop()
    assert(covRows(EmbStats.covariance(spark, store)) ==
      covRows(Clustering.covariance(df(firstHalf))),
      "prefix covariance must equal the batch covariance of the prefix")

    // restart continues the same store
    source.addData(secondHalf.toIndexedSeq)
    val q2 = EmbStats.start(stream, store, ckpt)
    q2.processAllAvailable(); q2.stop()
    val wantCov = covRows(Clustering.covariance(emb))
    val wantPca = pcaRows(Clustering.pcaTopK(emb, nComponents = 2, iters = 8))
    assert(covRows(EmbStats.covariance(spark, store)) == wantCov,
      "streamed covariance must equal the one-shot corpus aggregate bit-for-bit")
    assert(pcaRows(EmbStats.pcaTopK(spark, store)) == wantPca,
      "PCA over the streamed moments must equal the batch deflation chain")

    // at-least-once replay rewrites its own epoch, never double-counts
    EmbStats.admitEpoch(store, df(secondHalf), batchId = 1L)
    assert(covRows(EmbStats.covariance(spark, store)) == wantCov,
      "replayed epoch must not double-count into the moments")

    // compaction sums the moment rows — answers unchanged, store bounded
    EmbStats.compactStore(spark, store)
    val dirs = new java.io.File(s"$store/moments").listFiles().map(_.getName).toSeq
    assert(dirs.size == 1 && dirs.head.startsWith("batch=compact-"),
      s"sweep must leave only the compact epoch, got $dirs")
    assert(covRows(EmbStats.covariance(spark, store)) == wantCov &&
      pcaRows(EmbStats.pcaTopK(spark, store)) == wantPca,
      "answers unchanged by compaction")

    // a replay of a merged epoch must fail loudly, not double-count
    val boom = intercept[IllegalArgumentException] {
      EmbStats.admitEpoch(store, df(firstHalf), batchId = 0L)
    }
    assert(boom.getMessage.contains("merged"), boom.getMessage)

    // an all-null-vector epoch aggregates to a null moment row and is
    // skipped on read — covariance/PCA answers are unchanged by it
    val nulls = spark.createDataset(Seq(900000L, 900001L))
      .toDF("vec_id")
      .withColumn("embedding", lit(null).cast("array<float>"))
    EmbStats.admitEpoch(store, nulls, batchId = 99L)
    assert(covRows(EmbStats.covariance(spark, store)) == wantCov,
      "a null-vector epoch must contribute nothing to the moments")
  }
}
