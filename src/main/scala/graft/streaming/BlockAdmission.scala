package graft.streaming

import graft.operators.Dedup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING block-level dedup (the CCNet/C4 paragraph-hash pass at the
  * ingest front door): every arriving document sheds any fixed-width word
  * block whose hash has EVER been seen before — across all earlier
  * micro-batches and, keep-first, within its own — and the stitched
  * survivor text is emitted. The online twin of [[Dedup.blockDedup]],
  * built on [[Dedup.blockDedupIncremental]] so a batch fold over ordered
  * epochs replays the stream bit-for-bit (the `dedup_blocks_stream`
  * oracle collapses the fold into one min over an (epoch, doc_id, pos)
  * composite key).
  *
  * State = an epoch-committed store of 62-bit block hashes under
  * `storeDir/blocks/batch=<e>` (one long per distinct block ever seen),
  * with the epoch's cleaned output under `storeDir/out/batch=<e>`.
  * Exactly-once contract: epochs are keyed DETERMINISTICALLY by
  * micro-batch id; a replayed batch first UNCOMMITS its own epoch (out is
  * deleted before blocks — out's `_SUCCESS` is the commit marker, written
  * last), re-decides against the store WITHOUT its own prior attempt, and
  * rewrites. A crash anywhere mid-epoch leaves it invisible and
  * replayable; nothing is admitted or emitted twice.
  */
object BlockAdmission {

  /** The per-epoch decision shared by [[start]] and the batch replay:
    * uncommit-then-rewrite `batchId`'s epoch under `storeDir`.
    */
  def admitEpoch(
      storeDir: String,
      batch: DataFrame,
      batchId: Long,
      blockWords: Int = 8): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epoch = f"batch-$batchId%08d"
    // uncommit first (out, then blocks): the replay must not see its own
    // prior attempt in the store, and a crash here leaves the epoch
    // invisible rather than half-served
    fs.delete(new Path(s"$storeDir/out/batch=$epoch"), true)
    fs.delete(new Path(s"$storeDir/blocks/batch=$epoch"), true)
    val (out, fresh) = Dedup.blockDedupIncremental(
      readSeen(spark, storeDir), batch, blockWords)
    fresh.write.mode("overwrite").parquet(s"$storeDir/blocks/batch=$epoch")
    out.write.mode("overwrite").parquet(s"$storeDir/out/batch=$epoch")
  }

  /** Start the stream: `stream` must carry (doc_id, text). Cleaned output
    * accumulates under `storeDir/out`; read it with [[readClean]].
    */
  def start(
      stream: DataFrame,
      storeDir: String,
      checkpointDir: String,
      blockWords: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .queryName("graft-block-admission")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) admitEpoch(storeDir, batch, batchId, blockWords)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Every committed epoch's cleaned output. */
  def readClean(spark: SparkSession, storeDir: String): Option[DataFrame] = {
    val epochs = committedEpochs(spark, storeDir)
    if (epochs.isEmpty) None
    else Some(spark.read.parquet(epochs.map(e => s"$storeDir/out/batch=$e"): _*))
  }

  /** The seen-block store: committed epochs' hash sets. */
  private def readSeen(spark: SparkSession, storeDir: String): Option[DataFrame] = {
    val epochs = committedEpochs(spark, storeDir)
    if (epochs.isEmpty) None
    else Some(spark.read.parquet(epochs.map(e => s"$storeDir/blocks/batch=$e"): _*))
  }

  /** Epochs whose blocks AND out writes both carry `_SUCCESS` (out is
    * written last — it is the commit side).
    */
  private def committedEpochs(spark: SparkSession, storeDir: String): Seq[String] = {
    val root = new Path(s"$storeDir/blocks")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch="))
      .filter(e => Seq("blocks", "out")
        .forall(s => fs.exists(new Path(s"$storeDir/$s/batch=$e/_SUCCESS"))))
      .sorted
  }
}
