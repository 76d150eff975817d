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
    // a replayed epoch that a compaction already folded away CANNOT safely
    // re-decide: its blocks and output live inside the compact epoch, so
    // the rewrite would read its own contribution as duplicates and the
    // clean output would be double-served. Fail loudly — the operator must
    // compact with keepLatest >= 1 so epochs still inside the streaming
    // checkpoint's uncommitted window are never merged.
    require(!mergedEpochs(spark, storeDir).contains(epoch),
      s"epoch $epoch was already merged by a store compaction; replaying it would " +
        "double-serve its output — compact with keepLatest >= 1 (never fold the " +
        "newest epoch) to keep replays safe")
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

  /** Consolidate the committed epoch dirs into one `compact-*` epoch —
    * the standing maintenance op once triggers accrete (same discipline as
    * the near-dup admission store): the hash side dedups to one distinct
    * set, the out side is a pure union, and the atomic `_MERGED` manifest
    * (written last into the compact epoch's blocks dir) retires the
    * replaced epochs in one commit. Probes/readers are identical before
    * and after. Run between triggers — maintenance does not race itself.
    */
  def compactStore(
      spark: SparkSession,
      storeDir: String,
      targetFiles: Int = 8,
      keepLatest: Int = 0): Unit =
    compactStore(spark, storeDir, targetFiles, sweep = true, keepLatest)

  private[graft] def compactStore(
      spark: SparkSession,
      storeDir: String,
      targetFiles: Int,
      sweep: Boolean): Unit =
    compactStore(spark, storeDir, targetFiles, sweep, keepLatest = 0)

  /** `sweep = false` stops after the manifest commit (the crash-mid-sweep
    * state; exercised by BlockAdmissionSpec). `keepLatest > 0` excludes the
    * newest N ordinary epochs from the merge — REQUIRED (>= 1) while the
    * stream is live: an epoch whose micro-batch has not passed its
    * streaming checkpoint may replay, and [[admitEpoch]] refuses to replay
    * a merged epoch rather than double-serve it.
    */
  private[graft] def compactStore(
      spark: SparkSession,
      storeDir: String,
      targetFiles: Int,
      sweep: Boolean,
      keepLatest: Int): Unit = {
    val committed = committedEpochs(spark, storeDir)
    val protectSet = committed.filterNot(_.startsWith("compact-"))
      .sorted.takeRight(keepLatest).toSet
    val olds = committed.filterNot(protectSet)
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (olds.size > 1) {
      val cpt = s"compact-${java.util.UUID.randomUUID.toString.take(8)}"
      spark.read.parquet(olds.map(e => s"$storeDir/blocks/batch=$e"): _*)
        .distinct()
        .coalesce(targetFiles)
        .write.mode("overwrite").parquet(s"$storeDir/blocks/batch=$cpt")
      spark.read.parquet(olds.map(e => s"$storeDir/out/batch=$e"): _*)
        .coalesce(targetFiles)
        .write.mode("overwrite").parquet(s"$storeDir/out/batch=$cpt")
      val tmp = new Path(s"$storeDir/blocks/batch=$cpt/_MERGED.tmp")
      val out = fs.create(tmp, true)
      try out.write(olds.mkString("\n").getBytes("UTF-8")) finally out.close()
      fs.rename(tmp, new Path(s"$storeDir/blocks/batch=$cpt/_MERGED"))
    }
    if (sweep) sweepMerged(spark, storeDir)
  }

  private def sweepMerged(spark: SparkSession, storeDir: String): Unit = {
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    mergedEpochs(spark, storeDir).foreach { e =>
      fs.delete(new Path(s"$storeDir/blocks/batch=$e"), true)
      fs.delete(new Path(s"$storeDir/out/batch=$e"), true)
    }
    val root = new Path(s"$storeDir/blocks")
    if (fs.exists(root)) fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("batch=compact-") &&
        !fs.exists(new Path(s"$storeDir/blocks/$n/_MERGED")))
      .foreach { n =>
        fs.delete(new Path(s"$storeDir/blocks/$n"), true)
        fs.delete(new Path(s"$storeDir/out/$n"), true)
      }
  }

  /** Epoch ids a committed `_MERGED` manifest replaced. */
  private def mergedEpochs(spark: SparkSession, storeDir: String): Set[String] = {
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    rawEpochs(spark, storeDir).flatMap { e =>
      val m = new Path(s"$storeDir/blocks/batch=$e/_MERGED")
      if (!fs.exists(m)) Seq.empty
      else {
        val in = fs.open(m)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }
    }.toSet
  }

  private def rawEpochs(spark: SparkSession, storeDir: String): Seq[String] = {
    val root = new Path(s"$storeDir/blocks")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch="))
      .sorted
  }

  /** Committed, un-retired epochs: ordinary epochs need both sides'
    * `_SUCCESS` (out written last — the commit side); compact epochs need
    * their `_MERGED` manifest; anything a committed manifest names is
    * dead.
    */
  private def committedEpochs(spark: SparkSession, storeDir: String): Seq[String] = {
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dead = mergedEpochs(spark, storeDir)
    rawEpochs(spark, storeDir)
      .filter { e =>
        if (e.startsWith("compact-"))
          fs.exists(new Path(s"$storeDir/blocks/batch=$e/_MERGED"))
        else Seq("blocks", "out")
          .forall(s => fs.exists(new Path(s"$storeDir/$s/batch=$e/_SUCCESS")))
      }
      .filterNot(dead)
  }
}
