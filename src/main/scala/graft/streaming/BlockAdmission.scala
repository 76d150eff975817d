package graft.streaming

import graft.operators.Dedup
import graft.util.EpochStore
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
  * State = an [[EpochStore]] of 62-bit block hashes under
  * `storeDir/blocks/batch=<e>` (one long per distinct block ever seen),
  * with the epoch's cleaned output under `storeDir/out/batch=<e>` (out is
  * the commit side — written last). Exactly-once contract: epochs are
  * keyed DETERMINISTICALLY by micro-batch id; a replayed batch first
  * UNCOMMITS its own epoch, re-decides against the store WITHOUT its own
  * prior attempt, and rewrites. A crash anywhere mid-epoch leaves it
  * invisible and replayable; nothing is admitted or emitted twice.
  */
object BlockAdmission {

  private def store(storeDir: String): EpochStore =
    EpochStore(storeDir, Seq("blocks", "out"))

  /** The per-epoch decision shared by [[start]] and the batch replay:
    * uncommit-then-rewrite `batchId`'s epoch under `storeDir`.
    */
  def admitEpoch(
      storeDir: String,
      batch: DataFrame,
      batchId: Long,
      blockWords: Int = 8): Unit = {
    val spark = batch.sparkSession
    val st = store(storeDir)
    val epoch = f"batch-$batchId%08d"
    // a replayed epoch that a compaction already folded away CANNOT safely
    // re-decide: its blocks and output live inside the compact epoch, so
    // the rewrite would read its own contribution as duplicates and the
    // clean output would be double-served. Fail loudly — the operator must
    // compact with keepLatest >= 1 so epochs still inside the streaming
    // checkpoint's uncommitted window are never merged.
    require(!st.mergedEpochs(spark).contains(epoch),
      s"epoch $epoch was already merged by a store compaction; replaying it would " +
        "double-serve its output — compact with keepLatest >= 1 (never fold the " +
        "newest epoch) to keep replays safe")
    // uncommit first (out, then blocks): the replay must not see its own
    // prior attempt in the store, and a crash here leaves the epoch
    // invisible rather than half-served
    st.uncommitEpoch(spark, epoch)
    val (out, fresh) = Dedup.blockDedupIncremental(
      readSeen(spark, storeDir), batch, blockWords)
    fresh.write.mode("overwrite").parquet(st.sideDir("blocks", epoch))
    out.write.mode("overwrite").parquet(st.sideDir("out", epoch))
  }

  /** Start the stream: `stream` must carry (doc_id, text). Cleaned output
    * accumulates under `storeDir/out`; read it with [[readClean]].
    *
    * `maxLiveEpochs > 0` is the auto-compaction dial (same discipline as
    * the ingest twins' `maxLiveTrees`): once a trigger leaves more than
    * that many committed epochs, the store is compacted with
    * `keepLatest = 1` — the newest epoch (the only one still inside the
    * streaming checkpoint's replay window) is never merged, so replays
    * stay safe and per-trigger store reads stay file-bounded without a
    * manual maintenance call.
    */
  def start(
      stream: DataFrame,
      storeDir: String,
      checkpointDir: String,
      blockWords: Int = 8,
      trigger: Trigger = Trigger.AvailableNow(),
      maxLiveEpochs: Int = 16): StreamingQuery =
    stream.writeStream
      .queryName("graft-block-admission")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          admitEpoch(storeDir, batch, batchId, blockWords)
          val spark = batch.sparkSession
          if (maxLiveEpochs > 0 &&
              store(storeDir).committedEpochs(spark).size > maxLiveEpochs)
            compactStore(spark, storeDir, targetFiles = 8, keepLatest = 1)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Every committed epoch's cleaned output. */
  def readClean(spark: SparkSession, storeDir: String): Option[DataFrame] =
    store(storeDir).readSide(spark, "out")

  /** The seen-block store: committed epochs' hash sets. */
  private def readSeen(spark: SparkSession, storeDir: String): Option[DataFrame] =
    store(storeDir).readSide(spark, "blocks")

  /** Consolidate the committed epoch dirs into one `compact-*` epoch —
    * the standing maintenance op once triggers accrete (same discipline as
    * the near-dup admission store): the hash side dedups to one distinct
    * set, the out side is a pure union, and the atomic `_MERGED` manifest
    * retires the replaced epochs in one commit. Probes/readers are
    * identical before and after. Run between triggers — maintenance does
    * not race itself.
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
      keepLatest: Int): Unit =
    store(storeDir).compact(spark, targetFiles, sweep, keepLatest) {
      case ("blocks", union) => union.distinct()
      case (_, union) => union
    }
}
