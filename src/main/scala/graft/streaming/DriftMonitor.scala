package graft.streaming

import graft.operators.CorpusDiff
import graft.util.EpochStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING corpus drift monitor: every micro-batch is scored against the
  * token distribution of EVERYTHING ingested before it — per-source
  * smoothed unigram KL ([[CorpusDiff.driftReport]]'s exact pico-quantized
  * arithmetic), emitted as one report row per (epoch, source). The alarm a
  * corpus team wires to a feed: a syndication change or scraper breakage
  * shows up as a KL spike the moment the batch lands, not at the next
  * nightly diff.
  *
  * State = an [[EpochStore]] of per-(source, token) COUNT deltas — counts
  * are additive, so history is one summed union of tiny epoch frames,
  * never a re-scan of old documents. Commit protocol mirrors
  * [[BlockAdmission]]: counts land first, the epoch's report last (the
  * commit side); deterministic batch-keyed epochs uncommit-then-rewrite
  * on replay, so at-least-once delivery never double-counts a batch into
  * the reference distribution.
  */
object DriftMonitor {

  private def store(storeDir: String): EpochStore =
    EpochStore(storeDir, Seq("counts", "reports"))

  /** The per-epoch decision shared by [[start]] and the batch replay. */
  def admitEpoch(
      storeDir: String,
      batch: DataFrame,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val st = store(storeDir)
    val epoch = f"batch-$batchId%08d"
    // a replayed epoch a compaction already folded away cannot re-decide:
    // its count deltas live inside the compact epoch, so the rewrite would
    // score against a reference that double-counts its own batch. Fail
    // loudly — compact with keepLatest >= 1 while the stream is live.
    require(!st.mergedEpochs(spark).contains(epoch),
      s"epoch $epoch was already merged by a store compaction; replaying it would " +
        "double-count its batch into the reference — compact with keepLatest >= 1 " +
        "(never fold the newest epoch) to keep replays safe")
    st.uncommitEpoch(spark, epoch)
    val batchCounts = CorpusDiff.tokenCounts(batch, "new").localCheckpoint(true)
    try {
      val oldCounts = readCounts(spark, storeDir).getOrElse(
        batchCounts.select(col("source"), col("tok"), col("c_new").as("c_old")).limit(0))
      val report = CorpusDiff.driftFromCounts(oldCounts, batchCounts)
        .withColumn("epoch", lit(batchId))
      batchCounts.select(col("source"), col("tok"), col("c_new").as("cnt"))
        .write.mode("overwrite").parquet(st.sideDir("counts", epoch))
      report.write.mode("overwrite").parquet(st.sideDir("reports", epoch))
    } finally graft.util.LocalCkpt.release(batchCounts) // long-running
    // streams must not accumulate per-epoch checkpoint blocks
  }

  /** Start the monitor: `stream` must carry (source, text).
    *
    * `maxLiveEpochs > 0` is the auto-compaction dial: once a trigger
    * leaves more than that many committed epochs, the store is compacted
    * with `keepLatest = 1` (the newest epoch — the only one still in the
    * checkpoint's replay window — is never merged), so the per-trigger
    * reference-distribution read stays file-bounded without a manual
    * maintenance call.
    */
  def start(
      stream: DataFrame,
      storeDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxLiveEpochs: Int = 16): StreamingQuery =
    stream.writeStream
      .queryName("graft-drift-monitor")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          admitEpoch(storeDir, batch, batchId)
          val spark = batch.sparkSession
          if (maxLiveEpochs > 0 &&
              store(storeDir).committedEpochs(spark).size > maxLiveEpochs)
            compactStore(spark, storeDir, targetFiles = 8, keepLatest = 1)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Every committed epoch's drift report. */
  def readReports(spark: SparkSession, storeDir: String): Option[DataFrame] =
    store(storeDir).readSide(spark, "reports")

  /** The reference distribution: summed committed count deltas. */
  private def readCounts(spark: SparkSession, storeDir: String): Option[DataFrame] =
    store(storeDir).readSide(spark, "counts").map(
      _.groupBy(col("source"), col("tok")).agg(sum(col("cnt")).as("c_old")))

  /** Consolidate the committed epochs into one `compact-*` epoch: the
    * count deltas SUM into one merged delta (additivity again — the
    * reference distribution is unchanged by construction), reports union,
    * and the atomic `_MERGED` manifest retires the replaced epochs. Run
    * between triggers — maintenance does not race itself.
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

  /** `keepLatest > 0` excludes the newest N ordinary epochs from the merge
    * — required (>= 1) while the stream is live, so a replay of an
    * un-checkpointed batch rewrites only its own epoch ([[admitEpoch]]
    * refuses to replay a merged one).
    */
  private[graft] def compactStore(
      spark: SparkSession,
      storeDir: String,
      targetFiles: Int,
      sweep: Boolean,
      keepLatest: Int): Unit =
    store(storeDir).compact(spark, targetFiles, sweep, keepLatest) {
      case ("counts", union) =>
        union.groupBy(col("source"), col("tok")).agg(sum(col("cnt")).as("cnt"))
      case (_, union) => union
    }
}
