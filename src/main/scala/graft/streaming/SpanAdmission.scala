package graft.streaming

import graft.operators.Dedup
import graft.util.EpochStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING dup-span coverage at the ingest front door: every arriving
  * document is scored with its duplicated-k-gram coverage against the
  * cumulative corpus (all earlier micro-batches plus its own) the moment
  * it arrives — the online twin of [[Dedup.dupSpanStats]], built on
  * [[Dedup.dupSpanStatsIncremental]] so a batch fold over ordered epochs
  * replays the stream bit-for-bit (the `dedup_spans_stream` oracle
  * collapses the fold into one per-hash cumulative window). The emitted
  * `dup_frac` is the admission-time screen ("how much of this doc already
  * exists here") that ingest pipelines threshold on; stats are
  * forward-only — an earlier doc's score never retracts as the corpus
  * grows.
  *
  * The same store also drives the CLEANUP twin
  * ([[Dedup.removeDupSpansIncremental]]): each epoch's span-cleaned text
  * lands under `storeDir/clean/batch=<e>` — the first-seen document keeps
  * its copy forever (arrival order is canonical), later arrivals shed the
  * spans the store already owns, and a single batch carrying the whole
  * corpus is bit-identical to `Dedup.removeDupSpans`.
  *
  * State = an [[EpochStore]] of per-gram-hash distinct-doc counts under
  * `storeDir/grams/batch=<e>` (a long hash and a count each — the
  * cumulative count is the per-hash SUM of epoch deltas; its hash set is
  * the membership the removal twin probes), with the epoch's cleaned text
  * under `storeDir/clean/batch=<e>` and its stats under
  * `storeDir/out/batch=<e>` (out is the commit side, written last).
  * Exactly-once contract identical to [[BlockAdmission]]: deterministic
  * batch-keyed epochs, uncommit-then-rewrite on replay, a crash mid-epoch
  * leaves it invisible.
  */
object SpanAdmission {

  private def store(storeDir: String): EpochStore =
    EpochStore(storeDir, Seq("grams", "clean", "out"))

  /** The per-epoch decision shared by [[start]] and the batch replay:
    * uncommit-then-rewrite `batchId`'s epoch under `storeDir`.
    */
  def admitEpoch(
      storeDir: String,
      batch: DataFrame,
      batchId: Long,
      k: Int = 8): Unit = {
    val spark = batch.sparkSession
    val st = store(storeDir)
    val epoch = f"batch-$batchId%08d"
    // same merged-epoch guard as the block admission: a compaction-folded
    // epoch cannot re-decide without double-counting its own grams
    require(!st.mergedEpochs(spark).contains(epoch),
      s"epoch $epoch was already merged by a store compaction; replaying it would " +
        "double-count its gram contributions — compact with keepLatest >= 1 (never " +
        "fold the newest epoch) to keep replays safe")
    st.uncommitEpoch(spark, epoch)
    // one tokenize+explode+hash pass serves both twins: stats and the
    // cleanup ((h, nd) counts are a superset of the membership the removal
    // needs — earlier epochs keep their copies, this batch sheds the spans
    // they already own)
    val (out, clean, delta, release) = Dedup.spanAdmitIncremental(
      readSeen(spark, storeDir), batch, k)
    try {
      delta.write.mode("overwrite").parquet(st.sideDir("grams", epoch))
      clean.write.mode("overwrite").parquet(st.sideDir("clean", epoch))
      out.write.mode("overwrite").parquet(st.sideDir("out", epoch))
    } finally release() // free the epoch's pinned gram blocks immediately —
    // a long-running stream must not accumulate checkpointed RDDs
  }

  /** Start the stream: `stream` must carry (doc_id, text). Admission-time
    * stats accumulate under `storeDir/out`; read them with [[readStats]].
    * `maxLiveEpochs > 0` auto-compacts with `keepLatest = 1` (the newest
    * epoch stays un-merged so its replay window remains safe).
    */
  def start(
      stream: DataFrame,
      storeDir: String,
      checkpointDir: String,
      k: Int = 8,
      trigger: Trigger = Trigger.AvailableNow(),
      maxLiveEpochs: Int = 16): StreamingQuery =
    stream.writeStream
      .queryName("graft-span-admission")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          admitEpoch(storeDir, batch, batchId, k)
          val spark = batch.sparkSession
          if (maxLiveEpochs > 0 &&
              store(storeDir).committedEpochs(spark).size > maxLiveEpochs)
            compactStore(spark, storeDir, targetFiles = 8, keepLatest = 1)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Every committed epoch's admission-time stats. */
  def readStats(spark: SparkSession, storeDir: String): Option[DataFrame] =
    store(storeDir).readSide(spark, "out")

  /** Every committed epoch's span-cleaned output (the removal twin:
    * first-seen epoch keeps its copy, later arrivals shed theirs).
    */
  def readClean(spark: SparkSession, storeDir: String): Option[DataFrame] =
    store(storeDir).readSide(spark, "clean")

  /** The seen-gram store: committed epochs' (h, nd) deltas — consumers
    * (and [[Dedup.dupSpanStatsIncremental]]) sum per hash.
    */
  private def readSeen(spark: SparkSession, storeDir: String): Option[DataFrame] =
    store(storeDir).readSide(spark, "grams")

  /** Consolidate committed epochs into one `compact-*` epoch: gram deltas
    * re-aggregate to one (h, nd) row per hash (sums are associative, so
    * readers see identical cumulative counts), the out side unions.
    */
  def compactStore(
      spark: SparkSession,
      storeDir: String,
      targetFiles: Int = 8,
      keepLatest: Int = 0): Unit =
    store(storeDir).compact(spark, targetFiles, sweep = true, keepLatest) {
      case ("grams", union) =>
        union.groupBy(col("h")).agg(sum(col("nd")).as("nd"))
      case (_, union) => union
    }
}
