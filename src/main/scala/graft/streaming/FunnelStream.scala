package graft.streaming

import graft.operators.EventAnalytics
import graft.util.EpochStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING conversion funnel: every arriving micro-batch advances the
  * per-user frontier state (highest step reached + its chain time)
  * through the strict-order step chain, and the post-batch funnel table
  * is emitted per epoch. The online twin of [[EventAnalytics.funnel]],
  * built on [[EventAnalytics.funnelDelta]] so a fold over time-ordered
  * batches replays the stream bit-for-bit (the `events_funnel_stream`
  * oracle replays the batch funnel over each prefix).
  *
  * State = an [[EpochStore]] with a `state` side holding one
  * (u, level, tp) DELTA row per user the epoch advanced — O(touched
  * users) per epoch, resolved on read by a level-max per user (levels
  * are monotone, so resolution needs no epoch ordering) — and an `out`
  * side holding the epoch's post-merge funnel table (the commit side,
  * written last). Exactly-once contract: epochs are keyed
  * DETERMINISTICALLY by micro-batch id; a replayed batch first UNCOMMITS
  * its own epoch, re-decides against the store WITHOUT its own prior
  * attempt, and rewrites. A crash anywhere mid-epoch leaves it invisible
  * and replayable.
  */
object FunnelStream {

  private def store(storeDir: String): EpochStore =
    EpochStore(storeDir, Seq("state", "out"))

  /** The per-epoch decision shared by [[start]] and the batch replay:
    * uncommit-then-rewrite `batchId`'s epoch under `storeDir`.
    */
  def admitEpoch(
      storeDir: String,
      batch: DataFrame,
      batchId: Long,
      steps: Seq[String],
      tsColName: String = "t_us"): Unit = {
    val spark = batch.sparkSession
    val st = store(storeDir)
    val epoch = f"batch-$batchId%08d"
    require(!st.mergedEpochs(spark).contains(epoch),
      s"epoch $epoch was already merged by a store compaction; replaying it would " +
        "double-count its advancements — compact with keepLatest >= 1 (never fold " +
        "the newest epoch) to keep replays safe")
    st.uncommitEpoch(spark, epoch)
    val resolved = readState(spark, storeDir)
    val delta = EventAnalytics.funnelDelta(resolved, batch, steps, col(tsColName))
      .localCheckpoint(true)
    try {
      delta.write.mode("overwrite").parquet(st.sideDir("state", epoch))
      val newState = resolved.join(delta.select(col("u")), Seq("u"), "left_anti")
        .unionByName(delta)
      EventAnalytics.funnelCounts(newState, steps)
        .withColumn("epoch", lit(batchId))
        .write.mode("overwrite").parquet(st.sideDir("out", epoch))
    } finally graft.util.LocalCkpt.release(delta) // long-running streams
    // must not accumulate per-epoch checkpoint blocks
  }

  /** The resolved (u, level, tp) frontier over every committed epoch:
    * per-user level-max over the delta rows (levels are monotone across
    * epochs, so no epoch ordering is needed in the resolution — which is
    * also why compaction's merge is the same expression).
    */
  def readState(spark: SparkSession, storeDir: String): DataFrame =
    store(storeDir).readSide(spark, "state") match {
      case Some(df) => resolve(df)
      case None => EventAnalytics.emptyState(spark)
    }

  private def resolve(deltas: DataFrame): DataFrame =
    deltas.groupBy(col("u"))
      .agg(max(struct(col("level"), col("tp"))).as("b"))
      .select(col("u"), col("b.level").as("level"), col("b.tp").as("tp"))

  /** Every committed epoch's post-batch funnel table (step, event_type,
    * n_users, epoch).
    */
  def readFunnel(spark: SparkSession, storeDir: String): Option[DataFrame] =
    store(storeDir).readSide(spark, "out")

  /** Start the stream: `stream` must carry (`user_id`, `event_type`,
    * `tsColName`) and batches must arrive time-ordered for the stream to
    * equal the batch funnel (the same contract as every admission store's
    * first-sight semantics). Per-epoch funnel tables accumulate under
    * `storeDir/out`; read them with [[readFunnel]].
    */
  def start(
      stream: DataFrame,
      storeDir: String,
      checkpointDir: String,
      steps: Seq[String],
      tsColName: String = "t_us",
      trigger: Trigger = Trigger.AvailableNow(),
      maxLiveEpochs: Int = 16): StreamingQuery =
    stream.writeStream
      .queryName("graft-funnel-stream")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          admitEpoch(storeDir, batch, batchId, steps, tsColName)
          val spark = batch.sparkSession
          if (maxLiveEpochs > 0 &&
              store(storeDir).committedEpochs(spark).size > maxLiveEpochs)
            compactStore(spark, storeDir, targetFiles = 8, keepLatest = 1)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Consolidate the committed epochs: the `state` side re-resolves to
    * one delta row per user (the level-max merge IS the read-time
    * resolution), the `out` side is a pure union of per-epoch tables.
    * `keepLatest >= 1` is REQUIRED while the stream is live — a replayed
    * epoch that compaction folded away cannot safely re-decide.
    */
  def compactStore(
      spark: SparkSession,
      storeDir: String,
      targetFiles: Int = 8,
      keepLatest: Int = 0): Unit =
    store(storeDir).compact(spark, targetFiles, sweep = true, keepLatest) {
      case ("state", union) => resolve(union)
      case (_, union) => union
    }
}
