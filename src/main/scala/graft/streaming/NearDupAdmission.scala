package graft.streaming

import graft.operators.Dedup
import graft.operators.Dedup.MinHashParams
import graft.util.EpochStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming NEAR-duplicate admission: the front door of a continuously
  * ingesting training-data pipeline where an arriving document is dropped
  * if it near-duplicates (exact word-3-gram Jaccard >= threshold, MinHash
  * LSH candidates) anything already admitted — the seed corpus, earlier
  * micro-batches, or a lower-id document of its own micro-batch. The
  * online counterpart of the batch [[graft.operators.Dedup.minhashLshPairs]]
  * dedup, exactly as [[DedupStream.firstSeen]] is the online counterpart of
  * the exact-fingerprint keeper.
  *
  * Admission policy (one-pass, deterministic, order-independent within a
  * micro-batch): a batch document is REJECTED iff it has a verified
  * near-dup pair with (a) any admitted store document, or (b) any LOWER-id
  * document of the same micro-batch — whether or not that lower-id
  * document is itself admitted. (b) is the standard one-pass ingest rule:
  * chasing admission through reject chains would make a document's fate
  * depend on resolution order; rejecting against the raw batch keeps the
  * decision a pure function of (store, batch).
  *
  * State = the admitted store itself, NOT executor state-store entries:
  * each admitted micro-batch appends two partitioned parquet sets under
  * `storeDir` — the documents (`docs/batch=<id>`) and their LSH bucket
  * rows (`buckets/batch=<id>`, the [[Dedup.minhashBucketsFor]] shape). The
  * next batch's probe reads the compact bucket table and joins it against
  * the batch's buckets ([[Dedup.minhashIncrementalPairsPrebucketed]]);
  * corpus TEXT is only touched for candidate-colliding docs, so per-batch
  * cost is O(batch x collision rate) regardless of corpus size — the
  * corpus is never re-signatured and never self-paired.
  *
  * Restart contract: the store is correct under ANY replay — crash-replay
  * of the in-flight micro-batch, or an upstream that re-offers already
  * processed documents after a resume (at-least-once delivery) — because
  * admission itself is semantically idempotent: a re-offered document is a
  * Jaccard-1.0 near-duplicate of its admitted copy in the store, so a
  * replayed batch admits nothing, by the same probe that rejects genuine
  * near-dups. Each decision writes a UNIQUE epoch directory (keying by
  * bare batch id would collide across checkpoint generations and silently
  * skip a fresh pipeline's first batches), and readers only see epochs
  * whose doc AND bucket writes both carry Spark's `_SUCCESS` marker —
  * a crash between the two writes leaves an uncommitted, invisible epoch.
  * NearDupAdmissionSpec drives the stop-resume-and-replay scenario.
  */
object NearDupAdmission {

  /** One admission decision in pure batch form: the rows of `batch` that
    * survive against `store` under the policy above. `store = None` is the
    * empty-store bootstrap (first epoch): only the internal lower-id rule
    * applies. This is the exact function the streaming query applies per
    * micro-batch, so a batch fold over ordered epochs replays the stream
    * bit-for-bit (the `dedup_admission_replay` oracle query).
    */
  def admitBatch(
      store: Option[DataFrame],
      batch: DataFrame,
      threshold: Double,
      params: MinHashParams = MinHashParams(),
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    admitBatchWithBuckets(
      store.map(st => (st, Dedup.minhashBucketsFor(st, params, idCol, textCol))),
      batch, threshold, params, idCol, textCol)._1

  /** [[admitBatch]] against a store whose bucket rows are already
    * materialized (the persisted snapshot) — what the streaming query
    * runs so the store is never re-signatured per micro-batch.
    */
  def admitBatchPrebucketed(
      store: DataFrame,
      storeBuckets: DataFrame,
      batch: DataFrame,
      threshold: Double,
      params: MinHashParams = MinHashParams(),
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    admitBatchWithBuckets(Some((store, storeBuckets)), batch, threshold, params, idCol, textCol)._1

  /** The admission decision plus the WHOLE batch's bucket table, with the
    * batch signatured exactly ONCE: the bucket table is derived a single
    * time (lazily pinned — it materializes with the decision's first job)
    * and feeds all three of its consumers — the internal lower-id gate, the
    * store probe, and (semi-joined against the caller's pinned admitted
    * ids, see [[bucketsOfAdmitted]]) the persisted snapshot the next epoch
    * probes. The non-bucket forms above derived buckets independently per
    * consumer, so every micro-batch paid the shingle+signature scan three
    * times; output is identical (bucket rows are a pure per-doc
    * projection).
    */
  def admitBatchWithBuckets(
      store: Option[(DataFrame, DataFrame)],
      batch: DataFrame,
      threshold: Double,
      params: MinHashParams = MinHashParams(),
      idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, DataFrame) = {
    val batchBuckets = Dedup.minhashBucketsFor(batch, params, idCol, textCol)
      .localCheckpoint(false)
    // both gates (batch-internal lower-id-wins + store probe) verified in
    // ONE fused Jaccard pass — same rejects, roughly half the stages per
    // micro-batch (see minhashAdmissionPairsPrebucketed)
    val rejects = Dedup.minhashAdmissionPairsPrebucketed(
        store, batch, batchBuckets, threshold, idCol, textCol)
      .select(col("doc_id").as(idCol))
    // no distinct: anti-join semantics ignore right-side multiplicity;
    // rejects is batch-bounded, so the anti-join broadcasts at plan time
    // (not via a late AQE conversion paying a stage-job first)
    (batch.join(broadcast(rejects), Seq(idCol), "left_anti"), batchBuckets)
  }

  /** The admitted docs' bucket rows: the batch bucket table filtered to the
    * (typically pinned) admitted frame — never a re-signature.
    */
  def bucketsOfAdmitted(
      batchBuckets: DataFrame, admitted: DataFrame, idCol: String = "doc_id"): DataFrame =
    batchBuckets.join(admitted.select(col(idCol).as("doc_id")), Seq("doc_id"), "left_semi")

  /** Pre-populate the store with an already-deduplicated seed corpus
    * (written as `batch=seed`, bucket snapshot included). Call once before
    * [[start]]; idempotent under the same marker rule as the stream.
    */
  def seed(
      docs: DataFrame,
      storeDir: String,
      params: MinHashParams = MinHashParams(),
      idCol: String = "doc_id",
      textCol: String = "text"): Unit =
    writeEpoch(docs.sparkSession, docs, None, storeDir, "seed", params, idCol, textCol)

  /** Start the admission stream: `stream` must carry (`idCol`, `textCol`).
    * Admitted documents and their bucket snapshots accumulate under
    * `storeDir`; the returned query is the driver of the store.
    *
    * `maxLiveEpochs > 0` is the auto-compaction dial: once a trigger
    * leaves more than that many committed epochs, the store consolidates
    * to one compact epoch, keeping the per-trigger probe file-bounded
    * without a manual maintenance call (no keep-latest guard needed —
    * epoch ids are unique per decision, so replays re-decide safely
    * against the compacted store).
    */
  def start(
      stream: DataFrame,
      storeDir: String,
      checkpointDir: String,
      threshold: Double = 0.8,
      params: MinHashParams = MinHashParams(),
      idCol: String = "doc_id",
      textCol: String = "text",
      trigger: Trigger = Trigger.AvailableNow(),
      maxLiveEpochs: Int = 16): StreamingQuery =
    stream.writeStream
      .queryName("graft-neardup-admission")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!batch.isEmpty) {
          val (admitted, batchBuckets) = admitBatchWithBuckets(
            readStore(spark, storeDir, idCol, textCol), batch, threshold, params, idCol, textCol)
          // unique per decision: replays re-decide (and, probing a store
          // that already contains this batch's admissions, admit nothing)
          // instead of colliding with a committed epoch
          val epoch = f"$batchId%08d-${java.util.UUID.randomUUID.toString.take(8)}"
          writeEpoch(spark, admitted, Some(batchBuckets), storeDir, epoch, params, idCol, textCol)
          if (maxLiveEpochs > 0 &&
              store(storeDir).committedEpochs(spark).size > maxLiveEpochs)
            compactStore(spark, storeDir)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The admitted corpus so far: docs + bucket snapshot, or None if the
    * store is empty. Committed epochs only (see restart contract); both
    * sides read over the SAME epoch listing so they can never disagree.
    */
  def readStore(
      spark: SparkSession,
      storeDir: String,
      idCol: String = "doc_id",
      textCol: String = "text"): Option[(DataFrame, DataFrame)] = {
    val st = store(storeDir)
    val epochs = st.committedEpochs(spark)
    if (epochs.isEmpty) None
    else Some((
      spark.read.parquet(st.sidePaths(epochs, "docs"): _*)
        .select(col(idCol), col(textCol)),
      spark.read.parquet(st.sidePaths(epochs, "buckets"): _*)
        .select(col("doc_id"), col("band"), col("bucket"))))
  }

  /** Compact the store: merge every committed epoch into ONE consolidated
    * epoch of `targetFiles` files per side, then sweep the replaced epoch
    * directories. A per-micro-batch ingest accretes one docs + one buckets
    * directory per trigger — at cluster scale that's the classic
    * small-files decay (probe cost becomes file-listing-bound, not
    * data-bound), so compaction is the store's standing maintenance op.
    *
    * No recompute: bucket rows are unioned from the existing snapshots,
    * never re-derived from text — compaction is pure IO.
    *
    * Crash contract: the consolidated epoch's COMMIT MARKER is its
    * `_MERGED` manifest (written last, via atomic rename), not the
    * double-`_SUCCESS` rule — the data writes land before the manifest,
    * so a crash in that window must leave the consolidated copy invisible
    * wholesale, or it and the olds it copied would both be visible and the
    * next compaction would merge the duplicates in forever. The manifest
    * names the epochs the compaction replaced; [[readStore]] excludes
    * manifest-listed epochs, so a crash AFTER the commit but mid-sweep
    * leaves stale directories that are invisible (and swept by the next
    * compaction) rather than duplicated. A crash BEFORE the commit leaves
    * an orphaned compact directory that is ignored wholesale and reclaimed
    * by the next sweep. Run it between triggers or with the stream
    * stopped — the decision loop and the sweep must not race over the same
    * directories.
    */
  def compactStore(
      spark: SparkSession,
      storeDir: String,
      targetFiles: Int = 8): Unit =
    compactStore(spark, storeDir, targetFiles, sweep = true)

  /** `sweep = false` stops after the manifest commit, leaving the replaced
    * directories on disk — the post-crash state the manifest rule makes
    * invisible (exercised by NearDupAdmissionSpec; production callers use
    * the sweeping overload). No keep-latest guard is needed, unlike the
    * block/drift stores: epoch ids are unique per DECISION, so a replayed
    * micro-batch never rewrites an old epoch — it re-decides against the
    * full committed store (its docs reject as Jaccard-1.0 dups of their
    * admitted copies), merged or not.
    */
  private[graft] def compactStore(
      spark: SparkSession,
      storeDir: String,
      targetFiles: Int,
      sweep: Boolean): Unit =
    store(storeDir).compact(spark, targetFiles, sweep, keepLatest = 0)((_, union) => union)

  private def store(storeDir: String): EpochStore =
    EpochStore(storeDir, Seq("docs", "buckets"))

  /** Write one epoch's admitted docs + bucket snapshot. Bucket rows are
    * written AFTER the docs succeed and both must be `_SUCCESS`-marked to
    * count as committed, so a crash between the two writes re-decides the
    * epoch on replay (overwrite mode clears partial output) instead of
    * probing a half-written store.
    */
  private def writeEpoch(
      spark: SparkSession,
      admitted: DataFrame,
      batchBuckets: Option[DataFrame],
      storeDir: String,
      epoch: String,
      params: MinHashParams,
      idCol: String,
      textCol: String): Unit = {
    // the admitted frame is consumed twice (docs write + bucket derivation)
    // and downstream of an expensive LSH decision — materialize it once
    val pinned = admitted.select(col(idCol), col(textCol)).localCheckpoint(true)
    try {
      if (!pinned.isEmpty) {
        pinned.write.mode("overwrite").parquet(s"$storeDir/docs/batch=$epoch")
        // with the decision's bucket table in hand the snapshot is a filter
        // of it, never a re-signature; the seed path (no decision ran)
        // derives buckets the one time
        batchBuckets.map(bucketsOfAdmitted(_, pinned, idCol))
          .getOrElse(Dedup.minhashBucketsFor(pinned, params, idCol, textCol))
          .write.mode("overwrite").parquet(s"$storeDir/buckets/batch=$epoch")
      }
    } finally graft.util.LocalCkpt.release(pinned) // long-running streams
    // must not accumulate per-epoch checkpoint blocks
  }
}
