package graft.streaming

import graft.operators.{Decontamination, Dedup, TextAnalysis}
import graft.operators.Dedup.MinHashParams
import graft.util.EpochStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The STREAMING curation front door: the full [[graft.operators.Curation]]
  * chain applied at ingest, one micro-batch at a time — quality + language
  * annotation and filter, benchmark decontamination, near-duplicate
  * admission against everything already admitted, then the per-stratum
  * token-budget gate. The online twin of `Curation.curate`, composed from
  * the SAME stage operators so a batch fold over ordered epochs replays the
  * stream bit-for-bit (the `pipeline_curate_stream` oracle query).
  *
  * Stage order is the batch chain's cost order, which online is also the
  * state-touching order: the two stateless stages (annotate/filter,
  * decontamination vs a fixed benchmark set) run first and shrink the
  * batch before anything probes state; the near-dup store probe sees only
  * clean survivors; the budget counters move last, so a doc never consumes
  * quota unless every upstream gate passed it.
  *
  * State = ONE epoch-committed store under `storeDir` with three sides per
  * admitted micro-batch:
  *   - `docs/batch=<e>`    — stage-3 admitted documents (the dedup corpus),
  *   - `buckets/batch=<e>` — their LSH bucket snapshot (probes stay
  *     prebucketed, the store is never re-signatured),
  *   - `out/batch=<e>`     — the final curated records (post-budget), whose
  *     per-stratum max `cum_tokens` IS the budget state the next batch
  *     resumes from.
  * An epoch is committed iff ALL THREE sides carry `_SUCCESS` (`out` is
  * written last). The single commit unit is what makes the three states
  * move atomically: a crash anywhere mid-epoch leaves the whole epoch
  * invisible, and the replayed batch re-decides against the exact state the
  * previous trigger left — re-offered documents then reject at the
  * near-dup gate (each is a Jaccard-1.0 dup of its admitted copy), so
  * nothing is admitted or budget-counted twice (CurationStreamSpec drives
  * the stop-resume-and-replay scenario). Split stores would break exactly
  * here: a doc in the dedup store but not the output (or vice versa) after
  * a crash between two commits.
  */
object CurationStream {

  /** One curation decision in pure batch form: annotate + filter →
    * decontaminate vs `bench` → near-dup admit vs `store` → budget-admit
    * against `consumed`. Returns (stage-3 admitted docs, final curated
    * records): the first accumulates into the dedup store, the second is
    * the emitted output. Both are eagerly pinned — each is consumed
    * multiple times downstream of an LSH decision.
    *
    * The final record is (doc_id, `langCol`, pred_lang, n_tokens,
    * quality_score, cum_tokens) — the batch chain's curation record plus
    * the stratum's inclusive running token total at admission.
    */
  def curateBatch(
      store: Option[(DataFrame, DataFrame)],
      consumed: Map[String, Long],
      batch: DataFrame,
      bench: DataFrame,
      budget: Long,
      minTokens: Long = 30L,
      minQuality: Double = 0.5,
      dedupThreshold: Double = 0.8,
      params: MinHashParams = MinHashParams(),
      langCol: String = "lang",
      benchGrams: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val (adm, buckets, fin) = curateBatchWithBuckets(
      store, consumed, batch, bench, budget, minTokens, minQuality,
      dedupThreshold, params, langCol, benchGrams)
    (adm, fin)
  }

  /** Every intermediate of one streaming curation decision, for callers
    * that report per-epoch stage attrition (the streaming funnel) as well
    * as the final records: annotated input → heuristic floor (+ optional
    * gates) → decontaminated → dedup-admitted (full annotated frame) →
    * budget-admitted curated records. `admittedBuckets` is the admitted
    * docs' LSH bucket snapshot for store accumulation.
    */
  final case class CurateStages(
      annotated: DataFrame,
      floored: DataFrame,
      survivors: DataFrame,
      clean: DataFrame,
      admitted: DataFrame,
      admittedBuckets: DataFrame,
      curated: DataFrame,
      // frees every checkpoint block this decision pinned (the eager
      // admission pin — which `admitted` AND `curated` are projections of
      // (r18: cum_tokens rides the admission checkpoint, so the decision
      // is ONE eager action per epoch) — and the lazy internal ones: the
      // decontaminated frame, the gate keep sets). Call ONLY when no
      // frame of this epoch will be read again: localCheckpoint truncates
      // lineage, so a released block cannot be recomputed. The production
      // stream calls it after its side writes; the batch folds (which
      // union stage frames across epochs) never do.
      release: () => Unit)

  /** [[curateBatch]] plus the admitted docs' LSH bucket rows (semi-joined
    * off the decision's own bucket table — the batch is signatured once per
    * trigger, and the store snapshot the caller accumulates is a filter,
    * never a re-signature). Returns (admitted docs, admitted bucket rows,
    * final curated records).
    */
  def curateBatchWithBuckets(
      store: Option[(DataFrame, DataFrame)],
      consumed: Map[String, Long],
      batch: DataFrame,
      bench: DataFrame,
      budget: Long,
      minTokens: Long = 30L,
      minQuality: Double = 0.5,
      dedupThreshold: Double = 0.8,
      params: MinHashParams = MinHashParams(),
      langCol: String = "lang",
      benchGrams: Option[DataFrame] = None,
      classifier: Option[(DataFrame, Long)] = None,
      minScoreMicro: Long = 0L,
      gopher: Boolean = false): (DataFrame, DataFrame, DataFrame) = {
    val st = curateBatchStages(
      store, consumed, batch, bench, budget, minTokens, minQuality,
      dedupThreshold, params, langCol, benchGrams, classifier,
      minScoreMicro, gopher)
    (st.admitted.select(col("doc_id"), col("text")), st.admittedBuckets, st.curated)
  }

  /** The same decision with every stage intermediate exposed (see
    * [[CurateStages]]) — [[curateBatchWithBuckets]] is a projection of
    * this.
    */
  def curateBatchStages(
      store: Option[(DataFrame, DataFrame)],
      consumed: Map[String, Long],
      batch: DataFrame,
      bench: DataFrame,
      budget: Long,
      minTokens: Long = 30L,
      minQuality: Double = 0.5,
      dedupThreshold: Double = 0.8,
      params: MinHashParams = MinHashParams(),
      langCol: String = "lang",
      benchGrams: Option[DataFrame] = None,
      classifier: Option[(DataFrame, Long)] = None,
      minScoreMicro: Long = 0L,
      gopher: Boolean = false): CurateStages = {
    // every checkpoint this decision creates, eager or lazy, registers
    // here — the CurateStages release handle frees them all at once
    val pins = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    val tAn0 = System.nanoTime()
    // 1: one annotate pass, same fusion as Curation.curate stage 1
    val annotated = TextAnalysis.langId(
      TextAnalysis.quality(batch, keep = Seq("text", langCol)),
      keep = Seq("text", langCol, "n_tokens", "quality_score"))
    graft.operators.Renko.logPhase("curate cAnn", (System.nanoTime() - tAn0) / 1e9)
    val heur0 = annotated
      .filter(col("n_tokens") >= minTokens && col("quality_score") >= minQuality)
    // 1a': the Gopher battery as the same per-doc gate the batch chain runs
    // (Curation.curate(gopherGate = true)); scan-local, no state touched.
    // The keep set is pinned for the same reason as the classifier's: the
    // gated survivor frame feeds three consumers per epoch, and re-running
    // the five-aggregate token fold per consumer measured ~+45% on the
    // 3-epoch stream fold
    val heur =
      if (!gopher) heur0
      else {
        val keep = TextAnalysis.gopherRules(heur0.select(col("doc_id"), col("text")))
          .filter(col("keep")).select(col("doc_id"))
          .localCheckpoint(false)
        pins += keep
        heur0.join(keep, Seq("doc_id"), "left_semi")
      }
    // 1b: learned quality gate against a PRE-TRAINED model (the seeds are
    // fixed for the stream's life, so training happens once per stream —
    // `Selection.nbClassifierModel` — never per micro-batch); the same
    // per-doc decision as Curation.curate's classifierSeeds stage
    val surv = classifier match {
      case Some((w, prior)) =>
        // pinned for the same reason as the batch chain's gate: surv is
        // multi-consumed and the scoring subtree must run once per batch
        val keep = graft.operators.Selection
          .nbScoreWithModel(heur.select(col("doc_id"), col("text")), w, prior)
          .filter(col("score_micro") >= lit(minScoreMicro))
          .select(col("doc_id"))
          .localCheckpoint(false)
        pins += keep
        heur.join(keep, Seq("doc_id"), "left_semi")
      case None => heur
    }
    // 2: benchmark decontamination — a broadcast-able anti join. The eval
    // suite is FIXED across the stream, so a repeated caller passes its
    // gram set precomputed (`benchGrams`) instead of re-shingling +
    // re-distincting the benchmark every micro-batch
    val tOv0 = System.nanoTime()
    val overlap = Decontamination.overlapReportPrepared(
      surv.select(col("doc_id"), col("text")),
      benchGrams.getOrElse(Decontamination.benchGramsOf(bench)))
    graft.operators.Renko.logPhase("curate cOverlap", (System.nanoTime() - tOv0) / 1e9)
    // LAZY checkpoint: the decontamination anti-join (a gram explode over
    // the survivors) is the chain's most expensive stage and has two
    // consumers in the funnel fold (the admission decision AND the
    // "20_decontaminated" stage aggregate) — the first execution stores
    // the blocks, the second reads them. The production stream pays the
    // storage too (its admission consumes clean), which is why its epoch
    // loop MUST call the release handle after its side writes land.
    val clean = surv.join(overlap.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .localCheckpoint(false)
    pins += clean
    // 3: near-dup admission (annotations ride along: the admit functions
    // anti-join rejects off the frame they are given)
    val tAc0 = System.nanoTime()
    val (admLazy, batchBuckets) =
      NearDupAdmission.admitBatchWithBuckets(store, clean, dedupThreshold, params)
    graft.operators.Renko.logPhase("curate cAdmBuild", (System.nanoTime() - tAc0) / 1e9)
    pins += batchBuckets // the admission's lazy bucket-table pin
    // 4: budget gate over the survivors, resuming from `consumed`; within
    // the batch admission order is doc_id order (deterministic). The
    // running total rides the ADMISSION checkpoint itself (r18): adm
    // already carries n_tokens from the annotate stage — the SAME
    // size(tokens(text)) the standalone BudgetAdmission.admitBatch
    // derives — so cum_tokens is ONE window column appended to the
    // admission plan before its single eager pin, instead of a second
    // eager checkpoint action per epoch over the already-pinned adm (the
    // window sees exactly the admitted rows either way; CurationStreamSpec
    // pins stream == batch twin).
    val baseCol = consumed.foldRight(lit(0L): org.apache.spark.sql.Column) {
      case ((s, c), rest) => when(col(langCol) === s, lit(c)).otherwise(rest)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol)).orderBy(col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tAdm0 = System.nanoTime()
    // EAGER by necessity (r17 note, unchanged by the fusion: a lazy pin
    // here is a correctness race — the epoch folds release this epoch's
    // blocks right after re-pinning their store, BEFORE the collect that
    // would materialize a lazy frame; eager materialization inside this
    // call is what makes the callers' release-after-write discipline safe)
    val admFull = graft.util.StallDiag.watch(
      batch.sparkSession, "curate adm", graft.operators.Renko.logPhase) {
      admLazy.withColumn("cum_tokens", baseCol + sum(col("n_tokens")).over(w))
        .localCheckpoint(true)
    }
    graft.operators.Renko.logPhase("curate admCkpt", (System.nanoTime() - tAdm0) / 1e9)
    pins += admFull
    val adm = admFull.drop("cum_tokens")
    // the curated record is a cheap projection over the SAME pinned
    // blocks (valid until release() — every caller either unions it into
    // its output before releasing, or writes it out first)
    val fin = admFull
      .filter(col("cum_tokens") - col("n_tokens") < lit(budget))
      .select(col("doc_id"), col(langCol), col("pred_lang"),
        col("n_tokens"), col("quality_score"), col("cum_tokens"))
    CurateStages(annotated, heur, surv, clean, adm,
      NearDupAdmission.bucketsOfAdmitted(batchBuckets, adm), fin,
      () => pins.foreach(graft.util.LocalCkpt.release))
  }

  /** Start the streaming chain: `stream` must carry (doc_id, `langCol`,
    * text); `bench` is the fixed benchmark frame decontamination screens
    * against. Admitted state accumulates under `storeDir`; the curated
    * corpus so far is [[readCurated]].
    */
  def start(
      stream: DataFrame,
      bench: DataFrame,
      storeDir: String,
      checkpointDir: String,
      budget: Long,
      minTokens: Long = 30L,
      minQuality: Double = 0.5,
      dedupThreshold: Double = 0.8,
      params: MinHashParams = MinHashParams(),
      langCol: String = "lang",
      trigger: Trigger = Trigger.AvailableNow(),
      classifierSeeds: Option[(DataFrame, DataFrame)] = None,
      minScoreMicro: Long = 0L,
      gopher: Boolean = false,
      maxLiveEpochs: Int = 16): StreamingQuery = {
    // the eval suite never changes over the stream's lifetime: shingle +
    // distinct it ONCE (pinned eagerly) instead of once per micro-batch
    val benchGrams = Decontamination.benchGramsOf(bench).localCheckpoint(true)
    // likewise the classifier seeds: train the model once per stream
    val model = classifierSeeds.map { case (pos, neg) =>
      graft.operators.Selection.nbClassifierModel(pos, neg) }
    stream.writeStream
      .queryName("graft-curation-stream")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        if (!batch.isEmpty) {
          val st0 = curateBatchStages(
            readStore(spark, storeDir), readConsumed(spark, storeDir, langCol),
            batch, bench, budget, minTokens, minQuality, dedupThreshold, params, langCol,
            benchGrams = Some(benchGrams), classifier = model,
            minScoreMicro = minScoreMicro, gopher = gopher)
          val (adm, admBuckets, fin) =
            (st0.admitted.select(col("doc_id"), col("text")), st0.admittedBuckets, st0.curated)
          // unique per decision (same rule as the admission store): replays
          // re-decide instead of colliding with a committed epoch
          val epoch = f"$batchId%08d-${java.util.UUID.randomUUID.toString.take(8)}"
          try {
            if (!adm.isEmpty) {
              adm.write.mode("overwrite").parquet(s"$storeDir/docs/batch=$epoch")
              admBuckets
                .write.mode("overwrite").parquet(s"$storeDir/buckets/batch=$epoch")
              // the commit side: the epoch exists only once this lands
              fin.write.mode("overwrite").parquet(s"$storeDir/out/batch=$epoch")
              // auto-compaction dial: keep the per-trigger store read
              // file-bounded without a manual maintenance call (unique
              // epoch ids make compacting everything replay-safe)
              if (maxLiveEpochs > 0 &&
                  store(storeDir).committedEpochs(spark).size > maxLiveEpochs)
                compactStore(spark, storeDir)
            }
          } finally st0.release() // free EVERY checkpoint this epoch
          // pinned (adm/fin eager, clean/keep-set lazy) — a long-running
          // stream must not accumulate them (same discipline as
          // SpanAdmission); nothing of the epoch is read after the writes
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  private def store(storeDir: String): EpochStore =
    EpochStore(storeDir, Seq("docs", "buckets", "out"))

  /** The curated corpus so far: every committed epoch's final records. */
  def readCurated(spark: SparkSession, storeDir: String): Option[DataFrame] =
    store(storeDir).readSide(spark, "out")

  /** The dedup side of the store (docs + bucket snapshot), committed
    * epochs only — both sides read over the SAME epoch listing so they
    * can never disagree.
    */
  private def readStore(
      spark: SparkSession, storeDir: String): Option[(DataFrame, DataFrame)] = {
    val st = store(storeDir)
    val epochs = st.committedEpochs(spark)
    if (epochs.isEmpty) None
    else Some((
      spark.read.parquet(st.sidePaths(epochs, "docs"): _*)
        .select(col("doc_id"), col("text")),
      spark.read.parquet(st.sidePaths(epochs, "buckets"): _*)
        .select(col("doc_id"), col("band"), col("bucket"))))
  }

  /** The budget state: each stratum's max admitted `cum_tokens` across the
    * committed output — a strata-sized collect, the same driver-resident
    * map the batch fold carries.
    */
  private def readConsumed(
      spark: SparkSession, storeDir: String, langCol: String): Map[String, Long] =
    readCurated(spark, storeDir) match {
      case None => Map.empty
      case Some(cur) => cur.groupBy(col(langCol)).agg(max("cum_tokens").as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }

  /** Consolidate every committed epoch's THREE sides into one
    * `compact-<uuid>` epoch and sweep the replaced directories — the same
    * standing maintenance op as the admission/block/drift stores (one
    * docs+buckets+out directory accretes per trigger; at cluster scale
    * that's the small-files decay that makes the per-trigger store read
    * file-listing-bound). Pure IO: all three sides are unioned, never
    * re-derived — the budget state (max `cum_tokens` per stratum over
    * `out`) and the dedup corpus are row-preserved by construction.
    *
    * Crash contract: the consolidated epoch's commit marker is its
    * `_MERGED` manifest (written last via atomic rename, naming the
    * replaced epochs) — a crash before it leaves an orphaned invisible
    * compact epoch (reclaimed by the next sweep), after it leaves replaced
    * directories that are already invisible. Safe against replays WITHOUT
    * a keep-latest guard, unlike the block/drift stores: this store's
    * epoch ids are unique per DECISION (batchId + random suffix), so a
    * replayed micro-batch never rewrites an old epoch — it re-decides
    * against the full committed store (its docs reject at the dedup gate
    * as Jaccard-1.0 dups of their admitted copies), merged or not. Run it
    * between triggers or with the stream stopped — maintenance and the
    * decision loop must not race over the same directories.
    */
  def compactStore(
      spark: SparkSession,
      storeDir: String,
      targetFiles: Int = 8): Unit =
    compactStore(spark, storeDir, targetFiles, sweep = true)

  /** `sweep = false` stops after the manifest commit — the post-crash
    * state the manifest rule makes invisible (exercised by
    * CurationStreamSpec; production uses the sweeping overload).
    */
  private[graft] def compactStore(
      spark: SparkSession,
      storeDir: String,
      targetFiles: Int,
      sweep: Boolean): Unit =
    store(storeDir).compact(spark, targetFiles, sweep, keepLatest = 0)((_, union) => union)
}
