package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed pipeline a training-data team
  * actually runs before tokenization, built entirely from this library's
  * oracle-green stages so the WHOLE chain stays DuckDB-checkable
  * (pipeline_curate). Stage order is the 100 TB cost order — each stage is
  * strictly cheaper per surviving row than the next, so the expensive work
  * runs on the smallest possible set:
  *
  *   1. annotate + filter (quality metrics, language ID): pure scan-local
  *      projections ([[TextAnalysis.quality]]/[[TextAnalysis.langId]] fused
  *      over one scan), no shuffle;
  *   1b. (optional, `classifierSeeds`) model-based quality gate: keep
  *      documents the in-engine Naive-Bayes classifier
  *      ([[Selection.nbClassifierScores]], trained on the given pos/neg
  *      seeds) scores at or above `minScoreMicro` — the fastText/CCNet-
  *      style learned filter layered over the heuristic floor; one
  *      broadcast model join + per-doc aggregate, still pre-gram-join;
  *   2. benchmark decontamination: drop any document sharing an 8-gram
  *      with the eval set ([[Decontamination.overlapReport]]; the bloom
  *      variant cuts the gram stream at the scan — identical output);
  *   3. near-duplicate removal: MinHash-LSH verified pairs at
  *      `dedupThreshold`, keep the lowest-id member of every pair
  *      ([[Dedup.minhashLshPairs]] — the only pairwise stage, deliberately
  *      last so it sees only clean survivors);
  *   4. mixture sampling: deterministic per-language keep rates, a pure
  *      function of (seed, doc_id) ([[Sampling.stratifiedSample]]) — no
  *      RNG, so the drawn corpus is reproducible run-over-run;
  *   5. (optional, `tokenBudget`) token-space quota: cap each language at
  *      N tokens in deterministic hash order
  *      ([[Sampling.tokenBudgetSample]] over the ALREADY-annotated
  *      n_tokens — no second tokenize pass), the final "stop at the token
  *      count the training run needs" cut.
  *
  * Output: one curation record per kept document —
  * (doc_id, `langCol`, pred_lang, n_tokens, quality_score), plus
  * `cum_tokens` (the stratum's running token total in draw order) when
  * `tokenBudget` is set.
  */
object Curation {

  def curate(
      docs: DataFrame,
      bench: DataFrame,
      minTokens: Long = 30L,
      minQuality: Double = 0.5,
      langFracs: Map[String, Double] = Map.empty,
      defaultFrac: Double = 1.0,
      dedupThreshold: Double = 0.8,
      langCol: String = "lang",
      seed: String = "graft",
      bloomGrams: Option[Long] = None,
      tokenBudget: Option[Long] = None,
      classifierSeeds: Option[(DataFrame, DataFrame)] = None,
      minScoreMicro: Long = 0L,
      gopherGate: Boolean = false): DataFrame = {
    // 1: one annotate pass — langId over quality's output keeps both stages
    // in a single scan-stage projection (no join of two derivations)
    val annotated = TextAnalysis.langId(
      TextAnalysis.quality(docs, keep = Seq("text", langCol)),
      keep = Seq("text", langCol, "n_tokens", "quality_score"))
    val heur0 = annotated
      .filter(col("n_tokens") >= minTokens && col("quality_score") >= minQuality)
    // 1a': (optional) the Gopher rule battery as a stage — the standard
    // pre-model web-curation gate ([[TextAnalysis.gopherRules]], default
    // thresholds) layered over the heuristic floor. A pure scan-local
    // per-doc decision, so it needs no pinning and commutes with the
    // stream's epoch restriction like every other per-doc stage
    val heur =
      if (!gopherGate) heur0
      else {
        val keep = TextAnalysis.gopherRules(heur0.select(col("doc_id"), col("text")))
          .filter(col("keep")).select(col("doc_id"))
        heur0.join(keep, Seq("doc_id"), "left_semi")
      }
    // 1b: learned quality gate over the heuristic survivors — semi-join on
    // the classifier's keep set (scores are exact integers, so the cut is
    // partition-order-stable and oracle-replayable). The keep set is
    // PINNED: `surv` is consumed by decontamination, the clean anti-join,
    // and the dedup pair scan, and an unpinned gate would re-run the
    // feature explode + model aggregation once per consumer (measured 2x
    // on the composed chain)
    val surv = classifierSeeds match {
      case Some((pos, neg)) =>
        val keep = Selection
          .nbClassifierScores(heur.select(col("doc_id"), col("text")), pos, neg)
          .filter(col("score_micro") >= lit(minScoreMicro))
          .select(col("doc_id"))
          .localCheckpoint(false)
        heur.join(keep, Seq("doc_id"), "left_semi")
      case None => heur
    }
    // 2: decontaminate — overlapReport returns exactly the contaminated
    // doc ids, so removal is a broadcast-able anti join
    val overlap = bloomGrams match {
      case Some(n) => Decontamination.overlapReportBloom(
        surv.select(col("doc_id"), col("text")), bench, estimatedGrams = n)
      case None => Decontamination.overlapReport(
        surv.select(col("doc_id"), col("text")), bench)
    }
    // LAZY-pinned (r17): `clean` embeds the decontamination gram anti-join
    // and feeds TWO consumers — the LSH pair scan and the dedup anti-join
    // below — so the unpinned plan re-ran the annotate + gram stages once
    // per consumer (the funnel twin already pins for the same reason, and
    // measured FASTER than this chain while computing five extra stage
    // aggregates). One-shot callers rely on the ContextCleaner to reap the
    // blocks, matching the funnel's discipline.
    val clean = surv.join(overlap.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .localCheckpoint(false)
    // 3: near-dup removal — pairs have id_a < id_b, so dropping every id_b
    // keeps the lowest-id member of each verified pair
    val pairs = Dedup.minhashLshPairs(
      clean.select(col("doc_id"), col("text")), dedupThreshold)
    val deduped = clean.join(
      pairs.select(col("id_b").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
    // 4: deterministic mixture draw over the metadata language column
    val sampled =
      if (langFracs.isEmpty) deduped
      else Sampling.stratifiedSample(deduped, langCol, langFracs, defaultFrac, seed)
    val base = sampled.select(col("doc_id"), col(langCol), col("pred_lang"),
      col("n_tokens"), col("quality_score"))
    // 5: token quota over the annotated counts (hierarchical exact prefix —
    // never a one-task-per-language window)
    tokenBudget match {
      case Some(b) =>
        Sampling.tokenBudgetSample(base, b, langCol, tokensCol = Some("n_tokens"))
      case None => base
    }
  }

  /** The pipeline_e2e chain with STAGE-LEVEL RESUMABILITY (VERDICT r16
    * #3): curate → 0.5-Jaccard survivor pairs → leakage-safe grouped
    * split → shard manifest with the straddle certificate, each stage
    * persisted through a [[graft.util.StageStore]] under a content-key
    * chain. A run killed between stages (or mid-write — the store
    * discards marker-less partials) restarts by READING its finished
    * stages and computing only from the first uncommitted one, and the
    * final manifest is identical to an uninterrupted run's — witnessed by
    * the PipelineStress kill/restart arm (task-count + byte-identity) and
    * oracle-gated by pipeline_e2e_resume (same oracle as pipeline_e2e).
    *
    * `inputKey` names the input snapshot (the data dir here; a snapshot /
    * version id in production) — it roots the key chain, so the same
    * runDir can host runs over different inputs without aliasing.
    * `failAfter` is the stress witness's injected mid-run kill: throw
    * [[graft.util.StageStore.InjectedKill]] after the named stage commits.
    */
  def e2eResumable(
      corpus: DataFrame,
      bench: DataFrame,
      store: graft.util.StageStore,
      inputKey: String,
      minTokens: Long = 30L,
      minQuality: Double = 0.5,
      langFracs: Map[String, Double] = Map.empty,
      defaultFrac: Double = 1.0,
      nShards: Int = 4,
      failAfter: Option[String] = None): DataFrame = {
    import graft.util.StageStore
    def kill(name: String): Unit =
      if (failAfter.contains(name)) throw new StageStore.InjectedKill(name)
    val kCurated = StageStore.contentKey(inputKey, "curated",
      minTokens.toString, minQuality.toString,
      langFracs.toSeq.sorted.mkString(","), defaultFrac.toString)
    val curated = store.stage("curated", kCurated) {
      curate(corpus, bench, minTokens, minQuality, langFracs, defaultFrac)
    }
    kill("curated")
    val kPairs = StageStore.contentKey(kCurated, "pairs", "0.5")
    val pairs = store.stage("pairs", kPairs) {
      val survivorText = corpus.select(col("doc_id"), col("text"))
        .join(curated.select(col("doc_id")), Seq("doc_id"), "left_semi")
      Dedup.ngramJaccardPairs(survivorText, 0.5)
    }
    kill("pairs")
    val kSplit = StageStore.contentKey(kPairs, "split")
    val split = store.stage("split", kSplit) {
      Sampling.assignSplitsGrouped(curated, Dedup.connectedComponents(pairs))
    }
    kill("split")
    val kManifest = StageStore.contentKey(kSplit, "manifest", nShards.toString)
    store.stage("manifest", kManifest) {
      val manifest = Export
        .shardAssignGrouped(split, nShards, "split", tokensCol = Some("n_tokens"))
        .groupBy(col("split"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
          min_by(col("doc_id"), col("shard_pos")).as("first_doc"))
      val sa = split.select(col("doc_id").as("id_a"), col("split").as("__sa"))
      val sb = split.select(col("doc_id").as("id_b"), col("split").as("__sb"))
      val leak = pairs.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
        .agg(coalesce(sum(when(col("__sa") =!= col("__sb"), 1L).otherwise(0L)),
          lit(0L)).as("straddling_pairs"))
      manifest.crossJoin(broadcast(leak))
    }
  }

  /** The curation FUNNEL: one row per pipeline stage with surviving doc
    * and token counts — the waterfall a corpus team reads before arguing
    * about any single gate ("we lost 40% at decontamination" is a funnel
    * row, not a rerun). Stages mirror [[curate]] with the same defaults:
    * annotated input → heuristic quality floor → decontaminated →
    * near-dup-deduped → mixture-sampled.
    *
    * Output: (stage, n_docs, n_tokens), stage names sorted in pipeline
    * order. Each intermediate feeds both its own rollup and the next
    * stage, so the expensive survivor set is pinned once.
    */
  def curateFunnel(
      docs: DataFrame,
      bench: DataFrame,
      minTokens: Long = 30L,
      minQuality: Double = 0.5,
      langFracs: Map[String, Double] = Map.empty,
      defaultFrac: Double = 1.0,
      dedupThreshold: Double = 0.8,
      langCol: String = "lang",
      seed: String = "graft"): DataFrame = {
    val annotated = TextAnalysis.langId(
      TextAnalysis.quality(docs, keep = Seq("text", langCol)),
      keep = Seq("text", langCol, "n_tokens", "quality_score"))
    val heur = annotated
      .filter(col("n_tokens") >= minTokens && col("quality_score") >= minQuality)
    val overlap = Decontamination.overlapReport(
      heur.select(col("doc_id"), col("text")), bench)
    val clean = heur.join(overlap.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val pairs = Dedup.minhashLshPairs(
      clean.select(col("doc_id"), col("text")), dedupThreshold)
    val deduped = clean.join(
      pairs.select(col("id_b").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val sampled =
      if (langFracs.isEmpty) deduped
      else Sampling.stratifiedSample(deduped, langCol, langFracs, defaultFrac, seed)
    val stages = Seq(
      "00_input" -> annotated,
      "10_quality_floor" -> heur,
      "20_decontaminated" -> clean,
      "30_deduped" -> deduped,
      "40_sampled" -> sampled)
    stages.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
    }.reduce(_ unionAll _).orderBy(col("stage"))
  }
}
