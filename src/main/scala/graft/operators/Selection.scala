package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based data SELECTION over hashed n-gram features — the two
  * standard "pick the training data that looks like your target" methods
  * from the public literature, built so every arithmetic step is replayable
  * by the DuckDB oracle:
  *
  *  - [[dsirSample]] — importance resampling (Xie et al. 2023, "Data
  *    Selection for Language Models via Importance Resampling"): score every
  *    raw document by the log-likelihood ratio of a target vs a raw hashed
  *    n-gram bag-of-features model, then draw without replacement via
  *    deterministic Gumbel top-k.
  *  - [[nbClassifierScores]] — the fastText-style / CCNet-style quality
  *    classifier: a Naive-Bayes linear model trained in-engine on a
  *    positive (curated) and negative (raw) seed, applied as a scan-local
  *    scoring pass.
  *
  * Numerics contract (the [[TextAnalysis.lmScore]] convention): every ln is
  * quantized to integer micro-units via the engine-stable
  * `floor(x * 1e6 + 0.5)` BEFORE any summation, so per-doc scores are exact
  * integer sums — order-independent under any partitioning and
  * bit-replicable by the oracle. Feature hashing is the SQL-replicable
  * 31-bit polynomial fold + LCG scramble (the [[Sampling.bucket]]
  * construction) into `numBuckets` buckets.
  *
  * Scale shape: feature extraction is scan-local (tokens → unigrams +
  * bigrams, no distinct — multiplicity is the bag model); the two model
  * tables are `numBuckets`-bounded aggregates with map-side partials;
  * scoring is one broadcast join of the `numBuckets`-row weight table onto
  * the exploded features plus one partial-agg'd groupBy(doc) — no
  * corpus-sized shuffle beyond the per-doc score aggregation, and the
  * selection is a distributed TakeOrdered (k-bounded), never a global
  * window.
  */
object Selection {

  /** Feature-hash bucket of a gram: scrambled polyhash mod `numBuckets`
    * (the scramble is required for the same reason as [[Sampling.bucket]] —
    * the raw polynomial fold leaves contiguous runs).
    */
  private def bucketOf(g: Column, numBuckets: Int): Column =
    pmod(
      pmod(TextFunctions.polyHash(g) * lit(2654435761L) + lit(12345L),
        lit(2147483647L)),
      lit(numBuckets.toLong))

  /** (doc_id, b) hashed feature OCCURRENCES (with multiplicity): word
    * unigrams + bigrams of the whitespace tokenization. Multiplicity is the
    * point — both models are bag-of-features counts, not sets.
    */
  private[graft] def hashedFeatures(
      docs: DataFrame,
      numBuckets: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("w"))
    toks.select(col("doc_id"),
      explode(concat(col("w"), TextFunctions.orderedNgramsFromTokens(col("w"), 2))).as("g"))
      .select(col("doc_id"), bucketOf(col("g"), numBuckets).as("b"))
  }

  /** The add-one-smoothed log-likelihood-ratio weight table
    * (b, lw_micro BIGINT) between two feature-occurrence frames:
    * `lw(b) = ln((cntA(b)+1)/(totA+B)) - ln((cntB(b)+1)/(totB+B))`,
    * quantized. Covers ALL `numBuckets` buckets (absent buckets get the
    * smoothing floor), so scoring never needs an outer join.
    */
  private[graft] def logRatioWeights(
      featsA: DataFrame,
      featsB: DataFrame,
      numBuckets: Int): DataFrame = {
    val spark = featsA.sparkSession
    val allB = spark.range(numBuckets).select(col("id").as("b"))
    val ca = featsA.groupBy(col("b")).agg(count(lit(1)).as("ca"))
    val cb = featsB.groupBy(col("b")).agg(count(lit(1)).as("cb"))
    val ta = featsA.agg(count(lit(1)).as("ta"))
    val tb = featsB.agg(count(lit(1)).as("tb"))
    allB
      .join(ca.hint("SHUFFLE_HASH"), Seq("b"), "left")
      .join(cb.hint("SHUFFLE_HASH"), Seq("b"), "left")
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .select(col("b"),
        floor(
          (log((coalesce(col("ca"), lit(0L)) + lit(1L)).cast("double")
            / (col("ta") + lit(numBuckets.toLong)).cast("double"))
            - log((coalesce(col("cb"), lit(0L)) + lit(1L)).cast("double")
            / (col("tb") + lit(numBuckets.toLong)).cast("double")))
            * lit(1e6) + lit(0.5)).cast("long").as("lw_micro"))
  }

  /** Per-doc integer score against a weight table: (doc_id, n_feats,
    * score_micro = Σ lw_micro over the doc's feature occurrences). Docs
    * with zero features (empty token array is impossible — `split` yields
    * at least one element — but kept total) score through the left join.
    * The weight table is `numBuckets` rows: broadcast by construction.
    */
  private[graft] def scoreDocs(
      docs: DataFrame,
      weights: DataFrame,
      numBuckets: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    scoreFeats(docs, hashedFeatures(docs, numBuckets, idCol, textCol), weights, idCol)

  /** [[scoreDocs]] with the feature frame supplied — so a caller that
    * already extracted `docs`' features for the weight table (DSIR, where
    * the raw corpus is both the denominator model and the scored set)
    * never pays the tokenize+hash scan twice.
    */
  private[graft] def scoreFeats(
      docs: DataFrame,
      feats: DataFrame,
      weights: DataFrame,
      idCol: String): DataFrame = {
    val agg = feats.join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lw_micro")).as("score_micro"))
    docs.select(col(idCol).as("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"))
  }

  /** DSIR importance resampling: score each `raw` document by the hashed
    * n-gram log-likelihood ratio of `target` vs `raw`, add deterministic
    * per-doc Gumbel noise (`-ln(-ln(u))` with `u` a pure function of
    * (seed, doc_id)), and keep the top `k` by the noised score — a
    * without-replacement draw whose inclusion probabilities follow the
    * softmax of the importance weights, exactly the published procedure
    * with the RNG replaced by a replayable hash.
    *
    * Output: (doc_id, n_feats, score_micro, draw_key) for the k selected,
    * `draw_key = score_micro + gumbel_micro` — all exact integers.
    */
  def dsirSample(
      raw: DataFrame,
      target: DataFrame,
      k: Int,
      numBuckets: Int = 1024,
      seed: String = "dsir",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // the raw corpus is both the denominator model and the scored set:
    // extract its features once (lazily pinned; materializes with the
    // weight table's first job) instead of a second tokenize+hash scan
    val rawFeats = hashedFeatures(raw, numBuckets, idCol, textCol)
      .localCheckpoint(false)
    val weights = logRatioWeights(
      hashedFeatures(target, numBuckets, idCol, textCol), rawFeats, numBuckets)
    val scr = pmod(
      TextFunctions.polyHash(concat(lit(seed), lit(":"), col("doc_id").cast("string")))
        * lit(2654435761L) + lit(12345L), lit(2147483647L))
    val u = (pmod(scr, lit(1000000L)).cast("double") + lit(0.5)) / lit(1e6)
    val gumbelMicro = floor(-log(-log(u)) * lit(1e6) + lit(0.5)).cast("long")
    scoreFeats(raw, rawFeats, weights, idCol)
      .withColumn("draw_key", col("score_micro") + gumbelMicro)
      .orderBy(col("draw_key").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Naive-Bayes quality classifier, trained in-engine: add-one-smoothed
    * per-bucket log-odds from a positive seed (`pos` — the curated corpus
    * you trust) and a negative seed (`neg` — raw/rejected text), plus the
    * class-prior log-ratio; every `docs` row is scored as
    * `prior + Σ log-odds(feature)` and labeled `pred = score >= 0` — the
    * standard scalable quality gate (one trained pass, then scan-local
    * scoring forever).
    *
    * Output: (doc_id, n_feats, score_micro BIGINT, pred BOOLEAN).
    */
  def nbClassifierScores(
      docs: DataFrame,
      pos: DataFrame,
      neg: DataFrame,
      numBuckets: Int = 1024,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val weights = logRatioWeights(
      hashedFeatures(pos, numBuckets, idCol, textCol),
      hashedFeatures(neg, numBuckets, idCol, textCol),
      numBuckets)
    val np = pos.agg(count(lit(1)).as("np"))
    val nn = neg.agg(count(lit(1)).as("nn"))
    val priorMicro = floor(
      log(col("np").cast("double") / col("nn").cast("double")) * lit(1e6) + lit(0.5))
      .cast("long")
    scoreDocs(docs, weights, numBuckets, idCol, textCol)
      .crossJoin(broadcast(np.crossJoin(nn)))
      .select(col("doc_id"), col("n_feats"),
        (col("score_micro") + priorMicro).as("score_micro"))
      .withColumn("pred", col("score_micro") >= lit(0L))
  }

  /** Train the NB model ONCE and hand it back as (weight table eagerly
    * pinned, prior in micro-units) — for repeated scorers (a streaming
    * curation gate scores every micro-batch against the same seeds, and
    * must not re-train per trigger). The prior is computed driver-side
    * with the same `Math.log` the in-plan expression evaluates, so
    * [[nbScoreWithModel]] output is bit-identical to [[nbClassifierScores]]
    * (SelectionSpec pins it).
    */
  def nbClassifierModel(
      pos: DataFrame,
      neg: DataFrame,
      numBuckets: Int = 1024,
      idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, Long) = {
    val weights = logRatioWeights(
      hashedFeatures(pos, numBuckets, idCol, textCol),
      hashedFeatures(neg, numBuckets, idCol, textCol),
      numBuckets).localCheckpoint(true)
    val np = pos.count()
    val nn = neg.count()
    require(np > 0 && nn > 0, "both classifier seeds must be non-empty")
    (weights, math.floor(math.log(np.toDouble / nn.toDouble) * 1e6 + 0.5).toLong)
  }

  /** Precision/recall calibration curve of a scored, LABELED eval set —
    * the readout a quality gate's threshold is chosen from (the
    * classifier-gate twin of `Similarity.recallAtK`'s nprobe curve). For
    * every distinct score t (descending): tp/fp = labeled-positive/
    * -negative docs scoring ≥ t, fn = positives missed, precision =
    * tp/(tp+fp), recall = tp/total-positives — the standard cumulative
    * construction, exact integer arithmetic until the final divisions.
    *
    * Scale contract: NO single-task stage anywhere — the cumulative runs
    * on the hierarchical ≤1024-range pattern ([[Sampling.shufflePosition]]
    * / `Layout.hierarchicalRank`'s shape): integer-divide the threshold
    * axis into ≤1024 coarse ranges from one broadcast stats row, take
    * per-range (p, n) subtotals, prefix-sum THOSE via the broadcast
    * self-join ([[graft.util.SmallPrefix]] — no window at all on the tiny
    * frame), and finish with a range-partitioned within-range cumulative.
    * Integer
    * sums are order-independent, so this reproduces the flat descending
    * cumulative bit-for-bit while the largest window task holds one range,
    * not the whole curve — the curve frame may be eval-sample-bounded by
    * convention, but the plan no longer bets on it.
    *
    * A NULL label raises (scan-local `raise_error`): a partially-labeled
    * eval set must fail loudly, not count its unlabeled rows as negatives.
    */
  def prCurve(
      scored: DataFrame,
      labelCol: String = "label",
      scoreCol: String = "score_micro"): DataFrame = {
    val lbl = when(col(labelCol).isNull, raise_error(lit(
        s"prCurve: NULL label in '$labelCol' — label every eval row (an unlabeled row is not a negative)")))
      .otherwise(col(labelCol))
    val per = scored.groupBy(col(scoreCol).as("threshold_micro"))
      .agg(sum(when(lbl, 1L).otherwise(0L)).as("__p"),
        sum(when(lbl, 0L).otherwise(1L)).as("__n"))
    val tot = scored.agg(
      sum(when(lbl, 1L).otherwise(0L)).as("__tot"),
      min(col(scoreCol)).as("__tmn"), max(col(scoreCol)).as("__tmx"))
    // coarse range id: 0..1023, monotone in threshold. Integral scores use
    // exact integer division (degenerate span -> single range 0); FRACTIONAL
    // scores — which the public API accepts, any orderable score column —
    // bucket on clamped float division instead (`x div step` fails analysis
    // on DOUBLE): only MONOTONICITY of the coarse key matters for
    // correctness (the within-range cumulative + cross-range prefix are
    // exact either way), so float rounding in the bucket id is harmless.
    // NaN scores sort first in the descending cumulative, so they pin to
    // the top range 1023.
    import org.apache.spark.sql.types._
    val integral = scored.schema(scoreCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case FloatType | DoubleType | _: DecimalType       => false
      case other => throw new IllegalArgumentException(
        s"prCurve: score column '$scoreCol' must be numeric, got $other")
    }
    val ranged0 = per.crossJoin(broadcast(tot))
    val ranged =
      if (integral) ranged0
        .withColumn("__step", expr("((__tmx - __tmn) div 1024) + 1L"))
        .withColumn("__rng", expr("(threshold_micro - __tmn) div __step"))
      else {
        val t = col("threshold_micro").cast("double")
        // a NaN max (any NaN score) would poison every bucket id — fall
        // back to the real-valued span (min is NaN only when ALL scores
        // are, and those rows pin to 1023 before the division)
        val stepD = greatest(
          (nanvl(col("__tmx").cast("double"), col("__tmn").cast("double"))
            - col("__tmn").cast("double")) / lit(1024.0),
          lit(java.lang.Double.MIN_NORMAL))
        ranged0.withColumn("__rng",
          when(isnan(t), lit(1023L)).otherwise(
            least(lit(1023L), greatest(lit(0L),
              floor((t - col("__tmn").cast("double")) / stepD).cast("long")))))
      }
    val rangeBase = graft.util.SmallPrefix.exclusivePrefix(
        ranged.groupBy(col("__rng"))
          .agg(sum(col("__p")).as("__rp"), sum(col("__n")).as("__rn")),
        "__rng", Map("__rp" -> "__bp", "__rn" -> "__bn"), desc = true)
      .select(col("__rng"), col("__bp"), col("__bn"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__rng")).orderBy(col("threshold_micro").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ranged.join(broadcast(rangeBase), Seq("__rng"))
      .withColumn("tp", col("__bp") + sum(col("__p")).over(wIn))
      .withColumn("fp", col("__bn") + sum(col("__n")).over(wIn))
      .select(col("threshold_micro"), col("tp"), col("fp"),
        (col("__tot") - col("tp")).as("fn"),
        // explicit NaN on a zero denominator (degenerate all-one-class
        // eval set): ANSI mode would otherwise raise DIVIDE_BY_ZERO, and
        // NaN is the IEEE value the oracle engine produces for 0/0
        when(col("tp") + col("fp") === 0L, lit(Double.NaN))
          .otherwise(col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .as("precision"),
        when(col("__tot") === 0L, lit(Double.NaN))
          .otherwise(col("tp").cast("double") / col("__tot").cast("double"))
          .as("recall"))
  }

  /** Score against a pre-trained [[nbClassifierModel]] — same output shape
    * and bits as [[nbClassifierScores]], no training work.
    */
  def nbScoreWithModel(
      docs: DataFrame,
      weights: DataFrame,
      priorMicro: Long,
      numBuckets: Int = 1024,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    scoreDocs(docs, weights, numBuckets, idCol, textCol)
      .select(col("doc_id"), col("n_feats"),
        (col("score_micro") + lit(priorMicro)).as("score_micro"))
      .withColumn("pred", col("score_micro") >= lit(0L))
}
