package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixture control: every sampling
  * decision is a pure function of (seed, document id) via the SQL-replicable
  * polynomial hash — re-running the pipeline reproduces the exact sample
  * (no RNG state, no partition-order dependence, unlike `df.sample`), a
  * different seed draws an independent sample, and the decision can be
  * replayed by any engine (the DuckDB oracle re-derives the sample
  * bit-for-bit).
  *
  * Scale shape: a scan-local filter — no shuffle, no count-first pass, and
  * the selectivity is pushed to the scan like any other predicate. This is
  * how corpus-scale mixtures are actually drawn (per-source/per-language
  * quotas over 100 TB cannot afford a global shuffle or a two-pass exact
  * count).
  */
object Sampling {

  /** Uniform bucket in [0, 1e6) for (seed, id): polyhash of "seed:id",
    * then one LCG scramble before the final reduction. The scramble is
    * REQUIRED: the polynomial fold is h(s·c) = h(s)·31 + c, so consecutive
    * ids produce contiguous hash runs and the raw mod-1e6 bucket is
    * grotesquely non-uniform (measured: 2% of ids under the 50% threshold).
    * Multiplying by a large odd constant mod the prime spreads consecutive
    * values across the full range (the same construction as the MinHash
    * permutations); measured rates land within 0.5% of nominal. Stays in
    * long range: h < 2^31, h·2654435761 < 2^63.
    */
  private[graft] def bucket(idCol: Column, seed: String): Column =
    pmod(
      pmod(TextFunctions.polyHash(concat(lit(seed), lit(":"), idCol.cast("string")))
        * lit(2654435761L) + lit(12345L), lit(2147483647L)),
      lit(1000000L))

  /** Bernoulli sample at rate `frac`: keep iff bucket < frac * 1e6. */
  def deterministicSample(
      docs: DataFrame,
      frac: Double,
      seed: String = "graft",
      idCol: String = "doc_id"): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, "frac must be in [0, 1]")
    docs.filter(bucket(col(idCol), seed) < lit((frac * 1e6).toLong))
  }

  /** Stratified sample: per-stratum keep rates (e.g. language quotas for a
    * training mixture), `defaultFrac` for unlisted strata. The rate lookup
    * is a literal CASE chain — broadcastable-free, stays in the scan.
    */
  def stratifiedSample(
      docs: DataFrame,
      strataCol: String,
      fracs: Map[String, Double],
      defaultFrac: Double = 0.0,
      seed: String = "graft",
      idCol: String = "doc_id"): DataFrame = {
    require((fracs.values ++ Seq(defaultFrac)).forall(f => f >= 0.0 && f <= 1.0),
      "all fractions must be in [0, 1]")
    val threshold = fracs.foldRight(lit((defaultFrac * 1e6).toLong): Column) {
      case ((stratum, f), rest) =>
        when(col(strataCol) === stratum, lit((f * 1e6).toLong)).otherwise(rest)
    }
    docs.filter(bucket(col(idCol), seed) < threshold)
  }

  /** Deterministic train/val/test split assignment: each document maps to
    * the split whose cumulative bucket interval contains its scrambled
    * hash — `split` is a pure function of (seed, id), so a document's
    * assignment NEVER changes as the corpus grows, shrinks, or is
    * re-sharded. That stability is the point (and what rank-based
    * splitting cannot give): it prevents test-set leakage across corpus
    * versions, the standard failure mode of re-split pipelines. Scan-local
    * (a literal CASE chain over the hash bucket), no shuffle, no state.
    *
    * `splits` are (name, weight) with weights summing to 1; realized
    * proportions are within the hash-uniformity tolerance of nominal
    * (measured ±0.5%), and the same (seed, id) always lands identically
    * across runs, partitions, and engines (the oracle replays the exact
    * bucket arithmetic).
    */
  def assignSplits(
      docs: DataFrame,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      seed: String = "split",
      idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 >= 0.0), "weights must be >= 0")
    require(splits.map(_._1).distinct.size == splits.size, "split names must be distinct")
    // cumulative thresholds in exact micro units (long addition — no
    // float-accumulation drift into the bucket comparison)
    val micro = splits.map { case (_, w) => (w * 1e6).toLong }
    require(math.abs(micro.sum - 1000000L) <= splits.size,
      s"weights must sum to 1 (micro sum ${micro.sum})")
    val cum = micro.scanLeft(0L)(_ + _).tail
    val b = bucket(col(idCol), seed)
    // ordered CASE chain; the last split takes everything above its
    // predecessor's threshold (so rounding slack can never drop a row)
    val assigned = splits.init.zip(cum.init).reverse
      .foldLeft(lit(splits.last._1): Column) {
        case (rest, ((name, _), hi)) => when(b < lit(hi), lit(name)).otherwise(rest)
      }
    docs.withColumn("split", assigned)
  }

  /** GROUP-aware split assignment — the leakage-safe variant of
    * [[assignSplits]]: every member of a duplicate cluster gets the SAME
    * split, because the hash is taken over the cluster id (min-label
    * component id from [[Dedup.connectedComponents]]) rather than the
    * document's own id. A per-document split puts ~w_train·w_test of every
    * near-dup pair across the train/test boundary — test-set contamination
    * by construction; keying the split on the group closes that channel
    * while keeping every [[assignSplits]] property (pure function of
    * (seed, group), stable under corpus growth).
    *
    * `clusters` is (idCol, cluster_id) covering only clustered docs;
    * singletons fall back to their own id (`group_key = coalesce(cluster_id,
    * id)`). Scale shape: one equi-join on the id (broadcast when the
    * cluster frame is small — the usual case, |clusters| ≈ duplicated docs
    * only), then the same scan-local CASE chain as assignSplits.
    */
  def assignSplitsGrouped(
      docs: DataFrame,
      clusters: DataFrame,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      seed: String = "split",
      idCol: String = "doc_id"): DataFrame = {
    require(!docs.columns.contains("cluster_id") && !docs.columns.contains("group_key"),
      "docs must not already carry a cluster_id/group_key column")
    // project the cluster frame to exactly (id, cluster_id): extra columns
    // on it must never leak into the output, and the join key set stays
    // unambiguous
    val clusterKeys = clusters.select(col(idCol), col("cluster_id"))
    val grouped = docs.join(clusterKeys, Seq(idCol), "left")
      .withColumn("group_key", coalesce(col("cluster_id"), col(idCol)))
      .drop("cluster_id")
    assignSplits(grouped, splits, seed, idCol = "group_key")
  }

  /** The leakage MEASUREMENT that motivates [[assignSplitsGrouped]]: for
    * each split scheme, how many near-dup pairs STRADDLE two different
    * splits (a straddling pair is test-set contamination — the model sees
    * a near-copy of an eval document in training). Output: one row per
    * scheme (scheme, pairs_total, pairs_straddling); the grouped scheme
    * is zero by construction (both endpoints share a cluster, clusters
    * share a split), the per-document scheme leaks ~Σ_{s≠t} w_s·w_t of
    * all pairs.
    *
    * Scale shape: two broadcast-sized joins of the pair list against the
    * per-doc split assignment (pairs are the dedup family's bounded
    * candidate output, never all-pairs).
    */
  def splitLeakage(
      docs: DataFrame,
      pairs: DataFrame,
      clusters: DataFrame,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      seed: String = "split",
      idCol: String = "doc_id"): DataFrame = {
    def straddle(assigned: DataFrame, scheme: String): DataFrame = {
      val sa = assigned.select(col(idCol).as("id_a"), col("split").as("__sa"))
      val sb = assigned.select(col(idCol).as("id_b"), col("split").as("__sb"))
      pairs.select(col("id_a"), col("id_b"))
        .join(sa, Seq("id_a")).join(sb, Seq("id_b"))
        .agg(count(lit(1)).as("pairs_total"),
          sum(when(col("__sa") =!= col("__sb"), 1L).otherwise(0L))
            .as("pairs_straddling"))
        .select(lit(scheme).as("scheme"), col("pairs_total"), col("pairs_straddling"))
    }
    straddle(assignSplits(docs, splits, seed, idCol), "per_document")
      .unionByName(
        straddle(assignSplitsGrouped(docs, clusters, splits, seed, idCol), "grouped"))
  }

  /** Deterministic fixed-size sample: exactly `k` docs per stratum (all of
    * them if the stratum is smaller), chosen as the k smallest scrambled
    * hashes — a uniform without-replacement draw that is a pure function of
    * (seed, id), the primitive behind fixed-budget eval-set construction.
    * Unlike rate-based sampling, the output size is exact by construction.
    *
    * Scale shape: one shuffle by stratum; the rank-then-filter compiles to
    * Spark's WindowGroupLimit — a bounded per-partition top-k heap BEFORE
    * the shuffle, so the sort never materializes whole strata.
    */
  def fixedSizeSample(
      docs: DataFrame,
      k: Int,
      strataCol: String,
      seed: String = "fixed",
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // full-range scramble (not the mod-1e6 bucket): rank ties broken by id
    val h = pmod(
      TextFunctions.polyHash(concat(lit(seed), lit(":"), col(idCol).cast("string")))
        * lit(2654435761L) + lit(12345L), lit(2147483647L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(h.asc, col(idCol).asc)
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Length-stratified eval draw: exactly `k` documents per (group, length
    * tercile), the terciles cut at the group's OWN exact p50/p90
    * ([[TextAnalysis.lengthQuantiles]] — interpolated order statistics, so
    * the buckets follow each source's real length distribution instead of
    * global guesses). The draw inside each stratum is the deterministic
    * scrambled-hash rank [[fixedSizeSample]] uses — reproducible, nested,
    * WindowGroupLimit-bounded. The balanced-by-length eval/calibration
    * sample a corpus team pulls before shipping a tokenizer or filter
    * change.
    *
    * Output: (doc_id, group, len, len_bucket) with len_bucket in {0,1,2}.
    */
  def lengthStratifiedSample(
      docs: DataFrame,
      k: Int,
      groupCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text",
      seed: String = "len"): DataFrame = {
    val qs = TextAnalysis.lengthQuantiles(docs, groupCol, textCol)
      .select(col(groupCol), col("p50"), col("p90"))
    val bucketed = docs
      .withColumn("len", length(col(textCol)).cast("long"))
      .join(broadcast(qs), Seq(groupCol))
      .withColumn("len_bucket",
        when(col("len").cast("double") <= col("p50"), 0L)
          .when(col("len").cast("double") <= col("p90"), 1L)
          .otherwise(2L))
      .withColumn("__stratum", concat_ws(":", col(groupCol), col("len_bucket")))
    fixedSizeSample(bucketed, k, "__stratum", seed, idCol)
      .select(col(idCol).as("doc_id"), col(groupCol), col("len"), col("len_bucket"))
  }

  /** Per-domain cap by score (the RefinedWeb-style "at most N documents per
    * domain, best first" pass): keep the `cap` highest-`scoreCol` documents
    * per stratum, ties broken by id. The caller supplies the score column
    * (e.g. [[TextAnalysis.quality]]'s quality_score or a classifier
    * probability), so the same cap composes with any scoring stage.
    *
    * Scale shape: the rank-filter idiom compiles to WindowGroupLimit — each
    * map task pre-prunes to its LOCAL top-cap before the shuffle (pinned in
    * PlanQualitySpec), so a billion-doc hot domain ships ~cap rows per input
    * partition instead of concentrating its full sort into one task.
    *
    * Output: input columns + cap_rank (1-based, <= cap).
    */
  def rankCap(
      docs: DataFrame,
      cap: Int,
      strataCol: String,
      scoreCol: String,
      idCol: String = "doc_id"): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col(scoreCol).desc, col(idCol).asc)
    docs.withColumn("cap_rank", row_number().over(w).cast("long"))
      .filter(col("cap_rank") <= cap)
  }

  /** Token-budget cap per stratum: keep documents in deterministic
    * scrambled-hash order until the stratum's running token total reaches
    * `budget` — per-domain quota drawing in TOKEN space, the unit training
    * mixtures are actually specified in (doc-count quotas over-weight short
    * documents). The doc that crosses the budget is the last one kept, so
    * any non-empty stratum contributes at least one doc. Like the other
    * samplers the draw order is a pure function of (seed, id) — replayable
    * by the DuckDB oracle as a single windowed cumulative sum.
    *
    * Scale shape — a naive `sum() OVER (PARTITION BY stratum ORDER BY hash)`
    * puts an ENTIRE stratum into one task (no WindowGroupLimit pruning for
    * running sums, unlike [[fixedSizeSample]]'s rank filter), which dies on
    * any billion-doc stratum. Instead the prefix sum is computed
    * hierarchically, exactly: the hash's high bits split each stratum into
    * 1024 order-preserving ranges; per-range token totals (a tiny
    * `strata x 1024` aggregate) get an exclusive running-sum window and are
    * broadcast-joined back as each range's base offset; the in-range
    * cumulative sum then runs per (stratum, range) — 1024-way parallel, max
    * task = stratum/1024. Two scans of the text column, three exchanges
    * total, no driver-side state.
    *
    * Output: input columns + (n_tokens, cum_tokens) where `cum_tokens` is
    * the inclusive running total in draw order.
    */
  def tokenBudgetSample(
      docs: DataFrame,
      budget: Long,
      strataCol: String,
      seed: String = "budget",
      idCol: String = "doc_id",
      textCol: String = "text",
      tokensCol: Option[String] = None): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val h = pmod(
      TextFunctions.polyHash(concat(lit(seed), lit(":"), col(idCol).cast("string")))
        * lit(2654435761L) + lit(12345L), lit(2147483647L))
    // token counts come from `tokensCol` when the pipeline already
    // annotated them (the curation chain does — no second tokenize pass),
    // otherwise from the standard whitespace count over `textCol`
    val nTok = tokensCol.map(tc => col(tc).cast("long"))
      .getOrElse(size(TextFunctions.tokens(col(textCol))).cast("long"))
    // hv < 2^31, so hv >> 21 is an order-preserving range id in [0, 1024)
    val perDoc = docs
      .withColumn("__hv", h)
      .withColumn("__rng", shiftright(col("__hv"), 21))
      .withColumn("n_tokens", nTok)
    val wRange = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("__rng").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val rangeBase = perDoc
      .groupBy(col(strataCol), col("__rng"))
      .agg(sum(col("n_tokens")).as("__rtok"))
      .withColumn("__base", coalesce(sum(col("__rtok")).over(wRange), lit(0L)))
      .select(col(strataCol), col("__rng"), col("__base"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol), col("__rng"))
      .orderBy(col("__hv").asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perDoc
      .join(broadcast(rangeBase), Seq(strataCol, "__rng"))
      .withColumn("cum_tokens", col("__base") + sum(col("n_tokens")).over(wIn))
      .filter(col("cum_tokens") - col("n_tokens") < lit(budget))
      .drop("__hv", "__rng", "__base")
  }

  /** Deterministic global shuffle position: each doc's exact 1-based rank
    * in scrambled-hash order — the "shuffle the corpus before packing"
    * primitive that fixes a training order as a pure function of
    * (seed, id). Reproducible across runs and engines (no RNG, no
    * partition-order dependence), and a different seed is an independent
    * permutation.
    *
    * Scale shape — the naive `row_number() OVER (ORDER BY hash)` funnels
    * the whole corpus through ONE task. Exact global rank is instead
    * computed hierarchically like [[tokenBudgetSample]]'s prefix sum: the
    * hash's high bits are an order-preserving 1024-way range split, the
    * per-range counts (a 1024-row aggregate) get an exclusive running-sum
    * window and broadcast back as each range's rank base, and ranking runs
    * per range — max task = corpus/1024 (and the range count could scale
    * with the corpus; it is fixed here because the testdata never needs
    * more). Same result as the flat window, never its single-task sort.
    *
    * Output: input columns + `position` (1-based, dense, unique).
    */
  def shufflePosition(
      docs: DataFrame,
      seed: String = "shuffle",
      idCol: String = "doc_id"): DataFrame = {
    val h = pmod(
      TextFunctions.polyHash(concat(lit(seed), lit(":"), col(idCol).cast("string")))
        * lit(2654435761L) + lit(12345L), lit(2147483647L))
    val perDoc = docs
      .withColumn("__hv", h)
      .withColumn("__rng", shiftright(col("__hv"), 21))
    // <=1024 rows: the exclusive prefix over the tiny range frame is a
    // broadcast self-join (SmallPrefix) — no single-task window anywhere
    val rangeBase = graft.util.SmallPrefix.exclusivePrefix(
        perDoc.groupBy(col("__rng")).agg(count(lit(1)).as("__rcnt")),
        "__rng", Map("__rcnt" -> "__base"))
      .select(col("__rng"), col("__base"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__rng"))
      .orderBy(col("__hv").asc, col(idCol).asc)
    perDoc
      .join(broadcast(rangeBase), Seq("__rng"))
      .withColumn("position", col("__base") + row_number().over(wIn).cast("long"))
      .drop("__hv", "__rng", "__base")
  }

  /** Temperature-based mixture sampling (the multilingual pre-training
    * standard — sample stratum `l` with probability ∝ n_l^α, α < 1
    * up-weighting small strata; mBERT/XLM-R exponent-smoothed sampling):
    * draw a TOTAL of ~`totalDocs` documents with per-stratum quotas
    * `k_l = floor(totalDocs * n_l^α / Σ_m n_m^α)`, each stratum's draw the
    * k_l smallest scrambled hashes (the [[fixedSizeSample]] order).
    *
    * Exactness contract: α is restricted to {0.0, 0.5, 1.0} so the weight
    * arithmetic is cross-engine exact — `sqrt` is IEEE-correctly-rounded
    * on both engines (a general `pow` is not), each stratum weight is
    * quantized to integer micro-units, and the quota division is INTEGER
    * division of exact integers. Quota remainders are dropped (the output
    * is ≤ totalDocs by up to #strata docs) — the deterministic floor rule,
    * not largest-remainder apportionment.
    *
    * Scale shape: the stratum census is one tiny partial-agg'd aggregate
    * (broadcast back as quota literals per row); selection reuses the
    * hierarchical 1024-range rank of [[shufflePosition]] — never a
    * whole-stratum single-task sort. (The WindowGroupLimit heap that
    * rescues [[fixedSizeSample]] needs a LITERAL limit, which a per-stratum
    * quota column is not — the range split is what bounds task size here.)
    *
    * Output: input columns + (n_tokens-free) `draw_rank` (1-based within
    * stratum, in draw order).
    */
  def temperatureSample(
      docs: DataFrame,
      totalDocs: Long,
      strataCol: String,
      alpha: Double = 0.5,
      seed: String = "temp",
      idCol: String = "doc_id"): DataFrame = {
    require(totalDocs >= 1, "totalDocs must be >= 1")
    require(Seq(0.0, 0.5, 1.0).contains(alpha),
      s"alpha must be one of 0.0, 0.5, 1.0 (cross-engine-exact weights), got $alpha")
    val census = docs.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val qs = alpha match {
      case 0.0 => lit(1000000L)
      case 0.5 => floor(sqrt(col("__n").cast("double")) * lit(1e6) + lit(0.5)).cast("long")
      case _ => col("__n") * lit(1000000L)
    }
    val wq = census.select(col(strataCol), qs.as("__qs"))
    val denom = wq.agg(sum(col("__qs")).as("__denom"))
    // integer division of exact integers: never route this through a
    // double — totalDocs * __qs can exceed 2^53
    val quotas = wq.crossJoin(broadcast(denom))
      .select(col(strataCol),
        expr(s"(${totalDocs}L * __qs) div __denom").as("__k"))
    val h = pmod(
      TextFunctions.polyHash(concat(lit(seed), lit(":"), col(idCol).cast("string")))
        * lit(2654435761L) + lit(12345L), lit(2147483647L))
    val perDoc = docs
      .withColumn("__hv", h)
      .withColumn("__rng", shiftright(col("__hv"), 21))
    val wRange = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("__rng").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val rangeBase = perDoc
      .groupBy(col(strataCol), col("__rng"))
      .agg(count(lit(1)).as("__rcnt"))
      .withColumn("__base", coalesce(sum(col("__rcnt")).over(wRange), lit(0L)))
      .select(col(strataCol), col("__rng"), col("__base"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol), col("__rng"))
      .orderBy(col("__hv").asc, col(idCol).asc)
    perDoc
      .join(broadcast(rangeBase), Seq(strataCol, "__rng"))
      .withColumn("draw_rank", col("__base") + row_number().over(wIn).cast("long"))
      .join(broadcast(quotas), Seq(strataCol))
      .filter(col("draw_rank") <= col("__k"))
      .drop("__hv", "__rng", "__base", "__k")
  }

  /** Weighted mixture with UPSAMPLING: per-stratum weights may exceed 1.0
    * (e.g. 2.2 → every doc emitted twice, plus a third copy for a
    * deterministic 20% of docs). `copies = floor(w) + [bucket < frac(w)]`;
    * kept docs are exploded into `copy_id = 0..copies-1`. This is how
    * training mixtures are actually materialized (domain up/down-weighting
    * before packing), and like the samplers above it is a pure function of
    * (seed, id) — replayable on any engine.
    *
    * The fractional thresholds are computed driver-side from the weight map
    * (floor + round of the remainder at 1e-6 granularity), so the plan
    * contains only integer literals — no float arithmetic whose rounding
    * could diverge across engines.
    *
    * Scale shape: scan-local filter + explode, no shuffle; output size is
    * `sum(copies)` rows.
    */
  def mixtureSample(
      docs: DataFrame,
      strataCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 0.0,
      seed: String = "mix",
      idCol: String = "doc_id"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0.0),
      "all weights must be >= 0")
    def parts(w: Double): (Long, Long) = {
      val base = math.floor(w).toLong
      (base, math.round((w - base) * 1e6))
    }
    val (dBase, dThresh) = parts(defaultWeight)
    val baseCol = weights.foldRight(lit(dBase): Column) { case ((s, w), rest) =>
      when(col(strataCol) === s, lit(parts(w)._1)).otherwise(rest)
    }
    val threshCol = weights.foldRight(lit(dThresh): Column) { case ((s, w), rest) =>
      when(col(strataCol) === s, lit(parts(w)._2)).otherwise(rest)
    }
    val copies = baseCol + when(bucket(col(idCol), seed) < threshCol, 1L).otherwise(0L)
    docs.withColumn("n_copies", copies)
      .filter(col("n_copies") >= 1)
      .withColumn("copy_id", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("n_copies")
  }
}
