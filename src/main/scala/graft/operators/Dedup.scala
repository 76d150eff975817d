package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large text corpora.
  *
  * Scale design (the point of running this on Spark at all):
  *  - exact dedup is one hash-partitioned aggregation on the text key —
  *    map-side partial aggregation applies, no driver involvement;
  *  - n-gram Jaccard joins on individual shingles, which distributes far
  *    better than any pairwise scheme (word 3-grams are near-unique, so the
  *    shingle join has no hot keys; a pairwise cross join would be O(n²));
  *  - MinHash/LSH reduces candidate generation to an equi-join on
  *    (band, bandHash) — the standard sub-quadratic path at corpus scale —
  *    then verifies candidates with exact Jaccard so precision is exact;
  *  - SimHash pairs join on `maxHamming + 1` evenly-split signature chunks
  *    (pigeonhole: hamming ≤ maxHamming ⇒ at least one chunk equal), then
  *    verify with `bit_count(xor)`.
  *
  * All expressions are built-in Catalyst functions (whole-stage codegen).
  */
object Dedup {

  /** Exact duplicate groups: keep the smallest id per identical text.
    * Output: (doc_id BIGINT — the keeper, n_copies BIGINT).
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** Distinct word-3-gram shingles per doc: (doc_id, n, s), via the native
    * one-walk `graft_word_shingles` expression — the shingle stage is the
    * hot scan stage of every dedup pipeline, and the built-in-function
    * formulation runs interpreted (HOFs are CodegenFallback). Docs with
    * fewer than 3 tokens produce an empty array, which the explode drops —
    * same rows as the previous size(w) >= 3 filter. Exact string-level
    * equivalence with `wordShingles` is pinned by VectorExprSpec.
    *
    * `n` is the doc's DISTINCT shingle-set size, computed scan-locally as
    * `size` of the (already-distinct) shingle array (r17): every Jaccard
    * verification needs per-doc set sizes, and deriving them here replaces
    * a doc-keyed count aggregate plus its join-back onto the pair table —
    * two exchanges per verification — with 8 bytes riding each shingle
    * row. Exactly equal to the old `count(*) group by doc_id` over the
    * exploded rows because the array is distinct by construction —
    * PROVIDED doc ids are unique in `docs` (every caller's contract; the
    * stream admission path dropDuplicates its ids before reaching here).
    * With duplicate ids the old aggregate summed shingle rows across
    * copies while `n` stays per-copy; both are degenerate on such input.
    */
  private def shingles(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        graft.functions.expressions.ShingleExpression
          .wordShinglesNative(col(textCol), 3).as("__sh"))
      .select(col("doc_id"), size(col("__sh")).cast("long").as("n"),
        explode(col("__sh")).as("s"))

  /** Exact n-gram Jaccard near-duplicate pairs (word 3-grams).
    * Output: (id_a, id_b, jaccard DOUBLE) for jaccard >= threshold.
    *
    * `method` picks the physical path — results are identical (pinned by
    * PipelineSpec's plain⇄prefix equivalence test), only the candidate
    * generation differs:
    *  - `"plain"`: self-join on EVERY shingle — cheapest at small corpora
    *    (no document-frequency pass, no per-doc window);
    *  - `"prefix"`: PPJoin-style prefix filtering ([[ngramJaccardPairsPrefix]])
    *    — the scale path, candidates from the rarest shingles only;
    *  - `"auto"` (default): by corpus row count, `plainLimit` mirroring
    *    [[Similarity.topCosinePairs]]'s exactLimit switch — a caller at 10^8
    *    docs must not silently get the full shingle self-join.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      method: String = "auto",
      plainLimit: Long = 200000L): DataFrame =
    jaccardResolveMethod(method, () => docs.count(), plainLimit) match {
      case "prefix" => ngramJaccardPairsPrefix(docs, threshold, idCol, textCol)
      case _ =>
        // the shingle table feeds the size aggregate AND both join sides —
        // materialize it once via localCheckpoint rather than Dataset.persist:
        // persist registers in the session's CacheManager, which holds a strong
        // reference until an explicit unpersist/clearCache (a session-lifetime
        // leak for an operator-internal intermediate), whereas localCheckpoint
        // blocks are RDD-level and the ContextCleaner frees them as soon as the
        // returned plan becomes unreachable. Trade: lineage is truncated, so a
        // lost executor fails the job instead of recomputing — acceptable for a
        // within-job intermediate (re-run the operator).
        val sh = shingles(docs, idCol, textCol).localCheckpoint(false)
        jaccardOfSharedShingles(sh, threshold, None)
    }

  /** Resolve the Jaccard pair method; count is by-name so explicit choices
    * skip the counting job entirely.
    */
  private[graft] def jaccardResolveMethod(
      method: String, count: () => Long, plainLimit: Long): String =
    method match {
      case "auto" => if (count() <= plainLimit) "plain" else "prefix"
      case m @ ("plain" | "prefix") => m
      case other => throw new IllegalArgumentException(
        s"ngramJaccardPairs method must be 'plain', 'prefix' or 'auto', got '$other'")
    }

  /** Shared-shingle counting + Jaccard for (doc_id, s) pairs, optionally
    * restricted to a candidate pair set (id_a, id_b).
    */
  private def jaccardOfSharedShingles(
      sh: DataFrame,
      threshold: Double,
      candidates: Option[DataFrame]): DataFrame = {
    // per-doc set sizes ride the shingle rows (scan-local `n`, see
    // [[shingles]]) — no doc-keyed size aggregate and no join-back of it
    // (r17: two exchanges removed per verification; values bit-identical
    // because the shingle array is distinct per doc)
    // with a candidate set, prune the shingle table to involved docs BEFORE
    // the self-join — verification then touches only the candidates' rows
    // instead of re-materializing the full pairwise expansion
    // no distinct on the id projections: left_semi ignores right-side
    // multiplicity, and the pair table is already pair-distinct — the
    // dedup aggregate was one exchange + stage per prune for nothing (r17)
    val (aSh, bSh) = candidates match {
      case Some(c) =>
        (sh.join(c.select(col("id_a").as("doc_id")), Seq("doc_id"), "left_semi"),
          sh.join(c.select(col("id_b").as("doc_id")), Seq("doc_id"), "left_semi"))
      case None => (sh, sh)
    }
    val a = aSh.select(col("doc_id").as("id_a"), col("s"), col("n").as("na"))
    val b = bSh.select(col("doc_id").as("id_b"), col("s"), col("n").as("nb"))
    val sharedAll = a.join(b, Seq("s")).filter(col("id_a") < col("id_b"))
    val sharedPairs = candidates match {
      case Some(c) => sharedAll.join(c, Seq("id_a", "id_b"), "left_semi")
      case None => sharedAll
    }
    // na/nb are constant within a (id_a, id_b) group — max() is exact
    val shared = sharedPairs.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("c"), max(col("na")).as("na"), max(col("nb")).as("nb"))
    val jac = col("c").cast("double") /
      (col("na") + col("nb") - col("c")).cast("double")
    shared
      .select(col("id_a"), col("id_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= lit(threshold))
  }

  /** The dedup DECISION a production pipeline actually ships: one canonical
    * keeper per near-duplicate cluster, chosen by (priority DESC, doc_id
    * ASC), everything else marked for the drop list. Composes
    * [[connectedComponents]] with an exact arg-max — the keeper choice is an
    * aggregate (`max_by` over a (priority, -id) struct), not a window, so
    * no per-cluster sort materializes.
    *
    * Output: (doc_id, cluster_id, keeper_id, keep BOOLEAN) for every doc
    * that appears in some pair; singleton docs are implicitly kept and
    * stay absent, like `connectedComponents`.
    */
  def canonicalKeepers(
      docs: DataFrame,
      pairs: DataFrame,
      priority: Column,
      idCol: String = "doc_id"): DataFrame = {
    val clusters = connectedComponents(pairs)
    val member = docs
      .select(col(idCol).cast("long").as("doc_id"), priority.cast("int").as("prio"))
      .join(clusters, Seq("doc_id"))
    val keepers = member.groupBy(col("cluster_id"))
      .agg(max_by(col("doc_id"),
        struct(col("prio"), (-col("doc_id")).as("nid"))).as("keeper_id"))
    member.join(keepers, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("keeper_id"),
        (col("doc_id") === col("keeper_id")).as("keep"))
  }

  /** Exact n-gram Jaccard with prefix filtering (PPJoin-style, public
    * set-similarity-join literature): sort each doc's shingles by global
    * document frequency (rarest first) and keep only the first
    * `n - ceil(t*n) + 1` as join keys. Soundness: J(A,B) >= t implies the
    * overlap c >= ceil(t*|A|) (since J >= t forces |B| >= t*|A|), so a
    * qualifying pair cannot avoid A's prefix — candidates generated this way
    * are COMPLETE, and exact verification keeps precision exact. The join
    * keys are the rarest shingles, which collapses the self-join output by
    * orders of magnitude versus joining on every shingle — the 100 TB path
    * for exact (non-LSH) thresholds.
    * Output: identical to `ngramJaccardPairs`.
    */
  def ngramJaccardPairsPrefix(
      docs: DataFrame,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sh = shingles(docs, idCol, textCol)
    val freq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df").asc, col("s").asc)
    val prefix = sh
      // freq has one row per DISTINCT SHINGLE — corpus-sized by
      // construction. Catalyst's size estimate for an aggregate output can
      // come in under the broadcast threshold and OOM the driver trying to
      // broadcast it (observed at 200k docs / 11M shingles), so the join
      // strategy is pinned to a shuffle hash join instead of left to stats
      .join(freq.hint("SHUFFLE_HASH"), Seq("s"))
      .withColumn("r", row_number().over(w))
      // per-doc sizes already ride the shingle rows (`n`, see shingles) —
      // the former doc-keyed size aggregate + join-back is gone (r17)
      .filter(col("r") <= col("n") - ceil(lit(threshold) * col("n")) + lit(1))
      .select(col("doc_id"), col("s"), col("n"))
    val candidates = prefix.as("x").join(prefix.as("y"), Seq("s"))
      .filter(col("x.doc_id") < col("y.doc_id")
        // size filter: J >= t forces t*na <= nb <= na/t
        && col("y.n") >= ceil(lit(threshold) * col("x.n"))
        && col("y.n") <= floor(col("x.n") / lit(threshold)))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    jaccardOfSharedShingles(sh, threshold, Some(candidates))
  }

  /** MinHash signature parameters: numHashes = bands * rowsPerBand linear
    * permutations over a 64-bit base shingle hash. Seeds are fixed so
    * results are deterministic.
    */
  final case class MinHashParams(bands: Int = 16, rowsPerBand: Int = 4) {
    def numHashes: Int = bands * rowsPerBand
  }

  /** MinHash + LSH near-duplicate detection, verified: generate candidate
    * pairs from LSH band collisions (sub-quadratic), then compute exact
    * Jaccard on candidates only. Output: (id_a, id_b, jaccard) — same shape
    * as `ngramJaccardPairs` but scalable to corpora where the full shingle
    * self-join is too expensive at low thresholds.
    */
  def minhashLshPairs(
      docs: DataFrame,
      threshold: Double,
      params: MinHashParams = MinHashParams(),
      idCol: String = "doc_id",
      textCol: String = "text",
      hotBucketCap: Int = 0): DataFrame = {
    // signatures are a scan projection (native graft_minhash_sig), so the
    // corpus is NEVER exploded into shingle rows to find candidates — only
    // the docs that appear in some candidate pair get shingled for the
    // exact-jaccard verification. At corpus scale (near-dup rate a few
    // percent) that is the difference between shuffling every shingle of
    // 100 TB and shuffling the candidates'. The candidate set is
    // materialized once (localCheckpoint, ContextCleaner-freed) because it
    // feeds the doc prune AND the verification semi-joins — without it the
    // whole signature pipeline would re-run per consumer.
    val candidates = minhashCandidatesFromBuckets(
        minhashBuckets(minhashSigs(docs, params, idCol, textCol), params), hotBucketCap)
      .localCheckpoint(false)
    // no distinct: left_semi ignores right-side multiplicity (r17)
    val candIds = candidates.select(col("id_a").as("__cand_id"))
      .union(candidates.select(col("id_b").as("__cand_id")))
    val candDocs = docs.join(candIds, col(idCol) === col("__cand_id"), "left_semi")
    jaccardOfSharedShingles(shingles(candDocs, idCol, textCol), threshold, Some(candidates))
  }

  /** Per-doc MinHash signatures as ONE scan projection (native
    * `graft_minhash_sig` over the native shingle array): the all-rows stage
    * of the pipeline never explodes shingles or funnels the corpus through
    * a 64-column aggregate. The permutation arithmetic is identical to
    * [[minhashSigsRelational]] (min is commutative, so the fold order
    * cannot matter) — bit-equality is pinned by VectorExprSpec.
    * Output: (doc_id, sig array<bigint>[numHashes]); docs with no shingles
    * are absent, like the relational groupBy.
    */
  private[graft] def minhashSigs(
      docs: DataFrame, params: MinHashParams, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.functions.expressions.SignatureExpressions.minhashSigNative(
        graft.functions.expressions.ShingleExpression.wordShinglesNative(col(textCol), 3),
        params.numHashes).as("sig"))
      .filter(col("sig").isNotNull)

  /** The relational formulation of [[minhashSigs]] — explode + 64 min
    * aggregates over the exploded shingle table, retained as the
    * cross-check of the native expression (and the shape the DuckDB oracle
    * replays).
    */
  private[graft] def minhashSigsRelational(sh: DataFrame, params: MinHashParams): DataFrame = {
    // base hash: 31-bit polynomial fold (SQL-replicable, so the whole LSH
    // pipeline is DuckDB-oracle-checkable) — stays in [0, 2^31) so the
    // linear permutations below stay inside Long range (ANSI mode rejects
    // wrap-around arithmetic)
    val h = polyHash(col("s"))
    // the mod-prime reduction is what makes each of the 64 permutations an
    // independent hash — min(a_i*h + b_i) without it is monotone in h, so
    // every component would collapse to a function of the single minimum
    // shingle hash and the LSH band S-curve would degenerate to ~J
    val sigCols: Seq[Column] = (0 until params.numHashes).map { i =>
      min(pmod(h * lit(2L * i + 1234567891L) + lit(98176543L * i + 7L),
        lit(2147483647L))).as(s"m$i")
    }
    sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
      .select(col("doc_id"),
        array((0 until params.numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH candidate pairs from MinHash signatures: (id_a, id_b). */
  private[graft] def minhashCandidates(sigs: DataFrame, params: MinHashParams): DataFrame =
    minhashCandidatesFromBuckets(minhashBuckets(sigs, params))

  /** LSH candidate pairs from an already-materialized bucket table — the
    * entry point for callers that hold the (doc_id, band, bucket) snapshot
    * (the admission front door computes it ONCE per micro-batch and feeds
    * the internal self-pair gate, the store probe, and the persisted
    * snapshot from the same frame).
    *
    * `hotBucketCap` (0 = off, the default and the oracle-gated path) is
    * the adversarial-skew valve (VERDICT r15 #8): a boilerplate-heavy
    * corpus can put a constant fraction of ALL documents into one
    * (band, bucket) key, and the within-bucket self-join is quadratic in
    * that bucket — at a 10%-duplicate 200k corpus that is ~2·10⁸ candidate
    * rows per band for ONE key's task. No algorithm shrinks it for free
    * (the true pair list of a giant duplicate cluster IS quadratic), so
    * the cap degrades gracefully instead: a bucket larger than the cap
    * emits STAR edges to its smallest member (O(size) rows, connectivity
    * within the bucket preserved exactly — the clusters/keepers layers
    * see the same components), every smaller bucket keeps the exact
    * all-pairs form, and the number of skipped within-bucket pairs is
    * logged (`logPhase("lshHotBucketDroppedPairs")`) so the trim is
    * visible in the artifact, never silent.
    */
  private[graft] def minhashCandidatesFromBuckets(
      buckets: DataFrame,
      hotBucketCap: Int = 0): DataFrame = {
    if (hotBucketCap <= 0)
      buckets.as("x").join(buckets.as("y"), Seq("band", "bucket"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct()
    else {
      val (pairs, dropped) = cappedCandidatesWithDropped(buckets, hotBucketCap)
      // visible, not silent: how many within-bucket pairs the cap skipped
      val d = dropped.collect()(0)
      graft.operators.Renko.logPhase("lshHotBucketDroppedPairs",
        d.getLong(0).toDouble)
      pairs
    }
  }

  /** The size-gated candidate generation behind `hotBucketCap`, with the
    * skip count returned IN-PLAN (a 1-row aggregate) instead of collected:
    * `(candidate pairs, skipped_pairs)`. [[minhashCandidatesFromBuckets]]
    * collects the count for its phase log; the oracle-gated audit entry
    * ([[minhashLshPairsCappedAudit]]) broadcasts it into the output so the
    * trim's exact size is driver-gate-checkable, not just logged.
    */
  private[graft] def cappedCandidatesWithDropped(
      buckets: DataFrame,
      hotBucketCap: Int): (DataFrame, DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket"))
    val sized = buckets
      .withColumn("__bsz", count(lit(1)).over(w))
      .withColumn("__bmin", min(col("doc_id")).over(w))
    val cold = sized.filter(col("__bsz") <= hotBucketCap)
      .select(col("band"), col("bucket"), col("doc_id"))
    val coldPairs = cold.as("x").join(cold.as("y"), Seq("band", "bucket"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    val hot = sized.filter(col("__bsz") > hotBucketCap)
    val hotPairs = hot.filter(col("doc_id") =!= col("__bmin"))
      .select(col("__bmin").as("id_a"), col("doc_id").as("id_b"))
    val dropped = hot
      .select(col("band"), col("bucket"), col("__bsz")).distinct()
      .agg(coalesce(sum(
        expr("__bsz * (__bsz - 1) DIV 2 - (__bsz - 1)")), lit(0L))
        .cast("long").as("skipped_pairs"))
    (coldPairs.unionByName(hotPairs).distinct(), dropped)
  }

  /** [[minhashLshPairs]] with the hot-bucket valve ON and its audit trail
    * IN the output: every verified pair carries `skipped_pairs` — the
    * exact number of within-bucket candidate pairs the cap declined to
    * enumerate (star-edge degradation preserves the connected components,
    * so the decision layers above see the same clusters; what is lost is
    * exactly this count, and it rides the result instead of a log line).
    * Output: (id_a, id_b, jaccard, skipped_pairs), the oracle-gated form
    * of the valve (VERDICT r16 #5).
    */
  def minhashLshPairsCappedAudit(
      docs: DataFrame,
      threshold: Double,
      hotBucketCap: Int,
      params: MinHashParams = MinHashParams(),
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(hotBucketCap > 0, "hotBucketCap must be positive for the audit form")
    val (cand, dropped) = cappedCandidatesWithDropped(
      minhashBuckets(minhashSigs(docs, params, idCol, textCol), params), hotBucketCap)
    val candidates = cand.localCheckpoint(false)
    // no distinct: left_semi ignores right-side multiplicity (r17)
    val candIds = candidates.select(col("id_a").as("__cand_id"))
      .union(candidates.select(col("id_b").as("__cand_id")))
    val candDocs = docs.join(candIds, col(idCol) === col("__cand_id"), "left_semi")
    jaccardOfSharedShingles(shingles(candDocs, idCol, textCol), threshold, Some(candidates))
      .crossJoin(broadcast(dropped))
  }

  /** [[minhashLshPairs]] with the document frame's bucket rows supplied by
    * the caller instead of derived in-plan — identical output (bucket rows
    * are a pure per-doc projection). The admission path uses this so a
    * micro-batch is signatured exactly once per trigger, not once for the
    * internal gate and again for the store probe.
    */
  def minhashLshPairsPrebucketed(
      docs: DataFrame,
      docBuckets: DataFrame,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val candidates = minhashCandidatesFromBuckets(docBuckets)
      .localCheckpoint(false)
    // no distinct: left_semi ignores right-side multiplicity (r17)
    val candIds = candidates.select(col("id_a").as("__cand_id"))
      .union(candidates.select(col("id_b").as("__cand_id")))
    val candDocs = docs.join(candIds, col(idCol) === col("__cand_id"), "left_semi")
    jaccardOfSharedShingles(shingles(candDocs, idCol, textCol), threshold, Some(candidates))
  }

  /** One row per (doc, band): bucket key = the band's signature slice
    * verbatim (concat_ws, collision-free in practice and engine-independent
    * — an opaque hash here would block the DuckDB oracle).
    */
  private def minhashBuckets(sigs: DataFrame, params: MinHashParams): DataFrame = {
    val bandRows: Seq[Column] = (0 until params.bands).map { b =>
      val slice = (0 until params.rowsPerBand)
        .map(r => element_at(col("sig"), b * params.rowsPerBand + r + 1))
      struct(lit(b).as("band"), concat_ws("_", slice: _*).as("bucket"))
    }
    sigs.select(col("doc_id"), explode(array(bandRows: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Incremental admission dedup: flag documents of a NEW batch that
    * near-duplicate the already-admitted corpus snapshot — the shape of
    * every continuously-ingesting training-data pipeline, where each
    * arriving batch is checked against the corpus WITHOUT re-pairing the
    * corpus against itself.
    *
    * Scale shape: the corpus side's band buckets are computed once per
    * ingest epoch (in production, READ from the stored signature snapshot —
    * here derived in-plan for oracle parity) and the batch probes them with
    * an equi-join on (band, bucket); candidate volume is
    * O(batch x collision rate), never O(corpus^2) and never O(batch^2) —
    * batch-internal duplicates are the NEXT epoch's corpus-side problem.
    * Only candidate docs from either side are shingled for the
    * exact-Jaccard verification, exactly like [[minhashLshPairs]].
    *
    * Output: (doc_id — the new doc, dup_of — the colliding corpus doc,
    * jaccard), exact-verified at `threshold`. Sides are assumed
    * id-disjoint (they are different ingest epochs).
    */
  def minhashIncrementalPairs(
      corpus: DataFrame,
      batch: DataFrame,
      threshold: Double,
      params: MinHashParams = MinHashParams(),
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    minhashIncrementalPairsPrebucketed(
      corpus, minhashBucketsFor(corpus, params, idCol, textCol),
      batch, threshold, params, idCol, textCol)

  /** The (doc_id, band, bucket) LSH bucket rows of a document frame — the
    * SNAPSHOT TABLE a continuously-ingesting pipeline persists per epoch so
    * the next batch's admission probe joins stored buckets instead of
    * re-signaturing the whole corpus (see
    * [[minhashIncrementalPairsPrebucketed]] and
    * [[graft.streaming.NearDupAdmission]]).
    */
  def minhashBucketsFor(
      docs: DataFrame,
      params: MinHashParams = MinHashParams(),
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    minhashBuckets(minhashSigs(docs, params, idCol, textCol), params)

  /** [[minhashIncrementalPairs]] with the corpus side's bucket rows
    * supplied by the caller (typically read back from the persisted
    * snapshot written with [[minhashBucketsFor]]) instead of derived
    * in-plan. `corpus` itself is still needed — but only the docs that
    * collide into some candidate pair are shingled for the exact-Jaccard
    * verification, so at scale the corpus TEXT is touched for a few
    * percent of rows while the probe reads the compact bucket table.
    * Output and semantics are identical to the derived-bucket form
    * (bucket rows are a pure per-doc projection; NearDupAdmissionSpec
    * pins the equality).
    */
  def minhashIncrementalPairsPrebucketed(
      corpus: DataFrame,
      corpusBuckets: DataFrame,
      batch: DataFrame,
      threshold: Double,
      params: MinHashParams = MinHashParams(),
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    minhashIncrementalPairsBothPrebucketed(
      corpus, corpusBuckets, batch,
      minhashBuckets(minhashSigs(batch, params, idCol, textCol), params),
      threshold, idCol, textCol)

  /** [[minhashIncrementalPairsPrebucketed]] with BOTH sides' bucket rows
    * supplied — the probe the admission front door runs after deriving the
    * batch's buckets once for all its consumers.
    */
  def minhashIncrementalPairsBothPrebucketed(
      corpus: DataFrame,
      corpusBuckets: DataFrame,
      batch: DataFrame,
      batchBuckets: DataFrame,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(Seq("doc_id", "band", "bucket").forall(corpusBuckets.columns.contains),
      s"corpusBuckets needs (doc_id, band, bucket) — the minhashBucketsFor " +
        s"shape — got ${corpusBuckets.columns.mkString(", ")}")
    // materialized once (localCheckpoint, ContextCleaner-freed): feeds the
    // shingle prunes AND the verification join, like minhashLshPairs
    val candidates = corpusBuckets.as("x").join(batchBuckets.as("y"), Seq("band", "bucket"))
      .select(col("x.doc_id").as("dup_of"), col("y.doc_id").as("doc_id"))
      .distinct()
      .localCheckpoint(false)
    // no distinct on the id projections: left_semi ignores right-side
    // multiplicity, and `candidates` is already pair-distinct (r17)
    val corpusSh = shingles(
      corpus.join(candidates.select(col("dup_of").as("__cand_id")),
        col(idCol) === col("__cand_id"), "left_semi"), idCol, textCol)
    val batchSh = shingles(
      batch.join(candidates.select(col("doc_id").as("__cand_id")),
        col(idCol) === col("__cand_id"), "left_semi"), idCol, textCol)
    // per-doc set sizes ride the shingle rows (scan-local `n`, see
    // [[shingles]]) — the two doc-keyed size aggregates and their
    // join-backs are gone (r17); na/nb constant per group, max() exact
    val shared = corpusSh.select(col("doc_id").as("dup_of"), col("s"), col("n").as("na"))
      .join(batchSh.select(col("doc_id"), col("s"), col("n").as("nb")), Seq("s"))
      .join(candidates, Seq("dup_of", "doc_id"), "left_semi")
      .groupBy(col("doc_id"), col("dup_of"))
      .agg(count(lit(1)).as("c"), max(col("na")).as("na"), max(col("nb")).as("nb"))
    val jac = col("c").cast("double") /
      (col("na") + col("nb") - col("c")).cast("double")
    shared
      .select(col("doc_id"), col("dup_of"), jac.as("jaccard"))
      .filter(col("jaccard") >= lit(threshold))
  }

  /** The admission front door's two gates in ONE verification: the batch's
    * internal lower-id-wins candidates (`id_a < id_b`, batch self-probe)
    * and its store-probe candidates, unioned BEFORE the exact-Jaccard
    * verify so the expensive stages — shingle prune, per-doc size
    * aggregates, the shared-shingle join — run once per micro-batch
    * instead of once per gate (measured ~10 AQE jobs per admission at
    * near-empty batch sizes, the curate stream's per-epoch floor).
    *
    * Semantics are EXACTLY the union of
    * [[minhashLshPairsPrebucketed]]`.select(id_b)` and
    * [[minhashIncrementalPairsBothPrebucketed]]`.select(doc_id)`: the same
    * candidates, the same multiset shingle counts, the same threshold —
    * NearDupAdmissionSpec pins the equality. Sides are id-disjoint except
    * for a REPLAYED batch re-offering ids the store holds (identical
    * text): those collide into an (X, X) candidate that verifies at
    * jaccard 1.0 and rejects — the admission replay contract. Output:
    * (ref_id, doc_id, jaccard) where `doc_id` is the batch doc that loses
    * to `ref_id` (an earlier batch doc or a store doc).
    */
  private[graft] def minhashAdmissionPairsPrebucketed(
      store: Option[(DataFrame, DataFrame)],
      batch: DataFrame,
      batchBuckets: DataFrame,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val internalCand = batchBuckets.as("x").join(batchBuckets.as("y"), Seq("band", "bucket"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("ref_id"), col("y.doc_id").as("doc_id"))
    // the BATCH side of the store probe is micro-batch-bounded (16 bucket
    // rows per offered doc) while the store side GROWS with the stream's
    // life — broadcast the bounded side explicitly: a checkpointed store
    // has no stats, so Spark would otherwise plan a sort-merge join that
    // EXCHANGES the whole store every trigger (O(store) shuffle per epoch
    // — the measured curate-stream slope floor); with the broadcast the
    // store pays a scan and nothing else
    val cand0 = store match {
      case Some((_, sb)) => internalCand.unionByName(
        sb.as("x").join(broadcast(batchBuckets.as("y")), Seq("band", "bucket"))
          .select(col("x.doc_id").as("ref_id"), col("y.doc_id").as("doc_id")))
      case None => internalCand
    }
    // NOT checkpointed (experiment r14): feeds the shingle prunes AND the
    // verification join; the identical subtree should exchange-reuse
    val candidates = cand0.distinct()
    val refSrc = store match {
      case Some((sd, _)) => sd.select(col(idCol), col(textCol))
        .unionByName(batch.select(col(idCol), col(textCol)))
      case None => batch.select(col(idCol), col(textCol))
    }
    // dropDuplicates: a REPLAYED batch re-offers ids the store already
    // holds (identical text — the admission replay contract), so the
    // ref-side union would shingle those ids twice and double their na.
    // The (X_store, X_batch) candidate itself is legitimate and must
    // verify at jaccard 1.0 — it is HOW a replay rejects its own re-offer.
    // candidate ref-ids are batch-driven (bounded) while refSrc carries the
    // whole store — broadcast the id set so the store side is scan-only
    // no distinct on the id projections: left_semi ignores right-side
    // multiplicity, and `candidates` is already pair-distinct — the
    // per-prune dedup aggregate was one exchange + stage per epoch (r17);
    // the ref-id broadcast builds its hash set from the (slightly
    // duplicated) pair rows directly
    val refSh = shingles(
      refSrc.join(broadcast(candidates.select(col("ref_id").as("__cand_id"))),
        col(idCol) === col("__cand_id"), "left_semi")
        .dropDuplicates(Seq(idCol)), idCol, textCol)
    val docSh = shingles(
      batch.join(candidates.select(col("doc_id").as("__cand_id")),
        col(idCol) === col("__cand_id"), "left_semi"), idCol, textCol)
    // per-doc set sizes ride the shingle rows (scan-local `n`, see
    // [[shingles]]) — the two doc-keyed size aggregates and their
    // join-backs are gone (r17); na/nb constant per group, max() exact
    val shared = refSh.select(col("doc_id").as("ref_id"), col("s"), col("n").as("na"))
      .join(docSh.select(col("doc_id"), col("s"), col("n").as("nb")), Seq("s"))
      .join(candidates, Seq("ref_id", "doc_id"), "left_semi")
      .groupBy(col("doc_id"), col("ref_id"))
      .agg(count(lit(1)).as("c"), max(col("na")).as("na"), max(col("nb")).as("nb"))
    val jac = col("c").cast("double") /
      (col("na") + col("nb") - col("c")).cast("double")
    shared
      .select(col("ref_id"), col("doc_id"), jac.as("jaccard"))
      .filter(col("jaccard") >= lit(threshold))
  }

  /** Connected components over a near-duplicate pair set: collapse pairs
    * into duplicate GROUPS (what a production dedup actually keeps/drops).
    * Min-label propagation: every node starts labeled with itself; each
    * round every node takes the minimum label in its neighborhood; converges
    * in O(diameter) rounds — near-dup clusters are small and dense, so this
    * is a handful of small shuffles regardless of corpus size (the label
    * table only contains nodes that appear in some pair).
    * Output: (doc_id BIGINT, cluster_id BIGINT) with cluster_id = min doc_id
    * of the component. Ids must be integral — they are cast to long up front
    * in BOTH execution branches, so the output schema (and the failure mode
    * for non-integral ids) does not depend on which branch the edge count
    * selects.
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20,
      localEdgeThreshold: Long = 4000000L): DataFrame = {
    // the pair set is usually an expensive similarity join — materialize it
    // once (localCheckpoint, not persist: RDD blocks are ContextCleaner-
    // freed; CacheManager entries would outlive the call); it feeds the
    // edge count and then whichever branch runs
    val distinctPairs = pairs
      .select(col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b"))
      .distinct()
      .localCheckpoint(false)
    val nEdges = distinctPairs.count()
    if (nEdges <= localEdgeThreshold) {
      // near-dup pair sets are normally tiny relative to the corpus (the
      // expensive part is the similarity join that PRODUCED them, not the
      // clustering) — below the threshold a driver-side union-find is exact
      // and replaces O(diameter) label-propagation shuffle rounds with one
      // collect of (id, id) longs. Past the threshold (edge set too big for
      // one machine) the distributed propagation below takes over.
      val spark = pairs.sparkSession
      import spark.implicits._
      val es = distinctPairs.as[(Long, Long)].collect()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra); parent(hi) = lo }
      }
      val out = parent.keys.toSeq.map(k => (k, find(k)))
      return out.toDF("doc_id", "cluster_id")
    }
    val edges = distinctPairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(distinctPairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .cache()
    // labels only ever decrease, so the label sum is a convergence witness —
    // one aggregate per round instead of a count plus a diff join
    var prevSum = labels.agg(sum(col("cluster_id"))).collect()(0).getLong(0)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), Seq("dst"))
        .select(col("src").as("doc_id"), col("cluster_id"))
      val next = labels.union(viaNeighbors)
        .groupBy(col("doc_id")).agg(min(col("cluster_id")).as("cluster_id"))
        .cache()
      val sumNow = next.agg(sum(col("cluster_id"))).collect()(0).getLong(0)
      labels.unpersist()
      labels = next
      converged = sumNow == prevSum
      prevSum = sumNow
      iter += 1
    }
    // hand back a materialized, cache-free result: the loop's final `labels`
    // is a CacheManager entry that would otherwise leak past this call
    val result = labels.localCheckpoint(true)
    labels.unpersist()
    edges.unpersist()
    result
  }

  /** Bit width of the SimHash signature: two independent 31-bit polynomial
    * token hashes concatenated — 62 bits instead of xxhash64's 64, traded
    * for exact SQL replicability (the DuckDB oracle recomputes signatures
    * bit-for-bit). The 8x8-bit chunk join still covers all signature bits.
    */
  val SimhashBits: Int = 62

  /** 62-bit SimHash per document over word-3-gram SHINGLE hashes (docs with
    * fewer than 3 tokens have no shingles and get no signature).
    *
    * Shingles, not unigram tokens: this corpus (like most same-domain text)
    * has heavily overlapping unigram VOCABULARY, so token-set signatures
    * put unrelated documents at small hamming distances (measured: 16% of
    * all pairs under hamming 7, and idf-weighting inverts the problem by
    * letting singleton tokens dominate). Shingles are near-unique per
    * document — measured separation on this corpus: true near-duplicates
    * (trigram jaccard >= 0.9) land at hamming 1-9, everything else at >= 14.
    * Output: (doc_id, simhash BIGINT).
    */
  /** Per-document duplicated-span coverage (the "how much of this doc exists
    * elsewhere in the corpus" metric behind exact-substring dedup à la Lee
    * et al. 2022): a token position is DUPLICATED if the k-gram starting
    * there also occurs in at least one other document. Output per doc:
    * (doc_id, n_pos, n_dup_pos, dup_frac) where n_pos = nTok - k + 1.
    *
    * Scale shape: grams are reduced to 8-byte polynomial hashes at the scan
    * (fixed-width shuffle keys instead of k-word strings), the
    * multi-document test is one hash-partitioned aggregate with map-side
    * partials, and the per-doc rollup is a second standard aggregate —
    * two shuffles of O(total tokens) narrow rows, the canonical map-reduce
    * shape for corpus-wide gram statistics. No driver collection.
    */
  def dupSpanStats(
      docs: DataFrame,
      k: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val grams = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), posexplode(orderedNgramsFromTokens(col("w"), k)).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"), widePolyHash(col("g")).as("h"))
    // grams present in >= 2 distinct docs; joined back as a semi-style flag
    val dup = grams.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"), lit(1L).as("is_dup"))
    grams.join(dup, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pos"), count(col("is_dup")).as("n_dup_pos"))
      .withColumn("dup_frac",
        col("n_dup_pos").cast("double") / col("n_pos").cast("double"))
  }

  /** Dup-span REMOVAL — the rewrite the span statistics motivate (Lee et
    * al., "Deduplicating Training Data Makes Language Models Better": the
    * cleanup excises duplicated substrings rather than whole documents).
    * A k-gram occurring in >= 2 distinct docs keeps exactly ONE canonical
    * copy — every occurrence in its lowest doc_id — and every other doc
    * drops all k tokens of each of its occurrences; untouched tokens
    * re-join in order. Output is one row per input doc:
    * (doc_id, clean_text, n_tokens, n_removed), where `clean_text` is the
    * kept tokens joined by single spaces (a token-space rewrite: original
    * inter-token whitespace is normalized, the same contract as chunking).
    *
    * Every ORIGINAL duplicated k-gram survives in at most its canonical
    * doc, so re-running the span stats on the cleaned corpus finds no
    * residual covered positions (DedupSpec property; new k-grams can in
    * principle arise where an excision splices distant tokens together —
    * the standard, documented artifact of span excision).
    *
    * 100 TB shape: the same two hash-partitioned aggregates as
    * [[dupSpanStats]] (gram group-by, then per-doc rebuild) plus one
    * equi-join of dup positions back to grams — no pairwise work, no
    * driver state; the per-doc token re-sort is bounded by document
    * length.
    */
  def removeDupSpans(
      docs: DataFrame,
      k: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val tok = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
    val grams = tok
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), posexplode(orderedNgramsFromTokens(col("w"), k)).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"), widePolyHash(col("g")).as("h"))
    // duplicated gram hashes with their canonical (lowest) doc
    val dup = grams.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"), min(col("doc_id")).as("keeper"))
      .filter(col("nd") >= 2)
      .select(col("h"), col("keeper"))
    // non-canonical occurrences → the k token indices each one covers
    val dropped = grams.join(dup, Seq("h"))
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("t"))
      .distinct()
    rebuildExcised(tok, dropped)
  }

  /** Ordered token rebuild shared by the span-excision rewrites: drop the
    * `(doc_id, t)` positions in `dropped` from the tokenized corpus `tok`
    * (`doc_id`, `w` token array) and re-emit
    * (doc_id, clean_text, n_tokens, n_removed) — one row per input doc,
    * single-space joined surviving tokens.
    */
  private[operators] def rebuildExcised(tok: DataFrame, dropped: DataFrame): DataFrame = {
    val toks = tok.select(col("doc_id"), posexplode(col("w")).as(Seq("t", "token")))
    val kept = toks.join(dropped, Seq("doc_id", "t"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        // collect_list order is partition-dependent; the struct sort keys
        // the rebuild on the token index, making the text deterministic
        array_join(
          transform(array_sort(collect_list(struct(col("t"), col("token")))),
            x => x.getField("token")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    tok.select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** Per-position corpus k-grams with text and hash: (doc_id, pos, g, h)
    * — the shared scan prefix of the verified span family (also used by
    * `Decontamination`'s verified/provenance twins).
    */
  private[operators] def spanGrams(
      docs: DataFrame,
      k: Int,
      idCol: String,
      textCol: String,
      hashFn: Column => Column): DataFrame = {
    require(k >= 1, "k must be >= 1")
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), posexplode(orderedNgramsFromTokens(col("w"), k)).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"), col("g"), hashFn(col("g")).as("h"))
  }

  /** The candidate/confirm core shared by every verified span operator:
    * pass 1 is the narrow hash-keyed candidate aggregate (corpus-wide
    * shuffle keys stay 8 bytes — Catalyst prunes the gram text out of that
    * shuffle); pass 2 re-groups ONLY the flagged occurrences on
    * `(hash, gram)`, so wide gram strings shuffle for the duplicated slice
    * alone, and a hash flagged purely by collision has no `(h, g)` group
    * spanning two docs — it contributes nothing. Returns the CONFIRMED
    * duplicate gram groups `(h, g, keeper)` with each group's min-doc
    * keeper; since the hash is a function of the gram, `(h, g)` groups are
    * exactly `g` groups, which is why the DuckDB oracles replay these
    * operators with no hash at all. Consumers join the RAW gram stream
    * against this (inner or semi on `(h, g)`) — the result already
    * restricts to confirmed duplicates, so no flagged intermediate is
    * replayed.
    */
  private def confirmedSpanGroups(grams: DataFrame): DataFrame = {
    val cand = grams.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"))
    grams.join(cand, Seq("h"), "left_semi")
      .groupBy(col("h"), col("g"))
      .agg(count_distinct(col("doc_id")).as("nd2"), min(col("doc_id")).as("keeper"))
      .filter(col("nd2") >= 2)
      .select(col("h"), col("g"), col("keeper"))
  }

  /** Collision-VERIFIED twin of [[dupSpanStats]]: every candidate duplicate
    * found by the 62-bit gram hash is confirmed by direct gram comparison
    * ([[confirmedSpanGroups]]) before it counts, so the statistics are
    * EXACT under the raw k-gram text — no hash-collision false positives
    * at any corpus size (the extension COVERAGE.md's terminal span-surface
    * decision names for consumers needing collision-free equality, e.g.
    * legal-grade provenance). The DuckDB oracle replays this with NO hash
    * at all, grouping on the raw gram text.
    */
  def dupSpanStatsVerified(
      docs: DataFrame,
      k: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    dupSpanStatsVerifiedWith(docs, k, idCol, textCol, widePolyHash)

  /** [[dupSpanStatsVerified]] with a pluggable gram hash — the test seam:
    * a deliberately colliding hash must yield the same exact-text result.
    */
  private[graft] def dupSpanStatsVerifiedWith(
      docs: DataFrame,
      k: Int,
      idCol: String,
      textCol: String,
      hashFn: Column => Column): DataFrame = {
    val grams = spanGrams(docs, k, idCol, textCol, hashFn)
    // ONE pass over the gram stream (r17): flag confirmed-duplicate
    // occurrences with a left join ((h, g) is unique in the confirmed
    // groups, so row count is preserved) and take both counts in a single
    // per-doc aggregate — the old two doc-keyed aggregates + their outer
    // join re-scanned the unpinned gram explode once per branch
    val trueDup = confirmedSpanGroups(grams)
      .select(col("h"), col("g"), lit(1L).as("is_dup"))
    grams.join(trueDup, Seq("h", "g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pos"), count(col("is_dup")).as("n_dup_pos"))
      .select(col("doc_id"), col("n_pos"), col("n_dup_pos"),
        (col("n_dup_pos").cast("double")
          / col("n_pos").cast("double")).as("dup_frac"))
  }

  /** Span-excision PROVENANCE: one row per non-canonical occurrence of a
    * corpus-duplicated k-gram — the audit trail behind
    * [[removeDupSpansVerified]] (which doc's canonical copy displaced each
    * excised span, with the gram text as evidence). Verified by
    * construction: candidates come from the narrow hash aggregate, every
    * decision (duplicate-or-not AND keeper) is confirmed on the raw gram
    * text, so the trail is exact at any corpus size — the record a
    * reproducibility or provenance audit of the cleaned corpus replays.
    * Output: (doc_id, pos, keeper_doc, gram), pos 0-based token index of
    * the occurrence; exactly the occurrences whose k-token covers
    * [[removeDupSpansVerified]] drops.
    */
  def dupSpanProvenance(
      docs: DataFrame,
      k: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    dupSpanProvenanceWith(docs, k, idCol, textCol, widePolyHash)

  /** [[dupSpanProvenance]] with a pluggable gram hash (test seam). */
  private[graft] def dupSpanProvenanceWith(
      docs: DataFrame,
      k: Int,
      idCol: String,
      textCol: String,
      hashFn: Column => Column): DataFrame = {
    val grams = spanGrams(docs, k, idCol, textCol, hashFn)
    grams.join(confirmedSpanGroups(grams), Seq("h", "g"))
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("keeper").as("keeper_doc"), col("g").as("gram"))
  }

  /** Collision-verified twin of [[removeDupSpans]]: excision decisions
    * (which grams are duplicated, and which doc is each one's canonical
    * keeper) are confirmed by direct gram comparison on the flagged slice,
    * so the rewrite is exact under the raw k-gram text — a collision can
    * neither excise an innocent span nor misassign a keeper. Same output
    * contract and 100 TB shape as [[removeDupSpans]] plus the verified
    * pass-2 aggregate of [[dupSpanStatsVerified]].
    */
  def removeDupSpansVerified(
      docs: DataFrame,
      k: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    removeDupSpansVerifiedWith(docs, k, idCol, textCol, widePolyHash)

  /** [[removeDupSpansVerified]] with a pluggable gram hash (test seam). */
  private[graft] def removeDupSpansVerifiedWith(
      docs: DataFrame,
      k: Int,
      idCol: String,
      textCol: String,
      hashFn: Column => Column): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
    val grams = spanGrams(docs, k, idCol, textCol, hashFn)
    // keeper per TRUE gram group — min over (h, g), not over the hash bucket
    val dropped = grams.join(confirmedSpanGroups(grams), Seq("h", "g"))
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("t"))
      .distinct()
    rebuildExcised(tok, dropped)
  }

  /** Block-level corpus dedup (the CCNet/C4 paragraph-hash pass re-expressed
    * over fixed word blocks, since this corpus has no line structure): split
    * every document into non-overlapping `blockWords`-token blocks, keep
    * each distinct block's FIRST occurrence in (doc_id, block position)
    * order corpus-wide, drop every other occurrence, and re-emit the
    * stitched remaining text. Unlike [[removeDupSpans]] (which excises
    * duplicated k-gram RUNS found by coverage statistics), this is the
    * cheap exact pass pipelines run first: one hash-partitioned group-by on
    * the block text, no coverage arithmetic.
    *
    * Output: (doc_id, clean_text, n_blocks, n_removed) — one row per input
    * document, fully-deduplicated documents keep an empty clean_text.
    *
    * 100 TB shape: blocks shuffle once on their text (hash-partitioned agg
    * → per-block canonical key), one equi-join back, one per-doc rebuild
    * aggregate — no pairwise work, no windows. The canonical key is
    * `doc_id * 2^20 + pos` (exact long arithmetic, SQL-replicable);
    * documents are bounded to 2^20 blocks, ~8M tokens at the default
    * width, far above any real document.
    */
  def blockDedup(
      docs: DataFrame,
      blockWords: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(blockWords >= 1, "blockWords must be >= 1")
    val bw = blockWords
    val tok = docs.select(col(idCol).cast("long").as("doc_id"), tokens(col(textCol)).as("w"))
      .withColumn("n_blocks",
        floor((size(col("w")) + lit(bw - 1)) / lit(bw)).cast("long"))
    val blocks = tok
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), col("n_blocks") - 1),
          i => array_join(slice(col("w"), (i * bw + 1).cast("int"), lit(bw)), " ")))
          .as(Seq("pos", "blk")))
      .withColumn("key", col("doc_id") * lit(1048576L) + col("pos"))
    val first = blocks.groupBy(col("blk")).agg(min(col("key")).as("keep_key"))
    val kept = blocks.join(first, Seq("blk")).filter(col("key") === col("keep_key"))
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(
        // collect_list order is partition-dependent; the struct sort keys
        // the rebuild on the block position, making the text deterministic
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("blk")))),
            x => x.getField("blk")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    tok.select(col("doc_id"), col("n_blocks"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_blocks"),
        (col("n_blocks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** 62-bit block hash: two independent 31-bit polynomial folds
    * concatenated (the [[SimhashBits]] convention) — wide enough that
    * corpus-scale block collisions stay negligible while the DuckDB
    * oracle can replay every bit.
    */
  private[operators] def blockHash(blk: Column): Column =
    polyHash(blk) + polyHash(blk, mult = 131L, prime = 2147483629L) * lit(2147483648L)

  /** One admission decision of the STREAMING block dedup: drop every block
    * of `batch` whose hash is already in `seen` (the store of all block
    * hashes that have ever arrived), keep-first within the batch by
    * (doc_id, pos), and re-emit the stitched survivors. Returns
    * (cleaned batch, the batch's fresh distinct block hashes — the store
    * delta). A fold over ordered batches replays the stream exactly
    * (the `dedup_blocks_stream` oracle query collapses the fold into one
    * min over an (epoch, doc_id, pos) composite key).
    *
    * 100 TB shape: the store probe is one hash-partitioned anti-join on
    * the 62-bit block hash — O(batch blocks), never corpus-sized — and
    * the store grows by exactly the fresh distinct hashes, one long each.
    */
  def blockDedupIncremental(
      seen: Option[DataFrame],
      batch: DataFrame,
      blockWords: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, DataFrame) = {
    require(blockWords >= 1, "blockWords must be >= 1")
    val bw = blockWords
    val tok = batch.select(col(idCol).cast("long").as("doc_id"), tokens(col(textCol)).as("w"))
      .withColumn("n_blocks",
        floor((size(col("w")) + lit(bw - 1)) / lit(bw)).cast("long"))
    val blocks = tok
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), col("n_blocks") - 1),
          i => array_join(slice(col("w"), (i * bw + 1).cast("int"), lit(bw)), " ")))
          .as(Seq("pos", "blk")))
      .withColumn("h", blockHash(col("blk")))
      .withColumn("key", col("doc_id") * lit(1048576L) + col("pos"))
    val fresh = seen match {
      case Some(s) => blocks.join(s.select(col("h")), Seq("h"), "left_anti")
      case None => blocks
    }
    val first = fresh.groupBy(col("h")).agg(min(col("key")).as("keep_key"))
    val kept = fresh.join(first, Seq("h")).filter(col("key") === col("keep_key"))
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("blk")))),
            x => x.getField("blk")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    val out = tok.select(col("doc_id"), col("n_blocks"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_blocks"),
        (col("n_blocks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
    (out, fresh.select(col("h")).distinct())
  }

  /** One admission decision of the STREAMING dup-span coverage: each
    * arriving document's [[dupSpanStats]] metrics measured against the
    * cumulative corpus — everything admitted in earlier batches PLUS its
    * own batch. A position is duplicated iff its k-gram hash has been seen
    * in >= 2 distinct documents so far; the ingest-time quality gate form
    * of the Lee-et-al. coverage (screen a doc for "how much of this
    * already exists in my corpus" the moment it arrives). Forward-only:
    * earlier documents' emitted stats never retract as the corpus grows —
    * they priced the corpus at THEIR admission time.
    *
    * `seen` carries (h, nd) per-gram distinct-doc counts, possibly
    * unaggregated across epochs (the store's per-epoch files union in;
    * the fold's deltas union in) — summed per hash here. Returns
    * (batch stats, the batch's own (h, nd) — the store delta; cumulative
    * counts are the per-hash SUM of deltas, exact while a document
    * arrives exactly once, the same contract as the block admission).
    *
    * 100 TB shape: one hash-partitioned aggregate of the batch's grams,
    * one equi-join against the store slice, one per-doc rollup — all
    * O(batch), never corpus-sized; the store grows by the batch's
    * distinct gram hashes (a long and a count each).
    */
  def dupSpanStatsIncremental(
      seen: Option[DataFrame],
      batch: DataFrame,
      k: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, DataFrame) = {
    val (_, grams) = incrementalTokGrams(batch, k, idCol, textCol)
    spanStatsCore(grams, seen)
  }

  /** The batch's tokenization and narrow per-position gram hashes
    * (doc_id, pos, h) — the shared scan prefix of the incremental span
    * twins.
    */
  private def incrementalTokGrams(
      batch: DataFrame, k: Int, idCol: String, textCol: String): (DataFrame, DataFrame) = {
    require(k >= 1, "k must be >= 1")
    val tok = batch.select(col(idCol).cast("long").as("doc_id"), tokens(col(textCol)).as("w"))
    val grams = tok
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), posexplode(orderedNgramsFromTokens(col("w"), k)).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"), widePolyHash(col("g")).as("h"))
    (tok, grams)
  }

  /** [[dupSpanStatsIncremental]]'s decision core over a prepared
    * (doc_id, pos, h) gram frame. Returns (batch stats, (h, nd) delta).
    */
  private def spanStatsCore(
      grams: DataFrame, seen: Option[DataFrame]): (DataFrame, DataFrame) = {
    val batchNd = grams.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"))
    val cum = seen match {
      case Some(s) =>
        val prior = s.groupBy(col("h")).agg(sum(col("nd")).as("snd"))
        batchNd.join(prior, Seq("h"), "left")
          .select(col("h"), (col("nd") + coalesce(col("snd"), lit(0L))).as("cnd"))
      case None => batchNd.select(col("h"), col("nd").as("cnd"))
    }
    val dup = cum.filter(col("cnd") >= 2).select(col("h"), lit(1L).as("is_dup"))
    val out = grams.join(dup, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pos"), count(col("is_dup")).as("n_dup_pos"))
      .withColumn("dup_frac",
        col("n_dup_pos").cast("double") / col("n_pos").cast("double"))
    (out, batchNd)
  }

  /** One admission decision emitting BOTH span twins — the per-epoch
    * coverage stats ([[dupSpanStatsIncremental]]) and the first-seen-keeps
    * cleaned text ([[removeDupSpansIncremental]]) — from ONE tokenize +
    * gram-explode + hash pass over the batch: the narrow (doc_id, pos, h)
    * gram frame is pinned (`localCheckpoint`) so the separate write
    * actions of a streaming epoch don't re-scan the batch per side.
    * Returns (stats, cleaned, (h, nd) store delta, release) — the delta's
    * hash set is the membership the removal rule probes, so one store
    * serves both. `release` unpersists the pinned gram frame: the caller
    * MUST invoke it after materializing all three frames (the epoch's side
    * writes), or each epoch of a long-running stream leaks its checkpointed
    * blocks on the executors until driver GC collects the plan.
    */
  def spanAdmitIncremental(
      seen: Option[DataFrame],
      batch: DataFrame,
      k: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, DataFrame, DataFrame, () => Unit) = {
    val (tok, gramsLazy) = incrementalTokGrams(batch, k, idCol, textCol)
    val grams = gramsLazy.localCheckpoint(true)
    val (out, delta) = spanStatsCore(grams, seen)
    (out, spanCleanCore(tok, grams, seen, k), delta,
      () => graft.util.LocalCkpt.release(grams))
  }

  /** One admission decision of the STREAMING span removal (the cleanup
    * twin of [[dupSpanStatsIncremental]]): every k-gram occurrence whose
    * hash an EARLIER batch already admitted drops its k-token cover (the
    * first-seen document keeps its copy forever — arrival order is the
    * canonical order, the same first-epoch-wins contract as
    * [[blockDedupIncremental]]); within the batch, the lowest doc_id is
    * the keeper, exactly [[removeDupSpans]]'s rule — so ONE batch carrying
    * the whole corpus is bit-identical to the batch operator. Returns
    * (cleaned batch, the batch's distinct gram hashes — the store delta).
    *
    * A fold over ordered batches replays the stream exactly; the
    * `dedup_span_removal_stream` oracle collapses the fold into one
    * composite-key min per hash: an occurrence in doc d of epoch e drops
    * iff some doc with (epoch, doc_id) lexicographically smaller carries
    * the same gram hash.
    *
    * 100 TB shape: O(batch) gram explode, one store semi-join on the
    * 62-bit hash, one in-batch keeper aggregate, the per-doc rebuild —
    * never corpus-sized; the store grows by the batch's distinct hashes.
    */
  def removeDupSpansIncremental(
      seen: Option[DataFrame],
      batch: DataFrame,
      k: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, DataFrame) = {
    val (tok, grams) = incrementalTokGrams(batch, k, idCol, textCol)
    (spanCleanCore(tok, grams, seen, k), grams.select(col("h")).distinct())
  }

  /** [[removeDupSpansIncremental]]'s decision core over a prepared batch
    * tokenization and (doc_id, pos, h) gram frame.
    */
  private def spanCleanCore(
      tok: DataFrame, grams: DataFrame, seen: Option[DataFrame], k: Int): DataFrame = {
    // store-flagged occurrences: an earlier batch owns the canonical copy
    val storeDrops = seen match {
      case Some(s) => grams.join(s.select(col("h")).distinct(), Seq("h"), "left_semi")
        .select(col("doc_id"), col("pos"))
      case None => grams.select(col("doc_id"), col("pos")).filter(lit(false))
    }
    // within-batch duplicates: min doc_id keeps, the batch operator's rule
    val batchKeeper = grams.groupBy(col("h"))
      .agg(min(col("doc_id")).as("keeper"), count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"), col("keeper"))
    val inBatchDrops = grams.join(batchKeeper, Seq("h"))
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"), col("pos"))
    val dropped = storeDrops.unionByName(inBatchDrops)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("t"))
      .distinct()
    rebuildExcised(tok, dropped)
  }

  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    // native scan projection (shingle walk + 62 bit counts in one pass);
    // the bit-count sum is commutative so the result is identical to the
    // relational aggregation below — pinned by VectorExprSpec
    docs.select(col(idCol).as("doc_id"),
      graft.functions.expressions.SignatureExpressions.simhashSigNative(
        graft.functions.expressions.ShingleExpression.wordShinglesNative(col(textCol), 3)).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** The relational formulation of [[simhash]] — explode + 62 bit-sum
    * aggregates, retained as the cross-check of the native expression (and
    * the shape the DuckDB oracle replays).
    */
  private[graft] def simhashRelational(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = shingles(docs, idCol, textCol).select(col("doc_id"), col("s").as("t"))
      .withColumn("h",
        polyHash(col("t")) + polyHash(col("t"), mult = 131L, prime = 2147483629L) * lit(2147483648L))
    val bitSums: Seq[Column] = (0 until SimhashBits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === lit(1L), 1).otherwise(-1)).as(s"b$j")
    }
    val agged = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    // disjoint bit contributions sum to the bitwise OR
    val sig = (0 until SimhashBits).map { j =>
      when(col(s"b$j") >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    agged.select(col("doc_id"), sig.as("simhash"))
  }

  /** Even split of the signature bits into `numChunks` contiguous chunks:
    * (lo, width) per chunk. Shared by the operator and the oracle SQL
    * generator so candidate generation is engine-identical.
    */
  private[graft] def chunkBounds(numChunks: Int): Seq[(Int, Int)] =
    (0 until numChunks).map { k =>
      val lo = SimhashBits * k / numChunks
      val hi = SimhashBits * (k + 1) / numChunks
      (lo, hi - lo)
    }

  /** SimHash near-duplicate pairs with hamming distance <= maxHamming.
    * Candidate generation joins on `maxHamming + 1` evenly-split signature
    * chunks — pigeonhole: `maxHamming` flipped bits cannot touch all
    * `maxHamming + 1` chunks, so a qualifying pair matches at least one
    * chunk exactly; candidates are then verified with `bit_count(xor)`.
    * Narrower chunks trade more candidates for a higher detectable radius —
    * the threshold should sit inside the corpus's hamming separation gap
    * (here: dups at 1-9, non-dups at >= 14, so the default is 11).
    *
    * Candidate-volume tradeoff (API contract, not corpus-specific): with
    * `m = maxHamming + 1` chunks over 62 bits, each chunk key has only
    * `2^(62/m)` distinct values, so the expected self-join volume grows as
    * `m · N² / 2^(62/m)` — at `maxHamming = 11` the 5-6-bit chunks make the
    * join degenerate toward quadratic as N grows. Use a threshold as small
    * as the corpus's separation gap allows; when a large radius is truly
    * needed at large N, the standard remedies are two-of-m blocking (join on
    * PAIRS of chunks: hamming <= h still leaves two untouched chunks when
    * `m >= h + 2`, quadratically shrinking each key's collision mass) or a
    * wider signature — both are parameter/feature changes on this same
    * pipeline shape.
    *
    * `method`: `"chunks"` forces one-of-m blocking, `"two-of-m"` delegates
    * to [[simhashPairsTwoOfM]], and `"auto"` (default) picks two-of-m
    * exactly when the one-of-m chunk width would degenerate below 8 bits
    * (see [[simhashResolveMethod]]) — output is identical either way.
    * Output: (id_a, id_b, hamming INT).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 11,
      idCol: String = "doc_id", textCol: String = "text",
      method: String = "auto"): DataFrame = {
    require(maxHamming >= 0 && maxHamming < SimhashBits,
      s"maxHamming must be in [0, $SimhashBits)")
    simhashResolveMethod(maxHamming, method) match {
      case "two-of-m" => simhashPairsTwoOfM(docs, maxHamming, 0, idCol, textCol)
      case _ =>
        simhashCandidatesChunks(docs, maxHamming, idCol, textCol)
          .filter(col("hamming") <= lit(maxHamming))
          .distinct()
    }
  }

  /** Resolve the simhash blocking method. `"auto"` defaults to two-of-m
    * blocking exactly at the documented degeneration point: when
    * `maxHamming + 1` chunks would drop the chunk width below 8 bits, each
    * one-of-m join key has < 2^8 distinct values and the self-join volume
    * trends quadratic (see the candidate-volume note above) — the radius
    * where a user reaching for the default must get the scale shape.
    */
  private[graft] def simhashResolveMethod(maxHamming: Int, method: String): String =
    method match {
      case "auto" =>
        if (SimhashBits / (maxHamming + 1) < 8) "two-of-m" else "chunks"
      case m @ ("chunks" | "two-of-m") => m
      case other => throw new IllegalArgumentException(
        s"simhashPairs method must be 'chunks', 'two-of-m' or 'auto', got '$other'")
    }

  /** One-of-m candidate pairs WITH their exact hamming, pre-threshold and
    * pre-dedup — exposed for the candidate-volume comparison tests.
    */
  private[graft] def simhashCandidatesChunks(docs: DataFrame, maxHamming: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sigs = simhash(docs, idCol, textCol)
    val bounds = chunkBounds(maxHamming + 1)
    val chunks = sigs.select(col("doc_id"), col("simhash"),
      explode(array(bounds.zipWithIndex.map { case ((lo, width), k) =>
        struct(lit(k).as("k"),
          shiftrightunsigned(col("simhash"), lo).bitwiseAND(lit((1L << width) - 1L)).as("chunk"))
      }: _*)).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.k").as("k"), col("c.chunk").as("chunk"))
    val ham = bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
    chunks.as("x").join(chunks.as("y"), Seq("k", "chunk"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"), ham.as("hamming"))
  }

  /** `simhashPairs` with two-of-m blocking: split the signature into
    * `numChunks >= maxHamming + 2` chunks and join on PAIRS of chunks.
    * Pigeonhole: `maxHamming` flipped bits leave at least
    * `numChunks - maxHamming >= 2` chunks untouched, so a qualifying pair
    * shares at least one chunk PAIR exactly — candidates remain COMPLETE
    * and the output is identical to `simhashPairs` (same exact hamming
    * verification; equality is a test invariant, not a hope).
    *
    * The trade: C(m,2) join rows per doc instead of m, but each join key
    * carries two chunks' bits, so per-key collision mass drops from
    * `N²/2^w` to `N²/2^(2w)`. At (62 bits, maxHamming=11, m=13) that is a
    * measured ~3x candidate reduction — the technique's payoff grows with
    * signature width (the chunk width `w = bits/m` is what's squared), which
    * is why wide signatures + two-of-m is the standard shape when a large
    * radius must scale (see the `simhashPairs` candidate-volume note).
    * Output: (id_a, id_b, hamming INT) — identical to `simhashPairs`.
    */
  def simhashPairsTwoOfM(docs: DataFrame, maxHamming: Int = 11, numChunks: Int = 0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    simhashCandidatesTwoOfM(docs, maxHamming, numChunks, idCol, textCol)
      .filter(col("hamming") <= lit(maxHamming))
      .distinct()

  /** Two-of-m candidate pairs WITH their exact hamming, pre-threshold and
    * pre-dedup — exposed for the candidate-volume comparison tests.
    */
  private[graft] def simhashCandidatesTwoOfM(docs: DataFrame, maxHamming: Int,
      numChunks: Int = 0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val m = if (numChunks > 0) numChunks else maxHamming + 2
    require(maxHamming >= 0 && maxHamming < SimhashBits,
      s"maxHamming must be in [0, $SimhashBits)")
    require(m >= maxHamming + 2, "two-of-m blocking needs numChunks >= maxHamming + 2")
    require(m <= SimhashBits, s"numChunks must be <= $SimhashBits")
    val sigs = simhash(docs, idCol, textCol)
    val bounds = chunkBounds(m)
    def chunkExpr(k: Int): Column = {
      val (lo, width) = bounds(k)
      shiftrightunsigned(col("simhash"), lo).bitwiseAND(lit((1L << width) - 1L))
    }
    val pairRows = for { k1 <- 0 until m; k2 <- k1 + 1 until m } yield
      struct(lit(k1).as("k1"), lit(k2).as("k2"),
        chunkExpr(k1).as("c1"), chunkExpr(k2).as("c2"))
    val keyed = sigs.select(col("doc_id"), col("simhash"), explode(array(pairRows: _*)).as("p"))
      .select(col("doc_id"), col("simhash"),
        col("p.k1").as("k1"), col("p.k2").as("k2"), col("p.c1").as("c1"), col("p.c2").as("c2"))
    val ham = bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
    keyed.as("x").join(keyed.as("y"), Seq("k1", "k2", "c1", "c2"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"), ham.as("hamming"))
  }
}
