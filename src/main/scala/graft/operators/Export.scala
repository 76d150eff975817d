package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data export: the last step of a curation pipeline — fix a
  * deterministic global shuffle order, deal documents round-robin into a
  * fixed number of shards, and manifest each shard's document/token mass.
  *
  * The shuffle order is [[Sampling.shufflePosition]] (a pure function of
  * (seed, id) — reproducible across runs and engines, no RNG), so the
  * entire export is replayable: the same corpus, seed, and shard count
  * always produce byte-identical shard assignments on any engine. This is
  * the property a 100 TB training run needs from its data layer — restarts
  * and re-exports cannot silently reorder the corpus.
  *
  * Scale shape: the only shuffle is the hierarchical rank in
  * `shufflePosition` (1024-way range split, never a one-task window);
  * shard assignment is arithmetic on the position, and the manifest is one
  * `nShards`-row aggregate. Writing `partitionBy(shard)` then gives one
  * directory per shard with within-shard order = `shard_pos`.
  */
object Export {

  /** Per-document shard assignment. Output: input columns + `position`
    * (the global shuffle rank), `shard` (0-based, round-robin over
    * positions — shard doc counts balanced to ±1), `shard_pos` (1-based
    * rank within the shard), `n_tokens` (whitespace token count, or
    * `tokensCol` when the pipeline already annotated one).
    */
  def shardAssign(
      docs: DataFrame,
      nShards: Int,
      seed: String = "shuffle",
      idCol: String = "doc_id",
      textCol: String = "text",
      tokensCol: Option[String] = None): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val nTok = tokensCol.map(tc => col(tc).cast("long"))
      .getOrElse(size(TextFunctions.tokens(col(textCol))).cast("long"))
    // (position-1) is < corpus size, far inside double's exact-integer
    // range, so the truncating division is exact (the epoch-ns caveat in
    // Renko.toEpochMicros does not apply at corpus cardinalities)
    val p0 = col("position") - lit(1L)
    Sampling.shufflePosition(docs, seed, idCol)
      .withColumn("shard", pmod(p0, lit(nShards.toLong)))
      .withColumn("shard_pos", (p0 / lit(nShards.toLong)).cast("long") + lit(1L))
      .withColumn("n_tokens", nTok)
  }

  /** TOKEN-balanced shard assignment: documents ranked by
    * (n_tokens DESC, scrambled hash, id) and dealt in SNAKE order — round
    * r hands shards 0..n-1 left-to-right when r is even, right-to-left
    * when odd (classic folded dealing): consecutive rounds pair each
    * shard's large draw with a small one, so per-shard TOKEN mass evens
    * out where plain round-robin only balances document counts. Doc counts
    * stay balanced to ±1 (each round still touches every shard once), and
    * the whole deal remains a pure function of (seed, id, nShards) —
    * byte-identical on re-export, engine-replayable.
    *
    * Scale shape: the exact global rank reuses the hierarchical pattern
    * ([[Sampling.shufflePosition]]): one tiny token-range stats aggregate
    * fixes an integer-division step, the coarse `__rng` key buckets the
    * token-DESC axis into ≤1024 monotone ranges (the PlanLint whitelist
    * bound), the per-range counts form a broadcast base frame, and the
    * within-range window is partitioned by range — and never the earlier
    * (distinct-token-counts × 1024)-row base frame, which was
    * corpus-coupled on long-document corpora.
    *
    * Degenerate-span guard: when the token-count span is small (uniform or
    * low-cardinality lengths — fixed-size chunks are the common case), a
    * pure token-range key collapses to ONE range = one window task. Since a
    * small span means every range holds EXACTLY one token count (step = 1),
    * the hash high bits are a VALID refinement inside a range (rows with
    * equal `__nt` are ordered by `__hv`, so a hash-bit prefix is a monotone
    * coarsening of the sort key there), and the range key widens in-plan to
    * `range * 2^b + (hash >> (31-b))` with `b = max(0, 10 − ceil(log2(span
    * +1)))` — still ≤ 1024 combined ranges (so the base frame stays
    * broadcast-bounded), but the worst partition is ~N/2^b rows (N/1024 for
    * a fully uniform corpus, the bound the old (__nt, hash-bit) scheme
    * had). When the span exceeds 512 the hash bits drop out (b = 0) and the
    * key is the plain token range; a range then holds several token counts,
    * which is exactly when hash bits would break the ordering.
    *
    * Output: input columns + (position — the token-desc global rank,
    * shard, shard_pos, n_tokens).
    */
  def shardAssignTokenBalanced(
      docs: DataFrame,
      nShards: Int,
      seed: String = "shuffle",
      idCol: String = "doc_id",
      textCol: String = "text",
      tokensCol: Option[String] = None): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val nTok = tokensCol.map(tc => col(tc).cast("long"))
      .getOrElse(size(TextFunctions.tokens(col(textCol))).cast("long"))
    val h = pmod(
      TextFunctions.polyHash(concat(lit(seed), lit(":"), col(idCol).cast("string")))
        * lit(2654435761L) + lit(12345L), lit(2147483647L))
    val perDoc0 = docs
      .withColumn("n_tokens", nTok)
      .withColumn("__hv", h)
      .withColumn("__nt", -col("n_tokens"))
    val ntStats = perDoc0.agg(
      min(col("__nt")).as("__ntmn"), max(col("__nt")).as("__ntmx"))
    // coarse range id 0..1023, monotone in the (-n_tokens) sort axis:
    // integer division of exact integers (the prCurve/hierarchicalRank step
    // construction) — the base frame is <= 1024 rows whatever the corpus
    val perDoc = perDoc0.crossJoin(broadcast(ntStats))
      .withColumn("__step", expr("((__ntmx - __ntmn) div 1024) + 1L"))
      // hash sub-bucket bits: only when step = 1 (span <= 512 implies every
      // range is a single token count, where hash order IS the sort order)
      .withColumn("__b", expr(
        "greatest(0, 10 - cast(ceil(log2(cast(__ntmx - __ntmn AS DOUBLE) + 1.0D)) AS INT))"))
      .withColumn("__rng", expr(
        "((__nt - __ntmn) div __step) * shiftleft(1L, __b) + " +
          "(CASE WHEN __b = 0 THEN 0L ELSE cast(shiftright(__hv, 31 - __b) AS BIGINT) END)"))
    val rangeBase = graft.util.SmallPrefix.exclusivePrefix(
        perDoc.groupBy(col("__rng")).agg(count(lit(1)).as("__rcnt")),
        "__rng", Map("__rcnt" -> "__base"))
      .select(col("__rng"), col("__base"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__rng"))
      .orderBy(col("__nt").asc, col("__hv").asc, col(idCol).asc)
    val p0 = col("position") - lit(1L)
    val round = (p0 / lit(nShards.toLong)).cast("long")
    val inRound = pmod(p0, lit(nShards.toLong))
    perDoc
      .join(broadcast(rangeBase), Seq("__rng"))
      .withColumn("position", col("__base") + row_number().over(wIn).cast("long"))
      .withColumn("shard",
        when(pmod(round, lit(2L)) === lit(0L), inRound)
          .otherwise(lit(nShards.toLong - 1L) - inRound))
      .withColumn("shard_pos", round + lit(1L))
      .drop("__hv", "__nt", "__rng", "__base", "__step", "__b", "__ntmn", "__ntmx")
  }

  /** GROUP-scoped shard assignment — [[shardAssign]] with the deal keyed
    * per `groupCol` value (a train/val/test split, a language, an epoch):
    * position, shard, and shard_pos restart inside every group, so each
    * group exports into its OWN nShards round-robin shards and no shard
    * file ever mixes two groups — the property a train/test split needs
    * from its export (a shard readable by exactly one consumer).
    *
    * Scale shape: [[Sampling.shufflePosition]]'s hierarchical rank with
    * every stage partitioned by the group — the range-base frame is
    * |groups|·1024 rows (broadcast for any realistic group count) and its
    * prefix window is PARTITIONED by group, so nothing here is a one-task
    * stage even before whitelisting.
    *
    * Output: input columns + (position — 1-based rank within the group's
    * (scrambled hash, id) order, shard, shard_pos, n_tokens).
    */
  def shardAssignGrouped(
      docs: DataFrame,
      nShards: Int,
      groupCol: String,
      seed: String = "shuffle",
      idCol: String = "doc_id",
      textCol: String = "text",
      tokensCol: Option[String] = None): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val nTok = tokensCol.map(tc => col(tc).cast("long"))
      .getOrElse(size(TextFunctions.tokens(col(textCol))).cast("long"))
    val h = pmod(
      TextFunctions.polyHash(concat(lit(seed), lit(":"), col(idCol).cast("string")))
        * lit(2654435761L) + lit(12345L), lit(2147483647L))
    val perDoc = docs
      .withColumn("n_tokens", nTok)
      .withColumn("__hv", h)
      .withColumn("__rng", shiftright(col("__hv"), 21))
    val wRange = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__rng").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val rangeBase = perDoc
      .groupBy(col(groupCol), col("__rng"))
      .agg(count(lit(1)).as("__rcnt"))
      .withColumn("__base", coalesce(sum(col("__rcnt")).over(wRange), lit(0L)))
      .select(col(groupCol), col("__rng"), col("__base"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("__rng"))
      .orderBy(col("__hv").asc, col(idCol).asc)
    val p0 = col("position") - lit(1L)
    perDoc
      .join(broadcast(rangeBase), Seq(groupCol, "__rng"))
      .withColumn("position", col("__base") + row_number().over(wIn).cast("long"))
      .withColumn("shard", pmod(p0, lit(nShards.toLong)))
      .withColumn("shard_pos", (p0 / lit(nShards.toLong)).cast("long") + lit(1L))
      .drop("__hv", "__rng", "__base")
  }

  /** Per-shard manifest: (shard, n_docs, n_tokens, first_doc) — the export
    * summary a training job reads to plan its input streams. `first_doc`
    * (the id at shard_pos 1) pins the head of each shard's order into the
    * manifest, so an accidental reorder is visible here, not just in the
    * shard bytes.
    */
  def shardManifest(
      docs: DataFrame,
      nShards: Int,
      seed: String = "shuffle",
      idCol: String = "doc_id",
      textCol: String = "text",
      tokensCol: Option[String] = None): DataFrame =
    shardAssign(docs, nShards, seed, idCol, textCol, tokensCol)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min_by(col(idCol), col("shard_pos")).as("first_doc"))
}
