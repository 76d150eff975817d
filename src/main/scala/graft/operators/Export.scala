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
