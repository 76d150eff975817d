package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-delta report between two corpus versions — the nightly answer
  * to "what changed since the last cut": per source, how many documents
  * were added / removed / retained and the net token delta (covering both
  * membership changes and in-place edits).
  *
  * Scale shape: both sides project to (id, source, token-count) in their
  * scan stage — the text never shuffles — then one full-outer equi-join on
  * the id (co-located and exchange-free when the snapshots live bucketed
  * by id, see BucketedScanSpec) feeds a partial-aggregated rollup whose
  * output is one row per source.
  */
object CorpusDiff {

  def report(
      oldDocs: DataFrame,
      newDocs: DataFrame,
      idCol: String = "doc_id",
      srcCol: String = "source",
      textCol: String = "text"): DataFrame = {
    def proj(df: DataFrame, side: String) = df.select(
      col(idCol).as("doc_id"), col(srcCol).as(s"src_$side"),
      size(tokens(col(textCol))).cast("long").as(s"tok_$side"))
    proj(oldDocs, "old")
      .join(proj(newDocs, "new"), Seq("doc_id"), "full_outer")
      // a retained doc reports its CURRENT source if relabeled
      .groupBy(coalesce(col("src_new"), col("src_old")).as("source"))
      .agg(
        sum(when(col("src_old").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("src_new").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("src_old").isNotNull && col("src_new").isNotNull, 1L)
          .otherwise(0L)).as("n_retained"),
        sum(coalesce(col("tok_new"), lit(0L)) - coalesce(col("tok_old"), lit(0L)))
          .as("token_delta"))
      .orderBy(col("source"))
  }

  /** Token-distribution drift between two corpus snapshots, per source:
    * KL(new ‖ old) over add-one-smoothed unigram distributions on the
    * union vocabulary — the "did my feed change character, not just size"
    * monitor a corpus team runs next to the membership diff ([[report]]).
    *
    * Determinism: each term's contribution `p·ln(p/q)` is quantized to
    * integer picos (`floor(x·1e12 + 0.5)`) BEFORE summing — the per-source
    * sum is exact integer arithmetic, order-independent under any
    * partitioning, and divided once at the end (the [[TextAnalysis]]
    * lmScore discipline). The oracle replays the identical arithmetic.
    *
    * Output: (source, n_tokens_old, n_tokens_new, vocab_union, kl).
    *
    * Scale shape: two (source, token) count aggregates with map-side
    * partials, one full-outer equi-join on the vocabulary, a broadcast of
    * the per-source totals, one rollup. Nothing corpus-sized shuffles
    * twice; the join is vocabulary-sized.
    */
  def driftReport(
      oldDocs: DataFrame,
      newDocs: DataFrame,
      srcCol: String = "source",
      textCol: String = "text"): DataFrame =
    driftFromCounts(
      tokenCounts(oldDocs, "old", srcCol, textCol),
      tokenCounts(newDocs, "new", srcCol, textCol))

  /** Per-(source, token) counts of one snapshot — the additive state the
    * STREAMING monitor accumulates (counts of a union == summed counts of
    * its parts, so a count store replaces re-scanning history).
    */
  private[graft] def tokenCounts(
      df: DataFrame, side: String,
      srcCol: String = "source", textCol: String = "text"): DataFrame = df
    .select(col(srcCol).as("source"), explode(tokens(col(textCol))).as("tok"))
    .groupBy(col("source"), col("tok")).agg(count(lit(1)).as(s"c_$side"))

  /** [[driftReport]]'s arithmetic over already-aggregated count frames
    * (source, tok, c_old) and (source, tok, c_new).
    */
  private[graft] def driftFromCounts(oldCounts: DataFrame, newCounts: DataFrame): DataFrame = {
    val j = oldCounts
      .join(newCounts, Seq("source", "tok"), "full_outer")
      .select(col("source"), col("tok"),
        coalesce(col("c_old"), lit(0L)).as("co"),
        coalesce(col("c_new"), lit(0L)).as("cn"))
    val tot = j.groupBy(col("source"))
      .agg(sum(col("co")).as("o"), sum(col("cn")).as("n"), count(lit(1)).as("v"))
    j.join(broadcast(tot), Seq("source"))
      .withColumn("p", (col("cn") + 1).cast("double") / (col("n") + col("v")).cast("double"))
      .withColumn("q", (col("co") + 1).cast("double") / (col("o") + col("v")).cast("double"))
      .withColumn("contrib",
        floor(col("p") * log(col("p") / col("q")) * lit(1e12) + 0.5).cast("long"))
      .groupBy(col("source"))
      .agg(max(col("o")).as("n_tokens_old"), max(col("n")).as("n_tokens_new"),
        max(col("v")).as("vocab_union"), sum(col("contrib")).as("klp"))
      .select(col("source"), col("n_tokens_old"), col("n_tokens_new"),
        col("vocab_union"), (col("klp").cast("double") / lit(1e12)).as("kl"))
      .orderBy(col("source"))
  }

  /** Cross-source overlap matrix: for every source pair, how many distinct
    * verbatim `k`-gram hashes they share and the gram-set Jaccard — the
    * corpus-analytics answer to "which of my feeds are copying each
    * other" (mirror sites, syndication, scraped re-hosts) before any
    * pairwise document work is spent on them.
    *
    * Output: (source_a, source_b, shared_grams, jaccard rounded 6 dp),
    * one row per unordered pair (a < b), zero-pairs included.
    *
    * Scale shape: one distinct (source, gram-hash) aggregate — the same
    * fixed-width shuffle keys as [[Dedup.dupSpanStats]] — then a
    * hash-equi self-join grouped to |sources|² rows; per-source totals
    * are a tiny aggregate, the pair frame is source-cardinality-sized.
    */
  def overlapMatrix(
      docs: DataFrame,
      k: Int = 8,
      srcCol: String = "source",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.{orderedNgramsFromTokens, polyHash}
    require(k >= 1, "k must be >= 1")
    val g = docs.select(col(srcCol).as("source"), tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= k)
      .select(col("source"), explode(orderedNgramsFromTokens(col("w"), k)).as("gram"))
      .select(col("source"), polyHash(col("gram")).as("h"))
      .distinct()
    val totals = g.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val sources = docs.select(col(srcCol).as("source")).distinct()
    val pairs = sources.as("a").select(col("source").as("source_a"))
      .crossJoin(sources.as("b").select(col("source").as("source_b")))
      .filter(col("source_a") < col("source_b"))
    val shared = g.as("x").join(g.as("y"),
        col("x.h") === col("y.h") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("shared_grams"))
    // totals join LEFT + coalesced to 0: a source whose documents are all
    // shorter than k tokens has no gram totals row, and the zero-pairs
    // contract says such pairs still appear (shared_grams = 0, jaccard 0.0
    // by the empty-union convention) rather than silently vanishing
    val sg = coalesce(col("shared_grams"), lit(0L))
    val denom =
      coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L)) - sg
    pairs
      .join(broadcast(totals.select(col("source").as("source_a"), col("n").as("na"))),
        Seq("source_a"), "left")
      .join(broadcast(totals.select(col("source").as("source_b"), col("n").as("nb"))),
        Seq("source_b"), "left")
      .join(shared, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        sg.as("shared_grams"),
        when(denom === 0, lit(0.0))
          .otherwise(round(sg.cast("double") / denom.cast("double"), 6))
          .as("jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }
}
