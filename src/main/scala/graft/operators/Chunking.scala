package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence chunking for training-data pipelines: split each document into
  * fixed-size token windows with a stride (overlap = chunkSize - stride),
  * the standard precursor to context-window packing / embedding indexing.
  *
  * Chunk-count rule: one chunk always; beyond that, a new chunk starts every
  * `stride` tokens while the PREVIOUS chunk did not already reach the end of
  * the document — `nChunks = 1 + max(0, ceil((nTok - chunkSize) / stride))`.
  * This covers every token exactly once per overlapping window without
  * emitting tail chunks fully contained in their predecessor.
  *
  * Scale shape: a scan-local projection + explode — no shuffle, no state;
  * output row count is `sum(nChunks)` and each chunk's text is rebuilt from
  * the token slice, so the operator streams through a 100 TB corpus with
  * per-row cost only.
  */
object Chunking {

  def chunk(
      docs: DataFrame,
      chunkSize: Int = 32,
      stride: Int = 24,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(chunkSize >= 1, "chunkSize must be >= 1")
    require(stride >= 1 && stride <= chunkSize, "stride must be in [1, chunkSize]")
    val tok = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
      .withColumn("n_tok", size(col("w")).cast("long"))
    // integer ceil((n - cs) / st) via (n - cs + st - 1) div st, clamped at 0
    val extra = greatest(
      floor((col("n_tok") - chunkSize + (stride - 1)).cast("double") / stride).cast("long"),
      lit(0L))
    tok.withColumn("chunk_id", explode(sequence(lit(0L), extra)))
      .select(
        col("doc_id"),
        col("chunk_id"),
        (col("chunk_id") * stride + 1).as("chunk_start"),
        least(lit(chunkSize.toLong), col("n_tok") - col("chunk_id") * stride)
          .as("n_chunk_tokens"),
        array_join(
          slice(col("w"), (col("chunk_id") * stride + 1).cast("int"), lit(chunkSize)),
          " ").as("chunk_text"))
  }

  /** Token-offset assignment for concat-and-chunk pretraining batches:
    * documents are conceptually concatenated per group (in id order) and the
    * token stream is cut into `budget`-token packs; each doc's global token
    * interval [tok_start, tok_end) then spans packs `pack_first..pack_last`
    * (a doc straddling a cut belongs to both — exactly how LLM pretraining
    * packs corpora). Output: (group, doc_id, n_tokens, tok_start,
    * pack_first, pack_last).
    *
    * Scale shape: one running-sum window PARTITIONED BY the group column —
    * one shuffle by group, no global ordering bottleneck; groups are the
    * parallelism axis (source/shard at corpus scale).
    */
  def packOffsets(
      docs: DataFrame,
      budget: Int = 512,
      groupCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // offsets stay far inside double's 2^53 exact range, so the fractional
    // divide + truncate equals integer floor-div for these non-negatives
    def packOf(tokPos: org.apache.spark.sql.Column) =
      (tokPos.cast("double") / budget).cast("long")
    docs.select(col(groupCol), col(idCol).as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("tok_end", sum(col("n_tokens")).over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      .select(col(groupCol), col("doc_id"), col("n_tokens"), col("tok_start"),
        packOf(col("tok_start")).as("pack_first"),
        packOf(col("tok_end") - 1).as("pack_last"))
  }
}
