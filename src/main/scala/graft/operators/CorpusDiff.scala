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
}
