package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch-based approximate statistics for corpus profiling.
  *
  * KMV (k-minimum-values) distinct counting [Bar-Yossef et al. 2002]: keep
  * the k smallest distinct hash values per group; if fewer than k distinct
  * hashes exist the count is exact, otherwise `(k-1) * H / kth_min`
  * estimates the distinct count (hashes uniform on [0, H)). Chosen over HLL
  * here because every step — polynomial hash, distinct, rank, one division —
  * is exactly replicable in ANSI SQL, so the sketch itself is oracle-
  * verifiable bit-for-bit, not just statistically.
  *
  * Scale shape: the shuffle is O(distinct tokens) narrow (group, hash) rows
  * — the same cost as any exact distinct count's first stage — then a
  * per-group sort to rank. (A production variant replaces the rank window
  * with a bounded k-min-heap aggregate; the relational form is kept here for
  * oracle parity and is already sub-quadratic.)
  */
object Sketches {

  /** Approximate distinct-token count per group. Output: (group, n_kept,
    * est_distinct) — n_kept = min(k, true distinct), est_distinct rounded
    * to 6 dp (exact when the group has < k distinct tokens).
    */
  def kmvDistinctTokens(
      docs: DataFrame,
      k: Int = 256,
      groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    require(k >= 2, "k must be >= 2")
    // the raw polynomial fold of SHORT tokens is wildly non-uniform (a
    // 3-char token hashes below 31^3), which destroys the kth-min statistic
    // — the same LCG scramble the deterministic sampler uses restores
    // uniformity on [0, 2^31-1) while staying exactly SQL-replicable
    val hashes = docs
      .select(col(groupCol), explode(tokens(col(textCol))).as("tok"))
      .select(col(groupCol),
        pmod(polyHash(col("tok")) * lit(2654435761L) + lit(12345L), lit(2147483647L)).as("h"))
      .distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h").asc)
    hashes.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth"))
      .select(col(groupCol), col("n_kept"),
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble * 2147483647.0) / col("kth")), 6)
          .as("est_distinct"))
  }
}
