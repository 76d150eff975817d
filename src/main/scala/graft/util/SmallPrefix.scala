package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exclusive prefix sums over a BROADCAST-SIZED keyed frame — the
  * hierarchical-rank pattern's base-frame cumulative WITHOUT the
  * empty-partitionSpec window it used to ride. A `Window.orderBy(key)`
  * over even a ≤1024-row frame still plans a single-partition exchange +
  * one-task WindowExec (and Spark logs a scary warning per run); the same
  * exclusive prefix is a broadcast non-equi self-join + re-aggregation —
  * ≤1024² comparisons, fully distributed, warning-free, and exactly equal
  * (integer sums over a strictly-smaller-key set are order-independent).
  *
  * `base` must have one row per key (the caller's groupBy output). Output:
  * one row per input row with each value column replaced by the SUM of
  * that column over all rows whose key is strictly before it (ascending or
  * descending per `desc`), 0 when none — i.e. the
  * `rowsBetween(unboundedPreceding, -1)` frame.
  */
object SmallPrefix {

  /** 1-based rank over a BROADCAST-SIZED frame (a top-k output):
    * rank(a) = 1 + |{b : b strictly before a}| via the same broadcast
    * non-equi self-join — replaces the empty-partitionSpec ranking window
    * a `orderBy.limit(k)` tail used to need. `before(bAlias, aAlias)` must
    * encode a STRICT total order (include an id tiebreaker), or two rows
    * share a rank.
    */
  def rankSmall(
      base: DataFrame,
      before: (String, String) => Column,
      out: String = "rank"): DataFrame = {
    val keep = base.columns.toSeq
    val a = base.as("__ra")
    val b = base.withColumn("__one", lit(1)).as("__rb")
    a.join(broadcast(b), before("__rb", "__ra"), "left")
      .groupBy(keep.map(c => col(s"__ra.$c").as(c)): _*)
      .agg((count(col("__rb.__one")) + lit(1L)).as(out))
  }

  def exclusivePrefix(
      base: DataFrame,
      keyCol: String,
      sums: Map[String, String],
      desc: Boolean = false): DataFrame = {
    require(sums.nonEmpty, "need at least one value column")
    val a = base.as("__pa")
    val b = base.as("__pb")
    val cond: Column =
      if (desc) col(s"__pb.$keyCol") > col(s"__pa.$keyCol")
      else col(s"__pb.$keyCol") < col(s"__pa.$keyCol")
    val keep = base.columns.toSeq
    a.join(broadcast(b), cond, "left")
      .groupBy(keep.map(c => col(s"__pa.$c").as(c)): _*)
      .agg(
        sums.head match { case (v, out) => coalesce(sum(col(s"__pb.$v")), lit(0L)).as(out) },
        sums.tail.toSeq.map { case (v, out) =>
          coalesce(sum(col(s"__pb.$v")), lit(0L)).as(out)
        }: _*)
  }
}
