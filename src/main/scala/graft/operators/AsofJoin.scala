package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single most recent right row
  * with the same key and `rightTs <= leftTs` (the canonical time-series
  * enrichment operator Spark has no built-in for).
  *
  * Implementation is the distributed union-and-carry-forward form, not a
  * range join: both sides are tagged and unioned, one window per key ordered
  * by (ts, side, tieBreak) carries the last-seen right payload forward, and
  * left rows read it. Right rows sort BEFORE left rows at equal timestamps
  * (side 0 < 1), so an exactly-simultaneous right row matches — the standard
  * backward-asof tie rule; among several right rows at one timestamp the
  * largest tie-break wins, making the result fully deterministic.
  *
  * Scale shape: ONE shuffle of both inputs by key + a sort within partitions
  * (no per-row probing, no broadcast requirement on either side, no range
  * explosion); this is how as-of joins run over billions of rows. Skewed
  * keys behave like any other windowed aggregate (AQE/salting apply).
  */
object AsofJoin {

  /** @param rightValCols right columns carried onto matches (emitted as
    *                     `asof_<name>`, NULL when no prior right row exists)
    * @param tieBreakCol  integral right column ordering simultaneous right
    *                     rows; the largest value wins
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightValCols: Seq[String],
      tieBreakCol: String): DataFrame = {
    require(rightValCols.nonEmpty, "rightValCols must be non-empty")
    val leftCols = left.columns.toSeq
    require(leftCols.forall(!_.startsWith("__")), "left columns may not start with __")
    val rSide = right.select(
      col(keyCol).as("__k"), col(rightTsCol).as("__t"), lit(0).as("__side"),
      col(tieBreakCol).cast("long").as("__tb"),
      struct(rightValCols.map(col): _*).as("__rv"))
    val rvType = rSide.schema("__rv").dataType
    val lSide = left.select(
      Seq(col(keyCol).as("__k"), col(leftTsCol).as("__t"), lit(1).as("__side"),
        lit(Long.MaxValue).as("__tb"), lit(null).cast(rvType).as("__rv")) ++
        leftCols.map(col): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide, allowMissingColumns = true)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightValCols.map(c => col("__m").getField(c).as(s"asof_$c")): _*)
  }
}
