package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Positional diff of two aligned frames — the reference's
  * `Series.compare` usage (`test/test_ws_ext.py:43-45`) and the
  * brick-alignment diff tool in `examples/comparison_ctrader.ipynb` (cell
  * 21): align two runs by position and report the rows where a value
  * column differs.
  *
  * Spark has no positional index, so alignment is explicit: `row_number`
  * over the caller's ordering, then an inner join on position — a single
  * co-partitioned shuffle on the position key.
  */
object SeriesCompare {

  /** Rows where `valueCol` differs between the two frames at the same
    * position (1-based `pos` by `orderCols`). Output: (pos, self, other).
    * Positions present in only one frame are ignored (inner join) — matching
    * pandas `Series.compare` on equal-length series.
    */
  def compare(
      left: DataFrame,
      right: DataFrame,
      valueCol: String,
      orderCols: Seq[String]): DataFrame = {
    def positioned(df: DataFrame, out: String): DataFrame = {
      val w = Window.orderBy(orderCols.map(col): _*)
      df.withColumn("pos", row_number().over(w))
        .select(col("pos"), col(valueCol).as(out))
    }
    positioned(left, "self")
      .join(positioned(right, "other"), Seq("pos"))
      .filter(col("self") =!= col("other"))
      .select(col("pos"), col("self"), col("other"))
  }
}
