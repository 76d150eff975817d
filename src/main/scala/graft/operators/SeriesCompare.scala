package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Positional diff of two aligned frames — the reference's
  * `Series.compare` usage (`test/test_ws_ext.py:43-45`) and the
  * brick-alignment diff tool in `examples/comparison_ctrader.ipynb` (cell
  * 21): align two runs by position and report the rows where a value
  * column differs.
  *
  * Spark has no positional index, so alignment is explicit: a distributed
  * global position (parallel range-sort, then per-partition counts turned
  * into prefix offsets — `zipWithIndex`), then an inner join on position.
  * A `row_number()` window without a partition key would funnel the whole
  * table through ONE task; this formulation keeps both the sort and the
  * numbering parallel, so it survives a 100x scale-up.
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
      val sorted = df.orderBy(orderCols.map(col): _*).select(col(valueCol).as(out))
      val field = sorted.schema.head
      val schema = StructType(Seq(
        StructField("pos", LongType, nullable = false),
        StructField(out, field.dataType, field.nullable)))
      // zipWithIndex = one tiny count job for per-partition offsets, then an
      // embarrassingly parallel zip — no single-task window
      val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row(i + 1L, r.get(0)) }
      df.sparkSession.createDataFrame(rdd, schema)
    }
    positioned(left, "self")
      .join(positioned(right, "other"), Seq("pos"))
      .filter(col("self") =!= col("other"))
      .select(col("pos"), col("self"), col("other"))
  }
}
