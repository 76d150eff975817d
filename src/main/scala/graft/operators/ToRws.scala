package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Checkpoint projection: wide brick table → resumable handoff table
  * (reference `Renko.to_rws`, `/root/reference/src/renkodf/renkodf.py:389-420`).
  *
  * Drops the batch-only tick indices, adds the constant `brick_size`, and
  * replaces the TIMESTAMP `datetime` with integer epoch-µs `timestamp`
  * (the reference uses `DatetimeIndex.asi8`, i.e. the index's own unit; our
  * engine standardizes on µs internally). The result round-trips into the
  * streaming operator's initial state.
  */
object ToRws {

  /** @param useIloc reference `use_iloc`: Some(n >= 0) keeps the first n
    *                rows per series, Some(n < 0) the last |n| rows
    *                (renkodf.py:414-418)
    */
  def toRws(wide: DataFrame, brickSize: Double, useIloc: Option[Int] = None): DataFrame = {
    val base = wide
      .drop("tick_index_open", "tick_index_close")
      .withColumn("brick_size", lit(brickSize))
      .withColumn("timestamp", unix_micros(col("datetime")))
      .drop("datetime")
    useIloc match {
      case None => base
      case Some(n) =>
        // Positional slice needs an explicit order — Spark has no index. A
        // per-series row_number keeps the slice distributed (no global sort).
        val asc = Window.partitionBy(col("symbol")).orderBy(col("timestamp").asc)
        val desc = Window.partitionBy(col("symbol")).orderBy(col("timestamp").desc)
        val w = if (n >= 0) asc else desc
        base
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= lit(math.abs(n)))
          .drop("__rn")
    }
  }
}
