package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the online counterpart of the
  * batch range join (`operators.RangeJoin`): every left event is paired
  * with the same-key right events whose event time falls in
  * `[left_time - lookback, left_time]`, as both sides arrive.
  *
  * Scale shape: both streams shuffle once on the key; the state store
  * retains only rows inside the watermark horizon (Spark derives the
  * eviction bound from the join's time-range condition plus the watermark
  * delay), so state is O(rate x (lookback + delay)) per key-partition —
  * independent of stream age. Output is Append: an inner interval match is
  * final the moment both rows exist; rows with no partner inside the
  * horizon simply never emit.
  */
object StreamJoin {

  /** Inner interval join of two streaming DataFrames.
    *
    * Both inputs must carry `keyCol` and an event-time `timeCol`
    * (TimestampType). Right-side columns come back prefixed `r_` (minus
    * its key, which equals the left key by the join), left columns keep
    * their names — same convention as a SQL `JOIN ... USING (key)` with a
    * disambiguating prefix.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      lookback: String,
      watermarkDelay: String): DataFrame = {
    // the blanket r_ prefix would collide if the right frame carries both
    // `x` and `r_x` (withColumnRenamed then yields two r_x columns and
    // ambiguous resolution downstream) — reject that input up front
    val collisions = right.columns.filter(c => right.columns.contains(s"r_$c"))
    require(collisions.isEmpty,
      s"right side already has r_-prefixed twins of: ${collisions.mkString(", ")}; " +
        "rename them before intervalJoin")
    val l = left.withWatermark(timeCol, watermarkDelay)
    val r = right.columns
      .foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
      .withWatermark(s"r_$timeCol", watermarkDelay)
    l.join(r,
        col(keyCol) === col(s"r_$keyCol") &&
          col(s"r_$timeCol") >= col(timeCol) - expr(s"interval $lookback") &&
          col(s"r_$timeCol") <= col(timeCol))
      .drop(s"r_$keyCol")
  }
}
