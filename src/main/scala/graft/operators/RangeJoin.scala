package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: points to the intervals of the same
  * key that contain them — the second classic time-series join Spark has no
  * native operator for (a naive formulation is a cross product with a
  * range filter).
  *
  * Scale path: TIME BUCKETING. Every interval is exploded to the fixed-width
  * buckets it spans; every point belongs to exactly one bucket; the join is
  * then an EQUI-join on (key, bucket) with the exact range predicate as a
  * post-filter. A (point, interval) pair can only meet in the point's single
  * bucket, so no dedup pass is needed. Bucket width trades explode factor
  * against join selectivity; the shuffle is hash-partitioned on (key,
  * bucket), so skewed keys spread across their time range instead of one
  * hot partition — the standard distributed range-join plan (Spark's own
  * SQL range-join hints implement the same idea).
  */
object RangeJoin {

  /** Inner containment join: `start <= ts <= end`, same key on both sides.
    * Interval columns are carried through; ts/key column names stay as
    * given. `bucketWidth` is in the timestamp's unit (e.g. µs).
    */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keyCol: String,
      tsCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    // non-negative epoch offsets stay far inside double's 2^53 exact range,
    // so divide + truncate equals integer floor-div here
    def bucketOf(c: org.apache.spark.sql.Column) =
      (c.cast("double") / bucketWidth).cast("long")
    // degenerate end < start intervals can match nothing, but would make
    // sequence() emit a DESCENDING bucket list — drop them at the scan
    val ib = intervals.filter(col(endCol) >= col(startCol)).withColumn("__b",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val pb = points.withColumn("__b", bucketOf(col(tsCol)))
    pb.join(ib,
        pb("__b") === ib("__b") && pb(keyCol) === ib(keyCol) &&
          col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop(ib(keyCol)).drop(pb("__b")).drop(ib("__b"))
  }
}
