package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with a watermark in Structured Streaming
  * (beyond the reference, which is purely price-driven): append-mode
  * tumbling windows close once the watermark passes, and the closed windows
  * match the batch computation over the same data.
  */
class WindowedStreamSpec extends SparkTestBase {

  test("tumbling window + watermark: closed windows == batch aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(
        timestamp_micros((col("ts").cast("decimal(38,0)") / lit(1000)).cast("long")).as("event_time"),
        col("event_type"), col("value"))
      .orderBy("event_time")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))

    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = stream.toDS().toDF("event_time", "event_type", "value")
      .withWatermark("event_time", "30 minutes")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_millis(col("window.start")).as("w"), col("event_type"), col("n_events"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      rows.grouped(rows.length / 5 + 1).foreach { ch =>
        stream.addData(ch.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("win_out").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("event_time",
        timestamp_micros((col("ts").cast("decimal(38,0)") / lit(1000)).cast("long")))
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_millis(col("window.start")).as("w"), col("event_type"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    assert(streamed.nonEmpty, "watermark should have closed windows")
    // every closed (appended) window carries the exact batch count
    streamed.foreach { case (k, n) =>
      assert(batch.contains(k) && batch(k) == n, s"window $k: stream $n vs batch ${batch.get(k)}")
    }
    // windows still open at stream end are the only ones missing
    val missing = batch.keySet.diff(streamed.keySet)
    val maxClosed = if (streamed.isEmpty) 0L else streamed.keys.map(_._1).max
    assert(missing.forall(_._1 >= maxClosed), "only trailing open windows may be missing")
  }
}
