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
    val evRaw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val rows = evRaw
      .select(
        timestamp_micros(SparkTestBase.tsEpochUs(evRaw)).as("event_time"),
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
    val evRaw2 = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val batch = evRaw2
      .withColumn("event_time", timestamp_micros(SparkTestBase.tsEpochUs(evRaw2)))
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

  test("session window + watermark: closed sessions == batch session_window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evRaw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val rows = evRaw
      .select(
        timestamp_micros(SparkTestBase.tsEpochUs(evRaw)).as("event_time"),
        col("user_id"), col("value"))
      .orderBy("event_time")
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))

    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(session_window(col("event_time"), "2 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("ss"),
        unix_micros(col("session_window.end")).as("se"), col("n_events"))

    val stream = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val q = sessions(stream.toDS().toDF("event_time", "user_id", "value")
        .withWatermark("event_time", "30 minutes"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      rows.grouped(rows.length / 5 + 1).foreach { ch =>
        stream.addData(ch.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    val evRaw2 = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val batch = sessions(evRaw2
        .withColumn("event_time", timestamp_micros(SparkTestBase.tsEpochUs(evRaw2))))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap

    assert(streamed.nonEmpty, "watermark should have closed sessions")
    // a closed streamed session must be exactly a batch session (merging
    // across micro-batches produced the same final extents and counts)
    streamed.foreach { case (k, n) =>
      assert(batch.contains(k) && batch(k) == n,
        s"session $k: stream $n vs batch ${batch.get(k)}")
    }
    // only sessions still open (or not yet past the watermark) at stream
    // end may be missing from the append output
    val missing = batch.keySet.diff(streamed.keySet)
    val maxClosedEnd = streamed.keys.map(_._3).max
    assert(missing.forall(_._3 >= maxClosedEnd),
      s"non-trailing sessions missing from the stream: ${missing.take(3)}")
  }
}
