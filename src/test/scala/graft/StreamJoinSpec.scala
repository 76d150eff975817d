package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join: purchases paired with the same user's
  * clicks from the preceding 30 minutes, fed as two live streams — the
  * matches must be exactly the batch interval join over the same data.
  */
class StreamJoinSpec extends SparkTestBase {

  private def eventSide(tpe: String) = {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.filter(col("event_type") === tpe)
      .select(
        col("user_id"),
        timestamp_micros(SparkTestBase.tsEpochUs(ev)).as("event_time"),
        col("event_id"))
  }

  test("interval join: streamed matches == batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def rows(tpe: String) = eventSide(tpe).orderBy("event_time").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))

    val purchases = rows("purchase")
    val clicks = rows("click")

    val pStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val cStream = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = StreamJoin.intervalJoin(
      pStream.toDS().toDF("user_id", "event_time", "event_id"),
      cStream.toDS().toDF("user_id", "event_time", "event_id"),
      keyCol = "user_id", timeCol = "event_time",
      lookback = "30 minutes", watermarkDelay = "10 minutes")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("r_event_id").as("click_id"))
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      // interleave both sides in event-time order, five chunks each
      val chunks = 5
      (0 until chunks).foreach { i =>
        def slice(a: Array[(Long, java.sql.Timestamp, Long)]) = {
          val per = a.length / chunks + 1
          a.slice(i * per, (i + 1) * per).toIndexedSeq
        }
        pStream.addData(slice(purchases))
        cStream.addData(slice(clicks))
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("sj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = eventSide("purchase").as("p")
      .join(eventSide("click").as("c"),
        col("p.user_id") === col("c.user_id") &&
          col("c.event_time") >= col("p.event_time") - expr("interval 30 minutes") &&
          col("c.event_time") <= col("p.event_time"))
      .select(col("p.user_id"), col("p.event_id"), col("c.event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(batch.nonEmpty, "the corpus must contain interval matches")
    assert(streamed == batch,
      s"stream ${streamed.size} vs batch ${batch.size}; " +
        s"missing=${batch.diff(streamed).take(3)} extra=${streamed.diff(batch).take(3)}")
  }

  test("right side already carrying an r_-prefixed twin is rejected up front") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val s = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val left = s.toDS().toDF("user_id", "event_time", "event_id")
    // right has BOTH event_id and r_event_id: the blanket rename would
    // produce two r_event_id columns — must fail fast, not downstream
    val right = s.toDS().toDF("user_id", "event_time", "r_event_id")
      .withColumn("event_id", col("r_event_id"))
    val e = intercept[IllegalArgumentException] {
      StreamJoin.intervalJoin(left, right, "user_id", "event_time",
        "30 minutes", "10 minutes")
    }
    assert(e.getMessage.contains("event_id"))
  }
}
