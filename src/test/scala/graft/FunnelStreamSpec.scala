package graft

import graft.operators.EventAnalytics
import graft.streaming.FunnelStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming funnel: time-ordered micro-batches advance the per-user
  * frontier store, the stream equals the batch funnel over each prefix
  * across a mid-run restart, and a replayed epoch rewrites itself.
  */
class FunnelStreamSpec extends SparkTestBase {

  private val steps = Seq("signup", "view", "purchase")

  private def funnelRows(df: DataFrame) =
    df.orderBy(col("epoch"), col("step")).collect()
      .map(r => (r.getLong(3), r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("stream with mid-run restart == batch funnel per prefix; replayed epoch is idempotent") {
    // event_id stands in for the time column (same long semantics, no
    // nanos-timestamp decode needed in the test session); batches are
    // split in t order, the stream's time-ordered-arrival contract
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val rows = ev.select(col("user_id").cast("long"), col("event_type"),
        col("event_id").as("t_us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._3)
    val (b0, rest) = rows.splitAt(rows.length / 3)
    val (b1, b2) = rest.splitAt(rest.length / 2)
    val batches = Seq(b0, b1, b2)

    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def toDF(b: Array[(Long, String, Long)]) =
      spark.createDataset(b.toIndexedSeq).toDF("user_id", "event_type", "t_us")

    // reference: batch funnel over each prefix
    val want = batches.indices.map { e =>
      val prefix = toDF(batches.take(e + 1).reduce(_ ++ _))
      EventAnalytics.funnel(prefix, steps, col("t_us"))
        .withColumn("epoch", lit(e.toLong))
    }.reduce(_.unionByName(_))

    val store = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-funnel-ckpt").toString
    val source = MemoryStream[(Long, String, Long)]
    def stream = source.toDF().toDF("user_id", "event_type", "t_us")

    // two triggers, stop, then restart for the third (state survives);
    // ProcessingTime(0) keeps the query live across addData calls
    // (AvailableNow snapshots the source at start and self-terminates)
    val q1 = FunnelStream.start(stream, store, ckpt, steps,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      source.addData(b0.toIndexedSeq); q1.processAllAvailable()
      source.addData(b1.toIndexedSeq); q1.processAllAvailable()
    } finally q1.stop()

    val q2 = FunnelStream.start(stream, store, ckpt, steps,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      source.addData(b2.toIndexedSeq); q2.processAllAvailable()
    } finally q2.stop()

    val got = FunnelStream.readFunnel(spark, store)
      .getOrElse(fail("no committed funnel output"))
    assert(funnelRows(got) == funnelRows(want),
      "streamed funnel must equal the batch funnel over every prefix")

    // replay of the last epoch: uncommit-and-rewrite, nothing double-counted
    FunnelStream.admitEpoch(store, toDF(b2), batchId = 2L, steps)
    assert(funnelRows(FunnelStream.readFunnel(spark, store).get) == funnelRows(want),
      "replayed epoch must rewrite itself, not double-advance users")

    // compaction (keepLatest = 1): state resolves to the same frontier,
    // funnel history identical before and after
    val before = FunnelStream.readState(spark, store)
      .orderBy("u").collect().toSeq
    FunnelStream.compactStore(spark, store, targetFiles = 2, keepLatest = 1)
    assert(FunnelStream.readState(spark, store).orderBy("u").collect().toSeq == before,
      "compaction must preserve the resolved frontier")
    assert(funnelRows(FunnelStream.readFunnel(spark, store).get) == funnelRows(want),
      "compaction must preserve the funnel history")
  }
}
