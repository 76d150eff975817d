package graft

import graft.operators.AsofJoin
import graft.streaming.{AsofEvent, AsofStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming as-of enrichment ≡ the batch as-of join under the repo's
  * in-order delivery contract, with state carried across micro-batches.
  */
class AsofStreamSpec extends SparkTestBase {

  import spark.implicits._

  private def eventFrames() = {
    // clicks (left) and views (right) from the real events table
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val e = ev.select(col("event_id"),
      SparkTestBase.tsEpochUs(ev).as("ts_us"),
      col("user_id"), col("event_type"), col("value"))
    val left = e.filter(col("event_type") === "click")
      .select(col("user_id").as("key"), col("ts_us").as("ts"), col("event_id").as("id"))
    val right = e.filter(col("event_type") === "view")
      .select(col("user_id").as("key"), col("ts_us").as("ts"),
        col("event_id").as("id"), col("value"))
    (left, right)
  }

  test("batch run of the streaming code == AsofJoin.asofBackward") {
    val (left, right) = eventFrames()
    val streamed = AsofStream.enrich(AsofStream.tagged(left, right))
      .collect().map(m => m.leftId -> ((m.asofRightId, m.asofVal))).toMap
    val batch = AsofJoin.asofBackward(
        left.withColumnRenamed("id", "event_id"),
        right.withColumnRenamed("id", "event_id"),
        "key", "ts", "ts", Seq("event_id", "value"), "event_id")
      .collect().map { r =>
        val rid = Option(r.getAs[java.lang.Long]("asof_event_id")).map(_.toLong)
        val rv = Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble)
        r.getAs[Long]("event_id") -> ((rid, rv))
      }.toMap
    assert(streamed.size == batch.size && streamed.keySet == batch.keySet)
    streamed.foreach { case (id, m) =>
      assert(batch(id) == m, s"left row $id: stream $m vs batch ${batch(id)}")
    }
    assert(streamed.values.exists(_._1.isDefined), "some clicks must match")
    assert(streamed.values.exists(_._1.isEmpty), "some clicks must have no prior view")
  }

  test("streamed in 4 time-ordered micro-batches == batch; state crosses batches") {
    implicit val sqlCtx = spark.sqlContext
    val (left, right) = eventFrames()
    val all = AsofStream.tagged(left, right).collect().sortBy(e => (e.ts, e.side, e.tb))
    val expected = AsofStream.enrich(AsofStream.tagged(left, right))
      .collect().map(m => m.leftId -> ((m.asofRightId, m.asofVal))).toMap

    val stream = MemoryStream[AsofEvent]
    val q = AsofStream.enrich(stream.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      all.grouped(all.length / 4 + 1).foreach { ch =>
        stream.addData(ch.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("asof_out").as[graft.streaming.AsofMatch]
      .collect().map(m => m.leftId -> ((m.asofRightId, m.asofVal))).toMap
    assert(streamed.size == expected.size)
    streamed.foreach { case (id, m) =>
      assert(expected(id) == m, s"left row $id: 4-batch stream $m vs one-shot ${expected(id)}")
    }
    // a match must exist whose right row arrived in an EARLIER micro-batch
    // than the left row (state genuinely crossed a batch boundary)
    val batchOf = all.zipWithIndex.map { case (e, i) => (e.side, e.side match {
      case 1 => e.leftId; case _ => e.rightId
    }) -> (i / (all.length / 4 + 1)) }.toMap
    val crossed = streamed.exists { case (lid, (Some(rid), _)) =>
      batchOf((0, rid)) < batchOf((1, lid))
    case _ => false }
    assert(crossed, "no enrichment crossed a micro-batch boundary")
  }
}
