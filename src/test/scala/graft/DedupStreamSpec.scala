package graft

import graft.streaming.{DedupStream, DocEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming incremental dedup: the first-seen filter must agree with the
  * batch fingerprint keeper when the corpus arrives in doc_id order, drop
  * cross-batch duplicates via state, and emit nothing twice.
  *
  * The raw corpus has no exact-normalized duplicates (every planted near-dup
  * differs by real edits), so the fixtures plant them the way the
  * `dedup_stream_replay` workload does: a cased copy of every doc under a
  * shifted id, which normalization maps back onto the original fingerprint.
  */
class DedupStreamSpec extends SparkTestBase {

  private lazy val corpus = {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    d.unionByName(d.select((col("doc_id") + 100000L).as("doc_id"), upper(col("text")).as("text")))
  }

  private def batchKeepers: Map[Long, String] =
    DedupStream.firstSeenDocs(corpus).select("doc_id", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("batch replay = min doc_id per fingerprint group; planted cased dups all drop") {
    val got = batchKeepers
    val expected = DedupStream.withFingerprint(corpus).toDF()
      .groupBy("fp").agg(min("doc_id").as("doc_id"))
      .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    assert(got == expected)
    // every cased copy collides with its original: only originals survive
    assert(got.size.toLong == corpus.count() / 2)
    assert(got.keys.forall(_ < 100000L), "keepers are exactly the original ids")
  }

  test("streamed in 3 micro-batches == batch replay; duplicates dropped across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // doc_id-ordered arrival: every original strictly precedes its cased
    // copy, and the 3-way split puts each copy in a LATER micro-batch than
    // its original — so the drops exercise cross-batch state, not
    // within-batch minBy
    val events = DedupStream.withFingerprint(corpus).collect().sortBy(_.doc_id)
    val stream = MemoryStream[DocEvent]
    val q = DedupStream.firstSeen(stream.toDS()).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      events.grouped(math.max(1, events.length / 3 + 1)).foreach { chunk =>
        stream.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("dedup_out").as[DocEvent].collect()
    assert(streamed.map(_.doc_id).distinct.length == streamed.length, "nothing emitted twice")
    val got = streamed.map(e => e.doc_id -> e.fp).toMap
    assert(got == batchKeepers, "stream (doc_id-ordered arrival) must equal the batch keeper set")
  }

  test("built-in dropDuplicatesWithinWatermark matches first-seen inside its horizon") {
    // Spark's own streaming dedup exists and we use the custom operator
    // DELIBERATELY: the built-in evicts state at the watermark (dedup
    // horizon = the delay), while corpus admission must be first-seen over
    // the stream's whole life. Inside the horizon the two must agree —
    // this pins that the custom operator isn't reinventing different
    // semantics, just a longer memory.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = DedupStream.withFingerprint(corpus).collect().sortBy(_.doc_id)
    val stream = MemoryStream[DocEvent]
    val deduped = stream.toDS()
      // synthetic event time: arrival order as a timestamp (+1 s so doc 0
      // sits strictly above the initial watermark of epoch 0 — a row AT
      // the watermark is dropped as late), every duplicate well inside
      // the horizon
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros((col("doc_id") + 1L) * 1000000L))
      .withWatermark("ts", "10 days")
      .dropDuplicatesWithinWatermark("fp")
    val q = deduped.writeStream.format("memory").queryName("ddww_out")
      .outputMode("append").start()
    try {
      events.grouped(math.max(1, events.length / 3 + 1)).foreach { chunk =>
        stream.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("ddww_out")
      .select("doc_id", "fp").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // same keeper SET per fingerprint (the built-in keeps the first ARRIVAL;
    // arrival here is doc_id order, so keepers coincide with first-seen)
    assert(got == batchKeepers,
      s"built-in watermarked dedup diverges from first-seen inside the horizon: " +
        s"extra=${(got.keySet -- batchKeepers.keySet).toSeq.sorted.take(5)} " +
        s"missing=${(batchKeepers.keySet -- got.keySet).toSeq.sorted.take(5)} " +
        s"(got ${got.size} vs batch ${batchKeepers.size})")
  }
}
