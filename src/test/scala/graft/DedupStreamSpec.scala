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
}
