package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The SupportsAdmissionControl contract of graft-replay: the stream must
  * honor the ENGINE-SUPPLIED ReadLimit (maxRows tighter or looser than the
  * configured pace, all-available, composite), and the provider must read
  * its options case-insensitively like every other DSv2 source.
  */
class ReplayAdmissionSpec extends SparkTestBase {

  private lazy val recording: String = {
    val dir = Files.createTempDirectory("graft-replay-adm").toFile
    val out = new java.io.File(dir, "rec").getAbsolutePath
    spark.range(1000).select(
      lit("s").as("symbol"), col("id").as("t"), col("id").cast("double").as("price"))
      .coalesce(1).write.parquet(out)
    new java.io.File(out).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .get.getAbsolutePath
  }

  private def advance(stream: ReplayStream, from: Long, limit: ReadLimit): Long =
    stream.latestOffset(ReplayOffset(from), limit).asInstanceOf[ReplayOffset].row

  test("latestOffset derives the admitted count from the supplied ReadLimit") {
    val s = new ReplayStream(recording, rowsPerBatch = 100L)
    // engine-supplied maxRows overrides the configured pace, both ways
    assert(advance(s, 0L, ReadLimit.maxRows(10L)) == 10L)
    assert(advance(s, 0L, ReadLimit.maxRows(400L)) == 400L)
    // all-available admits the whole bounded recording
    assert(advance(s, 250L, ReadLimit.allAvailable()) == 1000L)
    // composite: the most restrictive row cap wins; minRows doesn't bound
    assert(advance(s, 0L,
      ReadLimit.compositeLimit(Array(ReadLimit.maxRows(7L), ReadLimit.minRows(3L, 0L)))) == 7L)
    // a min-only limit falls back to the configured pace
    assert(advance(s, 0L, ReadLimit.minRows(3L, 0L)) == 100L)
    // never past EOF
    assert(advance(s, 990L, ReadLimit.maxRows(100L)) == 1000L)
  }

  test("provider options are case-insensitive") {
    // lowercase option spelling must set the pace (not silently default):
    // at rowsperbatch=250 a 1000-row recording takes exactly 4 micro-batches
    val q = spark.readStream
      .format("graft.sources.TickReplaySource")
      .option("path", recording).option("rowsperbatch", "250")
      .load()
      .writeStream.format("memory").queryName("replay_ci")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    assert(spark.table("replay_ci").count() == 1000L)
    val sizes = q.recentProgress.filter(_.numInputRows > 0).map(_.numInputRows).toList
    assert(sizes == List(250L, 250L, 250L, 250L),
      s"lowercase rowsperbatch ignored: batch sizes $sizes")
  }
}
