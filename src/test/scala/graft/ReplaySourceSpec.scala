package graft

import graft.streaming.{PriceEvent, RenkoWS}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The graft-replay DSv2 source: row-paced micro-batches over a recorded
  * tick file, with restart-safe row offsets — and a renko pipeline on top
  * of the replay must equal the batch build over the same recording.
  */
class ReplaySourceSpec extends SparkTestBase {

  private def recordTicks(): (String, Long) = {
    val dir = Files.createTempDirectory("graft-replay").toFile
    val out = new java.io.File(dir, "rec").getAbsolutePath
    val evRaw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    evRaw
      .select(lit("ev").as("symbol"),
        SparkTestBase.tsEpochUs(evRaw).as("t"),
        col("value").as("price"))
      .orderBy("t").coalesce(1)
      .write.parquet(out)
    val part = new java.io.File(out).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val n = spark.read.parquet(out).count()
    (part.getAbsolutePath, n)
  }

  test("row-paced replay reproduces the recording across several micro-batches") {
    val (file, n) = recordTicks()
    val q = spark.readStream
      .format("graft.sources.TickReplaySource")
      .option("path", file).option("rowsPerBatch", "200")
      .load()
      .writeStream.format("memory").queryName("replay_raw")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("replay_raw")
    assert(got.count() == n, s"replayed ${got.count()} of $n rows")
    // content identical to the recording (as a multiset)
    val want = spark.read.parquet(new java.io.File(file).getParent)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // genuinely paced: multiple non-empty micro-batches
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 3, s"expected row-level pacing, saw $batches batches")

    // the registered short name reads the recording as a batch frame
    val asBatch = spark.read.format("graft-replay")
      .option("path", file).load()
    assert(asBatch.count() == n)
    assert(asBatch.exceptAll(want).isEmpty)
  }

  test("restart from the checkpoint appends nothing new; renko on replay == batch renko") {
    val (file, _) = recordTicks()
    val ckpt = Files.createTempDirectory("graft-replay-ckpt").toFile.getAbsolutePath
    val sinkDir = Files.createTempDirectory("graft-replay-sink").toFile.getAbsolutePath

    def runOnce(): Unit = {
      val src = spark.readStream
        .format("graft.sources.TickReplaySource")
        .option("path", file).option("rowsPerBatch", "100")
        .load()
        .select(col("symbol"), col("t").as("timestamp"), col("price"))
        .as[PriceEvent](org.apache.spark.sql.Encoders.product[PriceEvent])
      val q = RenkoWS.bricks(src, 25.0).writeStream
        .format("parquet").option("path", sinkDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try { q.processAllAvailable() } finally q.stop()
    }

    runOnce()
    val afterFirst = spark.read.parquet(sinkDir).count()
    runOnce() // restart: offsets resume at EOF, nothing re-emitted
    val afterSecond = spark.read.parquet(sinkDir).count()
    assert(afterFirst == afterSecond,
      s"restart duplicated bricks: $afterFirst -> $afterSecond")

    // the streamed bricks equal the SAME operator run as one batch over
    // the recording (flatMapGroupsWithState on a batch Dataset = empty
    // initial state — the replay contract renko_ws_replay pins; ws-vs-
    // fromTicks equivalence incl. the initial-brick contract lives in
    // StreamingSpec)
    val evs = spark.read.parquet(new java.io.File(file).getParent)
      .select(col("symbol"), col("t").as("timestamp"), col("price"))
      .as[PriceEvent](org.apache.spark.sql.Encoders.product[PriceEvent])
    val batch = RenkoWS.bricks(evs, 25.0)
      .toDF().select("timestamp", "open", "close", "direction")
      .collect().map(_.toString).sorted
    val streamed = spark.read.parquet(sinkDir)
      .select("timestamp", "open", "close", "direction")
      .collect().map(_.toString).sorted
    assert(streamed.length == batch.length,
      s"stream ${streamed.length} bricks vs batch ${batch.length}")
    assert(streamed.sameElements(batch), "streamed bricks diverge from the batch replay")
  }

  /** A 3-file recording: the events ticks split into name-ordered parquet
    * files inside one directory. Returns (dir, per-file row counts).
    */
  private def recordThreeFiles(): (String, Seq[Long]) = {
    val dir = Files.createTempDirectory("graft-replay-multi").toFile
    val evRaw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val ticks = evRaw
      .select(lit("ev").as("symbol"),
        SparkTestBase.tsEpochUs(evRaw).as("t"),
        col("value").as("price"))
      .orderBy("t").collect()
    val chunks = ticks.grouped(ticks.length / 3 + 1).toSeq
    val counts = chunks.zipWithIndex.map { case (chunk, i) =>
      val tmp = new java.io.File(dir, s"tmp$i").getAbsolutePath
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("symbol", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("price", org.apache.spark.sql.types.DoubleType)))
      spark.createDataFrame(spark.sparkContext.parallelize(chunk.toIndexedSeq, 1), schema)
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      // name order IS replay order: 000.parquet, 001.parquet, 002.parquet
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(dir, f"00$i.parquet").toPath)
      chunk.length.toLong
    }
    (dir.getAbsolutePath, counts)
  }

  test("3-file recording: replay == concatenation in name order, restart mid-file") {
    import org.apache.spark.sql.streaming.Trigger
    val (dir, counts) = recordThreeFiles()
    val total = counts.sum
    val ckpt = Files.createTempDirectory("graft-replay-multi-ckpt").toFile.getAbsolutePath
    val sinkDir = Files.createTempDirectory("graft-replay-multi-sink").toFile.getAbsolutePath
    // one batch of 250 rows ends MID-FILE-0 (files are ~670 rows each)
    val rpb = 250L
    assert(rpb < counts.head, "restart point must land inside the first file")

    def mkQuery(trigger: Option[Trigger]) = {
      val w = spark.readStream
        .format("graft.sources.TickReplaySource")
        .option("path", dir).option("rowsPerBatch", rpb.toString)
        .load()
        .writeStream.format("parquet").option("path", sinkDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
      trigger.fold(w)(w.trigger).start()
    }
    // phase 1: paced micro-batches (Trigger.Once/AvailableNow would hand the
    // source ReadAllAvailable, which it honors — the whole recording in one
    // batch); stop after the first committed batch, leaving the checkpoint
    // offset at a 250-multiple — strictly inside a file (file boundaries
    // are ~len/3 multiples, never 250-aligned here)
    val q1 = mkQuery(None)
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (q1.recentProgress.count(_.numInputRows > 0) < 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
    } finally q1.stop()
    val afterOne = spark.read.parquet(sinkDir).count()
    assert(afterOne >= rpb && afterOne < total && afterOne % rpb == 0,
      s"phase 1 should stop on a mid-recording batch boundary, committed $afterOne of $total")
    val boundaries = counts.scanLeft(0L)(_ + _).toSet
    assert(!boundaries.contains(afterOne),
      s"restart point $afterOne landed exactly on a file boundary $boundaries")
    mkQuery(Some(Trigger.AvailableNow())).awaitTermination() // restart mid-file
    val got = spark.read.parquet(sinkDir)
    assert(got.count() == total, s"replayed ${got.count()} of $total rows")
    // content equality with the whole recording (multiset)
    val want = spark.read.format("graft-replay").option("path", dir).load()
    assert(want.count() == total)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "restart across the file-offset map duplicated or dropped rows")
    // comma-separated explicit file list resolves identically
    val listed = spark.read.format("graft-replay")
      .option("path", (0 until 3).map(i => s"$dir/00$i.parquet").mkString(","))
      .load()
    assert(listed.count() == total)
    assert(listed.exceptAll(want).isEmpty)
  }
}
