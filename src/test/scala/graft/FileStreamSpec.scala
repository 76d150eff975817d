package graft

import graft.streaming.{PriceEvent, RenkoWS}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{Encoders, Row}

import java.nio.file.Files

/** Production-shaped streaming: parquet file source → renko
  * flatMapGroupsWithState → parquet sink with a checkpoint, including a
  * query RESTART — state must survive in the state store so the resumed
  * query continues the same brick sequence with no duplicates and no gaps.
  */
class FileStreamSpec extends SparkTestBase {

  test("file source -> renko -> parquet sink, state survives query restart") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-stream").toFile
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    val outDir = new java.io.File(root, "out").getAbsolutePath

    val evRaw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val events = evRaw
      .select(lit("ev").as("symbol"),
        SparkTestBase.tsEpochUs(evRaw).as("timestamp"),
        col("value").as("price"))
      .as[PriceEvent]
      .collect().sortBy(_.timestamp)

    def writeChunk(name: String, chunk: Seq[PriceEvent]): Unit =
      spark.createDataset(chunk).coalesce(1).write.parquet(s"$srcDir/$name")

    // phase 1: first half arrives, query drains it and stops
    val (h1, h2) = events.splitAt(events.length / 2)
    writeChunk("c1", h1.toIndexedSeq)

    def runOnce(): Unit = {
      val src = spark.readStream
        .schema(Encoders.product[PriceEvent].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/*")
        .as[PriceEvent]
      val q = RenkoWS.bricks(src, 25.0).writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val afterPhase1 = spark.read.parquet(outDir).count()
    assert(afterPhase1 > 0)

    // phase 2: second half arrives, a NEW query resumes from the checkpoint
    writeChunk("c2", h2.toIndexedSeq)
    runOnce()

    // the union of both phases must equal a single batch replay
    val got = spark.read.parquet(outDir)
      .orderBy(col("timestamp"), col("close"))
      .drop("symbol").collect()
    val want = RenkoWS.replay(spark.createDataset(events.toIndexedSeq), 25.0)
      .toDF().orderBy(col("timestamp"), col("close"))
      .drop("symbol").collect()
    assert(got.length == want.length,
      s"restart produced ${got.length} bricks, batch replay ${want.length}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"row $i differs after restart:\n got $g\nwant $w")
    }
    assert(afterPhase1 < got.length, "phase 2 must have appended new bricks")
  }

  test("RocksDB state store: restartable renko stream, same bricks") {
    // the production state backend at scale (state larger than executor
    // heap): same pipeline, same checkpoint-restart contract, RocksDB
    // provider instead of the default in-memory HDFS-backed store
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("graft-rocks").toFile
      val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
      val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
      val outDir = new java.io.File(root, "out").getAbsolutePath
      val evRaw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      val events = evRaw
        .select(lit("ev").as("symbol"),
          SparkTestBase.tsEpochUs(evRaw).as("timestamp"),
          col("value").as("price"))
        .as[PriceEvent].collect().sortBy(_.timestamp)
      val (h1, h2) = events.splitAt(events.length / 2)
      spark.createDataset(h1.toIndexedSeq).coalesce(1).write.parquet(s"$srcDir/c1")
      def runOnce(): Unit = {
        val src = spark.readStream
          .schema(Encoders.product[PriceEvent].schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$srcDir/*")
          .as[PriceEvent]
        val q = RenkoWS.bricks(src, 25.0).writeStream
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      runOnce()
      spark.createDataset(h2.toIndexedSeq).coalesce(1).write.parquet(s"$srcDir/c2")
      runOnce()
      val got = spark.read.parquet(outDir)
        .orderBy(col("timestamp"), col("close")).drop("symbol").collect()
      val want = RenkoWS.replay(spark.createDataset(events.toIndexedSeq), 25.0)
        .toDF().orderBy(col("timestamp"), col("close")).drop("symbol").collect()
      assert(got.length == want.length && got.nonEmpty)
      got.zip(want).foreach { case (g, w) => assert(g == w) }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
