package graft

import graft.streaming.IngestPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import java.nio.file.Files

/** End-to-end streaming ingest: file source → first-seen dedup → quality
  * annotation → PARTITIONED parquet store with a checkpoint, including a
  * mid-stream restart. The final store must equal the batch pipeline over
  * the same corpus — exactly one annotated row per distinct fingerprint,
  * duplicates dropped across chunk and restart boundaries alike.
  */
class IngestStreamSpec extends SparkTestBase {

  test("file stream -> dedup -> annotate -> partitioned store, restart-safe") {
    val root = Files.createTempDirectory("graft-ingest").toFile
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    val outDir = new java.io.File(root, "out").getAbsolutePath

    // corpus + planted exact duplicates (uppercased copies under shifted
    // ids — the normalization maps them onto their originals' fingerprint)
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = base.select((col("doc_id") + 100000L).as("doc_id"),
      upper(col("text")).as("text"))
    val all = base.unionByName(planted).orderBy("doc_id").collect()

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def writeChunk(name: String, rows: Array[org.apache.spark.sql.Row]): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
        .coalesce(1).write.parquet(s"$srcDir/$name")

    val third = all.length / 3
    writeChunk("c1", all.slice(0, third))

    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*")
      val q = IngestPipeline.cleanAnnotated(src)
        .withColumn("bucket", pmod(col("doc_id"), lit(4L)))
        .writeStream
        .partitionBy("bucket")
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    runOnce() // phase 1: first third admitted
    writeChunk("c2", all.slice(third, 2 * third))
    writeChunk("c3", all.slice(2 * third, all.length))
    runOnce() // phase 2: restart from the checkpoint, drain the rest

    val stored = spark.read.parquet(outDir)
    val batch = IngestPipeline.cleanAnnotated(
      spark.createDataFrame(spark.sparkContext.parallelize(all.toIndexedSeq, 4), schema))

    // the store holds exactly the batch keeper set, annotated identically
    val key = Seq("doc_id", "fp", "n_tokens", "quality_score")
    val got = stored.select(key.head, key.tail: _*).collect().map(_.toString).sorted
    val want = batch.select(key.head, key.tail: _*).collect().map(_.toString).sorted
    assert(got.length == want.length,
      s"store ${got.length} rows vs batch ${want.length}")
    assert(got.sameElements(want), "stored annotations diverge from the batch pipeline")
    // every admitted doc is an original (min-id first-seen), none duplicated
    val ids = stored.select("doc_id").collect().map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
    assert(ids.forall(_ < 100000L), "a planted duplicate leaked past the dedup")
    // and the store really is partitioned (bucket directories exist)
    val parts = new java.io.File(outDir).listFiles().filter(_.getName.startsWith("bucket="))
    assert(parts.length == 4, s"expected 4 bucket partitions, got ${parts.length}")
  }
}
