package graft

import graft.operators.Dedup
import graft.streaming.BlockAdmission
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming block-level dedup: cross-batch blocks drop against the
  * epoch-committed hash store, the stream equals the batch fold of the
  * same incremental function across a mid-run restart, and a replayed
  * epoch rewrites itself instead of double-emitting.
  */
class BlockAdmissionSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def outRows(df: DataFrame) =
    df.select(col("doc_id"), col("clean_text"), col("n_blocks"), col("n_removed"))
      .orderBy(col("doc_id")).collect().toSeq

  test("stream with mid-run restart == batch fold; replayed epoch is idempotent") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))

    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = docs.as[(Long, String)].collect().sortBy(_._1)
    val (firstHalf, secondHalf) = all.splitAt(all.length / 2)

    // fold reference over the same two batches
    var seen: Option[DataFrame] = None
    val foldOut = Seq(firstHalf, secondHalf).map { half =>
      val batch = spark.createDataset(half.toIndexedSeq).toDF("doc_id", "text")
      val (out, fresh) = Dedup.blockDedupIncremental(seen, batch, blockWords = 8)
      val pinned = fresh.localCheckpoint(true)
      seen = Some(seen.map(_.unionByName(pinned)).getOrElse(pinned))
      out.localCheckpoint(true)
    }.reduce(_.unionByName(_))

    val store = java.nio.file.Files.createTempDirectory("graft-blockadm").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-blockadm-ckpt").toString
    val source = MemoryStream[(Long, String)]
    def stream = source.toDF().toDF("doc_id", "text")

    source.addData(firstHalf.toIndexedSeq)
    val q1 = BlockAdmission.start(stream, store, ckpt)
    q1.processAllAvailable(); q1.stop()

    source.addData(secondHalf.toIndexedSeq)
    val q2 = BlockAdmission.start(stream, store, ckpt)
    q2.processAllAvailable(); q2.stop()

    val clean = BlockAdmission.readClean(spark, store)
      .getOrElse(fail("no committed output"))
    assert(outRows(clean) == outRows(foldOut),
      "stream across a restart must equal the batch fold")
    // cross-batch evidence: at least one second-half doc lost a block to a
    // first-half occurrence (the sf corpus has real cross-doc duplicates)
    val crossDropped = clean.filter(col("doc_id") >= secondHalf.head._1 && col("n_removed") > 0).count()
    assert(crossDropped > 0, "expected cross-batch block drops on this corpus")

    // replay of epoch 1: uncommit-and-rewrite, nothing double-emitted
    BlockAdmission.admitEpoch(store,
      spark.createDataset(secondHalf.toIndexedSeq).toDF("doc_id", "text"), batchId = 1L)
    val replayed = BlockAdmission.readClean(spark, store).get
    assert(outRows(replayed) == outRows(foldOut),
      "replayed epoch must rewrite itself, not duplicate output")
    assert(replayed.count() == all.length, "one output row per ingested doc")

    // store compaction: crash-mid-sweep state first (manifest committed,
    // old dirs on disk but dead), then the sweeping run reclaims them —
    // readers identical throughout
    BlockAdmission.compactStore(spark, store, 2, sweep = false)
    assert(outRows(BlockAdmission.readClean(spark, store).get) == outRows(foldOut),
      "pre-sweep readers must already serve only the compact epoch")
    BlockAdmission.compactStore(spark, store, 2)
    val dirs = new java.io.File(s"$store/blocks").listFiles().map(_.getName).toSeq
    assert(dirs.size == 1 && dirs.head.startsWith("batch=compact-"),
      s"sweep must leave only the compact epoch, got $dirs")
    assert(outRows(BlockAdmission.readClean(spark, store).get) == outRows(foldOut),
      "post-compaction readers unchanged")
  }

  test("auto-compaction dial: store stays file-bounded, readers unchanged") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .orderBy("doc_id").limit(40)

    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = docs.as[(Long, String)].collect().sortBy(_._1)
    val batches = all.grouped(10).toSeq // 5 micro-batches

    def drive(store: String, ckpt: String, maxLive: Int): Unit = {
      val source = MemoryStream[(Long, String)]
      batches.foreach { b =>
        source.addData(b.toIndexedSeq)
        val q = BlockAdmission.start(source.toDF().toDF("doc_id", "text"),
          store, ckpt, maxLiveEpochs = maxLive)
        q.processAllAvailable(); q.stop()
      }
    }

    val (storeOff, ckptOff) = (
      java.nio.file.Files.createTempDirectory("graft-bacomp-off").toString,
      java.nio.file.Files.createTempDirectory("graft-bacomp-offck").toString)
    val (storeOn, ckptOn) = (
      java.nio.file.Files.createTempDirectory("graft-bacomp-on").toString,
      java.nio.file.Files.createTempDirectory("graft-bacomp-onck").toString)
    drive(storeOff, ckptOff, maxLive = 0)
    drive(storeOn, ckptOn, maxLive = 2)

    val epochDirs = new java.io.File(s"$storeOn/blocks").listFiles().map(_.getName).toSeq
    assert(epochDirs.exists(_.startsWith("batch=compact-")),
      s"expected an auto-created compact epoch, got $epochDirs")
    assert(epochDirs.size <= 3,
      s"auto-compaction must bound live epochs (maxLive=2 + the protected newest), got $epochDirs")
    assert(new java.io.File(s"$storeOff/blocks").listFiles().length == batches.size,
      "the undialed store accretes one epoch per trigger")
    assert(outRows(BlockAdmission.readClean(spark, storeOn).get) ==
      outRows(BlockAdmission.readClean(spark, storeOff).get),
      "auto-compaction must be read-transparent")
  }
}
