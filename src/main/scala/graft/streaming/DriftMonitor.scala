package graft.streaming

import graft.operators.CorpusDiff
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING corpus drift monitor: every micro-batch is scored against the
  * token distribution of EVERYTHING ingested before it — per-source
  * smoothed unigram KL ([[CorpusDiff.driftReport]]'s exact pico-quantized
  * arithmetic), emitted as one report row per (epoch, source). The alarm a
  * corpus team wires to a feed: a syndication change or scraper breakage
  * shows up as a KL spike the moment the batch lands, not at the next
  * nightly diff.
  *
  * State = an epoch-committed store of per-(source, token) COUNT deltas —
  * counts are additive, so history is one summed union of tiny epoch
  * frames, never a re-scan of old documents. Commit protocol mirrors
  * [[BlockAdmission]]: counts land first, the epoch's report last (its
  * `_SUCCESS` is the commit marker); deterministic batch-keyed epochs
  * uncommit-then-rewrite on replay, so at-least-once delivery never
  * double-counts a batch into the reference distribution.
  */
object DriftMonitor {

  /** The per-epoch decision shared by [[start]] and the batch replay. */
  def admitEpoch(
      storeDir: String,
      batch: DataFrame,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epoch = f"batch-$batchId%08d"
    // a replayed epoch a compaction already folded away cannot re-decide:
    // its count deltas live inside the compact epoch, so the rewrite would
    // score against a reference that double-counts its own batch. Fail
    // loudly — compact with keepLatest >= 1 while the stream is live.
    require(!mergedEpochs(spark, storeDir).contains(epoch),
      s"epoch $epoch was already merged by a store compaction; replaying it would " +
        "double-count its batch into the reference — compact with keepLatest >= 1 " +
        "(never fold the newest epoch) to keep replays safe")
    fs.delete(new Path(s"$storeDir/reports/batch=$epoch"), true)
    fs.delete(new Path(s"$storeDir/counts/batch=$epoch"), true)
    val batchCounts = CorpusDiff.tokenCounts(batch, "new").localCheckpoint(true)
    val oldCounts = readCounts(spark, storeDir).getOrElse(
      batchCounts.select(col("source"), col("tok"), col("c_new").as("c_old")).limit(0))
    val report = CorpusDiff.driftFromCounts(oldCounts, batchCounts)
      .withColumn("epoch", lit(batchId))
    batchCounts.select(col("source"), col("tok"), col("c_new").as("cnt"))
      .write.mode("overwrite").parquet(s"$storeDir/counts/batch=$epoch")
    report.write.mode("overwrite").parquet(s"$storeDir/reports/batch=$epoch")
  }

  /** Start the monitor: `stream` must carry (source, text). */
  def start(
      stream: DataFrame,
      storeDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .queryName("graft-drift-monitor")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) admitEpoch(storeDir, batch, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Every committed epoch's drift report. */
  def readReports(spark: SparkSession, storeDir: String): Option[DataFrame] = {
    val epochs = committedEpochs(spark, storeDir)
    if (epochs.isEmpty) None
    else Some(spark.read.parquet(epochs.map(e => s"$storeDir/reports/batch=$e"): _*))
  }

  /** The reference distribution: summed committed count deltas. */
  private def readCounts(spark: SparkSession, storeDir: String): Option[DataFrame] = {
    val epochs = committedEpochs(spark, storeDir)
    if (epochs.isEmpty) None
    else Some(
      spark.read.parquet(epochs.map(e => s"$storeDir/counts/batch=$e"): _*)
        .groupBy(col("source"), col("tok")).agg(sum(col("cnt")).as("c_old")))
  }

  /** Consolidate the committed epochs into one `compact-*` epoch: the
    * count deltas SUM into one merged delta (additivity again — the
    * reference distribution is unchanged by construction), reports union,
    * and the atomic `_MERGED` manifest retires the replaced epochs. Run
    * between triggers — maintenance does not race itself.
    */
  def compactStore(
      spark: SparkSession,
      storeDir: String,
      targetFiles: Int = 8,
      keepLatest: Int = 0): Unit =
    compactStore(spark, storeDir, targetFiles, sweep = true, keepLatest)

  private[graft] def compactStore(
      spark: SparkSession,
      storeDir: String,
      targetFiles: Int,
      sweep: Boolean): Unit =
    compactStore(spark, storeDir, targetFiles, sweep, keepLatest = 0)

  /** `keepLatest > 0` excludes the newest N ordinary epochs from the merge
    * — required (>= 1) while the stream is live, so a replay of an
    * un-checkpointed batch rewrites only its own epoch ([[admitEpoch]]
    * refuses to replay a merged one).
    */
  private[graft] def compactStore(
      spark: SparkSession,
      storeDir: String,
      targetFiles: Int,
      sweep: Boolean,
      keepLatest: Int): Unit = {
    val committed = committedEpochs(spark, storeDir)
    val protectSet = committed.filterNot(_.startsWith("compact-"))
      .sorted.takeRight(keepLatest).toSet
    val olds = committed.filterNot(protectSet)
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (olds.size > 1) {
      val cpt = s"compact-${java.util.UUID.randomUUID.toString.take(8)}"
      spark.read.parquet(olds.map(e => s"$storeDir/counts/batch=$e"): _*)
        .groupBy(col("source"), col("tok")).agg(sum(col("cnt")).as("cnt"))
        .coalesce(targetFiles)
        .write.mode("overwrite").parquet(s"$storeDir/counts/batch=$cpt")
      spark.read.parquet(olds.map(e => s"$storeDir/reports/batch=$e"): _*)
        .coalesce(targetFiles)
        .write.mode("overwrite").parquet(s"$storeDir/reports/batch=$cpt")
      val tmp = new Path(s"$storeDir/counts/batch=$cpt/_MERGED.tmp")
      val out = fs.create(tmp, true)
      try out.write(olds.mkString("\n").getBytes("UTF-8")) finally out.close()
      fs.rename(tmp, new Path(s"$storeDir/counts/batch=$cpt/_MERGED"))
    }
    if (sweep) sweepMerged(spark, storeDir)
  }

  private def sweepMerged(spark: SparkSession, storeDir: String): Unit = {
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    mergedEpochs(spark, storeDir).foreach { e =>
      fs.delete(new Path(s"$storeDir/counts/batch=$e"), true)
      fs.delete(new Path(s"$storeDir/reports/batch=$e"), true)
    }
    val root = new Path(s"$storeDir/counts")
    if (fs.exists(root)) fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("batch=compact-") &&
        !fs.exists(new Path(s"$storeDir/counts/$n/_MERGED")))
      .foreach { n =>
        fs.delete(new Path(s"$storeDir/counts/$n"), true)
        fs.delete(new Path(s"$storeDir/reports/$n"), true)
      }
  }

  /** Epoch ids a committed `_MERGED` manifest replaced. */
  private def mergedEpochs(spark: SparkSession, storeDir: String): Set[String] = {
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    rawEpochs(spark, storeDir).flatMap { e =>
      val m = new Path(s"$storeDir/counts/batch=$e/_MERGED")
      if (!fs.exists(m)) Seq.empty
      else {
        val in = fs.open(m)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }
    }.toSet
  }

  private def rawEpochs(spark: SparkSession, storeDir: String): Seq[String] = {
    val root = new Path(s"$storeDir/counts")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch="))
      .sorted
  }

  /** Committed, un-retired epochs: ordinary epochs need both sides'
    * `_SUCCESS` (the report is the commit side); compact epochs need
    * their `_MERGED` manifest; anything a committed manifest names is
    * dead.
    */
  private def committedEpochs(spark: SparkSession, storeDir: String): Seq[String] = {
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dead = mergedEpochs(spark, storeDir)
    rawEpochs(spark, storeDir)
      .filter { e =>
        if (e.startsWith("compact-"))
          fs.exists(new Path(s"$storeDir/counts/batch=$e/_MERGED"))
        else Seq("counts", "reports")
          .forall(s => fs.exists(new Path(s"$storeDir/$s/batch=$e/_SUCCESS")))
      }
      .filterNot(dead)
  }
}
