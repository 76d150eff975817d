package graft.streaming

import graft.operators.Clustering
import graft.util.EpochStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING embedding statistics: each micro-batch folds its exact
  * second-moment sums into an [[EpochStore]], and the store answers the
  * full-corpus covariance — and top-k PCA over it — at ANY point with no
  * corpus re-scan. The monitoring primitive an embedding pipeline wires
  * to its ingest feed: distribution shift shows up in the covariance
  * diagonal / top component the trigger after the batch lands.
  *
  * Why this is EXACT (not an approximation like most streaming moments):
  * the batch covariance is derived from integer micro-quantized sums
  * ([[Clustering.momentSums]] — upper-triangle product sums, element
  * sums, count), and integer addition is associative — summing per-epoch
  * moment rows elementwise equals the one-shot corpus aggregate
  * bit-for-bit, so the streamed answer IS the batch answer on every
  * prefix. State per epoch is ONE tiny row (d(d+1)/2 + d longs), so the
  * store read is driver-trivial at any epoch count.
  *
  * Commit protocol is the shared [[EpochStore]] one: deterministic
  * batch-keyed epochs uncommit-then-rewrite on replay (at-least-once
  * delivery never double-counts a batch into the moments).
  */
object EmbStats {

  private def store(storeDir: String): EpochStore =
    EpochStore(storeDir, Seq("moments"))

  /** The per-epoch decision shared by [[start]] and the batch replay. */
  def admitEpoch(
      storeDir: String,
      batch: DataFrame,
      batchId: Long,
      vecCol: String = "embedding"): Unit = {
    val spark = batch.sparkSession
    val st = store(storeDir)
    val epoch = f"batch-$batchId%08d"
    // a replayed epoch a compaction already folded away cannot re-decide:
    // its sums live inside the compact epoch, so the rewrite would
    // double-count the batch. Fail loudly — compact with keepLatest >= 1
    // while the stream is live.
    require(!st.mergedEpochs(spark).contains(epoch),
      s"epoch $epoch was already merged by a store compaction; replaying it would " +
        "double-count its batch into the moments — compact with keepLatest >= 1 " +
        "(never fold the newest epoch) to keep replays safe")
    st.uncommitEpoch(spark, epoch)
    Clustering.momentSums(batch, vecCol)
      .write.mode("overwrite").parquet(st.sideDir("moments", epoch))
  }

  /** Start the fold: `stream` must carry `vecCol` (array<float|double>).
    * `maxLiveEpochs` is the auto-compaction dial (see the other stores);
    * 0 disables it.
    */
  def start(
      stream: DataFrame,
      storeDir: String,
      checkpointDir: String,
      vecCol: String = "embedding",
      trigger: Trigger = Trigger.AvailableNow(),
      maxLiveEpochs: Int = 16): StreamingQuery =
    stream.writeStream
      .queryName("graft-emb-stats")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          admitEpoch(storeDir, batch, batchId, vecCol)
          val spark = batch.sparkSession
          if (maxLiveEpochs > 0 &&
              store(storeDir).committedEpochs(spark).size > maxLiveEpochs)
            compactStore(spark, storeDir, keepLatest = 1)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The summed committed moments as one (pp, sx, n, d) row: per-epoch
    * rows are tiny (one each), so the fold is a driver-side exact integer
    * sum — associativity makes it equal the one-shot corpus aggregate.
    */
  private def readMoments(spark: SparkSession, storeDir: String): DataFrame = {
    // an epoch whose batch had only null vectors aggregates to a null
    // moment row (n = 0, nothing to sum) — it contributes nothing and is
    // skipped, like the null vectors themselves were
    val rows = store(storeDir).readSide(spark, "moments")
      .getOrElse(throw new IllegalStateException(
        s"no committed moment epochs at $storeDir"))
      .collect()
      .filterNot(r => r.isNullAt(r.fieldIndex("pp")) || r.getAs[Long]("n") == 0L)
    require(rows.nonEmpty,
      s"no committed non-empty moment epochs at $storeDir")
    val d = rows.map(_.getAs[Int]("d")).max
    val ppLen = rows.map(_.getSeq[Long](rows.head.fieldIndex("pp")).length).max
    val pp = new Array[Long](ppLen)
    val sx = new Array[Long](d)
    var n = 0L
    rows.foreach { r =>
      val rp = r.getSeq[Long](r.fieldIndex("pp"))
      val rs = r.getSeq[Long](r.fieldIndex("sx"))
      require(rp.length == ppLen && rs.length == d,
        s"moment epochs disagree on dimension: ${rs.length} vs $d")
      var i = 0
      while (i < ppLen) { pp(i) += rp(i); i += 1 }
      i = 0
      while (i < d) { sx(i) += rs(i); i += 1 }
      n += r.getAs[Long]("n")
    }
    import spark.implicits._
    Seq((pp.toSeq, sx.toSeq, n, d)).toDF("pp", "sx", "n", "d")
  }

  /** The full-corpus covariance over everything ingested — bit-identical
    * to `Clustering.covariance` of the union, on every prefix.
    */
  def covariance(spark: SparkSession, storeDir: String): DataFrame =
    Clustering.covarianceFromSums(readMoments(spark, storeDir))

  /** Top-k PCA over the streamed covariance — bit-identical to
    * `Clustering.pcaTopK` of the union.
    */
  def pcaTopK(
      spark: SparkSession,
      storeDir: String,
      nComponents: Int = 2,
      iters: Int = 8): DataFrame =
    Clustering.pcaTopKOf(spark,
      Clustering.matrixOf(covariance(spark, storeDir)), nComponents, iters)

  /** Consolidate committed epochs into one compact epoch: moment rows SUM
    * into one row (additivity — the answer is unchanged by construction).
    * `keepLatest >= 1` is required while the stream is live.
    */
  def compactStore(
      spark: SparkSession,
      storeDir: String,
      keepLatest: Int = 0): Unit =
    store(storeDir).compact(spark, targetFiles = 1, sweep = true,
      keepLatest = keepLatest) { (_, union) =>
      // the merged side is the elementwise long sum of a handful of tiny
      // rows — driver arithmetic, exact by associativity. Null moment rows
      // (all-null-vector epochs) contribute nothing and drop out here.
      val rows = union.collect()
        .filterNot(r => r.isNullAt(r.fieldIndex("pp")) || r.getAs[Long]("n") == 0L)
      import spark.implicits._
      if (rows.isEmpty)
        // only null/empty epochs merged: the compact epoch is an explicit
        // zero row, skipped by reads exactly like its inputs were
        Seq((Seq.empty[Long], Seq.empty[Long], 0L, 0)).toDF("pp", "sx", "n", "d")
      else {
        val d = rows.map(_.getAs[Int]("d")).max
        val ppLen = rows.map(_.getSeq[Long](rows.head.fieldIndex("pp")).length).max
        val pp = new Array[Long](ppLen)
        val sx = new Array[Long](d)
        var n = 0L
        rows.foreach { r =>
          val rp = r.getSeq[Long](r.fieldIndex("pp"))
          val rs = r.getSeq[Long](r.fieldIndex("sx"))
          var i = 0
          while (i < ppLen) { pp(i) += rp(i); i += 1 }
          i = 0
          while (i < d) { sx(i) += rs(i); i += 1 }
          n += r.getAs[Long]("n")
        }
        Seq((pp.toSeq, sx.toSeq, n, d)).toDF("pp", "sx", "n", "d")
      }
    }
}
