package graft.streaming

import graft.operators.IvfIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest for the persisted IVF index: embedding micro-batches
  * accrete as committed epochs under the frozen coarse quantizer — the
  * vector-side twin of the curation/admission front doors, turning the
  * write-once index into a continuously-growing serving index with no
  * rebuild and no serving outage.
  *
  * Exactly-once contract: `IvfIndex.append` alone is at-least-once under
  * foreachBatch replay (a retried batch would write a second uuid-named
  * epoch and double-serve its vectors), so the stream keys each epoch
  * DETERMINISTICALLY by micro-batch id. A replayed batch then overwrites
  * its own epoch — the overwrite drops the `_SUCCESS` marker first, so
  * probes never see a partial epoch — and the net effect is exactly-once.
  * The first batch bootstraps the index via [[IvfIndex.write]] (idempotent
  * under replay for the same reason: same deterministic content, full
  * overwrite).
  *
  * Id uniqueness across batches stays the CALLER's contract (same as
  * [[IvfIndex.append]] — front the stream with the admission store or an
  * upstream watermark); this layer only makes REPLAYS safe, not upstream
  * re-offers of the same id under a new batch.
  */
object IvfIngest {

  /** One ingest decision in pure batch form: bootstrap on an absent index,
    * else append under the deterministic epoch for `batchId`. A fold over
    * ordered batches replays the stream exactly (the
    * `sim_topk_ivf_streamed` oracle query).
    */
  def ingestBatch(
      batch: DataFrame,
      indexPath: String,
      batchId: Long,
      nlist: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      filesPerList: Int = 1): Unit = {
    val spark = batch.sparkSession
    if (!indexExists(spark, indexPath))
      IvfIndex.write(batch, indexPath, nlist, idCol, vecCol, filesPerList)
    else
      IvfIndex.append(batch, indexPath, idCol, vecCol, filesPerList,
        epochId = Some(f"batch-$batchId%08d"))
  }

  /** Start the ingest stream: `stream` must carry (`idCol`, `vecCol`).
    * The index under `indexPath` grows one committed epoch per non-empty
    * micro-batch; probe it any time with [[IvfIndex.probe]].
    */
  def start(
      stream: DataFrame,
      indexPath: String,
      checkpointDir: String,
      nlist: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      filesPerList: Int = 1,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .queryName("graft-ivf-ingest")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          ingestBatch(batch, indexPath, batchId, nlist, idCol, vecCol, filesPerList)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  private def indexExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/centroids")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
