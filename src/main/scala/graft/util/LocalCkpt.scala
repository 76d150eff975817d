package graft.util

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit release of `localCheckpoint` storage.
  *
  * `Dataset.unpersist()` only consults the CacheManager, which never
  * tracks checkpoint blocks — a localCheckpoint pins its rows as
  * RDD-level storage that survives any number of `unpersist()` calls and
  * is freed only when the driver GC collects the plan and the
  * ContextCleaner notices (the "slow storage leak" of long-running
  * epoch streams, ADVICE r12). [[release]] walks the analyzed plan and
  * unpersists the checkpointed RDDs directly — the deterministic free
  * the epoch paths need after their side writes land.
  */
object LocalCkpt {

  /** Free the checkpoint blocks behind `df` (and, for a derived frame,
    * behind its checkpointed ancestors). Safe on any frame — plans
    * without a LogicalRDD are a no-op. Asynchronous (non-blocking).
    */
  def release(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
