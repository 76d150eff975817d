package graft.util

import org.apache.spark.sql.SparkSession

/** Probe-time relation construction over partitioned index trees.
  *
  * A serving probe builds one parquet relation per live tree, and each
  * tree's bucket/list layout has hundreds of partition directories — above
  * `spark.sql.sources.parallelPartitionDiscovery.threshold` (default 32),
  * so EVERY per-tree relation pays a distributed file-listing job whose
  * ~0.3 s scheduling overhead dwarfs the listing itself (probe-sized
  * metadata: hundreds of directories, one `listStatus` RPC each). Ten
  * epochs then cost ~3 s of pure job scheduling before a byte of postings
  * is read — measured 12x over a compacted probe.
  *
  * [[withDriverListing]] keeps the listing on the driver, where it is
  * sub-millisecond on local/HDFS metadata and one-RPC-per-directory on
  * object stores — the right trade until a single tree's partition count
  * reaches the tens of thousands, far past what auto-compaction allows to
  * accrete.
  *
  * CONCURRENCY: the threshold is raised ONCE per session, the first time
  * any probe plans, and never restored — a sticky serving-session mode.
  * The earlier design set/restored the conf around every relation
  * construction, which forced a per-session monitor (two concurrent
  * probes could interleave a restore into the other's window); a serving
  * engine's actual workload is N concurrent TVF queries, and every
  * cache-miss probe planned under that global lock. With the sticky set
  * there is no mutation to interleave, so probes plan lock-free. The
  * trade: other reads in a session that has served a probe also list on
  * the driver; for that to matter a NON-index table would need tens of
  * thousands of partition directories in the same session that serves
  * probes — accepted and documented over re-introducing a planning lock.
  */
object ProbePlanning {

  private val Key = "spark.sql.sources.parallelPartitionDiscovery.threshold"

  /** Make `spark` a serving session: partition discovery stays on the
    * driver from here on. Idempotent and race-safe — concurrent callers
    * write the same constant, so no ordering matters.
    */
  def ensureDriverListing(spark: SparkSession): Unit =
    if (!spark.conf.getOption(Key).contains(Int.MaxValue.toString))
      spark.conf.set(Key, Int.MaxValue.toString)

  /** Plan a probe relation with driver-side listing. Lock-free: flips the
    * session into sticky driver-listing mode (see object doc) and runs
    * `f` directly — safe under arbitrary probe concurrency.
    */
  def withDriverListing[A](spark: SparkSession)(f: => A): A = {
    ensureDriverListing(spark)
    f
  }
}
