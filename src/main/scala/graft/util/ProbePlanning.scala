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
  * [[withDriverListing]] raises the threshold around relation construction
  * (and restores it), keeping the listing on the driver where it is
  * sub-millisecond on local/HDFS metadata and one-RPC-per-directory on
  * object stores — the right trade until a single tree's partition count
  * reaches the tens of thousands, far past what auto-compaction allows to
  * accrete.
  */
object ProbePlanning {

  private val Key = "spark.sql.sources.parallelPartitionDiscovery.threshold"

  // The set/restore below mutates SHARED session conf: two concurrent
  // probes (e.g. graft_ann and graft_bm25 planned from parallel queries)
  // could interleave a restore into the other's construction window, or
  // leak Int.MaxValue as the "old" value. Serialize per session; monitor
  // reentrancy makes nested calls on one thread safe (the inner call sees
  // and restores the outer's Int.MaxValue, the outer restores the real
  // original). Weak keys so discarded test sessions don't accumulate.
  private val guards =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, AnyRef]())

  private def guardFor(spark: SparkSession): AnyRef =
    guards.synchronized {
      var g = guards.get(spark)
      if (g == null) { g = new AnyRef; guards.put(spark, g) }
      g
    }

  def withDriverListing[A](spark: SparkSession)(f: => A): A =
    guardFor(spark).synchronized {
      val old = spark.conf.getOption(Key)
      spark.conf.set(Key, Int.MaxValue.toString)
      try f
      finally old match {
        case Some(v) => spark.conf.set(Key, v)
        case None    => spark.conf.unset(Key)
      }
    }
}
