package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Driver-side cache of an index tree's IMMUTABLE-per-state metadata
  * (coarse centroids, PQ codebooks, list/posting schemas, per-tree stat
  * sums) keyed by a filesystem signature of the index directory.
  *
  * Why: every serving probe was re-running the same tiny driver jobs —
  * centroid collect, schema footer reads, meta-stat aggregates — and at
  * ~0.1–0.3 s of scheduling each they dominated probe latency (measured
  * 17 Spark jobs per cache-miss `graft_ann` probe; the index metadata
  * accounted for roughly half). An index reader caches segment metadata;
  * this is that cache, with invalidation derived from the index's own
  * epoch-commit discipline:
  *
  * The SIGNATURE walks the directory tree recording (name, mtime, length)
  * of every entry, recursing everywhere EXCEPT inside the write-once data
  * directories (lists/postings/docs/buckets — recorded at one level, so
  * their `_SUCCESS` commit markers and cid=/bucket= membership are still
  * covered, but the thousands of immutable part files are not walked).
  * Every mutation the stores can perform — append epoch, tombstone
  * delete, compaction, uncommit-then-rewrite, full rebuild at the same
  * path — changes that surface, because trees are write-once and all
  * commit protocols move `_SUCCESS` markers or add/remove directories.
  * Pure driver-side FS listing: no Spark job, sub-ms on local/HDFS
  * metadata, one LIST per directory on object stores (bounded by the
  * epoch count, the same order as the probe's own pruning listings).
  */
object IndexMetaCache {

  /** Data directories: record their direct children, do not descend. */
  private val DataDirs =
    Set("lists", "postings", "docs", "buckets", "clean", "grams", "out")

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, String), (String, Any)]

  /** FS-state signature of the index at `path` (see object doc). */
  def signature(spark: SparkSession, path: String): String = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sb = new StringBuilder
    def walk(p: Path, descend: Boolean): Unit = {
      val sts =
        try fs.listStatus(p)
        catch { case _: java.io.FileNotFoundException => return }
      for (st <- sts.sortBy(_.getPath.getName)) {
        sb.append(st.getPath.getName).append('|')
          .append(st.getModificationTime).append('|')
          .append(st.getLen).append('\n')
        if (st.isDirectory && descend)
          walk(st.getPath, !DataDirs.contains(st.getPath.getName))
      }
    }
    walk(root, descend = true)
    // fixed-width digest so keys stay small
    java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** `f`'s result for (`path`, `kind`), recomputed only when the index's
    * FS signature changed since the cached value was stored. Thread-safe;
    * concurrent misses may compute twice (last write wins — `f` must be
    * pure, which index-metadata reads are).
    */
  def getOrCompute[T](spark: SparkSession, path: String, kind: String)(f: => T): T = {
    val sig = signature(spark, path)
    val key = (path, kind)
    cache.get(key) match {
      case Some((s, v)) if s == sig => v.asInstanceOf[T]
      case _ =>
        val v = f
        cache.put(key, (sig, v))
        v
    }
  }

  /** Test seam: drop everything (e.g. to measure cold-path behavior). */
  private[graft] def invalidateAll(): Unit = cache.clear()
}
