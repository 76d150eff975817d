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
  * Pure driver-side FS listing: no Spark job, sub-ms on local/HDFS
  * metadata, one LIST per directory on object stores (bounded by the
  * epoch count, the same order as the probe's own pruning listings).
  *
  * INVALIDATION CONTRACT (required of every store served through this
  * cache): '''each commit must change the signature's entry SET''' —
  * add/remove a file or directory by NAME, the way the epoch protocols'
  * `_SUCCESS`/`_MERGED` markers and uniquely-named epoch dirs already do.
  * An in-place rewrite that preserves every name and length within one
  * mtime tick (ms on local FS; coarse or synthesized-zero on some object
  * stores) is INVISIBLE to a (name, mtime, length) walk. Writers that
  * cannot guarantee entry-set-changing commits must call [[stamp]] at
  * their commit point: it rotates a uniquely-named marker under
  * `<path>/_state/`, changing the entry set regardless of FS clock
  * resolution. The graft index writers (IvfIndex / TextIndex mutations)
  * all stamp. IndexMetaCacheSpec pins the frozen-clock edge both ways.
  *
  * MEMORY: entries are grouped per index path; a signature change
  * replaces the whole per-path group, dropping every value computed under
  * the old state (appends/compactions no longer accrete dead keys —
  * ADVICE r13). Distinct paths are LRU-bounded at [[MaxPaths]], so a
  * long-running serving driver that cycles through many rebuilt/deleted
  * index locations holds at most a fixed number of codebook/centroid
  * arrays.
  */
object IndexMetaCache {

  /** Data directories: record their direct children, do not descend. */
  private val DataDirs =
    Set("lists", "postings", "docs", "buckets", "clean", "grams", "out")

  /** Most distinct index paths held at once (LRU beyond this). */
  private[graft] val MaxPaths = 64

  /** All kinds computed for one path under one FS signature. A signature
    * change discards the instance wholesale. Values are held as
    * single-evaluation memos (r17): 32 concurrent cold probes of one store
    * — the serving_mixed_churn / quiet-twin workload — previously ALL
    * missed and ALL ran the compute (up to 32 duplicate collect jobs per
    * kind flooding the scheduler); now the first caller computes under the
    * memo's monitor and the rest block on the same value. A compute that
    * throws is not cached (Scala lazy-val retry semantics), matching the
    * old behavior.
    */
  private final class Memo(f: () => Any) { lazy val value: Any = f() }
  private final class PathEntry(val sig: String) {
    val kinds = scala.collection.concurrent.TrieMap.empty[String, Memo]
    @volatile var lastUsed: Long = 0L
  }

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, PathEntry]
  private val ticks = new java.util.concurrent.atomic.AtomicLong(0L)

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

  /** Fixed-width digest of a string sequence — for cache KINDS whose
    * identity includes a variable-length part (a pruned directory set, a
    * tree subset) so key size stays bounded.
    */
  private[graft] def digestOf(parts: Seq[String]): String =
    java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(parts.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** Writer-side commit stamp: rotate a uniquely-named marker file under
    * `<path>/_state/`, guaranteeing the commit changes [[signature]]'s
    * entry set even when every data write reused names, lengths AND mtime
    * ticks (see the invalidation contract in the object doc). The fresh
    * marker lands before the old ones are removed, so a crash mid-rotate
    * leaves extra markers — still a changed entry set, never a stale one.
    * Two FS metadata ops per mutation; mutations are epoch-rare.
    */
  def stamp(spark: SparkSession, path: String): Unit = {
    val root = new Path(s"$path/_state")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val old =
      try fs.listStatus(root).toSeq
      catch { case _: java.io.FileNotFoundException => Seq.empty }
    fs.create(new Path(root, s"uuid-${java.util.UUID.randomUUID}"), true).close()
    old.foreach { st =>
      if (st.getPath.getName.startsWith("uuid-")) fs.delete(st.getPath, false)
    }
  }

  /** `f`'s result for (`path`, `kind`), recomputed only when the index's
    * FS signature changed since the cached value was stored — and when it
    * has, EVERY kind cached for `path` under the old signature is dropped
    * in the same step. Thread-safe; concurrent misses on the same (path,
    * kind) share ONE in-flight computation (`f` must be pure, which
    * index-metadata reads are).
    */
  def getOrCompute[T](spark: SparkSession, path: String, kind: String)(f: => T): T = {
    val sig = signature(spark, path)
    val entry = cache.get(path) match {
      case Some(pe) if pe.sig == sig => pe
      case _ =>
        // putIfAbsent, not put: of N concurrent first-callers only one may
        // install the group, or each would install its own and N-1 memos
        // would be computed then discarded
        val fresh = new PathEntry(sig)
        cache.putIfAbsent(path, fresh) match {
          case Some(existing) if existing.sig == sig => existing
          case Some(stale) =>
            // stale group under the old signature: replace it (old kinds
            // all die here); a concurrent replace is last-writer-wins and
            // both writers hold the NEW signature
            cache.put(path, fresh)
            fresh
          case None => fresh
        }
    }
    entry.lastUsed = ticks.incrementAndGet()
    val memo = entry.kinds.getOrElseUpdate(kind, new Memo(() => f))
    val v = memo.value
    if (cache.size > MaxPaths) evictLru()
    v.asInstanceOf[T]
  }

  /** Drop least-recently-used paths until within [[MaxPaths]]. Races with
    * concurrent touches are harmless: worst case a just-used path is
    * evicted and recomputed on its next probe.
    */
  private def evictLru(): Unit =
    while (cache.size > MaxPaths) {
      val lru = cache.toSeq.minByOption(_._2.lastUsed)
      lru match {
        case Some((p, _)) => cache.remove(p)
        case None => return
      }
    }

  /** Test seam: drop everything (e.g. to measure cold-path behavior). */
  private[graft] def invalidateAll(): Unit = cache.clear()

  /** Test seam: distinct paths currently cached. */
  private[graft] def cachedPaths(): Set[String] = cache.keySet.toSet

  /** Test seam: kinds currently cached for `path`. */
  private[graft] def cachedKinds(path: String): Set[String] =
    cache.get(path).map(_.kinds.keySet.toSet).getOrElse(Set.empty)
}
