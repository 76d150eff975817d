package graft

import graft.util.IndexMetaCache
import org.apache.spark.sql.functions._

/** Pins [[graft.util.IndexMetaCache]]'s invalidation contract: the FS
  * signature must change under every mutation the index stores can
  * perform (new epoch dir, commit-marker move inside a data dir, rebuild
  * that only rewrites file contents), and must be stable when nothing
  * changed — a stale `true` here would mean probes serve old centroids
  * or stats after an append/delete.
  */
class IndexMetaCacheSpec extends SparkTestBase {

  private def tmp(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft-metacache").toFile
    d
  }

  test("signature stable when untouched; cache hit returns without recompute") {
    val d = tmp()
    new java.io.File(d, "meta").mkdirs()
    java.nio.file.Files.writeString(new java.io.File(d, "meta/part-0").toPath, "x")
    val s1 = IndexMetaCache.signature(spark, d.toString)
    val s2 = IndexMetaCache.signature(spark, d.toString)
    assert(s1 == s2)
    var computes = 0
    def get(): Int = IndexMetaCache.getOrCompute(spark, d.toString, "t") { computes += 1; 42 }
    assert(get() == 42 && get() == 42 && computes == 1,
      "second call must be a cache hit")
  }

  test("signature changes on: new epoch dir, _SUCCESS move in a data dir, content rewrite") {
    val d = tmp()
    new java.io.File(d, "lists").mkdirs()
    java.nio.file.Files.writeString(new java.io.File(d, "lists/_SUCCESS").toPath, "")
    java.nio.file.Files.writeString(new java.io.File(d, "lists/part-0").toPath, "data")
    val s0 = IndexMetaCache.signature(spark, d.toString)

    // append: a new epoch directory appears
    new java.io.File(d, "epochs/e1/lists").mkdirs()
    val s1 = IndexMetaCache.signature(spark, d.toString)
    assert(s1 != s0, "a new epoch dir must change the signature")

    // uncommit: the _SUCCESS marker inside a (non-descended) data dir moves
    new java.io.File(d, "lists/_SUCCESS").delete()
    val s2 = IndexMetaCache.signature(spark, d.toString)
    assert(s2 != s1, "removing a data-dir commit marker must change the signature")

    // rebuild: same file name, different length (mtime may tie on fast FS)
    java.nio.file.Files.writeString(new java.io.File(d, "lists/part-0").toPath, "rebuilt!")
    val s3 = IndexMetaCache.signature(spark, d.toString)
    assert(s3 != s2, "rewriting a data file (length change) must change the signature")
  }

  test("getOrCompute recomputes after a mutation") {
    val d = tmp()
    new java.io.File(d, "centroids").mkdirs()
    java.nio.file.Files.writeString(new java.io.File(d, "centroids/part-0").toPath, "a")
    var src = "v1"
    def get(): String = IndexMetaCache.getOrCompute(spark, d.toString, "v") { src }
    assert(get() == "v1")
    src = "v2"
    assert(get() == "v1", "unchanged index must serve the cached value")
    java.nio.file.Files.writeString(new java.io.File(d, "centroids/part-1").toPath, "b")
    assert(get() == "v2", "a mutated index must recompute")
  }

  test("frozen-clock edge: same-name/same-length/same-mtime rewrite is invisible; stamp() is not") {
    val d = tmp()
    new java.io.File(d, "centroids").mkdirs()
    val f = new java.io.File(d, "centroids/part-0")
    java.nio.file.Files.writeString(f.toPath, "aaaa")
    val frozen = java.nio.file.attribute.FileTime.fromMillis(1700000000000L)
    java.nio.file.Files.setLastModifiedTime(f.toPath, frozen)
    val s0 = IndexMetaCache.signature(spark, d.toString)
    // the in-place rewrite a (name, mtime, length) walk CANNOT see: same
    // name, same byte count, and the mtime pinned back to the same tick —
    // this pins the documented limitation that makes stamp() mandatory
    java.nio.file.Files.writeString(f.toPath, "bbbb")
    java.nio.file.Files.setLastModifiedTime(f.toPath, frozen)
    assert(IndexMetaCache.signature(spark, d.toString) == s0,
      "the granularity edge itself: an entry-set-preserving rewrite is invisible by design")
    // ... which is why every writer stamps: the rotated marker changes the
    // entry SET, so the signature moves with no clock cooperation at all
    IndexMetaCache.stamp(spark, d.toString)
    val s1 = IndexMetaCache.signature(spark, d.toString)
    assert(s1 != s0, "stamp() must invalidate even under a frozen clock")
    IndexMetaCache.stamp(spark, d.toString)
    assert(IndexMetaCache.signature(spark, d.toString) != s1,
      "each stamp rotates a fresh marker name")
  }

  test("a signature change drops EVERY kind cached for the path") {
    val d = tmp()
    new java.io.File(d, "meta").mkdirs()
    java.nio.file.Files.writeString(new java.io.File(d, "meta/part-0").toPath, "x")
    IndexMetaCache.getOrCompute(spark, d.toString, "a") { 1 }
    IndexMetaCache.getOrCompute(spark, d.toString, "b") { 2 }
    assert(IndexMetaCache.cachedKinds(d.toString) == Set("a", "b"))
    java.nio.file.Files.writeString(new java.io.File(d, "meta/part-1").toPath, "y")
    // one access under the new state replaces the whole per-path group:
    // kind "b"'s stale value dies with it (appends/compactions no longer
    // accrete dead keys — ADVICE r13)
    IndexMetaCache.getOrCompute(spark, d.toString, "a") { 10 }
    assert(IndexMetaCache.cachedKinds(d.toString) == Set("a"),
      "stale sibling kinds must be evicted with the old signature")
  }

  test("distinct paths are LRU-bounded at MaxPaths") {
    IndexMetaCache.invalidateAll()
    val dirs = (0 to IndexMetaCache.MaxPaths).map { i =>
      val d = tmp()
      java.nio.file.Files.writeString(new java.io.File(d, s"m$i").toPath, "x")
      d.toString
    }
    dirs.foreach(p => IndexMetaCache.getOrCompute(spark, p, "k") { p })
    assert(IndexMetaCache.cachedPaths().size <= IndexMetaCache.MaxPaths,
      "cache must stay bounded as rebuilt/deleted index paths accumulate")
    assert(!IndexMetaCache.cachedPaths().contains(dirs.head),
      "the least-recently-used path is the one evicted")
    assert(IndexMetaCache.cachedPaths().contains(dirs.last))
  }

  test("end-to-end: probe reflects an append and a delete made after a cached probe") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft-metacache-ivf").toString
    operators.IvfIndex.write(emb.filter(col("vec_id") < 400), path)
    val q = emb.filter(col("vec_id") < 3)
    val r1 = operators.IvfIndex.probe(spark, path, q, 5)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    // warm every cache entry, then mutate
    val r1b = operators.IvfIndex.probe(spark, path, q, 5)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(r1 == r1b)
    operators.IvfIndex.append(emb.filter(col("vec_id") >= 400), path)
    val r2 = operators.IvfIndex.probe(spark, path, q, 5)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(r1 != r2, "an appended epoch must be served (stale cache would hide it)")
    val full = java.nio.file.Files.createTempDirectory("graft-metacache-full").toString
    operators.IvfIndex.write(emb, full)
    val rFull = operators.IvfIndex.probe(spark, full, q, 5)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(r2 == rFull, "appended index must equal the full rebuild bit-for-bit")
  }
}
