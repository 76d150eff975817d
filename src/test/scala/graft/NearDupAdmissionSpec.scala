package graft

import java.nio.file.Files

import graft.operators.Dedup
import graft.streaming.NearDupAdmission
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming near-duplicate admission: the per-micro-batch decision must
  * equal an independent driver-side application of the policy over the
  * global verified pair set, the prebucketed probe must equal the derived
  * one, the stream must equal the batch fold, and a stopped-and-resumed
  * pipeline re-offered the same documents must not re-admit or
  * double-write.
  */
class NearDupAdmissionSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text")).cache()

  private val Threshold = 0.8

  private def epoch(e: Int): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(3L)) === lit(e.toLong))

  private def epochRows(e: Int): IndexedSeq[(Long, String)] =
    epoch(e).collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq

  /** The batch fold over doc_id%3 epochs (= the dedup_admission_replay
    * query): admitted doc_id -> epoch.
    */
  private lazy val foldAdmitted: Map[Long, Int] = {
    var store: Option[DataFrame] = None
    (0 until 3).flatMap { e =>
      val adm = NearDupAdmission.admitBatch(store, epoch(e), Threshold)
        .localCheckpoint(false)
      store = Some(store.map(_.unionByName(adm)).getOrElse(adm))
      adm.select("doc_id").collect().map(_.getLong(0) -> e)
    }.toMap
  }

  test("admission fold = driver-side policy over the global verified pair set") {
    // independent recomputation: global LSH-verified pairs once (bucket
    // keys are per-doc, so subset probes see exactly these pairs), then a
    // sequential driver loop applying the documented policy
    val pairs = Dedup.minhashLshPairs(docs, Threshold)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val expected = scala.collection.mutable.Map.empty[Long, Int]
    val admittedSoFar = scala.collection.mutable.Set.empty[Long]
    for (e <- 0 until 3) {
      val batch = ids.filter(_ % 3 == e)
      val batchSet = batch.toSet
      val decided = batch.filter { id =>
        val nb = nbrs.getOrElse(id, Set.empty[Long])
        !nb.exists(a => (batchSet.contains(a) && a < id) || admittedSoFar.contains(a))
      }
      decided.foreach { id => expected(id) = e }
      admittedSoFar ++= decided
    }
    assert(foldAdmitted.nonEmpty && foldAdmitted.size < ids.length,
      "corpus should contain planted near-dups so some docs are rejected")
    assert(foldAdmitted == expected.toMap,
      s"policy divergence: only-fold=${foldAdmitted.toSet.diff(expected.toSet).take(5)} " +
        s"only-expected=${expected.toSet.diff(foldAdmitted.toSet).take(5)}")
  }

  test("fused admission verify == per-gate internal ∪ incremental rejects") {
    // the r14 fusion replaced two verification passes with one; this pins
    // that the admitted set is bit-identical to the composed per-gate form
    // at every epoch of a 3-epoch fold (empty store, small store, grown)
    var store: Option[(DataFrame, DataFrame)] = None
    for (e <- 0 until 3) {
      val batch = epoch(e)
      val batchBuckets = Dedup.minhashBucketsFor(batch).localCheckpoint(true)
      val internal = Dedup
        .minhashLshPairsPrebucketed(batch, batchBuckets, Threshold)
        .select(col("id_b").as("doc_id"))
      val oldRejects = (store match {
        case Some((st, sb)) => internal.unionByName(
          Dedup.minhashIncrementalPairsBothPrebucketed(
            st, sb, batch, batchBuckets, Threshold).select(col("doc_id")))
        case None => internal
      }).distinct().collect().map(_.getLong(0)).toSet
      val fusedRejects = Dedup.minhashAdmissionPairsPrebucketed(
          store, batch, batchBuckets, Threshold)
        .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
      assert(fusedRejects == oldRejects,
        s"epoch $e: fused rejects diverge (${fusedRejects.diff(oldRejects)} extra, " +
          s"${oldRejects.diff(fusedRejects)} missing)")
      val (adm, ab) = NearDupAdmission.admitBatchWithBuckets(store, batch, Threshold)
      val admQ = adm.localCheckpoint(true)
      val abAdm = NearDupAdmission.bucketsOfAdmitted(ab, admQ).localCheckpoint(true)
      store = Some(store match {
        case Some((sd, sb)) => (sd.unionByName(admQ), sb.unionByName(abAdm))
        case None => (admQ, abAdm)
      })
    }
  }

  test("prebucketed store probe == derived-bucket probe") {
    val store = epoch(0)
    val derived = NearDupAdmission.admitBatch(Some(store), epoch(1), Threshold)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pre = NearDupAdmission.admitBatchPrebucketed(
      store, Dedup.minhashBucketsFor(store), epoch(1), Threshold)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(derived.nonEmpty && derived == pre)
  }

  test("streamed 3 epochs == batch fold; store carries docs + bucket snapshot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val storeDir = Files.createTempDirectory("neardup_store").toString
    val ckpt = Files.createTempDirectory("neardup_ckpt").toString
    val stream = MemoryStream[(Long, String)]
    val src = stream.toDF().toDF("doc_id", "text")
    val q = NearDupAdmission.start(src, storeDir, ckpt, Threshold,
      trigger = Trigger.ProcessingTime(0L))
    try {
      // one epoch per micro-batch: drain each addData before the next
      for (e <- 0 until 3) {
        stream.addData(epochRows(e))
        q.processAllAvailable()
      }
    } finally q.stop()
    val (gotDocs, gotBuckets) = NearDupAdmission.readStore(spark, storeDir).get
    val got = gotDocs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == foldAdmitted.keySet, "stream admissions must equal the batch fold")
    // the persisted bucket snapshot is exactly the admitted docs' buckets
    val wantBuckets = Dedup.minhashBucketsFor(
      docs.join(gotDocs.select("doc_id"), Seq("doc_id"), "left_semi"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val haveBuckets = gotBuckets.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(haveBuckets == wantBuckets)
  }

  test("resume: re-offered documents reject against the store, none admitted twice") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val storeDir = Files.createTempDirectory("neardup_store_r").toString
    val stream = MemoryStream[(Long, String)]
    val src = stream.toDF().toDF("doc_id", "text")
    val q = NearDupAdmission.start(src, storeDir,
      Files.createTempDirectory("neardup_ckpt_r").toString, Threshold,
      trigger = Trigger.ProcessingTime(0L))
    try {
      stream.addData(epochRows(0)); q.processAllAvailable()
    } finally q.stop()
    val afterFirst = NearDupAdmission.readStore(spark, storeDir).get._1
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // new pipeline instance over the SAME store (fresh source + checkpoint,
    // the upstream re-offers epoch 0 in full — at-least-once delivery):
    // every re-offered doc is a >= 0.8 self-dup of its admitted copy, so
    // the replayed batch must admit NOTHING, then epoch 1 proceeds normally
    val stream2 = MemoryStream[(Long, String)]
    val src2 = stream2.toDF().toDF("doc_id", "text")
    val q2 = NearDupAdmission.start(src2, storeDir,
      Files.createTempDirectory("neardup_ckpt_r2").toString, Threshold,
      trigger = Trigger.ProcessingTime(0L))
    try {
      stream2.addData(epochRows(0)); q2.processAllAvailable()
      stream2.addData(epochRows(1)); q2.processAllAvailable()
    } finally q2.stop()
    val finalIds = NearDupAdmission.readStore(spark, storeDir).get._1
      .select("doc_id").collect().map(_.getLong(0))
    assert(finalIds.length == finalIds.distinct.length,
      "no doc admitted twice across the resume")
    assert(finalIds.toSet == foldAdmitted.filter(_._2 <= 1).keySet,
      "store after resume = fold over epochs 0..1")
    assert(afterFirst.subsetOf(finalIds.toSet))
  }

  test("compaction: content-identical store in one epoch; crash-stale dirs invisible") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val storeDir = Files.createTempDirectory("neardup_store_c").toString
    val stream = MemoryStream[(Long, String)]
    val q = NearDupAdmission.start(stream.toDF().toDF("doc_id", "text"), storeDir,
      Files.createTempDirectory("neardup_ckpt_c").toString, Threshold,
      trigger = Trigger.ProcessingTime(0L))
    try {
      for (e <- 0 until 3) { stream.addData(epochRows(e)); q.processAllAvailable() }
    } finally q.stop()

    def snapshot() = {
      val (d, b) = NearDupAdmission.readStore(spark, storeDir).get
      (d.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq,
        b.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(x => (x._1, x._2)).toSeq)
    }
    def epochDirs() = new java.io.File(s"$storeDir/docs").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch=")).map(_.getName).toSeq

    val before = snapshot()
    assert(epochDirs().size == 3, s"expected 3 pre-compaction epochs, got ${epochDirs()}")

    // crash-mid-sweep state: manifest committed, replaced dirs still on disk
    NearDupAdmission.compactStore(spark, storeDir, targetFiles = 2, sweep = false)
    assert(epochDirs().size == 4, "no-sweep compaction keeps the replaced dirs on disk")
    assert(snapshot() == before,
      "manifest must make replaced epochs invisible — same store, no duplicates")

    // the next (sweeping) compaction finishes the job: one live epoch dir
    NearDupAdmission.compactStore(spark, storeDir, targetFiles = 2)
    assert(epochDirs().size == 1, s"expected a single compacted epoch, got ${epochDirs()}")
    assert(snapshot() == before, "swept store is content-identical")

    // admissions against the compacted store behave exactly as before:
    // re-offered epoch-0 docs all reject, genuinely novel text admits
    val (storeDocs, storeBuckets) = NearDupAdmission.readStore(spark, storeDir).get
    val fresh = Seq((900001L, "totally novel zebra quantum lattice " * 10)).toDF("doc_id", "text")
    val probe = NearDupAdmission.admitBatchPrebucketed(
      storeDocs, storeBuckets, epoch(0).unionByName(fresh), Threshold)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(probe == Set(900001L),
      s"re-offered docs must reject and the novel doc admit, got $probe")
  }

  test("compaction crash BEFORE the manifest: consolidated copy invisible, no duplication") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val storeDir = Files.createTempDirectory("neardup_store_x").toString
    val stream = MemoryStream[(Long, String)]
    val q = NearDupAdmission.start(stream.toDF().toDF("doc_id", "text"), storeDir,
      Files.createTempDirectory("neardup_ckpt_x").toString, Threshold,
      trigger = Trigger.ProcessingTime(0L))
    try {
      for (e <- 0 until 2) { stream.addData(epochRows(e)); q.processAllAvailable() }
    } finally q.stop()

    def snapshot() = {
      val (d, b) = NearDupAdmission.readStore(spark, storeDir).get
      (d.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq,
        b.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(x => (x._1, x._2)).toSeq)
    }
    def epochDirs() = new java.io.File(s"$storeDir/docs").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch=")).map(_.getName).toSeq

    val before = snapshot()
    val olds = epochDirs().map(_.stripPrefix("batch="))
    assert(olds.size == 2)

    // simulate the crash window the advice flagged: a compaction that
    // finished BOTH data writes (docs + buckets, each _SUCCESS-marked) but
    // died before the _MERGED manifest rename. The consolidated copy holds
    // every old row — were it visible, every doc would be duplicated.
    val cpt = "compact-crashed0"
    spark.read.parquet(olds.map(e => s"$storeDir/docs/batch=$e"): _*)
      .coalesce(1).write.mode("overwrite").parquet(s"$storeDir/docs/batch=$cpt")
    spark.read.parquet(olds.map(e => s"$storeDir/buckets/batch=$e"): _*)
      .coalesce(1).write.mode("overwrite").parquet(s"$storeDir/buckets/batch=$cpt")

    assert(snapshot() == before,
      "pre-manifest consolidated epoch must be invisible wholesale — " +
        "olds-only view, zero duplicated docs")

    // recovery: the next real compaction consolidates the olds, commits its
    // manifest, sweeps them AND reclaims the orphaned crashed copy
    NearDupAdmission.compactStore(spark, storeDir, targetFiles = 2)
    assert(snapshot() == before, "post-recovery store is content-identical")
    val after = epochDirs()
    assert(after.size == 1 && !after.contains(s"batch=$cpt"),
      s"expected one live epoch and the crashed orphan reclaimed, got $after")
  }
}
