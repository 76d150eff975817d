package graft

import java.nio.file.Files

import graft.streaming.CurationStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming curation front door: the stream must equal the batch fold
  * of `curateBatch` (the `pipeline_curate_stream` oracle), and a
  * stopped-and-resumed pipeline re-offered already-processed documents must
  * not re-admit, re-emit, or double-consume budget — the near-dup store
  * rejects the replays before they can touch the budget counters.
  */
class CurationStreamSpec extends SparkTestBase {

  private val Budget = 2000L

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("lang"), col("text")).cache()
  private lazy val bench = docs.filter(col("doc_id") % 10 === 7)
  private lazy val corpus = docs.filter(col("doc_id") % 10 =!= 7)

  private def epoch(e: Int): DataFrame =
    corpus.filter(pmod(col("doc_id"), lit(3L)) === lit(e.toLong))

  private def epochRows(e: Int): IndexedSeq[(Long, String, String)] =
    epoch(e).collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toIndexedSeq

  /** (doc_id, lang, pred_lang, n_tokens, quality_score, cum_tokens) after
    * folding `curateBatch` over the first `n` epochs — the stream's
    * expected curated corpus.
    */
  private def fold(n: Int): Set[(Long, String, String, Long, Double, Long)] = {
    var store: Option[(DataFrame, DataFrame)] = None
    var consumed = Map.empty[String, Long]
    (0 until n).flatMap { e =>
      val (adm, fin) = CurationStream.curateBatch(store, consumed, epoch(e), bench, Budget)
      val admBuckets = graft.operators.Dedup.minhashBucketsFor(adm)
      store = Some(store match {
        case Some((sd, sb)) => (sd.unionByName(adm), sb.unionByName(admBuckets))
        case None => (adm, admBuckets)
      })
      consumed = consumed ++ fin.groupBy("lang").agg(max("cum_tokens").as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      fin.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4), r.getLong(5)))
    }.toSet
  }

  private def curated(storeDir: String): Set[(Long, String, String, Long, Double, Long)] =
    CurationStream.readCurated(spark, storeDir).get.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSet

  test("per-epoch funnel: stage counts monotone along the chain and consistent with the emitted records") {
    var store: Option[(DataFrame, DataFrame)] = None
    var consumed = Map.empty[String, Long]
    (0 until 3).foreach { e =>
      val st = CurationStream.curateBatchStages(store, consumed, epoch(e), bench, Budget)
      store = Some(store match {
        case Some((sd, sb)) =>
          (sd.unionByName(st.admitted.select(col("doc_id"), col("text"))),
            sb.unionByName(st.admittedBuckets))
        case None => (st.admitted.select(col("doc_id"), col("text")), st.admittedBuckets)
      })
      consumed = consumed ++ st.curated.groupBy("lang").agg(max("cum_tokens").as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val counts = Seq(st.annotated, st.survivors, st.clean, st.admitted, st.curated)
        .map(_.count())
      assert(counts.head == epoch(e).count(),
        s"epoch $e: funnel input must be the epoch's batch, got $counts")
      assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
        s"epoch $e: stage counts must be monotone non-increasing, got $counts")
      assert(counts.last == st.curated.count(),
        s"epoch $e: stage-40 count must equal the emitted records")
      assert(counts.last > 0, s"epoch $e: the funnel must admit something")
    }
  }

  test("streamed 3 epochs == batch fold (full chain, budget totals included)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val storeDir = Files.createTempDirectory("curation_store").toString
    val stream = MemoryStream[(Long, String, String)]
    val q = CurationStream.start(
      stream.toDF().toDF("doc_id", "lang", "text"), bench, storeDir,
      Files.createTempDirectory("curation_ckpt").toString, Budget,
      trigger = Trigger.ProcessingTime(0L))
    try {
      for (e <- 0 until 3) { stream.addData(epochRows(e)); q.processAllAvailable() }
    } finally q.stop()
    val want = fold(3)
    val got = curated(storeDir)
    assert(want.nonEmpty && got == want,
      s"stream != fold: only-stream=${got.diff(want).take(3)} only-fold=${want.diff(got).take(3)}")
    // every gate did real work on this corpus: some docs were filtered,
    // and at least one stratum hit its budget (a closed stratum is what
    // the resume test then leans on)
    assert(got.size < corpus.count(), "chain must reject documents")
    assert(got.groupBy(_._2).values.exists(_.map(_._6).max >= Budget),
      "at least one stratum should exhaust its budget")
  }

  test("epoch checkpoints are released: stream storage does not grow per epoch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def storedIds(): Set[Int] = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    val before = storedIds()
    val storeDir = Files.createTempDirectory("curation_leak").toString
    val stream = MemoryStream[(Long, String, String)]
    val q = CurationStream.start(
      stream.toDF().toDF("doc_id", "lang", "text"), bench, storeDir,
      Files.createTempDirectory("curation_leak_ckpt").toString, Budget,
      trigger = Trigger.ProcessingTime(0L))
    // each epoch pins ~4 frames (adm, fin, clean, keep sets); without the
    // release handle every epoch would ADD that many lingering checkpoint
    // RDDs. Per-stream pins (benchGrams) and framework residue are
    // epoch-count-independent, so the pin is on GROWTH between an early
    // and a late snapshot, with a drain window for the async unpersists
    def settled(base: Set[Int], slack: Int): Set[Int] = {
      val deadline = System.nanoTime() + 10L * 1000000000L
      var extra = storedIds() -- base
      while (extra.size > slack && System.nanoTime() < deadline) {
        Thread.sleep(100); extra = storedIds() -- base
      }
      extra
    }
    try {
      stream.addData(epochRows(0)); q.processAllAvailable()
      val afterFirst = storedIds()
      for (e <- 1 until 4) { stream.addData(epochRows(e)); q.processAllAvailable() }
      val grown = settled(afterFirst, slack = 2)
      assert(grown.size <= 2,
        s"3 further epochs must not accumulate checkpoint blocks " +
          s"(~4/epoch without the release handle); new lingering RDDs: $grown")
    } finally q.stop()
    settled(before, slack = Int.MaxValue) // drain before the next test
  }

  test("store compaction: readers unchanged, crash-mid-sweep invisible, re-offers still reject") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val storeDir = Files.createTempDirectory("curation_cpt_store").toString
    val stream = MemoryStream[(Long, String, String)]
    val q = CurationStream.start(
      stream.toDF().toDF("doc_id", "lang", "text"), bench, storeDir,
      Files.createTempDirectory("curation_cpt_ckpt").toString, Budget,
      trigger = Trigger.ProcessingTime(0L))
    try {
      for (e <- 0 until 3) { stream.addData(epochRows(e)); q.processAllAvailable() }
    } finally q.stop()
    val snapshot = curated(storeDir)
    def epochDirs(side: String) =
      new java.io.File(s"$storeDir/$side").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch=")).map(_.getName).toSeq
    assert(epochDirs("docs").size == 3, "expected one epoch per trigger")
    // crash window: manifest committed, replaced dirs still on disk — the
    // olds must be invisible (no duplicated rows)
    CurationStream.compactStore(spark, storeDir, targetFiles = 2, sweep = false)
    assert(curated(storeDir) == snapshot,
      "mid-sweep state must serve the compacted epoch only, no dups")
    // full compaction: one epoch per side, readers bit-identical
    CurationStream.compactStore(spark, storeDir, targetFiles = 2)
    assert(epochDirs("docs").size == 1 && epochDirs("buckets").size == 1 &&
      epochDirs("out").size == 1, s"expected one compact epoch, got ${epochDirs("docs")}")
    assert(curated(storeDir) == snapshot, "compaction must not change the curated corpus")
    // continuation against the compacted store: re-offering the whole
    // corpus admits nothing (every doc is a Jaccard-1.0 dup of its
    // admitted copy or rejects upstream) and the curated corpus is stable
    val stream2 = MemoryStream[(Long, String, String)]
    val q2 = CurationStream.start(
      stream2.toDF().toDF("doc_id", "lang", "text"), bench, storeDir,
      Files.createTempDirectory("curation_cpt_ckpt2").toString, Budget,
      trigger = Trigger.ProcessingTime(0L))
    try {
      for (e <- 0 until 3) { stream2.addData(epochRows(e)); q2.processAllAvailable() }
    } finally q2.stop()
    assert(curated(storeDir) == snapshot,
      "re-offered corpus must admit nothing against the compacted store")
  }

  test("resume: re-offered epochs reject at the dedup gate; budget not double-consumed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val storeDir = Files.createTempDirectory("curation_store_r").toString
    val stream = MemoryStream[(Long, String, String)]
    val q = CurationStream.start(
      stream.toDF().toDF("doc_id", "lang", "text"), bench, storeDir,
      Files.createTempDirectory("curation_ckpt_r").toString, Budget,
      trigger = Trigger.ProcessingTime(0L))
    try {
      stream.addData(epochRows(0)); q.processAllAvailable()
    } finally q.stop()
    // new pipeline over the SAME store (fresh source + checkpoint): the
    // upstream re-offers epoch 0 in full — at-least-once delivery — then
    // epoch 1 proceeds normally
    val stream2 = MemoryStream[(Long, String, String)]
    val q2 = CurationStream.start(
      stream2.toDF().toDF("doc_id", "lang", "text"), bench, storeDir,
      Files.createTempDirectory("curation_ckpt_r2").toString, Budget,
      trigger = Trigger.ProcessingTime(0L))
    try {
      stream2.addData(epochRows(0)); q2.processAllAvailable()
      stream2.addData(epochRows(1)); q2.processAllAvailable()
    } finally q2.stop()
    val got = curated(storeDir)
    val ids = got.toSeq.map(_._1)
    assert(ids.length == ids.distinct.length, "no doc emitted twice across the resume")
    assert(got == fold(2),
      "store after resume = fold over epochs 0..1 — replayed docs must not " +
        "re-admit or advance any stratum's consumed total")
  }

  test("classifier-gated stream == gated batch fold; model trained once, gate genuinely filters") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val seeds = (all.filter(col("doc_id") % 10 === 7), all.filter(col("doc_id") % 10 === 3))
    val storeDir = Files.createTempDirectory("curation_store_c").toString
    val stream = MemoryStream[(Long, String, String)]
    val q = CurationStream.start(
      stream.toDF().toDF("doc_id", "lang", "text"), bench, storeDir,
      Files.createTempDirectory("curation_ckpt_c").toString, Budget,
      trigger = Trigger.ProcessingTime(0L), classifierSeeds = Some(seeds))
    try {
      for (e <- 0 until 3) { stream.addData(epochRows(e)); q.processAllAvailable() }
    } finally q.stop()
    // gated fold with the model trained once — the exact stream function
    val model = Some(graft.operators.Selection.nbClassifierModel(seeds._1, seeds._2))
    var store: Option[(DataFrame, DataFrame)] = None
    var consumed = Map.empty[String, Long]
    val want = (0 until 3).flatMap { e =>
      val (adm, admBuckets, fin) = CurationStream.curateBatchWithBuckets(
        store, consumed, epoch(e), bench, Budget, classifier = model)
      store = Some(store match {
        case Some((sd, sb)) => (sd.unionByName(adm), sb.unionByName(admBuckets))
        case None => (adm, admBuckets)
      })
      consumed = consumed ++ fin.groupBy("lang").agg(max("cum_tokens").as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      fin.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4), r.getLong(5)))
    }.toSet
    val got = curated(storeDir)
    assert(want.nonEmpty && got == want, "gated stream != gated fold")
    // the gate changed the outcome vs the ungated chain
    assert(got.map(_._1) != fold(3).map(_._1),
      "the learned gate must change the curated set")
    // every curated doc clears the standalone classifier cut
    val (w, prior) = model.get
    val scores = graft.operators.Selection
      .nbScoreWithModel(corpus, w, prior)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { r => assert(scores(r._1) >= 0L, s"doc ${r._1} below the cut") }
  }
}
