package graft

import graft.operators.Dedup
import graft.streaming.SpanAdmission
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming dup-span coverage: each arriving doc scored against the
  * cumulative gram-count store, the stream equals the batch fold of the
  * same incremental function across a mid-run restart, a replayed epoch
  * rewrites itself, and compaction is read-transparent. Plus the batch
  * contract: a single batch over everything equals the batch operator, and
  * the admission scores are forward-only.
  */
class SpanAdmissionSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def statRows(df: DataFrame) =
    df.select(col("doc_id"), col("n_pos"), col("n_dup_pos"))
      .orderBy(col("doc_id")).collect().toSeq

  test("single batch == batch operator; admission scores are forward-only") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    // one batch carrying the whole corpus reproduces dupSpanStats exactly
    val (out, _) = Dedup.dupSpanStatsIncremental(None, docs, k = 8)
    assert(statRows(out) == statRows(Dedup.dupSpanStats(docs, k = 8)))

    // forward-only: an epoch-1 doc whose grams an epoch-2 doc repeats
    // keeps its admission-time zero; the epoch-2 doc sees the duplication
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val e1 = spark.createDataFrame(Seq((1L, shared))).toDF("doc_id", "text")
    val e2 = spark.createDataFrame(Seq((2L, shared))).toDF("doc_id", "text")
    val (out1, d1) = Dedup.dupSpanStatsIncremental(None, e1, k = 8)
    val (out2, _) = Dedup.dupSpanStatsIncremental(Some(d1), e2, k = 8)
    val r1 = out1.collect()(0)
    assert(r1.getAs[Long]("n_pos") == 5L && r1.getAs[Long]("n_dup_pos") == 0L,
      "epoch-1 doc admits clean")
    val r2 = out2.collect()(0)
    assert(r2.getAs[Long]("n_dup_pos") == 5L,
      "epoch-2 doc must see every position duplicated against the store")
  }

  test("removal twin: single batch == batch operator; first-seen epoch keeps, later arrivals shed") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    def cleanRows(df: DataFrame) =
      df.select(col("doc_id"), col("clean_text"), col("n_tokens"), col("n_removed"))
        .orderBy(col("doc_id")).collect().toSeq
    // one batch carrying the whole corpus == removeDupSpans bit-for-bit
    // (the in-batch keeper rule IS the batch operator's min-doc rule)
    val (clean, _) = Dedup.removeDupSpansIncremental(None, docs, k = 8)
    assert(cleanRows(clean) == cleanRows(Dedup.removeDupSpans(docs, k = 8)))

    // first-seen-keeps across epochs, even against the batch rule: the
    // HIGHER doc_id arrives first and keeps; the lower, later one sheds
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val early = spark.createDataFrame(Seq((9L, shared))).toDF("doc_id", "text")
    val late = spark.createDataFrame(Seq((1L, shared))).toDF("doc_id", "text")
    val (c1, d1) = Dedup.removeDupSpansIncremental(None, early, k = 8)
    assert(c1.collect()(0).getAs[Long]("n_removed") == 0L, "first arrival keeps")
    val (c2, _) = Dedup.removeDupSpansIncremental(Some(d1.localCheckpoint(true)), late, k = 8)
    val r2 = c2.collect()(0)
    assert(r2.getAs[Long]("n_removed") == 12L && r2.getAs[String]("clean_text") == "",
      "later arrival sheds the spans the store owns, regardless of doc_id order")
  }

  test("stream with mid-run restart == batch fold; replayed epoch idempotent; compaction read-transparent") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))

    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = docs.as[(Long, String)].collect().sortBy(_._1)
    val (firstHalf, secondHalf) = all.splitAt(all.length / 2)

    var seen: Option[DataFrame] = None
    val folds = Seq(firstHalf, secondHalf).map { half =>
      val batch = spark.createDataset(half.toIndexedSeq).toDF("doc_id", "text")
      val (out, delta) = Dedup.dupSpanStatsIncremental(seen, batch, k = 8)
      // the removal twin folds over the SAME store snapshot
      val (clean, _) = Dedup.removeDupSpansIncremental(seen, batch, k = 8)
      val pinned = delta.localCheckpoint(true)
      seen = Some(seen.map(_.unionByName(pinned)).getOrElse(pinned))
      (out.localCheckpoint(true), clean.localCheckpoint(true))
    }
    val foldOut = folds.map(_._1).reduce(_.unionByName(_))
    val foldClean = folds.map(_._2).reduce(_.unionByName(_))

    val store = java.nio.file.Files.createTempDirectory("graft-spanadm").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-spanadm-ckpt").toString
    val source = MemoryStream[(Long, String)]
    def stream = source.toDF().toDF("doc_id", "text")

    source.addData(firstHalf.toIndexedSeq)
    val q1 = SpanAdmission.start(stream, store, ckpt)
    q1.processAllAvailable(); q1.stop()

    source.addData(secondHalf.toIndexedSeq)
    val q2 = SpanAdmission.start(stream, store, ckpt)
    q2.processAllAvailable(); q2.stop()

    val stats = SpanAdmission.readStats(spark, store)
      .getOrElse(fail("no committed output"))
    assert(statRows(stats) == statRows(foldOut),
      "stream across a restart must equal the batch fold")
    def cleanRows(df: DataFrame) =
      df.select(col("doc_id"), col("clean_text"), col("n_removed"))
        .orderBy(col("doc_id")).collect().toSeq
    assert(cleanRows(SpanAdmission.readClean(spark, store).get) == cleanRows(foldClean),
      "the clean side across a restart must equal the removal fold")
    // cross-batch evidence on this corpus: some second-half doc's coverage
    // comes from first-half grams alone (dup at admission, no in-batch twin)
    assert(stats.filter(col("doc_id") >= secondHalf.head._1 && col("n_dup_pos") > 0).count() > 0,
      "expected cross-batch span coverage on this corpus")

    SpanAdmission.admitEpoch(store,
      spark.createDataset(secondHalf.toIndexedSeq).toDF("doc_id", "text"), batchId = 1L)
    val replayed = SpanAdmission.readStats(spark, store).get
    assert(statRows(replayed) == statRows(foldOut),
      "replayed epoch must rewrite itself, not double-count its grams")
    assert(replayed.count() == all.length, "one stats row per ingested doc")

    SpanAdmission.compactStore(spark, store, 2)
    val dirs = new java.io.File(s"$store/grams").listFiles().map(_.getName).toSeq
    assert(dirs.size == 1 && dirs.head.startsWith("batch=compact-"),
      s"sweep must leave only the compact epoch, got $dirs")
    assert(statRows(SpanAdmission.readStats(spark, store).get) == statRows(foldOut),
      "post-compaction readers unchanged")
    // and the compacted gram store still serves a NEW epoch correctly:
    // admitting a verbatim copy of an already-admitted long doc must read
    // fully duplicated (a probe doc with >= 8 tokens, so stats exist)
    val longDoc = all.find(_._2.trim.split("\\s+").length >= 8)
      .getOrElse(fail("corpus has no doc with >= 8 tokens"))._2
    SpanAdmission.admitEpoch(store,
      spark.createDataset(Seq((999999L, longDoc))).toDF("doc_id", "text"), batchId = 7L)
    val probed = SpanAdmission.readStats(spark, store).get
      .filter(col("doc_id") === 999999L).collect()
    assert(probed.length == 1 && probed(0).getAs[Long]("n_pos") > 0,
      "the probe doc must produce a stats row")
    assert(probed(0).getAs[Long]("n_dup_pos") == probed(0).getAs[Long]("n_pos"),
      "a verbatim copy admitted after compaction must be fully covered")
  }
}
