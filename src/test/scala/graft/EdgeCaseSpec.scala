package graft

import graft.operators.{Renko, RenkoModes, Tick}
import graft.streaming.{PriceEvent, RenkoWS}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate inputs the reference either crashes on or never sees. */
class EdgeCaseSpec extends SparkTestBase {

  import spark.implicits._

  private def ticksDf(rows: Seq[(Long, Double)]) =
    rows.toDF("datetime", "close")

  test("empty input -> empty output, correct schema") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("datetime", LongType), StructField("close", DoubleType))))
    val out = Renko.fromTicks(empty, 1.0, tsUnit = "us")
    assert(out.columns.toSeq == Renko.wideColumns)
    assert(out.count() == 0)
    assert(RenkoModes.project(out, "nongap").count() == 0)
  }

  test("single tick / constant price -> no bricks") {
    assert(Renko.fromTicks(ticksDf(Seq((1L, 10.0))), 1.0, tsUnit = "us").count() == 0)
    val const = (1L to 100L).map(i => (i, 42.5))
    assert(Renko.fromTicks(ticksDf(const), 1.0, tsUnit = "us").count() == 0)
  }

  test("monotone ramp: drop-first removes the first label only") {
    val ramp = (1L to 50L).map(i => (i, 100.0 + i))
    val out = Renko.fromTicks(ticksDf(ramp), 1.0, tsUnit = "us")
    val kept = Renko.fromTicks(ticksDf(ramp), 1.0, tsUnit = "us", dropFirst = false)
    assert(kept.count() == out.count() + 1)
  }

  test("massive gap in one tick emits unbounded bricks (no reference capacity crash)") {
    // the reference IndexErrors past len/divide_by rows (SURVEY §1.4);
    // 2 ticks -> 9999 bricks must work here
    val out = Renko.fromTicks(ticksDf(Seq((1L, 0.0), (2L, 10000.4))), 1.0, tsUnit = "us")
    // all 10000 bricks share the gap tick's timestamp -> ALL dropped by the
    // first-label rule (the documented empty-result edge)
    assert(out.count() == 0)
    val keep = Renko.fromTicks(ticksDf(Seq((1L, 0.0), (2L, 10000.4))), 1.0,
      tsUnit = "us", dropFirst = false)
    assert(keep.count() == 10000)
  }

  test("negative prices anchor correctly (floor toward -inf)") {
    val out = Renko.fromTicks(
      ticksDf(Seq((1L, -10.3), (2L, -8.1))), 1.0, tsUnit = "us", dropFirst = false)
      .orderBy("close").collect()
    // anchor = floor(-10.3) = -11; up bricks close at -10, -9
    assert(out.map(_.getAs[Double]("close")).toSeq == Seq(-10.0, -9.0))
  }

  test("streaming replay of empty / single-event series") {
    val empty = spark.emptyDataset[PriceEvent]
    assert(RenkoWS.replay(empty, 1.0).count() == 0)
    val one = Seq(PriceEvent("x", 5L, 10.4)).toDS()
    val rows = RenkoWS.replay(one, 1.0).collect()
    assert(rows.length == 1 && rows(0).close == 10.0 && rows(0).is_reversal == 1)
  }

  test("pipeline operators on degenerate inputs: empty frames, empty text, tiny corpora") {
    import graft.operators.{Decontamination, Dedup, Sampling, Similarity, TextAnalysis}
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, ""), (3L, "solo")).toDF("doc_id", "text")

    assert(TextAnalysis.repetition(emptyDocs).count() == 0)
    assert(TextAnalysis.redactPii(emptyDocs).count() == 0)
    assert(Dedup.simhash(emptyDocs).count() == 0)
    assert(Dedup.minhashLshPairs(emptyDocs, 0.8).count() == 0)

    // empty-text and sub-shingle docs flow through without errors
    val rep = TextAnalysis.repetition(docs).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rep.keySet == Set(1L, 2L, 3L) && rep(2L) == 0L && rep(3L) == 0L)
    val red = TextAnalysis.redactPii(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(2L) == "")

    // empty benchmark -> nothing flagged; empty corpus -> nothing flagged
    assert(Decontamination.overlapReport(docs, emptyDocs).count() == 0)
    assert(Decontamination.overlapReport(emptyDocs, docs).count() == 0)

    // sampling boundaries: frac 0 keeps nothing, frac 1 keeps everything
    assert(Sampling.deterministicSample(docs, 0.0).count() == 0)
    assert(Sampling.deterministicSample(docs, 1.0).count() == 3)

    // quantized ANN: k larger than the corpus returns everything ranked
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val topk = Similarity.quantizedTopK(vecs, vecs.filter(col("vec_id") === 1L), 10)
      .collect()
    assert(topk.length == 2, "k > corpus yields all neighbors, no duplicates")
    assert(topk.map(_.getLong(2)).toSet == Set(2L, 3L))

    // streaming dedup on an empty frame
    assert(graft.streaming.DedupStream.firstSeenDocs(emptyDocs).count() == 0)
  }
}
