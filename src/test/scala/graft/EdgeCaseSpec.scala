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
}
