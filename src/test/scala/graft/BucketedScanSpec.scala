package graft

import graft.operators.Renko
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** The 100 TB layout, demonstrated for real: a tick table bucketed by
  * symbol and sorted by (symbol, time) renko-scans through
  * `fromSortedTicks` with ZERO exchanges and ZERO sorts — and the result is
  * still bit-exact against the reference goldens.
  */
class BucketedScanSpec extends SparkTestBase {

  private def countShuffles(p: SparkPlan): Int = {
    val self = p match {
      case _: ShuffleExchangeExec => 1
      case a: AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
      case _ => 0
    }
    self + p.children.map(countShuffles).sum
  }

  test("bucketed+sorted tick table scans renko with zero shuffles, bit-exact") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bucketed LOCATION '$warehouse'")
    try {
      spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(col("event_type").as("symbol"), col("ts").as("datetime"), col("value").as("close"))
        .write
        .bucketBy(4, "symbol")
        .sortBy("symbol", "datetime")
        .saveAsTable("graft_bucketed.ticks")

      val ticks = spark.table("graft_bucketed.ticks")
      val wide = Renko.fromSortedTicks(ticks, 25.0,
        symbolCol = Some("symbol"), tsUnit = "ns")
      assert(countShuffles(wide.queryExecution.executedPlan) == 0,
        s"bucketed scan must not shuffle:\n${wide.queryExecution.executedPlan}")

      // identical bricks to the shuffle-based path per symbol
      val viaShuffle = Renko.fromTicks(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select(col("event_type"), col("ts").as("datetime"), col("value").as("close")),
        25.0, symbolCol = Some("event_type"), tsUnit = "ns")
      def bySym(df: org.apache.spark.sql.DataFrame) =
        df.collect().groupBy(_.getString(0)).view.mapValues(_.toSeq).toMap
      val a = bySym(wide)
      val b = bySym(viaShuffle)
      assert(a.keySet == b.keySet)
      a.keySet.foreach { sym => assert(a(sym) == b(sym), s"series $sym differs") }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucketed.ticks")
      spark.sql("DROP DATABASE IF EXISTS graft_bucketed")
    }
  }
}
