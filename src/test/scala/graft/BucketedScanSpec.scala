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

  test("co-bucketed dedup-apply join runs with zero exchanges, same rows as plain join") {
    // the 100 TB dedup APPLICATION shape: the corpus and its keeper/drop
    // list both live bucketed by doc_id, so subtracting duplicates is a
    // co-located sort-merge join — no shuffle of the corpus, ever
    val warehouse = java.nio.file.Files.createTempDirectory("graft-wh2").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_cobucket LOCATION '$warehouse'")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the co-located merge path (a broadcast join would also avoid
      // shuffling but proves nothing about the layout)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), col("text"), col("source"))
      def keeperFrame = graft.operators.Dedup.canonicalKeepers(
        docs, graft.operators.Dedup.ngramJaccardPairs(docs, 0.5), lit(0))
      docs.write.bucketBy(4, "doc_id").sortBy("doc_id")
        .saveAsTable("graft_cobucket.documents")
      keeperFrame.write.bucketBy(4, "doc_id").sortBy("doc_id")
        .saveAsTable("graft_cobucket.keepers")

      val corpus = spark.table("graft_cobucket.documents")
      val keepers = spark.table("graft_cobucket.keepers").filter(col("keep"))
      val kept = corpus.join(keepers.select("doc_id"), Seq("doc_id"))
      assert(countShuffles(kept.queryExecution.executedPlan) == 0,
        s"co-bucketed join must not shuffle:\n${kept.queryExecution.executedPlan}")

      val plain = docs.withColumn("doc_id", col("doc_id").cast("long"))
        .join(keeperFrame.filter(col("keep")).select("doc_id"), Seq("doc_id"))
      assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
        plain.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq,
        "bucketed layout must not change join results")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_cobucket.documents")
      spark.sql("DROP TABLE IF EXISTS graft_cobucket.keepers")
      spark.sql("DROP DATABASE IF EXISTS graft_cobucket")
    }
  }
}
