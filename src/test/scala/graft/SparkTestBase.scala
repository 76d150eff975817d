package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for suites (one per JVM, reused). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session

  /** Spark jobs launched while `body` runs (listener drained before the
    * count is read) — the probe-planning flatness assertions' instrument.
    */
  protected def countJobs(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      org.apache.spark.GraftTestShim.waitListenerBusEmpty(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(l)
    n.get
  }
}

object SparkTestBase {
  /** events.ts as epoch-µs LONG whatever its physical type — LONG epoch-ns
    * (older testdata recordings, via nanosAsLong) or TIMESTAMP[_NTZ] µs
    * (current recordings). Same dispatch the engine itself uses
    * (Renko.toEpochMicros), so suites cannot break on a testdata type
    * change again.
    */
  def tsEpochUs(df: org.apache.spark.sql.DataFrame, c: String = "ts"): org.apache.spark.sql.Column =
    graft.operators.Renko.toEpochMicros(
      df.schema(c).dataType, org.apache.spark.sql.functions.col(c), "ns")

  lazy val session: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.util.SparkLogNoise.suppressAccumulatorUpdateErrors()
    // set at runtime (not in the builder) deliberately: proves the conf is
    // session-settable, which GraftSession.ensure relies on when the driver
    // hands us an already-built session
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s
  }
}
