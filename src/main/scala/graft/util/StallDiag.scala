package graft.util

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Evidence channel for the thrice-observed "job2 suffix+ckpt" stall
  * (VERDICT r11–r13): a phase that normally runs 0.3–0.6 s spiked to
  * 11–18 s under co-tenant load with ZERO spill and ZERO GC — the r13
  * diag killed both prior hypotheses, so this round instruments the job
  * itself instead of adjudicating around it.
  *
  * [[watch]] wraps one driver-side action and answers, inside the bench
  * artifact, WHICH component stalled:
  *
  *  - '''all tasks slow''' (p50 ≈ max, runSum >> normal) → executor CPU /
  *    disk contention;
  *  - '''one straggler''' (taskMax >> taskP50) → a single partition or a
  *    single stalled thread;
  *  - '''launchGap''' (job submitted → first task launched) → scheduler
  *    starvation: the stage sat queued behind a co-tenant's jobs;
  *  - '''postGap''' (last task finished → action returned) → driver-side
  *    stall: block-manager/checkpoint bookkeeping after the compute.
  *
  * A watchdog thread additionally fires ONE full JVM thread dump if the
  * action exceeds [[stallThresholdSec]] (set per-rep by the bench to 3x
  * the rep-median; Double.PositiveInfinity disables). In local mode the
  * driver and every executor share the JVM, so one dump covers the whole
  * engine; it lands in `target/stall-dumps/` with a one-line summary on
  * stderr and a `<label> dumpFired` phase mark in the diag.
  */
object StallDiag {

  /** Watchdog threshold for [[watch]]'s thread dump. Volatile: the bench
    * rep loop tightens it as the phase's own median becomes known.
    */
  @volatile var stallThresholdSec: Double = Double.PositiveInfinity

  private final case class TaskObs(durMs: Long, runMs: Long, gcMs: Long, endMs: Long)

  /** Run `action`, attribute its Spark jobs' task metrics and driver-side
    * gaps to `label`-prefixed phase marks via `log`, and arm the stall
    * watchdog. The listener window covers exactly this call; concurrent
    * foreign jobs in the same session would pollute it, so callers hold
    * the invariant the bench already has (one timed query at a time).
    */
  def watch[T](spark: SparkSession, label: String,
               log: (String, Double) => Unit)(action: => T): T = {
    val tasks = new ConcurrentLinkedQueue[TaskObs]()
    val jobSubmitMs = new ConcurrentLinkedQueue[java.lang.Long]()
    val firstLaunchMs = new java.util.concurrent.atomic.AtomicLong(Long.MaxValue)
    val jobsStarted = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobsEnded = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobsStarted.incrementAndGet()
        jobSubmitMs.add(js.time)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        jobsEnded.incrementAndGet()
        ()
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val info = te.taskInfo
        if (info != null && te.taskMetrics != null) {
          firstLaunchMs.getAndUpdate(cur => math.min(cur, info.launchTime))
          tasks.add(TaskObs(
            durMs = info.finishTime - info.launchTime,
            runMs = te.taskMetrics.executorRunTime,
            gcMs = te.taskMetrics.jvmGCTime,
            endMs = info.finishTime))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.currentTimeMillis()
    val fired = new AtomicBoolean(false)
    val watchdog = startWatchdog(label, fired)
    try action
    finally {
      watchdog.foreach(_.interrupt())
      val tEnd = System.currentTimeMillis()
      // the listener bus is async: give JobEnd of every started job a
      // bounded beat to arrive before reading the queues
      val deadline = System.currentTimeMillis() + 500
      while ((jobsEnded.get() < jobsStarted.get() || jobsStarted.get() == 0) &&
             System.currentTimeMillis() < deadline) Thread.sleep(10)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val obs = tasks.asScala.toSeq
      if (obs.nonEmpty) {
        val durs = obs.map(_.durMs).sorted
        val submit = jobSubmitMs.asScala.map(_.toLong).minOption.getOrElse(t0)
        log(s"$label tasks", durs.size.toDouble)
        log(s"$label taskP50", durs(durs.size / 2) / 1e3)
        log(s"$label taskMax", durs.last / 1e3)
        log(s"$label runSum", obs.map(_.runMs).sum / 1e3)
        log(s"$label gcTaskSum", obs.map(_.gcMs).sum / 1e3)
        val launch = firstLaunchMs.get()
        if (launch != Long.MaxValue)
          log(s"$label launchGap", math.max(0L, launch - submit) / 1e3)
        log(s"$label postGap", math.max(0L, tEnd - obs.map(_.endMs).max) / 1e3)
        // driver-side planning before any job: analysis + optimization +
        // physical planning of the action's query
        log(s"$label preSubmit", math.max(0L, submit - t0) / 1e3)
        log(s"$label jobs", jobsStarted.get().toDouble)
      }
      if (fired.get()) log(s"$label dumpFired", (tEnd - t0) / 1e3)
    }
  }

  private def startWatchdog(label: String, fired: AtomicBoolean): Option[Thread] = {
    val thresh = stallThresholdSec
    if (!java.lang.Double.isFinite(thresh)) None
    else {
      val t = new Thread(() => {
        try {
          Thread.sleep(math.max(1L, (thresh * 1000).toLong))
          fired.set(true)
          dumpThreads(label, thresh)
        } catch { case _: InterruptedException => () }
      }, s"graft-stall-watchdog-$label")
      t.setDaemon(true)
      t.start()
      Some(t)
    }
  }

  /** One full thread dump to `target/stall-dumps/`, with a compact
    * by-state / top-frame summary on stderr — enough to name the stalled
    * component without fishing the file out of a remote host.
    */
  private def dumpThreads(label: String, thresholdSec: Double): Unit = {
    import scala.jdk.CollectionConverters._
    val traces = Thread.getAllStackTraces.asScala.toSeq
    val dir = new java.io.File("target/stall-dumps")
    dir.mkdirs()
    val file = new java.io.File(dir, s"$label-${System.nanoTime()}.txt")
    val sb = new StringBuilder
    sb.append(s"== $label exceeded ${thresholdSec}s — full dump, ")
      .append(s"${traces.size} threads ==\n")
    for ((th, frames) <- traces.sortBy(_._1.getName)) {
      sb.append(s"\n\"${th.getName}\" state=${th.getState}\n")
      frames.foreach(f => sb.append(s"    at $f\n"))
    }
    java.nio.file.Files.writeString(file.toPath, sb.toString)
    // summary: thread-state counts + the most common topmost non-idle
    // frame among RUNNABLE threads (the stalled component, if any)
    val states = traces.groupBy(_._1.getState).map { case (s, ts) => s"$s=${ts.size}" }
    val idle = Set("java.lang.Object.wait", "jdk.internal.misc.Unsafe.park",
      "java.lang.Thread.sleep", "sun.nio.ch.EPoll.wait", "sun.nio.ch.Net.poll",
      "java.io.FileInputStream.readBytes", "java.net.PlainSocketImpl.socketAccept",
      "io.netty.channel.epoll.Native.epollWait", "java.lang.Thread.dumpThreads",
      "java.lang.ref.Reference.waitForReferencePendingList")
    val hot = traces
      .filter(_._1.getState == Thread.State.RUNNABLE)
      .flatMap(_._2.headOption)
      .map(f => s"${f.getClassName}.${f.getMethodName}")
      .filterNot(sig => idle.exists(sig.startsWith))
      .groupBy(identity).toSeq.sortBy(-_._2.size).take(5)
      .map { case (sig, hits) => s"$sig x${hits.size}" }
    System.err.println(
      s"[stall-dump] $label > ${thresholdSec}s: ${states.mkString(" ")} | " +
      s"hot: ${hot.mkString("; ")} | full: ${file.getPath}")
  }
}
