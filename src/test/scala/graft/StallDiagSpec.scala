package graft

import graft.util.StallDiag

/** Pins the job2 evidence channel ([[graft.util.StallDiag]]): the task
  * histogram and driver-gap phases must land for a real Spark action, and
  * the watchdog must produce a thread dump exactly when the action
  * overruns the armed threshold — this is the instrument VERDICT r13
  * prescribed for the thrice-observed suffix+ckpt stall, so a silent
  * no-op here would leave the next recurrence unadjudicated again.
  */
class StallDiagSpec extends SparkTestBase {

  private def phasesOf(body: => Unit): Map[String, Double] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    StallDiag.watch(spark, "t", (p, v) => buf += (p -> v)) { body }
    buf.toMap
  }

  test("task histogram and driver gaps land for a real action") {
    val got = phasesOf {
      spark.range(0, 1000000, 1, 8).selectExpr("sum(id)").collect()
      ()
    }
    assert(got.get("t tasks").exists(_ >= 8.0), s"expected >=8 tasks, got $got")
    assert(got.contains("t taskP50") && got.contains("t taskMax"))
    assert(got("t taskMax") >= got("t taskP50"))
    assert(got.contains("t runSum") && got.contains("t postGap"))
    assert(got.get("t launchGap").exists(_ >= 0.0))
    assert(!got.contains("t dumpFired"), "watchdog must stay disarmed at the default threshold")
  }

  test("returns the action's value and tolerates job-less actions") {
    var phases = 0
    val out = StallDiag.watch(spark, "noop", (_, _) => phases += 1) { 42 }
    assert(out == 42)
    // no Spark job ran: no task phases, and crucially no crash
  }

  test("watchdog fires a thread dump when the action overruns the threshold") {
    val before = StallDiag.stallThresholdSec
    try {
      StallDiag.stallThresholdSec = 0.2
      val got = phasesOf {
        spark.range(0, 1000, 1, 2).count()
        Thread.sleep(700)
      }
      assert(got.contains("t dumpFired"), s"watchdog should have fired: $got")
      val dir = new java.io.File("target/stall-dumps")
      val dumps = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("t-"))
      assert(dumps.nonEmpty, "a dump file must exist")
      val txt = java.nio.file.Files.readString(dumps.maxBy(_.lastModified).toPath)
      assert(txt.contains("exceeded") && txt.contains("state="),
        "the dump must carry thread states and frames")
    } finally StallDiag.stallThresholdSec = before
  }

  test("phase log stays bounded under an unbounded producer") {
    // a long-running production stream logs sync-point phases per epoch
    // with nobody draining — the queue must not grow without bound
    graft.operators.Renko.drainPhaseLog()
    (1 to 20000).foreach(i => graft.operators.Renko.logPhase(s"p$i", i.toDouble))
    val drained = graft.operators.Renko.drainPhaseLog()
    assert(drained.size <= 8192 + 1, s"phase log unbounded: ${drained.size} entries")
    assert(drained.nonEmpty && drained.last._1 == "p20000",
      "the cap must drop oldest-first, keeping the newest entries")
    assert(graft.operators.Renko.drainPhaseLog().isEmpty)
  }

  test("a fast action under an armed threshold does not fire") {
    val before = StallDiag.stallThresholdSec
    try {
      StallDiag.stallThresholdSec = 30.0
      val got = phasesOf { spark.range(10).count(); () }
      assert(!got.contains("t dumpFired"))
    } finally StallDiag.stallThresholdSec = before
  }
}
