package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.functions._

/** Hand-computable fixtures for the funnel's STRICT ordering contract and
  * the integer-week cohort arithmetic; the DuckDB oracle covers the
  * full-corpus forms (events_funnel, events_retention).
  */
class EventAnalyticsSpec extends SparkTestBase {

  import spark.implicits._

  private val W = 7L * 24 * 3600 * 1000000L

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "t")

  test("funnel: strict ordering — pre-step events cannot satisfy later steps") {
    val events = ev(
      // user 1 completes A -> B -> C in order
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      // user 2's only B is BEFORE the first A: stalls at step 1
      (2L, "B", 5L), (2L, "A", 10L), (2L, "C", 30L),
      // user 3: A then B, C missing: stalls at step 2
      (3L, "A", 10L), (3L, "B", 40L),
      // user 4: never does A, invisible to the funnel
      (4L, "B", 1L), (4L, "C", 2L),
      // user 5: second B after A rescues step 2 (min-after-t1 semantics),
      // but C is between A and that B — C must NOT count (it is not
      // after the step-2 completion time)
      (5L, "B", 1L), (5L, "A", 10L), (5L, "C", 15L), (5L, "B", 20L))
    val out = EventAnalytics.funnel(events, Seq("A", "B", "C"), col("t"))
      .orderBy(col("step")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "A", 4L), (2L, "B", 3L), (3L, "C", 1L)))
  }

  test("funnel: equal timestamps do not satisfy strict progression") {
    val events = ev((1L, "A", 10L), (1L, "B", 10L))
    val out = EventAnalytics.funnel(events, Seq("A", "B"), col("t"))
      .orderBy(col("step")).collect().map(_.getLong(2))
    assert(out.toSeq == Seq(1L, 0L), "B at the same instant as A must not count")
  }

  test("funnel: zero-user steps keep the funnel shape") {
    val events = ev((1L, "A", 1L))
    val out = EventAnalytics.funnel(events, Seq("A", "B", "C"), col("t"))
      .orderBy(col("step")).collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 0L, 0L))
  }

  test("retention: cohorts split by first-event week, offsets count distinct active weeks") {
    val events = ev(
      // user 1: first event week 0, active weeks 0, 1, 3 (two events in
      // week 1 count once)
      (1L, "x", 0L), (1L, "x", W + 1L), (1L, "x", W + 2L), (1L, "x", 3 * W),
      // user 2: also cohort 0, only active week 0
      (2L, "x", W - 1L),
      // user 3: cohort week 2, active weeks 2 and 3
      (3L, "x", 2 * W), (3L, "x", 3 * W + 5L))
    val out = EventAnalytics.retentionCohorts(events, col("t"))
      .orderBy(col("cohort_week"), col("week_offset")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, 0L, 2L),   // users 1 and 2 in their cohort week
      (0L, 1L, 1L),   // user 1 returns in week 1
      (0L, 3L, 1L),   // ...and week 3
      (2L, 0L, 1L),   // user 3's cohort week
      (2L, 1L, 1L)))  // user 3 one week later
  }

  test("funnel incremental: fold over time-ordered batches == batch funnel") {
    val all = ev(
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 130L),  // advances across batches
      (2L, "B", 5L), (2L, "A", 110L), (2L, "C", 230L),  // B precedes A: stalls at 1
      (3L, "A", 10L), (3L, "B", 15L), (3L, "C", 18L),   // full chain inside batch 1
      (4L, "C", 210L),                                  // never signs up
      (5L, "A", 205L), (5L, "B", 206L))                 // two steps inside batch 3
    val steps = Seq("A", "B", "C")
    val cuts = Seq(0L -> 100L, 100L -> 200L, 200L -> 1000L)
    var state: Option[org.apache.spark.sql.DataFrame] = None
    var lastCounts: Seq[(Long, String, Long)] = Nil
    for (((lo, hi), e) <- cuts.zipWithIndex) {
      val batch = all.filter(col("t") >= lo && col("t") < hi)
      val (counts, ns) = EventAnalytics.funnelIncremental(state, batch, steps, col("t"))
      state = Some(ns.localCheckpoint(true))
      lastCounts = counts.orderBy("step").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      // invariant: counts after epoch e == batch funnel over the prefix
      val prefix = EventAnalytics.funnel(all.filter(col("t") < hi), steps, col("t"))
        .orderBy("step").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(lastCounts == prefix, s"epoch $e: fold $lastCounts != prefix $prefix")
    }
    assert(lastCounts == Seq((1L, "A", 4L), (2L, "B", 3L), (3L, "C", 2L)))
    // final state levels: users 1 and 3 at level 3, user 2 stalled at 1,
    // user 5 at 2, user 4 absent (never reached step 1)
    val lv = state.get.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lv == Map(1L -> 3L, 2L -> 1L, 3L -> 3L, 5L -> 2L))
  }

  test("retention incremental: fold over time-ordered batches == batch retention") {
    val all = ev(
      (1L, "x", 0L), (1L, "x", W + 1L), (1L, "x", 3 * W),
      (2L, "x", W - 1L), (2L, "x", 2 * W + 3L),
      (3L, "x", 2 * W), (3L, "x", 3 * W + 5L))
    val cuts = Seq(0L -> W, W -> (2 * W), (2 * W) -> (10 * W))
    var state: Option[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] = None
    for (((lo, hi), e) <- cuts.zipWithIndex) {
      val batch = all.filter(col("t") >= lo && col("t") < hi)
      val (counts, ns) = EventAnalytics.retentionIncremental(state, batch, col("t"))
      state = Some((ns._1.localCheckpoint(true), ns._2.localCheckpoint(true)))
      val got = counts.orderBy("cohort_week", "week_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val want = EventAnalytics.retentionCohorts(all.filter(col("t") < hi), col("t"))
        .orderBy("cohort_week", "week_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"epoch $e: fold $got != prefix $want")
    }
  }

  test("funnel and retention plans stay user-key equi-joins (no cartesian, no window)") {
    // event_id stands in for the time column — same types, same plan shape
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), col("event_type"), col("event_id").as("t"))
    for (plan <- Seq(
        EventAnalytics.funnel(events, Seq("signup", "view", "purchase"), col("t")),
        EventAnalytics.retentionCohorts(events, col("t")))
          .map(_.queryExecution.executedPlan.toString)) {
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"expected equi-joins only:\n$plan")
      assert(!plan.contains("Window"), s"expected no window operator:\n$plan")
    }
  }
}
