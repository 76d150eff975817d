package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream product analytics: ordered-step funnels and cohort
  * retention — the two classic "did the user progress / did they come
  * back" rollups over a (user, type, time) event log.
  *
  * Both are built as relational chains on the user key: every join and
  * aggregate shuffles on `user_id` only (the natural key that also
  * bounds state), never on time, and no per-user ALL-HISTORY event list
  * is ever collected — at 100 TB a user's history stays distributed and
  * each batch funnel step is one filtered pass with the type predicate
  * pushed to the scan. (The streaming [[funnelDelta]] groups one
  * MICRO-BATCH of one user's step-typed events into a sorted array —
  * batch-bounded by the stream's trigger, never all-history.)
  */
object EventAnalytics {

  /** Strictly-ordered conversion funnel: a user reaches step k iff an
    * event of type `steps(k)` exists STRICTLY after the user's earliest
    * completion time of step k-1 (the standard min-time chaining — later
    * same-type events cannot rescue an out-of-order sequence, and a
    * single event cannot satisfy two steps). Output one row per step:
    * (step 1-based, event_type, n_users), n_users = 0 rows included so
    * the funnel shape is always `steps.length` rows.
    *
    * Scale shape: step k is `events σ(type=steps(k))` equi-joined to the
    * step-(k-1) frame on the user key and re-minimized — k passes, each
    * with the type filter at the scan and a user-key shuffle whose
    * cardinality only ever shrinks. No windows, no collected arrays.
    */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      tsCol: Column,
      userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val ev = events.select(col(userCol).cast("long").as("u"),
      col(typeCol).as("et"), tsCol.cast("long").as("t"))
    def countOf(reached: DataFrame, k: Int): DataFrame =
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(k.toLong).as("step"), lit(steps(k - 1)).as("event_type"),
          col("n_users"))
    var reached = ev.filter(col("et") === steps.head)
      .groupBy(col("u")).agg(min(col("t")).as("tp"))
    var out = countOf(reached, 1)
    for (k <- 2 to steps.length) {
      reached = ev.filter(col("et") === steps(k - 1))
        .join(reached, Seq("u"))
        .filter(col("t") > col("tp"))
        .groupBy(col("u")).agg(min(col("t")).as("tp"))
      out = out.unionByName(countOf(reached, k))
    }
    out
  }

  /** One admission step of the STREAMING funnel: advance each user's
    * frontier state `(level, tp)` — the highest step reached and its
    * chain completion time — through one batch of events. Within the
    * batch a user can advance several steps (the per-step chain is
    * replayed seeded at the carried frontier), so a fold over
    * TIME-ORDERED batches is bit-identical to the batch [[funnel]] over
    * their union: the min-time chain only ever consumes events strictly
    * after the frontier, which earlier batches cannot contain.
    * Returns (per-step counts `(step, event_type, n_users)` with
    * n_users = users at level >= step AFTER this batch, new state).
    *
    * 100 TB shape: per step one type-filtered batch pass equi-joined to
    * the frontier frame on the user key; state is one row per user who
    * ever reached step 1, and the store merge is a user-key outer join —
    * O(batch + touched users), never all-history.
    */
  def funnelIncremental(
      state: Option[DataFrame],
      batch: DataFrame,
      steps: Seq[String],
      tsCol: Column,
      userCol: String = "user_id",
      typeCol: String = "event_type"): (DataFrame, DataFrame) = {
    val st = state.getOrElse(emptyState(batch.sparkSession))
    val best = funnelDelta(st, batch, steps, tsCol, userCol, typeCol)
    // each user's furthest in-batch advancement replaces their carried row
    val newState = st.join(best.select(col("u")), Seq("u"), "left_anti")
      .unionByName(best)
    (funnelCounts(newState, steps), newState)
  }

  /** The batch's frontier ADVANCEMENTS against carried `state`: one
    * (u, level, tp) row per user whose level changed, at their furthest
    * in-batch step — the store delta of [[funnelIncremental]], exposed so
    * a persisted stream writes only touched users per epoch.
    *
    * Physical shape (r18): ONE pass — the batch's step-typed events are
    * grouped per user into a time-sorted array and each user's frontier
    * is advanced by a single left-to-right walk seeded at the carried
    * (level, tp). The walk IS min-time chaining: at level L it takes the
    * FIRST event of type steps(L) strictly after tp (= the minimum such
    * time, since the walk is time-ascending and chain times only grow),
    * and an event can never satisfy two steps (advancing sets tp to its
    * own time, and the next advance needs t strictly greater). Same-time
    * ties across types cannot advance twice either (strict >), so the
    * within-tie sort order (t, et) is immaterial. The previous k-pass
    * join chain re-scanned the batch once per step and re-shuffled per
    * step (~3k exchanges per micro-batch — the events_funnel_stream
    * per-epoch floor); this is one user-key aggregate plus one state
    * join. The per-group array holds one MICRO-BATCH of one user's
    * step-typed events (batch-bounded by contract), never all-history —
    * the batch [[funnel]] keeps the join chain for unbounded inputs.
    * EventAnalyticsSpec pins fold == batch equivalence.
    */
  def funnelDelta(
      state: DataFrame,
      batch: DataFrame,
      steps: Seq[String],
      tsCol: Column,
      userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val ev = batch.select(col(userCol).cast("long").as("u"),
      col(typeCol).as("et"), tsCol.cast("long").as("t"))
      .filter(col("et").isin(steps.map(x => x: Any): _*))
    val byUser = ev.groupBy(col("u"))
      .agg(sort_array(collect_list(struct(col("t"), col("et")))).as("__evs"))
    val stepsArr = array(steps.map(lit): _*)
    val nSteps = lit(steps.length.toLong)
    // left join: a touched user may be new (no carried row) — seed at
    // (0, MIN_VALUE) so step 1 has no time constraint, exactly the old
    // level-0 frontier. The join keys on u, the aggregate's own output
    // partitioning, so only the state side exchanges.
    val seeded = byUser.join(state, Seq("u"), "left")
      .select(col("u"), col("__evs"),
        coalesce(col("level"), lit(0L)).as("__lv0"),
        coalesce(col("tp"), lit(Long.MinValue)).as("__tp0"))
    val walked = seeded.withColumn("__b",
      aggregate(col("__evs"),
        struct(col("__lv0").as("level"), col("__tp0").as("tp")),
        (acc, e) => {
          val lv = acc.getField("level")
          val tp = acc.getField("tp")
          // least() keeps element_at in bounds at the top level (ANSI);
          // the lv < nSteps conjunct forbids advancing past the last step
          val advance = lv < nSteps &&
            e.getField("et") === element_at(stepsArr, least(lv + 1L, nSteps).cast("int")) &&
            e.getField("t") > tp
          when(advance,
            struct((lv + 1L).as("level"), e.getField("t").as("tp")))
            .otherwise(struct(lv.as("level"), tp.as("tp")))
        }))
    walked.filter(col("__b.level") > col("__lv0"))
      .select(col("u"), col("__b.level").as("level"), col("__b.tp").as("tp"))
  }

  /** The funnel table of a (u, level, tp) state frame: one row per step,
    * n_users = users at level >= step.
    */
  def funnelCounts(state: DataFrame, steps: Seq[String]): DataFrame = {
    // ONE aggregate pass + explode (r17; was a union of one filtered
    // aggregate per step — k scans of the state and k exchange branches
    // for counts a single pass produces: in the epoch folds each epoch
    // paid the k-branch subtree, the dominant stage-job count of the
    // events_funnel_stream_ep10 floor). count(when(cond,1)) counts
    // exactly the rows the old filter kept; row order is array order,
    // identical to the old union order (step 1..k).
    val aggs = steps.indices.map(i =>
      count(when(col("level") >= lit((i + 1).toLong), lit(1))).as(s"__c$i"))
    val rows = steps.indices.map(i =>
      struct(lit((i + 1).toLong).as("step"), lit(steps(i)).as("event_type"),
        col(s"__c$i").as("n_users")))
    state.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.step"), col("__r.event_type"), col("__r.n_users"))
  }

  /** The empty (u, level, tp) frontier frame. */
  def emptyState(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("u", LongType), StructField("level", LongType),
        StructField("tp", LongType))))
  }

  /** One admission step of the STREAMING cohort retention: carry two
    * stores — `firsts` (user -> cohort week, assigned at first sight, so
    * batches must arrive time-ordered for the cohort to equal the batch
    * operator's) and `active` (distinct (user, week) pairs ever seen) —
    * and emit the full cumulative retention table after the merge. A fold
    * over time-ordered batches therefore reproduces
    * [[retentionCohorts]] over each prefix exactly (the
    * events_retention_stream oracle replays the prefixes).
    *
    * 100 TB shape: both store merges are user-key distinct/anti-join
    * passes, O(batch + touched rows); `active` is bounded by distinct
    * user-weeks, never raw events. The emitted rollup is cohorts x
    * offsets, tiny.
    */
  def retentionIncremental(
      state: Option[(DataFrame, DataFrame)],
      batch: DataFrame,
      tsCol: Column,
      userCol: String = "user_id",
      weekUs: Long = 7L * 24 * 3600 * 1000000L): (DataFrame, (DataFrame, DataFrame)) = {
    require(weekUs > 0, "weekUs must be positive")
    val ev = batch.select(col(userCol).cast("long").as("u"),
      tsCol.cast("long").as("t"))
    val batchFirsts = ev.groupBy(col("u"))
      .agg(expr(s"CAST(min(t) div ${weekUs}L AS BIGINT)").as("cohort_week"))
    val batchActive = ev.select(col("u"),
      expr(s"CAST(t div ${weekUs}L AS BIGINT)").as("w")).distinct()
    val (firsts, active) = state match {
      case Some((f, a)) =>
        (f.unionByName(batchFirsts.join(f.select(col("u")), Seq("u"), "left_anti")),
          a.unionByName(batchActive.join(a, Seq("u", "w"), "left_anti")))
      case None => (batchFirsts, batchActive)
    }
    (retentionCounts(firsts, active), (firsts, active))
  }

  /** The retention rollup over a (firsts, active) store pair — exposed so
    * a fold can aggregate its PINNED stores (materializing the emitted
    * union then reads checkpointed blocks instead of re-executing every
    * epoch's merge, the r13 microbatch-floor fix).
    */
  def retentionCounts(firsts: DataFrame, active: DataFrame): DataFrame =
    active.join(firsts, Seq("u"))
      .groupBy(col("cohort_week"), (col("w") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))

  /** Weekly cohort retention: users are cohorted by the epoch-week of
    * their FIRST event, and counted once per (cohort, week-offset) they
    * were active in. Output: (cohort_week, week_offset, n_users) —
    * cohort_week in integer weeks since the epoch, offset 0 = the cohort
    * week itself. Pure integer `div` arithmetic on the microsecond
    * timestamps (no calendar/locale week semantics), so every engine
    * agrees bit-for-bit.
    *
    * Scale shape: one user-key aggregate for the first-event cohort, one
    * distinct over (user, week) — both partial-aggregated map-side — and
    * a user-key equi-join; the final rollup is cohorts x offsets, tiny.
    */
  def retentionCohorts(
      events: DataFrame,
      tsCol: Column,
      userCol: String = "user_id",
      weekUs: Long = 7L * 24 * 3600 * 1000000L): DataFrame = {
    require(weekUs > 0, "weekUs must be positive")
    val ev = events.select(col(userCol).cast("long").as("u"),
      tsCol.cast("long").as("t"))
    val firsts = ev.groupBy(col("u"))
      .agg(expr(s"CAST(min(t) div ${weekUs}L AS BIGINT)").as("cohort_week"))
    val active = ev.select(col("u"),
      expr(s"CAST(t div ${weekUs}L AS BIGINT)").as("w")).distinct()
    active.join(firsts, Seq("u"))
      .groupBy(col("cohort_week"), (col("w") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
