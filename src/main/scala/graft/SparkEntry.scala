package graft

import graft.operators.{AsofJoin, Chunking, Clustering, CorpusDiff, Curation, Decontamination, Dedup, EventAnalytics, Export, IvfIndex, Layout, Multimodal, RangeJoin, Renko, RenkoModes, Sampling, Search, SeriesCompare, Similarity, Sketches, Skew, TextAnalysis, TextIndex, ToRws}
import graft.streaming.{PriceEvent, RenkoWS}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one implemented operator from SURVEY.md §2 (plus
  * the beyond-reference pipeline operators). Queries with a DuckDB-equivalent
  * formulation also appear in `oracleSql` with IDENTICAL output column names
  * and a deterministic total ORDER BY.
  */
object SparkEntry {

  /** The driver may hand us a session built without nano-timestamp support;
    * `events.parquet` stores TIMESTAMP(NANOS) which Spark 4 rejects unless
    * read as epoch-ns Long. Session-settable, so apply defensively.
    */
  private def ensureConf(s: SparkSession): Unit =
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** events projected for the layout family: (event_id, x = ts epoch-µs as
    * double, y = value) — the two numeric dimensions the z-order interleaves.
    */
  private def layoutEventsBase(s: SparkSession, dir: String): DataFrame = {
    ensureConf(s)
    val ev = s.read.parquet(s"$dir/events.parquet")
    ev.select(col("event_id"), tsUs(ev).cast("double").as("x"),
      col("value").cast("double").as("y"))
  }

  /** events table as a single-series tick stream: ts (epoch ns) + value. */
  private def eventTicks(s: SparkSession, dir: String): DataFrame = {
    ensureConf(s)
    s.read.parquet(s"$dir/events.parquet")
      .select(col("ts").as("datetime"), col("value").as("close"))
  }

  /** events.ts as epoch-µs LONG whatever its physical type — LONG epoch-ns
    * (older testdata recordings, read via nanosAsLong) or TIMESTAMP[_NTZ]
    * µs (current recordings; the driver regenerated the corpus between
    * rounds). Every direct consumer of `ts` arithmetic goes through this so
    * a testdata type change cannot break query analysis again.
    */
  private def tsUs(ev: DataFrame, c: String = "ts"): org.apache.spark.sql.Column =
    Renko.toEpochMicros(ev.schema(c).dataType, col(c), "ns")

  /** One epoch of the curate-stream folds, PINNED: the epoch's bucket
    * table is localCheckpointed before joining the growing store — it is
    * the one LAZY output of `curateBatchWithBuckets` that joins the store
    * (adm rides the epoch's admission pin; fin is a projection over the
    * same pin — nothing here releases, so the view stays valid through
    * the final union), anchored on the epoch's
    * LSH decision, so an unpinned store side re-executed every prior
    * epoch's signature work once per later epoch (r13 microbatch-floor
    * fix). Returns (new store, fin unchanged).
    */
  private def pinCurateEpoch(
      store: Option[(DataFrame, DataFrame)],
      adm: DataFrame, buckets: DataFrame, fin: DataFrame)
      : (Option[(DataFrame, DataFrame)], DataFrame) = {
    val bQ = buckets.localCheckpoint(true)
    val ns = Some(store match {
      case Some((sd, sb)) => (sd.unionByName(adm), sb.unionByName(bQ))
      case None => (adm, bQ)
    })
    (ns, fin)
  }

  /** events as one tick series per event_type (multi-series scan). */
  private def eventTicksByType(s: SparkSession, dir: String): DataFrame = {
    ensureConf(s)
    s.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("ts").as("datetime"), col("value").as("close"))
  }

  /** events as a PriceEvent stream (timestamp in epoch µs). */
  private def priceEvents(s: SparkSession, dir: String): Dataset[PriceEvent] = {
    ensureConf(s)
    import s.implicits._
    val ev = s.read.parquet(s"$dir/events.parquet")
    ev.select(
        lit("").as("symbol"),
        Renko.toEpochMicros(ev.schema("ts").dataType, col("ts"), "ns").as("timestamp"),
        col("value").as("price"))
      .as[PriceEvent]
  }

  /** events as a PriceEvent stream keyed by event_type (multi-key animate). */
  private def priceEventsByType(s: SparkSession, dir: String): Dataset[PriceEvent] = {
    ensureConf(s)
    import s.implicits._
    val ev = s.read.parquet(s"$dir/events.parquet")
    ev.select(
        col("event_type").as("symbol"),
        Renko.toEpochMicros(ev.schema("ts").dataType, col("ts"), "ns").as("timestamp"),
        col("value").as("price"))
      .as[PriceEvent]
  }

  /** Emission order for animate frames: the forming row sorts last within
    * its key/timestamp (`is_forming` before the close*direction tiebreak).
    */
  private def animateOrdered(df: DataFrame): DataFrame =
    df.orderBy(col("symbol"), col("timestamp"), col("is_forming"),
      (col("close") * col("direction")).asc)

  private val EventBrick = 25.0

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val ticks = eventTicks(spark, "/root/testdata/sf0.001")
    RenkoModes.project(Renko.fromTicks(ticks, EventBrick, tsUnit = "ns"), "wicks")
  }

  /** Deterministic total order for brick outputs: bricks of one tick share a
    * timestamp, and within the tick emission order is monotone in
    * close*direction — so (symbol, ts, close*direction) reproduces emission
    * order (timestamps have no µs ties in this corpus: verified sf0.001-0.1).
    */
  private def emissionOrdered(df: DataFrame): DataFrame = {
    val ts = if (df.columns.contains("datetime")) col("datetime") else col("timestamp")
    df.orderBy(col("symbol"), ts, (col("close") * col("direction")).asc)
  }

  private def renkoMode(mode: String): (SparkSession, String) => DataFrame =
    (s, dir) => emissionOrdered(RenkoModes.project(
      Renko.fromTicks(eventTicks(s, dir), EventBrick, tsUnit = "ns"), mode))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- the renko stateful scan (SURVEY §2.1) + mode views (§2.2): the
    // --- scan is a sequential recurrence, not SQL-expressible → rows-only
    "renko_wicks" -> renkoMode("wicks"),
    "renko_normal" -> renkoMode("normal"),
    "renko_nongap" -> renkoMode("nongap"),
    "renko_reverse_wicks" -> renkoMode("reverse-wicks"),
    "renko_reverse_nongap" -> renkoMode("reverse-nongap"),
    "renko_fake_r_wicks" -> renkoMode("fake-r-wicks"),
    "renko_fake_r_nongap" -> renkoMode("fake-r-nongap"),
    "renko_multi_series" -> ((s, dir) => emissionOrdered(RenkoModes.project(
      Renko.fromTicks(eventTicksByType(s, dir), EventBrick,
        symbolCol = Some("event_type"), tsUnit = "ns"), "wicks"))),
    "renko_multi_series_parallel" -> ((s, dir) =>
      // N-series parallel execution strategy (per-symbol range partitioning
      // + per-symbol sync-point stitch) — same semantics as
      // renko_multi_series, checked against the same oracle
      emissionOrdered(RenkoModes.project(
        Renko.fromTicksParallel(eventTicksByType(s, dir), EventBrick, tsUnit = "ns",
          numPartitions = 8, symbolCol = Some("event_type")), "wicks"))),
    "renko_to_rws" -> ((s, dir) => emissionOrdered(ToRws.toRws(
      Renko.fromTicks(eventTicks(s, dir), EventBrick, tsUnit = "ns"), EventBrick))),
    "renko_sorted_scan" -> ((s, dir) => {
      // zero-shuffle fast path on pre-ordered input (bucketed-layout shape)
      val sorted = eventTicks(s, dir).orderBy(col("datetime")).coalesce(1)
      emissionOrdered(
        RenkoModes.project(Renko.fromSortedTicks(sorted, EventBrick, tsUnit = "ns"), "wicks"))
    }),
    "renko_parallel_scan" -> ((s, dir) =>
      // single-series parallel execution strategy (range-sort + sync-point
      // stitched scan) — same operator semantics, checked against the same
      // recursive-CTE oracle as renko_wicks
      emissionOrdered(RenkoModes.project(
        Renko.fromTicksParallel(eventTicks(s, dir), EventBrick, tsUnit = "ns",
          numPartitions = 8), "wicks"))),
    "renko_tvf_pushdown" -> ((s, dir) => {
      // the custom-Catalyst path end-to-end: multi-series TVF + symbol
      // predicate, planned through RenkoScanNode with RenkoSymbolPushdown
      // moving the predicate to the tick source BEFORE the shuffle and the
      // stateful fold (ExtensionsSpec pins the pushed filter on the scan)
      GraftExtensions.registerTvfs(s)
      eventTicksByType(s, dir).createOrReplaceTempView("graft_tvf_pushdown_ticks")
      emissionOrdered(s.sql(
        s"SELECT * FROM graft_renko('graft_tvf_pushdown_ticks', $EventBrick, " +
          "'wicks', 'event_type', 'ns') WHERE symbol = 'click'"))
    }),
    "renko_sql_tvf" -> ((s, dir) => {
      // the SQL TVF surface (SURVEY §7.3): the same scan + mode projection
      // planned entirely through `SELECT * FROM graft_renko(...)`, checked
      // against the same recursive-CTE oracle as renko_wicks
      GraftExtensions.registerRenkoTvf(s)
      eventTicks(s, dir).createOrReplaceTempView("graft_tvf_entry_ticks")
      emissionOrdered(s.sql(
        s"SELECT * FROM graft_renko('graft_tvf_entry_ticks', $EventBrick, 'wicks', '', 'ns')"))
    }),

    // --- streaming surface (SURVEY §2.8), exercised in batch-replay form
    // --- (same engine the flatMapGroupsWithState operator wraps)
    "renko_ws_replay" -> ((s, dir) =>
      emissionOrdered(RenkoWS.replay(priceEvents(s, dir), EventBrick).toDF())),
    "renko_ws_resume" -> ((s, dir) => {
      // checkpoint at the timespan midpoint, resume, emit the post-splice
      // bricks (midpoint = integer mean of min/max epoch-ns — exact and
      // engine-independent, unlike a percentile sketch)
      val raw = eventTicks(s, dir)
      val ticks = raw.select(tsUs(raw, "datetime").as("datetime"), col("close"))
      val mm = ticks.agg(min(col("datetime")), max(col("datetime"))).collect()(0)
      val cut = (mm.getLong(0) + mm.getLong(1)) / 2
      val headWide = Renko.fromTicks(ticks.filter(col("datetime") <= cut), EventBrick, tsUnit = "us")
      val init = RenkoWS.stateFromCheckpoint(ToRws.toRws(headWide, EventBrick)).collect().toMap
      import s.implicits._
      val tail = priceEvents(s, dir).filter(_.timestamp > cut)
      emissionOrdered(RenkoWS.replay(tail, EventBrick, initialState = init).toDF())
    }),
    // renko_animate (reference renkodf.py:767-858) under the driver gate:
    // the live-chart frame — completed bricks mode-projected + the forming
    // brick from the end-of-replay accumulators — built from a
    // bricksWithForming-shaped table and computed per key IN-PLAN
    // (RenkoWS.animateView: every window partitioned by symbol, no driver
    // collect). wicks exercises the maxLen/keep retention window; nongap
    // runs MULTI-KEY (one animate frame per event_type in one plan)
    "renko_animate_wicks" -> ((s, dir) =>
      animateOrdered(RenkoWS.animateView(
        RenkoWS.replayWithForming(priceEvents(s, dir), EventBrick).toDF(),
        "wicks", maxLen = 500, keep = 250))),
    "renko_animate_nongap" -> ((s, dir) =>
      animateOrdered(RenkoWS.animateView(
        RenkoWS.replayWithForming(priceEventsByType(s, dir), EventBrick).toDF(),
        "nongap", maxLen = 0))),
    "renko_animate_fake_r_nongap" -> ((s, dir) =>
      animateOrdered(RenkoWS.animateView(
        RenkoWS.replayWithForming(priceEvents(s, dir), EventBrick).toDF(),
        "fake-r-nongap", maxLen = 0))),

    // --- relational operators (SURVEY §2.2-2.5), DuckDB-oracle-backed
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q2_filter_sort" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01 00:00:00"))
          && col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic corpus —
        // a total order needs the full tuple
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .limit(100)
    }),
    "q3_join_broadcast" -> ((s, dir) => {
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val customer = s.read.parquet(s"$dir/customer.parquet")
      orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),
    "q4_multijoin" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val customer = s.read.parquet(s"$dir/customer.parquet")
      val nation = s.read.parquet(s"$dir/nation.parquet")
      val region = s.read.parquet(s"$dir/region.parquet")
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1) - col("l_discount")).cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    }),
    "q5_window_topk" -> ((s, dir) => {
      ensureConf(s)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id").asc)
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("rn"), col("event_id"), col("value"))
        .orderBy(col("user_id"), col("rn"))
    }),
    "q6_window_lag" -> ((s, dir) => {
      ensureConf(s)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .filter(col("prev_value").isNotNull)
        .select(col("event_id"), col("user_id"), (col("value") - col("prev_value")).as("value_diff"))
        .orderBy(col("event_id"))
    }),
    "q7_union_distinct" -> ((s, dir) => {
      ensureConf(s)
      val ev = s.read.parquet(s"$dir/events.parquet")
      val a = ev.filter(col("event_type") === "purchase")
      val b = ev.filter(col("value") > 400)
      a.unionByName(b).distinct()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),
    "q8_semijoin" -> ((s, dir) => {
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      orders.join(li.filter(col("l_quantity") >= 49), col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),
    "q9_antijoin" -> ((s, dir) => {
      val customer = s.read.parquet(s"$dir/customer.parquet")
      val orders = s.read.parquet(s"$dir/orders.parquet")
      customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),
    "q10_tail" -> ((s, dir) => {
      ensureConf(s)
      val ev = s.read.parquet(s"$dir/events.parquet")
      ev.select(col("event_id"), col("event_type"), col("value"),
          (tsUs(ev).cast("decimal(38,0)") / lit(1000)).cast("long").as("ts_ms"))
        // ts_ms is truncated to ms, so ties are plausible at larger scale
        // factors — tie-break on event_id exactly like the oracle
        .orderBy(col("ts_ms").desc, col("event_id").desc)
        .limit(10)
    }),
    "q11_agg_stats" -> ((s, dir) => {
      ensureConf(s)
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    }),

    "q14_rollup" -> ((s, dir) => {
      // grouping sets come free from Catalyst (SURVEY §2.6) — exercised so
      // the engine demonstrably supports them
      s.read.parquet(s"$dir/orders.parquet")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),
    "q15_except" -> ((s, dir) => {
      ensureConf(s)
      val ev = s.read.parquet(s"$dir/events.parquet")
      ev.filter(col("value") > 400).select(col("event_id"), col("user_id"))
        .exceptAll(ev.filter(col("event_type") === "purchase").select(col("event_id"), col("user_id")))
        .orderBy(col("event_id"))
    }),
    "q16_intersect" -> ((s, dir) => {
      ensureConf(s)
      val ev = s.read.parquet(s"$dir/events.parquet")
      ev.filter(col("event_type") === "click").select(col("user_id"))
        .intersect(ev.filter(col("value") < 50).select(col("user_id")))
        .orderBy(col("user_id"))
    }),
    "q17_time_window" -> ((s, dir) => {
      // event-time tumbling window (beyond reference: renko is price-driven,
      // but the engine supports time-driven aggregation too — the streaming
      // form with a watermark is exercised in WindowedStreamSpec)
      ensureConf(s)
      val ev = s.read.parquet(s"$dir/events.parquet")
      ev
        .withColumn("event_time", timestamp_micros(tsUs(ev)))
        .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(unix_millis(col("window.start")).as("window_start_ms"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy(col("window_start_ms"), col("event_type"))
    }),
    "q18_sessionize" -> ((s, dir) => {
      // sessionization via gaps-and-islands (30-min inactivity gap) — the
      // training-data-pipeline form of session windows, SQL-oracle-able
      ensureConf(s)
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      val gapUs = 30L * 60 * 1000 * 1000
      val ev = s.read.parquet(s"$dir/events.parquet")
      ev.select(col("user_id"), tsUs(ev).as("ts_us"))
        .withColumn("prev", lag(col("ts_us"), 1).over(byUser))
        .withColumn("new_s",
          when(col("prev").isNull || col("ts_us") - col("prev") > gapUs, 1).otherwise(0))
        .withColumn("sid", sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_events"),
          ((min(col("ts_us")).cast("decimal(38,0)") / lit(1000)).cast("long")).as("start_ms"),
          ((max(col("ts_us")).cast("decimal(38,0)") / lit(1000)).cast("long")).as("end_ms"))
        .orderBy(col("user_id"), col("sid"))
    }),
    // large-x-large join under key skew: fact side salted, dim side
    // replicated across the salts, shuffle-hash hinted — row-identical to
    // the plain join (and to the oracle), but a hot user spreads over 32
    // reducers instead of serializing one
    "q19_salted_join" -> ((s, dir) => {
      ensureConf(s)
      val ev = s.read.parquet(s"$dir/events.parquet")
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      Skew.saltedJoin(ev, cust, "user_id", col("event_id"), 32)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(floor(col("value") * lit(1e6) + lit(0.5))).cast("double") / lit(1e6), 6)
            .as("sum_value"))
        .orderBy(col("c_mktsegment"))
    }),
    // relational pivot: per-user-bucket event-type matrix (missing combos
    // coalesced to 0 so tiny SFs stay null-free for the hash gate)
    "q20_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = s.read.parquet(s"$dir/events.parquet")
        .groupBy(pmod(col("user_id"), lit(10L)).as("user_bucket"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      p.select(col("user_bucket") +:
        types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("user_bucket"))
    }),
    "q21_json_extract" -> ((s, dir) =>
      // semi-structured payload extraction: events.props is a JSON string;
      // get_json_object runs at the scan (codegen'd path expression, no
      // UDF), the aggregate uses an integer-scaled sum so the hash compare
      // is immune to float addition order
      s.read.parquet(s"$dir/events.parquet")
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
          floor(col("value") * lit(1000)).cast("long").as("mv"))
        .groupBy((col("k") % lit(10)).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("mv")).as("sum_mv"))
        .orderBy(col("k_bucket"))),
    "q12_series_compare" -> ((s, dir) => {
      // reference Series.compare: positional diff of two aligned runs
      ensureConf(s)
      val ev = s.read.parquet(s"$dir/events.parquet")
      val left = ev.select(col("ts"), col("value"))
      val right = ev.select(col("ts"),
        when(col("event_type") === "click", col("value") * 2).otherwise(col("value")).as("value"))
      SeriesCompare.compare(left, right, "value", Seq("ts")).orderBy(col("pos"))
    }),
    "q13_round" -> ((s, dir) => {
      // reference scalar rounding (comparison_ctrader.ipynb: round(x, 5))
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") / lit(7.0), 5).as("rounded_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("rounded_price"))
        .limit(200)
    }),
    "renko_by_user" -> ((s, dir) => {
      // wide multi-series scan: one independent renko per user_id (~150
      // parallel series — the scale axis at cluster size)
      ensureConf(s)
      val ticks = s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), col("ts").as("datetime"), col("value").as("close"))
      emissionOrdered(RenkoModes.project(Renko.fromTicks(ticks, EventBrick,
        symbolCol = Some("user_id"), tsUnit = "ns"), "wicks"))
    }),

    // --- deduplication (beyond-reference pipeline operators)
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(s.read.parquet(s"$dir/documents.parquet")).orderBy(col("doc_id"))),
    // plain shingle join beats prefix filtering below ~10^5 docs (the freq
    // ranking overhead dominates); ngramJaccardPairsPrefix is the
    // result-identical large-corpus path (equivalence-tested)
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(s.read.parquet(s"$dir/documents.parquet"), 0.5)
        .orderBy(col("id_a"), col("id_b"))),
    // the hot-bucket valve ORACLE-GATED (VERDICT r16 #5): an adversarial
    // corpus slice — every doc_id % 10 == 3 replaced by ONE fixed
    // boilerplate line, so every band maps ~10% of the corpus into a
    // single (band, bucket) key — run with the cap ON. Hot buckets degrade
    // to star edges (components preserved), and the output carries the
    // EXACT skipped-pair count; the oracle replays the size-gated bucket
    // pipeline including that count, so the trim's contract is
    // driver-gate-pinned, not just ScalaTest-pinned
    "dedup_minhash_lsh_capped" -> ((s, dir) => {
      val adv = s.read.parquet(s"$dir/documents.parquet")
        .withColumn("text",
          when(col("doc_id") % 10 === 3, lit(PipelineOracleSql.LshBoilerLine))
            .otherwise(col("text")))
      Dedup.minhashLshPairsCappedAudit(adv, 0.8, hotBucketCap = 16)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(s.read.parquet(s"$dir/documents.parquet"), 0.8)
        .orderBy(col("id_a"), col("id_b"))),
    // continuous-ingestion shape: the "new batch" (an SF-independent 25%
    // slice) admission-checked against the corpus snapshot it joins
    "dedup_incremental" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Dedup.minhashIncrementalPairs(
        d.filter(col("doc_id") % 4 =!= 3), d.filter(col("doc_id") % 4 === 3), 0.8)
        .orderBy(col("doc_id"), col("dup_of"))
    }),
    // batch replay of the streaming near-dup admission front door: the
    // corpus arrives as three doc_id%3 epochs, each admission-checked
    // against everything admitted before it. The fold IS the stream,
    // including its store shape: the bucket snapshot accumulates with the
    // admitted docs and each epoch probes it PREBUCKETED, so the store is
    // signatured once at admission, never re-derived per epoch (the
    // admitBatch form recomputed store signatures every epoch — measurably
    // slower and not what the stream executes)
    "dedup_admission_replay" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
      var store: Option[(DataFrame, DataFrame)] = None
      val perEpoch = (0 until 3).map { e =>
        val batch = d.filter(pmod(col("doc_id"), lit(3L)) === lit(e.toLong))
        val (admLazy, bb) =
          graft.streaming.NearDupAdmission.admitBatchWithBuckets(store, batch, 0.8)
        val adm = admLazy.localCheckpoint(false)
        // bucket rows are a semi-join filter of the decision's own bucket
        // table — the epoch is signatured once, exactly like the stream
        val admBuckets = graft.streaming.NearDupAdmission.bucketsOfAdmitted(bb, adm)
        store = Some(store match {
          case Some((sd, sb)) => (sd.unionByName(adm), sb.unionByName(admBuckets))
          case None => (adm, admBuckets)
        })
        adm.select(col("doc_id"), lit(e).as("epoch"))
      }
      perEpoch.reduce(_.unionByName(_)).orderBy(col("doc_id"))
    }),
    // batch replay of the streaming token-budget gate: the corpus arrives
    // as three doc_id%3 epochs, each admitted against the per-stratum
    // consumed totals the earlier epochs left behind — admission order is
    // exactly (epoch, doc_id) per stratum, so the oracle is ONE windowed
    // cumulative sum over that order
    "sample_budget_stream" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("text"))
      var consumed = Map.empty[String, Long]
      val perEpoch = (0 until 3).map { e =>
        val batch = d.filter(pmod(col("doc_id"), lit(3L)) === lit(e.toLong))
        val adm = graft.streaming.BudgetAdmission
          .admitBatch(consumed, batch, budget = 2000L, strataCol = "lang")
          .localCheckpoint(false)
        // per-stratum consumed totals = each stratum's last admitted cum —
        // a strata-sized collect, the same driver-resident state the
        // stream keeps per key
        consumed = consumed ++ adm.groupBy("stratum").agg(max("cum_tokens").as("c"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        adm.withColumn("epoch", lit(e))
      }
      perEpoch.reduce(_.unionByName(_)).orderBy(col("doc_id"))
    }),
    "dedup_simhash" -> ((s, dir) =>
      // 11 sits inside the corpus's hamming separation gap (dups 1-9,
      // non-dups >= 14), giving recall 1.0 with zero false pairs
      Dedup.simhashPairs(s.read.parquet(s"$dir/documents.parquet"), 11)
        .orderBy(col("id_a"), col("id_b"))),
    "dedup_clusters" -> ((s, dir) =>
      Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(s.read.parquet(s"$dir/documents.parquet"), 0.5))
        .orderBy(col("doc_id"))),
    // the decision layer on top of the clusters: keep the highest-priority
    // source per cluster (ties -> smallest id), drop-list the rest
    "dedup_keepers" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val prio = when(col("source") === "src0", 3)
        .when(col("source") === "src1", 2)
        .when(col("source") === "src2", 1).otherwise(0)
      Dedup.canonicalKeepers(d, Dedup.ngramJaccardPairs(d, 0.5), prio)
        .orderBy(col("doc_id"))
    }),
    "dedup_embedding_pairs" -> ((s, dir) =>
      Similarity.topCosinePairs(s.read.parquet(s"$dir/embeddings.parquet"), 20)),
    // the threshold (near-dup) form, on its LSH-candidate scale path — the
    // oracle replays the same bucket pipeline, so recall is verified too
    "dedup_cosine_neardup" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(s.read.parquet(s"$dir/embeddings.parquet"), 0.42)
        .orderBy(col("id_a"), col("id_b"))),
    // SemDeDup: cluster-bounded semantic dedup — nearest lowest-id
    // centroid, drop any vector with a smaller-id τ-similar neighbor in
    // the same cluster; the oracle replays assignment, the within-cluster
    // pair scan, and the keeper rule
    "dedup_semantic" -> ((s, dir) =>
      Similarity.semanticDedup(s.read.parquet(s"$dir/embeddings.parquet"), 0.42)
        .orderBy(col("vec_id"))),

    // --- similarity search
    "sim_topk_bruteforce" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    // multimodal -> vector search, composed end to end: stub media features
    // feed the same ANN operator the embedding table uses. Cosine is ranked
    // over the INTEGER lane values (x1000 recovers them exactly; scale
    // cancels in cosine), so the whole chain stays engine-exact
    "mm_similar_media" -> ((s, dir) => {
      val f = Multimodal.extractFeatures(
        Multimodal.asMedia(s.read.parquet(s"$dir/documents.parquet"))).toDF()
      val lanes = (0 until 8).map(j =>
        round(element_at(col("embedding"), j + 1) * 1000).cast("double"))
      val emb = f.select(col("doc_id").as("vec_id"), array(lanes: _*).as("embedding"))
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    // int8-quantized candidate scan + exact rerank: the 4x-memory-ladder
    // rung; the oracle replays quantization, candidate cut, and rerank
    "sim_topk_quantized" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 10), 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    "sim_topk_lsh" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), 5, multiProbe = 3)
        .orderBy(col("query_id"), col("rank"))
    }),
    "sim_topk_ivf" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    // the recall curve an IVF deployment is tuned by: micro-averaged
    // recall@5 vs brute-force ground truth at nprobe 1/2/4/8 — the
    // latency-vs-quality trade, measured in-engine
    "sim_topk_ivf_recall" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val qs = emb.filter(col("vec_id") < 10)
      val bf = Similarity.bruteForceTopK(emb, qs, 5)
      Seq(1, 2, 4, 8).map { np =>
        Similarity.recallAtK(Similarity.ivfTopK(emb, qs, 5, nprobe = np), bf)
          .withColumn("nprobe", lit(np.toLong))
      }.reduce(_.unionByName(_))
        .select(col("nprobe"), col("n_true"), col("n_found"), col("recall"))
        .orderBy(col("nprobe"))
    }),
    // the write-once/probe-many form: build the cid-partitioned index, then
    // answer the same probe from the persisted layout (partition-pruned
    // scan of nprobe lists). Same oracle as sim_topk_ivf — the index is
    // bit-transparent.
    "sim_topk_ivf_indexed" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_index_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.write(emb, path)
      IvfIndex.probe(s, path, emb.filter(col("vec_id") < 10), 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    // FILTERED vector search: the build persists the label column into
    // the inverted lists (keepCols) and the probe takes a metadata
    // predicate applied to the list rows BEFORE ranking — top-k among
    // matching vectors, the filter evaluated at the pruned list scan
    // (plain comparisons reach PushedFilters), never a post-rank re-query
    "sim_topk_ivf_filtered" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_flt_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.write(emb, path, keepCols = Seq("label"))
      IvfIndex.probe(s, path, emb.filter(col("vec_id") < 10), 5,
        predicate = Some(pmod(col("label"), lit(2)) === 0))
        .orderBy(col("query_id"), col("rank"))
    }),
    // the GROWING-corpus form: build the index on the first 400 vectors,
    // append the remaining 100 as a committed epoch under the frozen
    // centroids, probe the union. The initial corpus contains every
    // lowest-id vector, so the frozen centroids equal the full-corpus
    // centroids and the same ivfTopK oracle replays the probe exactly —
    // the append path is bit-transparent
    "sim_topk_ivf_appended" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_app_${Integer.toHexString(dir.hashCode)}"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      // append accretes epochs: a stale dir from a previous run would
      // double-serve its vectors, so the build starts from nothing
      if (fs.exists(p)) fs.delete(p, true)
      IvfIndex.write(emb.filter(col("vec_id") < 400), path)
      IvfIndex.append(emb.filter(col("vec_id") >= 400), path)
      IvfIndex.probe(s, path, emb.filter(col("vec_id") < 10), 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    // the SERVE-AFTER-DELETE form: full build, tombstone-delete the
    // vec_id%7==3 slice, probe — deleted vectors must never be returned
    // while the frozen coarse quantizer (and so the probed-list choice)
    // stays the full build's. The oracle serves the filtered corpus under
    // the full corpus's centroids.
    "sim_topk_ivf_deleted" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_del_${Integer.toHexString(dir.hashCode)}"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      // deletes accrete tombstone epochs: a stale dir would mask extra ids
      if (fs.exists(p)) fs.delete(p, true)
      IvfIndex.write(emb, path)
      IvfIndex.delete(emb.filter(col("vec_id") % 7 === 3).select("vec_id"), path)
      IvfIndex.probe(s, path, emb.filter(col("vec_id") < 10), 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    // the EPOCH-ACCRETION form: base build on the low-id half (so the
    // frozen centroids equal the full-corpus convention), TEN append
    // epochs over the rest, a tombstone delete — the worst maintained
    // serving state before compaction. Probe planning pays ONE merged
    // meta/tombstone read regardless of epoch count; the same
    // filtered-corpus oracle as the single-delete form replays it because
    // df/n_docs and list contents are additive across epochs
    "sim_topk_ivf_epochs" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = buildEpochIvfIndex(s, dir, "ep")
      IvfIndex.probe(s, path, emb.filter(col("vec_id") < 10), 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    // the STREAMING-ingest form: the index is grown by a 3-batch fold of
    // IvfIngest.ingestBatch (bootstrap + two deterministic epochs) — the
    // exact function the foreachBatch stream applies per micro-batch. The
    // first batch holds every lowest-id vector, so the frozen centroids
    // equal the full build's and the same ivfTopK oracle replays the probe
    "sim_topk_ivf_streamed" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_str_${Integer.toHexString(dir.hashCode)}"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      graft.streaming.IvfIngest.ingestBatch(emb.filter(col("vec_id") < 250), path, 0L)
      graft.streaming.IvfIngest.ingestBatch(
        emb.filter(col("vec_id") >= 250 && col("vec_id") < 400), path, 1L)
      graft.streaming.IvfIngest.ingestBatch(emb.filter(col("vec_id") >= 400), path, 2L)
      IvfIndex.probe(s, path, emb.filter(col("vec_id") < 10), 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    // the quantized index: int8 inverted lists for the candidate scan (4x
    // fewer hot bytes), exact float rerank of candFactor*k candidates —
    // SQ8-and-refine; the oracle replays assignment, quantization, the
    // in-list candidate cut, and the rerank
    "sim_topk_ivf_sq8" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_sq8_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.writeQuantized(emb, path)
      IvfIndex.probeQuantized(s, path, emb.filter(col("vec_id") < 10), 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    // FILTERED SQ8 serving: the metadata predicate restricts BOTH the
    // int8 candidate preselect and the float rerank to matching rows,
    // applied at the pruned list scan — filtered search on the memory
    // ladder, same view-not-removal semantics as the float path
    "sim_topk_ivf_sq8_filtered" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_sq8f_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.writeQuantized(emb, path, keepCols = Seq("label"))
      IvfIndex.probeQuantized(s, path, emb.filter(col("vec_id") < 10), 5,
        predicate = Some(pmod(col("label"), lit(2)) === 0))
        .orderBy(col("query_id"), col("rank"))
    }),
    // the PQ rung: 8 one-byte codes per 64-dim vector (32x fewer candidate
    // bytes than float32), ADC estimate against the deterministic
    // lowest-id codebook, exact float rerank; the oracle replays encode,
    // reconstruction, candidate cut, and rerank
    "sim_topk_ivf_pq" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_pq_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.writePq(emb, path)
      IvfIndex.probePq(s, path, emb.filter(col("vec_id") < 10), 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    // TRAINED PQ codebook (VERDICT r15 #7): per-subspace deterministic
    // Lloyd (2 iterations, donor-seeded, micro-quantized integer means —
    // oracle-replayable) tightens the ADC estimate at the same candFactor;
    // IvfIndexSpec pins recall@5 >= the untrained curve at the 8x cut
    "sim_topk_ivf_pq_trained" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_pqt_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.writePq(emb, path, pqTrainIters = 2)
      IvfIndex.probePq(s, path, emb.filter(col("vec_id") < 10), 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    // FILTERED PQ serving: the ADC candidate scan and the float rerank
    // both see only matching rows — completes filtered search across the
    // whole memory ladder (float / SQ8 / PQ)
    "sim_topk_ivf_pq_filtered" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_pqf_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.writePq(emb, path, keepCols = Seq("label"))
      IvfIndex.probePq(s, path, emb.filter(col("vec_id") < 10), 5,
        predicate = Some(pmod(col("label"), lit(2)) === 0))
        .orderBy(col("query_id"), col("rank"))
    }),

    // --- text analysis
    "text_quality" -> ((s, dir) =>
      TextAnalysis.quality(s.read.parquet(s"$dir/documents.parquet")).orderBy(col("doc_id"))),
    "text_langid" -> ((s, dir) =>
      TextAnalysis.langId(s.read.parquet(s"$dir/documents.parquet")).orderBy(col("doc_id"))),
    // Unicode canonicalization (native NFC expression + control strip +
    // whitespace collapse): the corpus is ASCII-clean, so each doc gets a
    // deliberately denormalized wrapper — a combining-acute Cafe<U+0301>,
    // a BEL control, tab runs, trailing CRLF — and the oracle replays the
    // identical pass via DuckDB's nfc_normalize and the same RE2 regexes
    "text_normalize" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val messy = docs.withColumn("text",
        concat(lit("Café doc:\t\t"), col("text"), lit(" \r\n")))
      TextAnalysis.normalize(messy)
        .select(col("doc_id"), col("text").as("norm_text"),
          length(col("text")).cast("long").as("n_chars_norm"))
        .orderBy(col("doc_id"))
    }),
    // script profile (codepoint-class counts + dominant-script argmax):
    // the ASCII corpus gets a multi-script tail so every class is live;
    // the oracle replays the identical RE2 character classes
    "text_script" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val tagged = docs.withColumn("text",
        concat(col("text"), lit(" 汉字漢字 Русский текст 123")))
      TextAnalysis.scriptProfile(tagged).orderBy(col("doc_id"))
    }),
    // the Gopher rule battery: the standard pre-model web-curation gate
    // (token bounds, word-length band, symbol/alpha ratios, stopword hits)
    "text_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(s.read.parquet(s"$dir/documents.parquet"))
        .orderBy(col("doc_id"))),
    "text_token_stats" -> ((s, dir) =>
      TextAnalysis.tokenStats(s.read.parquet(s"$dir/documents.parquet")).orderBy(col("doc_id"))),
    "text_winnow" -> ((s, dir) =>
      TextAnalysis.winnowedFingerprints(s.read.parquet(s"$dir/documents.parquet"))
        .orderBy(col("doc_id"))),
    "text_winnow_neardup" -> ((s, dir) =>
      TextAnalysis.winnowNearDupPairs(s.read.parquet(s"$dir/documents.parquet"))
        .orderBy(col("id_a"), col("id_b"))),
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetition(s.read.parquet(s"$dir/documents.parquet"))
        .orderBy(col("doc_id"))),
    // deterministic training-mixture draw: per-language keep rates, the
    // decision a pure function of (seed, doc_id) — reproducible and
    // engine-replicable (no RNG, no partition-order dependence)
    "sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedSample(
        s.read.parquet(s"$dir/documents.parquet"), "lang",
        Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.1), defaultFrac = 0.05)
        .select(col("doc_id"), col("lang")).orderBy(col("doc_id"))),
    "text_length_quantiles" -> ((s, dir) =>
      TextAnalysis.lengthQuantiles(s.read.parquet(s"$dir/documents.parquet"))
        .orderBy(col("source"))),
    // length-balanced eval draw: 5 docs per (source, length tercile), the
    // terciles cut at each source's own exact p50/p90
    "sample_length_stratified" -> ((s, dir) =>
      Sampling.lengthStratifiedSample(
        s.read.parquet(s"$dir/documents.parquet"), k = 5)
        .orderBy(col("doc_id"))),
    // perplexity-proxy filter: avg add-one bigram log-likelihood under the
    // corpus's own statistics; integer-quantized log terms make the score
    // bit-stable under any partitioning
    "text_lm_score" -> ((s, dir) =>
      TextAnalysis.lmScore(s.read.parquet(s"$dir/documents.parquet"))
        .orderBy(col("doc_id"))),
    // the C4/RefinedWeb boilerplate census: 3-token blocks recurring in
    // >= 5 distinct documents (site chrome, license headers) — one
    // count-distinct shuffle, output sized by the hot vocabulary
    "text_boilerplate" -> ((s, dir) =>
      TextAnalysis.boilerplateStats(
        s.read.parquet(s"$dir/documents.parquet"), blockWords = 3, minDocs = 5)
        .orderBy(col("blk"))),
    // the rewrite the census motivates: EVERY occurrence of a hot block
    // is dropped (unlike dedup_blocks' keep-first) and the text re-stitched
    "text_boilerplate_removal" -> ((s, dir) =>
      TextAnalysis.boilerplateRemove(
        s.read.parquet(s"$dir/documents.parquet"), blockWords = 3, minDocs = 5)
        .orderBy(col("doc_id"))),
    // the STREAMING form: a 3-epoch fold where each batch is cleaned
    // against the POST-merge cumulative block counts — hot-in-this-batch
    // already condemns this batch, earlier emissions are never retracted;
    // the oracle collapses the fold into a per-epoch cumulative window
    "text_boilerplate_stream" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      var seen: Option[DataFrame] = None
      val perEpoch = (0 until 3).map { e =>
        val batch = docs.filter(pmod(col("doc_id"), lit(3L)) === lit(e.toLong))
        val (out, store) = TextAnalysis.boilerplateRemoveIncremental(
          seen, batch, blockWords = 3, minDocs = 5)
        // pinned: the store is re-read by every later epoch
        seen = Some(store.localCheckpoint(true))
        out.withColumn("epoch", lit(e.toLong))
      }
      perEpoch.reduce(_.unionByName(_)).orderBy(col("doc_id"))
    }),
    "text_top_terms" -> ((s, dir) =>
      TextAnalysis.topTerms(s.read.parquet(s"$dir/documents.parquet"), k = 5)
        .orderBy(col("source"), col("rank"))),
    // tokenizer training as a corpus operator: 6 BPE merge rounds learned
    // from the word dictionary, the greedy application replayed
    // relationally (match islands + parity) so the oracle checks every
    // round bit-for-bit
    "text_bpe_merges" -> ((s, dir) =>
      graft.operators.Bpe.learnMerges(
        s.read.parquet(s"$dir/documents.parquet"), nMerges = 6)
        .orderBy(col("rank"))),
    // the corpus tokenized under that vocabulary: per-doc whitespace word
    // count and BPE token count — the training-budget question
    "text_bpe_tokenize" -> ((s, dir) =>
      graft.operators.Bpe.tokenCounts(
        s.read.parquet(s"$dir/documents.parquet"), nMerges = 6)
        .orderBy(col("doc_id"))),
    // the sketch-served scale path for heavy hitters: count-min estimate
    // (3x32 bucket table, broadcastable at any corpus size) with the exact
    // count alongside so the one-sided error is checked, not assumed
    "text_top_terms_cms" -> ((s, dir) =>
      Sketches.cmsTopTerms(s.read.parquet(s"$dir/documents.parquet"),
        k = 20, depth = 3, width = 32)
        .orderBy(col("rank"))),
    // RefinedWeb-style per-domain cap: at most 40 docs per source, best
    // quality first — the rank filter compiles to WindowGroupLimit so a
    // hot domain pre-prunes map-side
    "sample_source_cap" -> ((s, dir) =>
      Sampling.rankCap(
        TextAnalysis.quality(s.read.parquet(s"$dir/documents.parquet"),
          keep = Seq("source"))
          .select(col("doc_id"), col("source"), col("quality_score")),
        cap = 40, strataCol = "source", scoreCol = "quality_score")
        .orderBy(col("source"), col("cap_rank"))),
    // exact-size eval-set draw: 20 docs per language, deterministic
    "sample_fixed_k" -> ((s, dir) =>
      Sampling.fixedSizeSample(
        s.read.parquet(s"$dir/documents.parquet"), k = 20, strataCol = "lang")
        .select(col("doc_id"), col("lang")).orderBy(col("doc_id"))),
    // stable train/val/test assignment: split = pure function of
    // (seed, doc_id) — never changes as the corpus grows (no re-split
    // test leakage); scan-local CASE over the scrambled hash bucket
    "sample_split" -> ((s, dir) =>
      Sampling.assignSplits(s.read.parquet(s"$dir/documents.parquet"))
        .select(col("doc_id"), col("split")).orderBy(col("doc_id"))),
    // token-space quota draw: first 2500 tokens per language in
    // deterministic hash order (the doc crossing the budget is kept), via
    // the hierarchical exact prefix sum — never one-task-per-stratum
    "sample_token_budget" -> ((s, dir) =>
      Sampling.tokenBudgetSample(
        s.read.parquet(s"$dir/documents.parquet"), budget = 2500L, strataCol = "lang")
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum_tokens"))
        .orderBy(col("doc_id"))),
    // deterministic global training order: exact 1-based permutation rank
    // in scrambled-hash order via the hierarchical rank (no single-task
    // global sort), a pure function of (seed, doc_id)
    "sample_shuffle_order" -> ((s, dir) =>
      Sampling.shufflePosition(s.read.parquet(s"$dir/documents.parquet"))
        .select(col("doc_id"), col("position")).orderBy(col("doc_id"))),
    // leakage-safe split: near-dup cluster members are co-assigned (the
    // split key is the cluster id, falling back to the doc's own id for
    // singletons), so a near-duplicate can never straddle train/test —
    // the contamination mode a per-document split cannot prevent
    "sample_split_grouped" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Sampling.assignSplitsGrouped(d, Dedup.connectedComponents(
          Dedup.ngramJaccardPairs(d, 0.5)))
        .select(col("doc_id"), col("group_key"), col("split"))
        .orderBy(col("doc_id"))
    }),
    // the leakage measurement that motivates the grouped split: near-dup
    // pairs straddling two splits — per-document leaks, grouped is zero
    // by construction
    "sample_split_leakage" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      // the pair set is one expensive similarity join with THREE consumers
      // (components + both straddle branches) — pin it once; the RDD
      // blocks are ContextCleaner-freed when the result is dropped
      val pairs = Dedup.ngramJaccardPairs(d, 0.5).localCheckpoint(true)
      Sampling.splitLeakage(d, pairs, Dedup.connectedComponents(pairs))
        .orderBy(col("scheme"))
    }),
    // Morton z-value of (ts, value): the 2-D clustering key whose
    // contiguous ranges give files tight min/max spans in BOTH dims —
    // built-in bit arithmetic only, scan-local, codegen'd
    "layout_zorder" -> ((s, dir) =>
      Layout.withZValue(layoutEventsBase(s, dir), "x", "y")
        .select(col("event_id"), col("zval")).orderBy(col("event_id"))),
    // per-file zone map of the 64-file z-order layout: exactly the min/max
    // statistics a parquet footer carries — the pruning surface itself
    "layout_zorder_zonemap" -> ((s, dir) =>
      Layout.zoneMap(
        Layout.zOrderAssign(layoutEventsBase(s, dir), "x", "y", 64, "event_id"),
        "x", "y").orderBy(col("file_id"))),
    // the pruning dividend, oracle-checked: a centered quarter-range box
    // on (ts, value) vs the zone maps of the z-order and natural-time
    // layouts — z-order touches ~4x fewer files (both dims bounded per
    // file) where the time layout prunes on ts only
    "layout_zorder_pruning" -> ((s, dir) =>
      Layout.pruningStats(layoutEventsBase(s, dir), "x", "y", 64, "event_id")
        .orderBy(col("layout"))),
    // Hilbert index per event: the native codegen'd graft_hilbert2
    // expression (the per-bit rotation fold rewrites both coordinates per
    // step — a composed Column form would double its tree per bit)
    "layout_hilbert" -> ((s, dir) =>
      Layout.withHilbertValue(layoutEventsBase(s, dir), "x", "y")
        .select(col("event_id"), col("hval")).orderBy(col("event_id"))),
    // three-way pruning: hilbert vs zorder vs natural time — Hilbert's
    // every-step-adjacent walk gives contiguous file ranges spans at
    // least as tight as Morton's
    "layout_hilbert_pruning" -> ((s, dir) =>
      Layout.pruningStats(layoutEventsBase(s, dir), "x", "y", 64, "event_id",
        withHilbert = true).orderBy(col("layout"))),
    // DSIR importance resampling (hashed-ngram log-likelihood ratio vs the
    // bench target + deterministic Gumbel top-k): the published data-
    // selection procedure with the RNG replaced by a replayable hash
    "sample_dsir" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      graft.operators.Selection.dsirSample(
        d.filter(col("doc_id") % 10 =!= 7), d.filter(col("doc_id") % 10 === 7), k = 200)
        .orderBy(col("doc_id"))
    }),
    // in-engine-trained Naive-Bayes quality classifier: positive seed =
    // the bench slice, negative seed = the %10==3 slice, score the rest;
    // integer-quantized log-odds make the scores partition-order-exact
    "text_nb_classifier" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      graft.operators.Selection.nbClassifierScores(
        d.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 3),
        d.filter(col("doc_id") % 10 === 7), d.filter(col("doc_id") % 10 === 3))
        .orderBy(col("doc_id"))
    }),
    // the quality gate's calibration curve: train the NB classifier on
    // half of each seed slice (%20==7 pos / %20==3 neg), score the
    // HELD-OUT halves (%20==17/13), and emit exact cumulative
    // precision/recall at every distinct score threshold — how the
    // curation gate's minScore is actually chosen
    "text_classifier_pr_curve" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val scored = graft.operators.Selection.nbClassifierScores(
        d.filter(col("doc_id") % 20 === 17 || col("doc_id") % 20 === 13),
        d.filter(col("doc_id") % 20 === 7),
        d.filter(col("doc_id") % 20 === 3))
        .withColumn("label", col("doc_id") % 20 === 17)
      graft.operators.Selection.prCurve(scored)
        .orderBy(col("threshold_micro").desc)
    }),
    // temperature mixture draw (n_l^0.5 stratum weights, ~500 docs total):
    // exponent-smoothed multilingual sampling with cross-engine-exact
    // sqrt/integer-division quota arithmetic
    "sample_temperature" -> ((s, dir) =>
      Sampling.temperatureSample(
        s.read.parquet(s"$dir/documents.parquet"), totalDocs = 500L, strataCol = "lang")
        .select(col("doc_id"), col("lang"), col("draw_rank"))
        .orderBy(col("doc_id"))),
    // training export: deterministic shuffle -> round-robin shard deal;
    // the whole assignment is a pure function of (seed, doc_id, nShards)
    "export_shards" -> ((s, dir) =>
      Export.shardAssign(s.read.parquet(s"$dir/documents.parquet"), nShards = 8)
        .select(col("doc_id"), col("position"), col("shard"),
          col("shard_pos"), col("n_tokens"))
        .orderBy(col("doc_id"))),
    // TOKEN-balanced export: snake deal over the token-desc rank — per-
    // shard token mass evens out where round-robin only balances counts
    "export_shards_balanced" -> ((s, dir) =>
      Export.shardAssignTokenBalanced(s.read.parquet(s"$dir/documents.parquet"), nShards = 8)
        .select(col("doc_id"), col("position"), col("shard"),
          col("shard_pos"), col("n_tokens"))
        .orderBy(col("doc_id"))),
    // GROUP-scoped deal: position/shard/shard_pos restart per language, so
    // no shard file ever mixes two groups — the per-split export primitive
    // pipeline_e2e composes, here on its own oracle
    "export_shards_grouped" -> ((s, dir) =>
      Export.shardAssignGrouped(
          s.read.parquet(s"$dir/documents.parquet"), nShards = 4, groupCol = "lang")
        .select(col("doc_id"), col("lang"), col("position"), col("shard"),
          col("shard_pos"), col("n_tokens"))
        .orderBy(col("doc_id"))),
    // the export summary a training job plans from: per-shard doc/token
    // mass + the id at the head of each shard's order
    "export_manifest" -> ((s, dir) =>
      Export.shardManifest(s.read.parquet(s"$dir/documents.parquet"), nShards = 8)
        .orderBy(col("shard"))),
    // the export ACTUALLY WRITTEN as trainer-consumable JSONL shards
    // (partitionBy(shard) layout), then read back through the raw-ingest
    // path: the manifest is recomputed from the shard BYTES, so it equals
    // the assignment-side manifest only if the deal, the JSON encoding,
    // and the shard layout all round-tripped — same oracle as
    // export_manifest
    "export_jsonl_manifest" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_shards_${Integer.toHexString(dir.hashCode)}_$tmpNonce"
      Export.shardAssign(docs, nShards = 8)
        .select(
          to_json(struct(col("doc_id"), col("shard"), col("shard_pos"),
            col("n_tokens"))).as("value"),
          col("shard").as("shard_dir"))
        .write.mode("overwrite").partitionBy("shard_dir").text(path)
      val sch = new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
        .add("shard", org.apache.spark.sql.types.LongType)
        .add("shard_pos", org.apache.spark.sql.types.LongType)
        .add("n_tokens", org.apache.spark.sql.types.LongType)
      val (good, _) = graft.sources.RawIngest.ingestJsonl(s, path, sch)
      good.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          min_by(col("doc_id"), col("shard_pos")).as("first_doc"))
        .orderBy(col("shard"))
    }),
    // RAW JSONL INGEST (SURVEY §2.7, beyond-reference source): the corpus
    // round-trips through the dump format web-scale pipelines start from —
    // one JSON object per line, with a deterministically truncated
    // (malformed) line REPLACING every doc_id % 13 == 5 record. Declared-
    // schema parse (no inference pass over the corpus), PERMISSIVE with
    // quarantine; the good side must carry the FULL text byte-exactly back
    // through JSON escaping
    "source_jsonl_ingest" -> ((s, dir) => {
      val (good, _) = graft.sources.RawIngest.ingestJsonl(
        s, writeJsonlDump(s, dir), docJsonSchema)
      good.orderBy(col("doc_id"))
    }),
    // the quarantine side of the same ingest: nothing undecodable is ever
    // dropped silently — count + byte mass replay from the planted lines,
    // and the source_file guard pins that every quarantined row kept its
    // file provenance
    "source_jsonl_quarantine" -> ((s, dir) => {
      val (_, quar) = graft.sources.RawIngest.ingestJsonl(
        s, writeJsonlDump(s, dir), docJsonSchema)
      quar.filter(col("source_file") =!= lit(""))
        .agg(count(lit(1)).as("n_bad"),
          sum(length(col("raw"))).cast("long").as("bad_bytes"))
    }),
    // the quarantine RE-PROCESSING loop closed end to end (VERDICT r16 #6):
    // a dump whose doc_id % 13 == 5 lines carry a RECOVERABLE corruption
    // (a U+FEFF BOM prefix — shards concatenated with their BOMs intact)
    // is ingested; the quarantine is repaired upstream-style (strip the
    // BOM from `raw`) and re-parsed QUARANTINE-ONLY through the identical
    // declared-schema contract — never re-reading the dump — and the
    // merged corpus must equal the uncorrupted original byte-exactly: the
    // oracle is the documents table itself
    "source_jsonl_reprocess" -> ((s, dir) => {
      val (good, quar) = graft.sources.RawIngest.ingestJsonl(
        s, writeJsonlDumpBom(s, dir), docJsonSchema)
      val repaired = quar.withColumn("raw",
        regexp_replace(col("raw"), "^\uFEFF", ""))
      val (fixedGood, _) =
        graft.sources.RawIngest.reprocessQuarantine(repaired, docJsonSchema)
      good.unionByName(fixedGood).orderBy(col("doc_id"))
    }),
    // weighted mixture materialization with UPSAMPLING: src0 2.2x, src1 1x,
    // src2 0.35x, src3 dropped, everything else 0.5x
    "sample_mixture" -> ((s, dir) =>
      Sampling.mixtureSample(
        s.read.parquet(s"$dir/documents.parquet"), "source",
        Map("src0" -> 2.2, "src1" -> 1.0, "src2" -> 0.35, "src3" -> 0.0),
        defaultWeight = 0.5)
        .select(col("doc_id"), col("source"), col("copy_id"))
        .orderBy(col("doc_id"), col("copy_id"))),
    "text_chunk" -> ((s, dir) =>
      Chunking.chunk(s.read.parquet(s"$dir/documents.parquet"), chunkSize = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_id"))),
    "dedup_spans" -> ((s, dir) =>
      Dedup.dupSpanStats(s.read.parquet(s"$dir/documents.parquet"), k = 8)
        .orderBy(col("doc_id"))),
    // the rewrite the span stats motivate: excise every non-canonical
    // occurrence of a cross-doc duplicated 8-gram (the lowest doc keeps
    // its copy) and re-emit the cleaned text
    "dedup_span_removal" -> ((s, dir) =>
      Dedup.removeDupSpans(s.read.parquet(s"$dir/documents.parquet"), k = 8)
        .orderBy(col("doc_id"))),
    // collision-VERIFIED twins: hash candidates confirmed by direct gram
    // comparison on the flagged slice — exact under the raw k-gram text at
    // any corpus size; the oracle replays them with NO hash at all
    "dedup_spans_verified" -> ((s, dir) =>
      Dedup.dupSpanStatsVerified(s.read.parquet(s"$dir/documents.parquet"), k = 8)
        .orderBy(col("doc_id"))),
    "dedup_span_removal_verified" -> ((s, dir) =>
      Dedup.removeDupSpansVerified(s.read.parquet(s"$dir/documents.parquet"), k = 8)
        .orderBy(col("doc_id"))),
    // the audit trail behind the verified removal: every excised
    // occurrence with its canonical keeper and the gram text as evidence
    "dedup_span_provenance" -> ((s, dir) =>
      Dedup.dupSpanProvenance(s.read.parquet(s"$dir/documents.parquet"), k = 8)
        .orderBy(col("doc_id"), col("pos"))),
    // the STREAMING form: a 3-epoch fold of the incremental admission —
    // each epoch's docs scored against the cumulative gram counts (own
    // epoch included); the oracle collapses the fold into one per-hash
    // cumulative window at each doc's own epoch
    "dedup_spans_stream" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      var seen: Option[DataFrame] = None
      val perEpoch = (0 until 3).map { e =>
        val batch = docs.filter(pmod(col("doc_id"), lit(3L)) === lit(e.toLong))
        val (out, delta) = Dedup.dupSpanStatsIncremental(seen, batch, k = 8)
        // pinned: the store is re-probed by every later epoch
        val pinned = delta.localCheckpoint(true)
        seen = Some(seen match {
          case Some(x) => x.unionByName(pinned)
          case None => pinned
        })
        out.withColumn("epoch", lit(e.toLong))
      }
      perEpoch.reduce(_.unionByName(_)).orderBy(col("doc_id"))
    }),
    // the CCNet/C4 paragraph-hash pass over fixed 8-token blocks: first
    // occurrence of every distinct block survives corpus-wide, later
    // occurrences are dropped and the text re-stitched
    "dedup_blocks" -> ((s, dir) =>
      Dedup.blockDedup(s.read.parquet(s"$dir/documents.parquet"), blockWords = 8)
        .orderBy(col("doc_id"))),
    // the STREAMING form: a 3-epoch fold of the incremental admission —
    // every block seen in an earlier epoch drops, keep-first within the
    // epoch; the oracle collapses the fold into one composite-key min
    "dedup_blocks_stream" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      var seen: Option[DataFrame] = None
      val perEpoch = (0 until 3).map { e =>
        val batch = docs.filter(pmod(col("doc_id"), lit(3L)) === lit(e.toLong))
        val (out, fresh) = Dedup.blockDedupIncremental(seen, batch, blockWords = 8)
        // pinned: the store is re-probed by every later epoch
        val pinned = fresh.localCheckpoint(true)
        seen = Some(seen match {
          case Some(x) => x.unionByName(pinned)
          case None => pinned
        })
        out.withColumn("epoch", lit(e.toLong))
      }
      perEpoch.reduce(_.unionByName(_)).orderBy(col("doc_id"))
    }),
    // the streaming REMOVAL twin: first-seen epoch keeps its copy, later
    // arrivals shed the spans the store owns; within an epoch the batch
    // operator's min-doc keeper rule applies. The oracle collapses the
    // fold into one composite (epoch, doc_id) min per gram hash
    "dedup_span_removal_stream" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      var seen: Option[DataFrame] = None
      val perEpoch = (0 until 3).map { e =>
        val batch = docs.filter(pmod(col("doc_id"), lit(3L)) === lit(e.toLong))
        val (clean, delta) = Dedup.removeDupSpansIncremental(seen, batch, k = 8)
        val pinned = delta.localCheckpoint(true)
        seen = Some(seen match {
          case Some(x) => x.unionByName(pinned)
          case None => pinned
        })
        clean.withColumn("epoch", lit(e.toLong))
      }
      perEpoch.reduce(_.unionByName(_)).orderBy(col("doc_id"))
    }),
    // fixed probe query with one rare term (df 25 at sf0.01) and three
    // common ones — exercises the idf spread
    "text_bm25" -> ((s, dir) =>
      Search.bm25TopK(s.read.parquet(s"$dir/documents.parquet"),
        Seq("dup", "vector", "join", "slow"), k = 20)
        .orderBy(col("rank"))),
    // hybrid retrieval: same BM25 probe fused with the cosine neighbors of
    // vec_id 0 by reciprocal-rank fusion — the standard two-arm production
    // retrieval stack (lexical + semantic) in one query
    "search_hybrid_rrf" -> ((s, dir) =>
      Search.hybridRrfTopK(
        s.read.parquet(s"$dir/documents.parquet"),
        s.read.parquet(s"$dir/embeddings.parquet"),
        Seq("dup", "vector", "join", "slow"), queryVecId = 0L, k = 20)
        .orderBy(col("rank"))),
    // the SERVING form of hybrid retrieval: same lexical arm and fusion,
    // semantic arm answered from the persisted IVF index (partition-pruned
    // probe of nprobe lists) — the oracle replays the IVF pool exactly, so
    // the approximation is checked, not assumed
    "search_hybrid_rrf_indexed" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_hyb_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.write(emb, path)
      Search.hybridRrfTopKIndexed(
        s.read.parquet(s"$dir/documents.parquet"),
        emb.filter(col("vec_id") === 0L), path,
        Seq("dup", "vector", "join", "slow"), k = 20)
        .orderBy(col("rank"))
    }),
    // the LEXICAL serving shape: the same BM25 probe answered from the
    // persisted term-bucket-partitioned inverted index — a partition-pruned
    // postings scan, no corpus tokenization at query time. Bit-transparent,
    // so the brute-force oracle replays it unchanged
    "text_bm25_indexed" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_text_index_${Integer.toHexString(dir.hashCode)}"
      TextIndex.write(docs, path)
      TextIndex.bm25TopK(s, path, Seq("dup", "vector", "join", "slow"), k = 20)
        .orderBy(col("rank"))
    }),
    "text_bm25_tvf" -> ((s, dir) => {
      // the SQL serving surface: the same persisted-index probe planned
      // entirely through `SELECT * FROM graft_bm25(...)`
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_text_tvf_${Integer.toHexString(dir.hashCode)}"
      TextIndex.write(docs, path)
      GraftExtensions.registerTvfs(s)
      s.sql(s"SELECT * FROM graft_bm25('$path', 'dup,vector,join,slow', 20) ORDER BY rank")
    }),
    "sim_topk_ivf_tvf" -> ((s, dir) => {
      // the vector twin: a persisted-IVF ANN probe from SQL
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_tvf_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.write(emb, path)
      emb.filter(col("vec_id") < 10).createOrReplaceTempView("graft_ann_tvf_queries")
      GraftExtensions.registerTvfs(s)
      s.sql(
        s"SELECT * FROM graft_ann('$path', 'graft_ann_tvf_queries', 5, 4) ORDER BY query_id, rank")
    }),
    // TVF auto-dispatch on the index rung: graft_ann over an SQ8 build
    // serves through probeQuantized (detected from the list schema), so
    // one SQL surface covers the whole memory ladder — the SQ8 oracle
    // replays it unchanged
    "sim_topk_ivf_sq8_tvf" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_sq8tvf_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.writeQuantized(emb, path)
      emb.filter(col("vec_id") < 10).createOrReplaceTempView("graft_ann_sq8_queries")
      GraftExtensions.registerTvfs(s)
      s.sql(
        s"SELECT * FROM graft_ann('$path', 'graft_ann_sq8_queries', 5, 4) ORDER BY query_id, rank")
    }),
    // ...and over a PQ build through probePq
    "sim_topk_ivf_pq_tvf" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_pqtvf_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.writePq(emb, path)
      emb.filter(col("vec_id") < 10).createOrReplaceTempView("graft_ann_pq_queries")
      GraftExtensions.registerTvfs(s)
      s.sql(
        s"SELECT * FROM graft_ann('$path', 'graft_ann_pq_queries', 5, 4) ORDER BY query_id, rank")
    }),
    // PLAN-LEVEL filtered search: an outer WHERE on a metadata column is
    // pushed through the serving TVF (ServingFilterPushdown) into the
    // probe — k FILTERED neighbors with the predicate at the pruned list
    // scan, bit-equal to the filter_sql / API-predicate probe, never a
    // post-rank remnant that under-fills k
    "sim_topk_ivf_tvf_pushdown" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_tvfpd_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.write(emb, path, keepCols = Seq("label"))
      emb.filter(col("vec_id") < 10).createOrReplaceTempView("graft_ann_pd_queries")
      GraftExtensions.registerTvfs(s)
      s.sql(
        s"""SELECT query_id, rank, neighbor_id, cos_sim
           |FROM graft_ann('$path', 'graft_ann_pd_queries', 5, 4)
           |WHERE label % 2 = 0 ORDER BY query_id, rank""".stripMargin)
    }),
    // pushdown composes with the TVF's rung auto-dispatch: the same outer
    // WHERE over an SQ8 build becomes probeQuantized's serving predicate
    // (candidate scan AND rescore filtered) — k filtered results under
    // quantized arithmetic, replayed by the SQ8 filtered oracle
    "sim_topk_ivf_sq8_tvf_pushdown" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_sq8tvfpd_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.writeQuantized(emb, path, keepCols = Seq("label"))
      emb.filter(col("vec_id") < 10).createOrReplaceTempView("graft_ann_sq8pd_queries")
      GraftExtensions.registerTvfs(s)
      s.sql(
        s"""SELECT query_id, rank, neighbor_id, cos_sim
           |FROM graft_ann('$path', 'graft_ann_sq8pd_queries', 5, 4)
           |WHERE label % 2 = 0 ORDER BY query_id, rank""".stripMargin)
    }),
    // ...and over a PQ build through probePq's filtered ADC scan + rerank
    "sim_topk_ivf_pq_tvf_pushdown" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_pqtvfpd_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.writePq(emb, path, keepCols = Seq("label"))
      emb.filter(col("vec_id") < 10).createOrReplaceTempView("graft_ann_pqpd_queries")
      GraftExtensions.registerTvfs(s)
      s.sql(
        s"""SELECT query_id, rank, neighbor_id, cos_sim
           |FROM graft_ann('$path', 'graft_ann_pqpd_queries', 5, 4)
           |WHERE label % 2 = 0 ORDER BY query_id, rank""".stripMargin)
    }),
    // a NON-pushable predicate over the serving TVF: subquery conjuncts
    // (IN (SELECT ...)) reference only metadata columns but their .sql
    // form is a plan placeholder that cannot re-parse, so
    // ServingFilterPushdown must leave them ABOVE the node — ordinary
    // post-filter semantics: the unfiltered top-k is computed first, then
    // rows drop (rank gaps survive), never a planner error
    "sim_topk_ivf_tvf_subquery" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_tvfsq_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.write(emb, path, keepCols = Seq("label"))
      emb.filter(col("vec_id") < 10).createOrReplaceTempView("graft_ann_sq_queries")
      emb.createOrReplaceTempView("graft_ann_sq_corpus")
      GraftExtensions.registerTvfs(s)
      s.sql(
        s"""SELECT query_id, rank, neighbor_id, cos_sim
           |FROM graft_ann('$path', 'graft_ann_sq_queries', 5, 4)
           |WHERE label IN (SELECT DISTINCT label FROM graft_ann_sq_corpus
           |                WHERE label % 2 = 0)
           |ORDER BY query_id, rank""".stripMargin)
    }),
    // the subquery post-filter composes with the TVF's rung auto-dispatch:
    // over an SQ8 build the unfiltered quantized top-k is served first,
    // then the non-pushable IN (SELECT ...) drops rows above the node —
    // rank gaps survive, exactly the float rung's semantics
    "sim_topk_ivf_sq8_tvf_subquery" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_sq8tvfsq_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.writeQuantized(emb, path, keepCols = Seq("label"))
      emb.filter(col("vec_id") < 10).createOrReplaceTempView("graft_ann_sq8sq_queries")
      emb.createOrReplaceTempView("graft_ann_sq8sq_corpus")
      GraftExtensions.registerTvfs(s)
      s.sql(
        s"""SELECT query_id, rank, neighbor_id, cos_sim
           |FROM graft_ann('$path', 'graft_ann_sq8sq_queries', 5, 4)
           |WHERE label IN (SELECT DISTINCT label FROM graft_ann_sq8sq_corpus
           |                WHERE label % 2 = 0)
           |ORDER BY query_id, rank""".stripMargin)
    }),
    // ...and over a PQ build: unfiltered ADC probe + exact rerank, then
    // the subquery predicate as an ordinary post-filter
    "sim_topk_ivf_pq_tvf_subquery" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_pqtvfsq_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.writePq(emb, path, keepCols = Seq("label"))
      emb.filter(col("vec_id") < 10).createOrReplaceTempView("graft_ann_pqsq_queries")
      emb.createOrReplaceTempView("graft_ann_pqsq_corpus")
      GraftExtensions.registerTvfs(s)
      s.sql(
        s"""SELECT query_id, rank, neighbor_id, cos_sim
           |FROM graft_ann('$path', 'graft_ann_pqsq_queries', 5, 4)
           |WHERE label IN (SELECT DISTINCT label FROM graft_ann_pqsq_corpus
           |                WHERE label % 2 = 0)
           |ORDER BY query_id, rank""".stripMargin)
    }),
    // the GROWING-corpus form of the lexical index: build on half the
    // corpus, append the rest as a committed epoch — df/n_docs/avgdl are
    // additive, so the probe answers bit-identically to a full rebuild and
    // the same brute-force oracle replays it
    "text_bm25_appended" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_text_app_${Integer.toHexString(dir.hashCode)}"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      // append accretes epochs: a stale dir from a previous run would
      // double-serve its documents, so the build starts from nothing
      if (fs.exists(p)) fs.delete(p, true)
      TextIndex.write(docs.filter(col("doc_id") % 2 === 0), path)
      TextIndex.append(docs.filter(col("doc_id") % 2 === 1), path)
      TextIndex.bm25TopK(s, path, Seq("dup", "vector", "join", "slow"), k = 20)
        .orderBy(col("rank"))
    }),
    // FILTERED lexical search: the build persists the lang column into
    // the posting rows (keepCols), the probe restricts SERVING to
    // lang='en' docs while every statistic (n_docs, avgdl, df) stays the
    // full corpus's — a filter is a view, not a removal; half built,
    // half appended so the epoch metadata-carry path is exercised too
    "text_bm25_filtered" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_text_flt_${Integer.toHexString(dir.hashCode)}"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      TextIndex.write(docs.filter(col("doc_id") % 2 === 0), path, keepCols = Seq("lang"))
      TextIndex.append(docs.filter(col("doc_id") % 2 === 1), path)
      TextIndex.bm25TopK(s, path, Seq("dup", "vector", "join", "slow"), k = 20,
        predicate = Some(col("lang") === "en"))
        .orderBy(col("rank"))
    }),
    // the lexical twin of sim_topk_ivf_tvf_pushdown: WHERE lang='en' over
    // the TVF becomes the serving predicate of the probe (k filtered
    // results; df/n_docs/avgdl stay full-corpus), exercised over the
    // half-written/half-appended index so epoch metadata-carry composes
    // with the plan-level pushdown
    "text_bm25_tvf_pushdown" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_text_tvfpd_${Integer.toHexString(dir.hashCode)}"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      TextIndex.write(docs.filter(col("doc_id") % 2 === 0), path, keepCols = Seq("lang"))
      TextIndex.append(docs.filter(col("doc_id") % 2 === 1), path)
      GraftExtensions.registerTvfs(s)
      s.sql(
        s"""SELECT doc_id, rank, bm25
           |FROM graft_bm25('$path', 'dup,vector,join,slow', 20)
           |WHERE lang = 'en' ORDER BY rank""".stripMargin)
    }),
    // the lexical twin of sim_topk_ivf_tvf_subquery: an IN (SELECT ...)
    // over graft_bm25's metadata column stays a post-filter (subquery
    // predicates never travel as serving SQL) — unfiltered top-20 first,
    // then the filter drops rows, rank gaps survive
    "text_bm25_tvf_subquery" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_text_tvfsq_${Integer.toHexString(dir.hashCode)}"
      TextIndex.write(docs, path, keepCols = Seq("lang"))
      docs.createOrReplaceTempView("graft_bm25_sq_docs")
      GraftExtensions.registerTvfs(s)
      s.sql(
        s"""SELECT doc_id, rank, bm25
           |FROM graft_bm25('$path', 'dup,vector,join,slow', 20)
           |WHERE lang IN (SELECT DISTINCT lang FROM graft_bm25_sq_docs
           |               WHERE lang = 'en')
           |ORDER BY rank""".stripMargin)
    }),
    // the SERVE-AFTER-DELETE form: full build, tombstone-delete the
    // doc_id%7==3 slice, probe — deleted docs leave serving and the
    // corpus stats (df/n_docs/avgdl) shrink to the survivors exactly,
    // so the oracle serves the filtered corpus
    "text_bm25_deleted" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_text_del_${Integer.toHexString(dir.hashCode)}"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      // deletes accrete tombstone epochs: a stale dir would mask extra ids
      if (fs.exists(p)) fs.delete(p, true)
      TextIndex.write(docs, path)
      TextIndex.delete(docs.filter(col("doc_id") % 7 === 3), path)
      TextIndex.bm25TopK(s, path, Seq("dup", "vector", "join", "slow"), k = 20)
        .orderBy(col("rank"))
    }),
    // the EPOCH-ACCRETION form of the lexical index: base + TEN append
    // epochs + a tombstone delete — the worst maintained serving state
    // before compaction. Probe planning pays ONE merged meta read and one
    // tombstone read regardless of epoch count; BM25 stats are additive,
    // so the single-delete oracle replays it unchanged
    "text_bm25_epochs" -> ((s, dir) => {
      val path = buildEpochTextIndex(s, dir, "ep")
      TextIndex.bm25TopK(s, path, Seq("dup", "vector", "join", "slow"), k = 20)
        .orderBy(col("rank"))
    }),
    // the STREAMING-ingest form of the lexical index: a 3-batch fold of
    // the ingest decision (bootstrap, then deterministic append epochs) —
    // additivity makes the result equal a full rebuild, same oracle
    "text_bm25_streamed" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_text_str_${Integer.toHexString(dir.hashCode)}"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      graft.streaming.TextIngest.ingestBatch(docs.filter(col("doc_id") % 3 === 0), path, 0L)
      graft.streaming.TextIngest.ingestBatch(docs.filter(col("doc_id") % 3 === 1), path, 1L)
      graft.streaming.TextIngest.ingestBatch(docs.filter(col("doc_id") % 3 === 2), path, 2L)
      TextIndex.bm25TopK(s, path, Seq("dup", "vector", "join", "slow"), k = 20)
        .orderBy(col("rank"))
    }),
    // the FULLY index-served hybrid stack: lexical arm from the inverted
    // index, semantic arm from the IVF index, same fusion — no corpus scan
    // at query time at all. The lexical arm is bit-transparent and the
    // semantic arm matches the indexed-hybrid probe (same nlist/nprobe), so
    // the indexed-hybrid oracle replays the whole fusion
    "search_hybrid_rrf_served" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val ivfPath = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_srv_${Integer.toHexString(dir.hashCode)}"
      val lexPath = s"${System.getProperty("java.io.tmpdir")}/graft_lex_srv_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.write(emb, ivfPath)
      TextIndex.write(docs, lexPath)
      Search.hybridRrfTopKServed(s, lexPath, ivfPath,
        emb.filter(col("vec_id") === 0L),
        Seq("dup", "vector", "join", "slow"), k = 20)
        .orderBy(col("rank"))
    }),
    "emb_outliers" -> ((s, dir) =>
      Clustering.centroidOutliers(s.read.parquet(s"$dir/embeddings.parquet"), k = 3)
        .orderBy(col("label"), col("rank"))),
    // deterministic distributed Lloyd k-means: lowest-id init, native
    // argmax assignment, exact-integer scaled-mean updates — the coarse-
    // quantizer trainer, oracle-replayed iteration by iteration
    // chunk→document pooling via the native vector-sum AGGREGATE
    // (VectorMicroSum, the repo's first custom TypedImperativeAggregate):
    // whole vectors partial-aggregate map-side, only groups×dim longs
    // shuffle; exploded rows out so the oracle compares scalars
    "emb_mean_pool" -> ((s, dir) =>
      Clustering.meanPool(s.read.parquet(s"$dir/embeddings.parquet"), groupCol = "label")
        .select(col("label"), col("n"), posexplode(col("pooled")).as(Seq("pos", "x")))
        .select(col("label"), col("pos").cast("long").as("pos"), col("x"), col("n"))
        .orderBy(col("label"), col("pos"))),
    "emb_kmeans" -> ((s, dir) =>
      Clustering.kmeansCentroids(s.read.parquet(s"$dir/embeddings.parquet"),
        k = 4, iters = 2)
        .orderBy(col("cid"), col("pos"))),
    // exact corpus covariance of the embedding coordinates in ONE
    // aggregate: each row's upper-triangle products elementwise-summed by
    // the native vector-sum aggregate — d(d+1)/2 + d longs shuffle, never
    // rows x d^2 exploded elements
    "emb_covariance" -> ((s, dir) =>
      Clustering.covariance(s.read.parquet(s"$dir/embeddings.parquet"))
        .orderBy(col("pos_i"), col("pos_j"))),
    // PCA top component: 8 deterministic power iterations on the exact
    // covariance — corpus work is the one aggregate, the d x d matrix is
    // driver-resident (the k-means-centroids contract), every round
    // integer-anchored so the oracle replays the iteration exactly
    "emb_pca" -> ((s, dir) =>
      Clustering.pcaPower(s.read.parquet(s"$dir/embeddings.parquet"), iters = 8)
        .orderBy(col("pos"))),
    // top-2 components by Hotelling deflation over the SAME one-aggregate
    // covariance: component c is 8 power rounds, then C -= lambda v v^T
    // with the quantized emitted pair — the oracle replays every round of
    // both components plus the deflation between them
    "emb_pca_topk" -> ((s, dir) =>
      Clustering.pcaTopK(s.read.parquet(s"$dir/embeddings.parquet"),
          nComponents = 2, iters = 8)
        .orderBy(col("component"), col("pos"))),
    // PCA WHITENING: centered projections onto the top-2 deflation
    // components scaled to unit variance — one moment aggregate + one
    // scan-local codegen'd projection, mean/loadings driver-resident
    "emb_whiten" -> ((s, dir) =>
      Clustering.pcaWhiten(s.read.parquet(s"$dir/embeddings.parquet"),
          nComponents = 2, iters = 8)
        .orderBy(col("vec_id"), col("component"))),
    // STREAMING covariance: each epoch folds its exact integer moment
    // sums into the shared epoch store; integer additivity makes the
    // summed store equal the one-shot corpus aggregate bit-for-bit, so
    // the BATCH covariance oracle replays the streamed answer unchanged
    "emb_covariance_stream" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val storeDir = s"${System.getProperty("java.io.tmpdir")}/graft_embstats_${Integer.toHexString(dir.hashCode)}"
      val p = new org.apache.hadoop.fs.Path(storeDir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      for (e <- 0 until 3)
        graft.streaming.EmbStats.admitEpoch(storeDir,
          emb.filter(pmod(col("vec_id"), lit(3L)) === lit(e.toLong)), e.toLong)
      graft.streaming.EmbStats.covariance(s, storeDir)
        .orderBy(col("pos_i"), col("pos_j"))
    }),
    // top-k PCA over the STREAMED covariance — the deflation chain runs
    // on the store's summed moments, bit-identical to the batch pcaTopK
    "emb_pca_stream" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val storeDir = s"${System.getProperty("java.io.tmpdir")}/graft_embstats_pca_${Integer.toHexString(dir.hashCode)}"
      val p = new org.apache.hadoop.fs.Path(storeDir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      for (e <- 0 until 3)
        graft.streaming.EmbStats.admitEpoch(storeDir,
          emb.filter(pmod(col("vec_id"), lit(3L)) === lit(e.toLong)), e.toLong)
      graft.streaming.EmbStats.pcaTopK(s, storeDir, nComponents = 2, iters = 8)
        .orderBy(col("component"), col("pos"))
    }),
    // Johnson-Lindenstrauss projection 64 -> 16 over the LSH family's
    // deterministic LCG hyperplanes: scan-local, no model, no shuffle
    "emb_project" -> ((s, dir) =>
      Similarity.jlProject(s.read.parquet(s"$dir/embeddings.parquet"))
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          round(col("x"), 9).as("x"))
        .orderBy(col("vec_id"), col("pos"))),
    // the TRAINED-quantizer index: 2 Lloyd iterations tighten the lists
    // under the same frozen-centroid serving discipline; the oracle
    // replays the training and the probe
    "sim_topk_ivf_trained" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_trn_${Integer.toHexString(dir.hashCode)}"
      IvfIndex.write(emb, path, nlist = 16, trainIters = 2)
      IvfIndex.probe(s, path, emb.filter(col("vec_id") < 10), 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    "text_pack" -> ((s, dir) =>
      Chunking.packOffsets(s.read.parquet(s"$dir/documents.parquet"), budget = 512)
        .orderBy(col("source"), col("doc_id"))),
    // Spark's NATIVE session_window aggregation (the streaming-capable form
    // of gaps-and-islands): 2h-gap sessions per user. Spark's session end =
    // last event + gap, so the oracle's islands add the gap to max(ts).
    "events_session_window" -> ((s, dir) => {
      ensureConf(s)
      val ev = s.read.parquet(s"$dir/events.parquet")
      ev
        .withColumn("event_time", timestamp_micros(tsUs(ev)))
        .groupBy(session_window(col("event_time"), "2 hours"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          unix_micros(col("session_window.end")).as("session_end_us"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start_us"))
    }),
    // strictly-ordered conversion funnel signup -> view -> purchase:
    // min-time chaining on the user key, one filtered pass per step
    "events_funnel" -> ((s, dir) => {
      ensureConf(s)
      val ev = s.read.parquet(s"$dir/events.parquet")
      EventAnalytics.funnel(ev, Seq("signup", "view", "purchase"), tsUs(ev))
        .orderBy(col("step"))
    }),
    // the STREAMING funnel: 10-day time-partitioned epochs folded through
    // the per-user frontier state — after each epoch the counts equal the
    // batch funnel over that prefix (the oracle replays the prefixes)
    "events_funnel_stream" -> ((s, dir) => {
      ensureConf(s)
      val ev = s.read.parquet(s"$dir/events.parquet")
      // the sliced source is pinned ONCE: each epoch's batch then reads
      // memory instead of re-scanning the parquet (a real micro-batch
      // arrives once too — r13 floor characterization showed the fold's
      // per-epoch cost was dominated by repeated source scans, not state)
      val withE = ev.withColumn("t_us", tsUs(ev))
        .withColumn("ep", least(lit(2L),
          expr("CAST((t_us - 1704067200000000L) div 864000000000L AS BIGINT)")))
        .localCheckpoint(true)
      var state: Option[DataFrame] = None
      val perEpoch = (0 until 3).map { e =>
        val batch = withE.filter(col("ep") === lit(e.toLong))
        val (_, ns) = EventAnalytics.funnelIncremental(
          state, batch, Seq("signup", "view", "purchase"), col("t_us"))
        // pinned: the state is re-probed by every later epoch — and the
        // emitted counts aggregate the PINNED state, so materializing the
        // final union can never re-execute an epoch's delta+merge
        val nsq = ns.localCheckpoint(true)
        state = Some(nsq)
        EventAnalytics.funnelCounts(nsq, Seq("signup", "view", "purchase"))
          .withColumn("epoch", lit(e.toLong))
      }
      perEpoch.reduce(_.unionByName(_)).orderBy(col("epoch"), col("step"))
    }),
    // the STREAMING cohort retention: the same 10-day epochs folded
    // through (firsts, active-pairs) stores; after each epoch the emitted
    // rollup equals the batch retention over that prefix
    "events_retention_stream" -> ((s, dir) => {
      ensureConf(s)
      val ev = s.read.parquet(s"$dir/events.parquet")
      // same two floor fixes as events_funnel_stream (r13): slice once,
      // and emit counts aggregated over the PINNED stores
      val withE = ev.withColumn("t_us", tsUs(ev))
        .withColumn("ep", least(lit(2L),
          expr("CAST((t_us - 1704067200000000L) div 864000000000L AS BIGINT)")))
        .localCheckpoint(true)
      var state: Option[(DataFrame, DataFrame)] = None
      val perEpoch = (0 until 3).map { e =>
        val batch = withE.filter(col("ep") === lit(e.toLong))
        val (_, ns) = EventAnalytics.retentionIncremental(
          state, batch, col("t_us"))
        // pinned: both stores are re-probed by every later epoch
        val (f, a) = (ns._1.localCheckpoint(true), ns._2.localCheckpoint(true))
        state = Some((f, a))
        EventAnalytics.retentionCounts(f, a).withColumn("epoch", lit(e.toLong))
      }
      perEpoch.reduce(_.unionByName(_))
        .orderBy(col("epoch"), col("cohort_week"), col("week_offset"))
    }),
    // weekly cohort retention in pure integer epoch-week arithmetic:
    // cohort = first-event week, one row per (cohort, active-week offset)
    "events_retention" -> ((s, dir) => {
      ensureConf(s)
      val ev = s.read.parquet(s"$dir/events.parquet")
      EventAnalytics.retentionCohorts(ev, tsUs(ev))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),
    // approximate distinct vocabulary per source via the KMV sketch (k=32 so
    // the ESTIMATE path is live on this corpus, not just the exact path)
    "text_vocab_sketch" -> ((s, dir) =>
      Sketches.kmvDistinctTokens(s.read.parquet(s"$dir/documents.parquet"), k = 32)
        .orderBy(col("source"))),
    // bucketed range join: clicks into the 6-hour-gap VIEW sessions of the
    // same user that contain them. A session stays open for one gap after
    // its last view (timeout padding) — padded same-user sessions remain
    // disjoint (the next session starts MORE than a gap later), so each
    // click matches at most one interval. 1-hour join buckets.
    "events_sessions_range" -> ((s, dir) => {
      ensureConf(s)
      val gapUs = 21600000000L
      val ev = s.read.parquet(s"$dir/events.parquet")
      val e = ev.select(col("event_id"),
        Renko.toEpochMicros(ev.schema("ts").dataType, col("ts"), "ns").as("ts_us"),
        col("user_id"), col("event_type"))
      val views = e.filter(col("event_type") === "view")
      val vw = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      val sessions = views
        .withColumn("prev", lag(col("ts_us"), 1).over(vw))
        .withColumn("is_new",
          when(col("prev").isNull || col("ts_us") - col("prev") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("is_new")).over(
          vw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts_us")).as("session_start"),
          (max(col("ts_us")) + gapUs).as("session_end"))
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      RangeJoin.intervalJoin(clicks, sessions, "user_id", "ts_us",
        "session_start", "session_end", bucketWidth = 3600000000L)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("session_id"), col("session_start"), col("session_end"))
        .orderBy(col("event_id"))
    }),
    // backward as-of join: each click enriched with the user's most recent
    // view at or before it (ts ties -> the view matches; among simultaneous
    // views the largest event_id wins)
    "events_asof" -> ((s, dir) => {
      ensureConf(s)
      val ev = s.read.parquet(s"$dir/events.parquet")
      val e = ev.select(col("event_id"),
        Renko.toEpochMicros(ev.schema("ts").dataType, col("ts"), "ns").as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us", "value")
      val views = e.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts_us", "value")
      // no-match rows surface as -1 sentinels, not NULLs: the gate's
      // hash compare is only proven on null-free numeric columns, and a
      // float NULL round-trips as NaN whose equality is engine-fragile
      AsofJoin.asofBackward(clicks, views, "user_id", "ts_us", "ts_us",
        Seq("event_id", "value"), "event_id")
        .withColumn("asof_event_id", coalesce(col("asof_event_id"), lit(-1L)))
        .withColumn("asof_value", coalesce(col("asof_value"), lit(-1.0)))
        .orderBy(col("event_id"))
    }),
    // the corpus itself is PII-free word text, so the workload plants
    // synthetic PII deterministically (same arithmetic on both engines):
    // emails into every 2nd doc, IPv4s into every 3rd, phones into every
    // 5th — redaction then has real positives AND real negatives to prove
    "text_redact_pii" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val injected = d.select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 2 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 3 === 0,
          concat(lit(" host 10.0."), (col("doc_id") % 256).cast("string"), lit("."),
            (col("doc_id") % 7).cast("string")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" call +1555"), lpad(col("doc_id").cast("string"), 7, "0")))
          .otherwise(lit(""))).as("text"))
      TextAnalysis.redactPii(injected).orderBy(col("doc_id"))
    }),
    // deterministic held-out split standing in for an eval set: docs with
    // doc_id % 10 == 7 are the "benchmark", the rest are the corpus
    "text_decontaminate" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Decontamination.overlapReport(
        d.filter(col("doc_id") % 10 =!= 7), d.filter(col("doc_id") % 10 === 7))
        .orderBy(col("doc_id"))
    }),
    // same semantics through the bloom-prefiltered path (identical output,
    // so it shares the exact variant's oracle): the corpus gram stream is
    // cut at the scan by a driver-built BloomFilterMightContain literal,
    // then the exact join removes the false positives
    "text_decontaminate_bloom" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      // estimatedGrams sized to the actual benchmark slice (~50k grams at
      // sf0.1): each partial aggregate carries a numBits/8-byte sketch, so
      // a lazy over-estimate taxes the build, not the probe
      Decontamination.overlapReportBloom(
        d.filter(col("doc_id") % 10 =!= 7), d.filter(col("doc_id") % 10 === 7),
        estimatedGrams = 65536L)
        .orderBy(col("doc_id"))
    }),
    // the surgical decontamination form: excise benchmark-overlapping
    // 8-gram SPANS and keep the rest of the document (the doc-drop form
    // above is the blunt instrument); same rewrite contract as
    // dedup_span_removal, benchmark grams broadcast
    "text_decontaminate_spans" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Decontamination.decontaminateSpans(
        d.filter(col("doc_id") % 10 =!= 7), d.filter(col("doc_id") % 10 === 7))
        .orderBy(col("doc_id"))
    }),
    // collision-verified decontamination: every hash match confirmed
    // against the benchmark gram TEXT before excision — the oracle joins
    // on the raw gram (no hash), i.e. exact-substring ground truth
    "text_decontaminate_spans_verified" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Decontamination.decontaminateSpansVerified(
        d.filter(col("doc_id") % 10 =!= 7), d.filter(col("doc_id") % 10 === 7))
        .orderBy(col("doc_id"))
    }),
    // contamination audit trail: every quoted occurrence with its lowest
    // benchmark witness doc and the quote itself; oracle joins on the raw
    // gram text (no hash)
    "text_contamination_provenance" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Decontamination.contaminationProvenance(
        d.filter(col("doc_id") % 10 =!= 7), d.filter(col("doc_id") % 10 === 7))
        .orderBy(col("doc_id"), col("pos"))
    }),
    // the composed curation pipeline end-to-end: quality+langid filter →
    // decontaminate vs the doc_id%10=7 eval slice → LSH near-dup drop →
    // per-language mixture draw. One oracle checks the whole chain.
    "pipeline_curate" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Curation.curate(
        d.filter(col("doc_id") % 10 =!= 7), d.filter(col("doc_id") % 10 === 7),
        minTokens = 30L, minQuality = 0.5,
        langFracs = Map("en" -> 0.9, "de" -> 0.5, "zh" -> 0.3), defaultFrac = 0.4)
        .orderBy(col("doc_id"))
    }),
    // the waterfall over the same chain: per-stage surviving doc/token
    // counts, the report read before arguing about any single gate
    "pipeline_curate_funnel" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Curation.curateFunnel(
        d.filter(col("doc_id") % 10 =!= 7), d.filter(col("doc_id") % 10 === 7),
        minTokens = 30L, minQuality = 0.5,
        langFracs = Map("en" -> 0.9, "de" -> 0.5, "zh" -> 0.3), defaultFrac = 0.4)
        .orderBy(col("stage"))
    }),
    // the curate chain with the Gopher rule battery layered on the
    // heuristic floor — the standard pre-model web-curation gate as a
    // pipeline stage, the whole chain still under one oracle
    "pipeline_curate_gopher" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Curation.curate(
        d.filter(col("doc_id") % 10 =!= 7), d.filter(col("doc_id") % 10 === 7),
        minTokens = 30L, minQuality = 0.5,
        langFracs = Map("en" -> 0.9, "de" -> 0.5, "zh" -> 0.3), defaultFrac = 0.4,
        gopherGate = true)
        .orderBy(col("doc_id"))
    }),
    // the curate chain with the LEARNED quality gate (stage 1b): the NB
    // classifier trained on (bench slice, %10==3 slice) seeds screens the
    // heuristic survivors before any gram join — the fastText/CCNet-style
    // filter as a pipeline stage, the whole chain under one oracle
    "pipeline_curate_classified" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Curation.curate(
        d.filter(col("doc_id") % 10 =!= 7), d.filter(col("doc_id") % 10 === 7),
        minTokens = 30L, minQuality = 0.5,
        langFracs = Map("en" -> 0.9, "de" -> 0.5, "zh" -> 0.3), defaultFrac = 0.4,
        classifierSeeds = Some((
          d.filter(col("doc_id") % 10 === 7), d.filter(col("doc_id") % 10 === 3))))
        .orderBy(col("doc_id"))
    }),
    // the pipeline END TO END as one oracle-checked artifact (VERDICT r14
    // #3): curate gates (annotate → heuristic floor → decontaminate →
    // 0.8-MinHash keep-lowest dedup → mixture draw) → near-dup FAMILY
    // clusters at the looser 0.5 n-gram Jaccard over the survivors (the
    // leakage channel the 0.8 dedup does not close) → leakage-safe grouped
    // split → per-split round-robin shard deal → the end manifest a
    // training job reads: (split, shard, n_docs, n_tokens, first_doc)
    // with the measured cross-split near-dup straddle count, which the
    // grouped split pins to 0 BY CONSTRUCTION — the manifest certifies
    // its own contamination safety
    "pipeline_e2e" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val corpus = d.filter(col("doc_id") % 10 =!= 7)
      val bench = d.filter(col("doc_id") % 10 === 7)
      // pin each expensive stage once: curated feeds the text rejoin, the
      // split, and (transitively) the leakage probe
      val curated = Curation.curate(
        corpus, bench, minTokens = 30L, minQuality = 0.5,
        langFracs = Map("en" -> 0.9, "de" -> 0.5, "zh" -> 0.3), defaultFrac = 0.4)
        .localCheckpoint(true)
      val survivorText = corpus.select(col("doc_id"), col("text"))
        .join(curated.select(col("doc_id")), Seq("doc_id"), "left_semi")
      val pairs = Dedup.ngramJaccardPairs(survivorText, 0.5).localCheckpoint(true)
      val split = Sampling.assignSplitsGrouped(
        curated, Dedup.connectedComponents(pairs)).localCheckpoint(true)
      val manifest = Export
        .shardAssignGrouped(split, 4, "split", tokensCol = Some("n_tokens"))
        .groupBy(col("split"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
          min_by(col("doc_id"), col("shard_pos")).as("first_doc"))
      val sa = split.select(col("doc_id").as("id_a"), col("split").as("__sa"))
      val sb = split.select(col("doc_id").as("id_b"), col("split").as("__sb"))
      val leak = pairs.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
        .agg(coalesce(sum(when(col("__sa") =!= col("__sb"), 1L).otherwise(0L)),
          lit(0L)).as("straddling_pairs"))
      manifest.crossJoin(broadcast(leak)).orderBy(col("split"), col("shard"))
    }),
    // the SAME chain made RESTARTABLE (VERDICT r16 #3), and the entry
    // itself witnesses the restart: run 1 is killed (injected) after the
    // expensive curate + pair stages COMMIT to the stage store; run 2, in
    // the same runDir, RESUMES those stages from their committed parquet
    // (asserted — zero recompute of finished work) and computes only the
    // split + manifest. The served manifest therefore comes from an
    // actually-resumed run, and its oracle is pipeline_e2e's own — resumed
    // == uninterrupted, driver-gate-pinned. Kill-mid-WRITE recovery
    // (marker-less partial dirs) is witnessed in StageStoreSpec and the
    // PipelineStress kill/restart arm.
    "pipeline_e2e_resume" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val corpus = d.filter(col("doc_id") % 10 =!= 7)
      val bench = d.filter(col("doc_id") % 10 === 7)
      val langFracs = Map("en" -> 0.9, "de" -> 0.5, "zh" -> 0.3)
      val runDir = s"${System.getProperty("java.io.tmpdir")}/graft_e2e_resume_" +
        s"${Integer.toHexString(dir.hashCode)}_${tmpNonce}_${resumeRunTick.getAndIncrement()}"
      val killed = new graft.util.StageStore(s, runDir)
      try {
        Curation.e2eResumable(corpus, bench, killed, inputKey = dir,
          langFracs = langFracs, defaultFrac = 0.4, failAfter = Some("pairs"))
        ()
      } catch { case _: graft.util.StageStore.InjectedKill => () }
      val restarted = new graft.util.StageStore(s, runDir)
      val out = Curation.e2eResumable(corpus, bench, restarted, inputKey = dir,
        langFracs = langFracs, defaultFrac = 0.4)
      require(restarted.resumed.toSeq == Seq("curated", "pairs") &&
        restarted.computed.toSeq == Seq("split", "manifest"),
        s"restart must resume finished stages and compute the rest, got " +
          s"resumed=${restarted.resumed} computed=${restarted.computed}")
      out.orderBy(col("split"), col("shard"))
    }),
    // batch replay of the STREAMING curation front door: the corpus
    // arrives as three doc_id%3 epochs, each run through the full chain
    // (annotate+filter → decontaminate → near-dup admit vs the admitted
    // store → per-language budget gate resuming from the consumed totals
    // earlier epochs left). The fold IS the stream — CurationStream.start
    // applies curateBatch per micro-batch against the same two states
    "pipeline_curate_stream" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("text"))
      val bench = d.filter(col("doc_id") % 10 === 7)
      val corpus = d.filter(col("doc_id") % 10 =!= 7)
      // the eval suite is fixed across epochs: its gram set is prepared
      // once, exactly as CurationStream.start does per stream
      val bg = Decontamination.benchGramsOf(bench).localCheckpoint(true)
      var store: Option[(DataFrame, DataFrame)] = None
      var consumed = Map.empty[String, Long]
      val perEpoch = (0 until 3).map { e =>
        val batch = corpus.filter(pmod(col("doc_id"), lit(3L)) === lit(e.toLong))
        val (adm, admBuckets, fin0) = graft.streaming.CurationStream.curateBatchWithBuckets(
          store, consumed, batch, bench, budget = 2000L, benchGrams = Some(bg))
        val (ns, fin) = pinCurateEpoch(store, adm, admBuckets, fin0)
        store = ns
        consumed = consumed ++ fin.groupBy("lang").agg(max("cum_tokens").as("c"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        fin.withColumn("epoch", lit(e))
      }
      perEpoch.reduce(_.unionByName(_)).orderBy(col("doc_id"))
    }),
    "pipeline_curate_stream_funnel" -> ((s, dir) => {
      // the STREAMING funnel: per-epoch doc/token attrition at every gate
      // of the online curation chain — the waterfall an ingest operator
      // reads per trigger ("epoch 2 lost 60% at the near-dup store" is a
      // funnel row). Same 3-epoch fold as pipeline_curate_stream, reading
      // the stage intermediates curateBatchStages exposes
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("text"))
      val bench = d.filter(col("doc_id") % 10 === 7)
      val corpus = d.filter(col("doc_id") % 10 =!= 7)
      val bg = Decontamination.benchGramsOf(bench).localCheckpoint(true)
      var store: Option[(DataFrame, DataFrame)] = None
      var consumed = Map.empty[String, Long]
      // the gate thresholds appear twice below (the stage call and the
      // single-pass level expression) — bind them once
      val minTokens = 30L
      val minQuality = 0.5
      val perEpoch = (0 until 3).map { e =>
        val batch = corpus.filter(pmod(col("doc_id"), lit(3L)) === lit(e.toLong))
        val st = graft.streaming.CurationStream.curateBatchStages(
          store, consumed, batch, bench, budget = 2000L,
          minTokens = minTokens, minQuality = minQuality, benchGrams = Some(bg))
        // pin the epoch's bucket side before it joins the growing store
        // (st.admitted/st.curated ride the epoch's admission pin; the
        // bucket table is the one lazy multi-epoch dependency) — same
        // r13 floor fix as the other folds
        val abQ = st.admittedBuckets.localCheckpoint(true)
        store = Some(store match {
          case Some((sd, sb)) =>
            (sd.unionByName(st.admitted.select(col("doc_id"), col("text"))),
              sb.unionByName(abQ))
          case None =>
            (st.admitted.select(col("doc_id"), col("text")), abQ)
        })
        consumed = consumed ++ st.curated.groupBy("lang").agg(max("cum_tokens").as("c"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        // fused input/floor stage stats (r18): 00_input and 10_quality_floor
        // aggregate the SAME annotated frame (the floor is a scan-local
        // predicate over its own columns), so one conditional-aggregate
        // pass replaces the two branches that each re-ran the annotate
        // subtree inside the final action (guide §2.3/§2.4). The three
        // deeper stages aggregate PINNED epoch frames — cheap block scans,
        // kept as-is (joining annotated against its own checkpointed
        // descendants trips Catalyst's conflicting-attribute check, so a
        // full 5-stage level fusion is not expressible here).
        val fl = col("n_tokens") >= minTokens && col("quality_score") >= minQuality
        val inputAndFloor = st.annotated.agg(
            count(lit(1)).as("__c0"),
            coalesce(sum(col("n_tokens")), lit(0L)).as("__t0"),
            count(when(fl, lit(1))).as("__c1"),
            coalesce(sum(when(fl, col("n_tokens"))), lit(0L)).as("__t1"))
          .select(explode(array(
            struct(lit("00_input").as("stage"),
              col("__c0").as("n_docs"), col("__t0").as("n_tokens")),
            struct(lit("10_quality_floor").as("stage"),
              col("__c1").as("n_docs"), col("__t1").as("n_tokens")))).as("__r"))
          .select(lit(e).as("epoch"), col("__r.stage"),
            col("__r.n_docs"), col("__r.n_tokens"))
        val pinnedStages = Seq(
          "20_decontaminated" -> st.clean,
          "30_dedup_admitted" -> st.admitted,
          "40_budget_admitted" -> st.curated)
          .map { case (name, df) =>
            df.agg(count(lit(1)).as("n_docs"),
                coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
              .select(lit(e).as("epoch"), lit(name).as("stage"),
                col("n_docs"), col("n_tokens"))
          }.reduce(_ unionAll _)
        inputAndFloor.unionByName(pinnedStages)
      }
      perEpoch.reduce(_.unionByName(_)).orderBy(col("epoch"), col("stage"))
    }),
    // the streaming front door with the Gopher battery at stage 1a' —
    // same 3-epoch fold; the per-doc gate commutes with the epoch split
    "pipeline_curate_stream_gopher" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("text"))
      val bench = d.filter(col("doc_id") % 10 === 7)
      val corpus = d.filter(col("doc_id") % 10 =!= 7)
      val bg = Decontamination.benchGramsOf(bench).localCheckpoint(true)
      var store: Option[(DataFrame, DataFrame)] = None
      var consumed = Map.empty[String, Long]
      val perEpoch = (0 until 3).map { e =>
        val batch = corpus.filter(pmod(col("doc_id"), lit(3L)) === lit(e.toLong))
        val (adm, admBuckets, fin0) = graft.streaming.CurationStream.curateBatchWithBuckets(
          store, consumed, batch, bench, budget = 2000L, benchGrams = Some(bg),
          gopher = true)
        val (ns, fin) = pinCurateEpoch(store, adm, admBuckets, fin0)
        store = ns
        consumed = consumed ++ fin.groupBy("lang").agg(max("cum_tokens").as("c"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        fin.withColumn("epoch", lit(e))
      }
      perEpoch.reduce(_.unionByName(_)).orderBy(col("doc_id"))
    }),
    // the streaming front door WITH the learned gate: same 3-epoch fold,
    // classifier model trained once before the fold (exactly what
    // CurationStream.start does per stream) and applied per epoch
    "pipeline_curate_stream_classified" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val dd = d.select(col("doc_id"), col("lang"), col("text"))
      val bench = dd.filter(col("doc_id") % 10 === 7)
      val corpus = dd.filter(col("doc_id") % 10 =!= 7)
      val bg = Decontamination.benchGramsOf(bench).localCheckpoint(true)
      val model = Some(graft.operators.Selection.nbClassifierModel(
        d.filter(col("doc_id") % 10 === 7), d.filter(col("doc_id") % 10 === 3)))
      var store: Option[(DataFrame, DataFrame)] = None
      var consumed = Map.empty[String, Long]
      val perEpoch = (0 until 3).map { e =>
        val batch = corpus.filter(pmod(col("doc_id"), lit(3L)) === lit(e.toLong))
        val (adm, admBuckets, fin0) = graft.streaming.CurationStream.curateBatchWithBuckets(
          store, consumed, batch, bench, budget = 2000L, benchGrams = Some(bg),
          classifier = model)
        val (ns, fin) = pinCurateEpoch(store, adm, admBuckets, fin0)
        store = ns
        consumed = consumed ++ fin.groupBy("lang").agg(max("cum_tokens").as("c"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        fin.withColumn("epoch", lit(e))
      }
      perEpoch.reduce(_.unionByName(_)).orderBy(col("doc_id"))
    }),
    // the same chain with the final token-space quota: stop each language
    // at 1500 tokens of post-curation survivors (the training-run cut);
    // the oracle appends the budget window to the staged curate CTEs
    "pipeline_curate_budget" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Curation.curate(
        d.filter(col("doc_id") % 10 =!= 7), d.filter(col("doc_id") % 10 === 7),
        minTokens = 30L, minQuality = 0.5,
        langFracs = Map("en" -> 0.9, "de" -> 0.5, "zh" -> 0.3), defaultFrac = 0.4,
        tokenBudget = Some(1500L))
        .orderBy(col("doc_id"))
    }),
    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprintGroups(s.read.parquet(s"$dir/documents.parquet"))
        .orderBy(col("fingerprint"))),
    // the nightly per-source rollup a corpus team actually runs: one scan
    // (quality is a pure projection), one partial-agg'd groupBy; the mean
    // is an exact integer-scaled sum, so the report is bit-stable under
    // any partitioning
    // snapshot diff: v1 = docs without the %10==3 slice, v2 = docs without
    // the %7==2 slice — overlapping cuts so every class (added / removed /
    // retained) is non-empty per source
    // which feeds are copying each other: distinct shared 8-gram hashes
    // and gram-set Jaccard per source pair — the corpus-analytics screen
    // run before any pairwise document work
    "corpus_overlap_matrix" -> ((s, dir) =>
      CorpusDiff.overlapMatrix(s.read.parquet(s"$dir/documents.parquet"), k = 8)
        .orderBy(col("source_a"), col("source_b"))),
    // distribution drift next to the membership diff: per-source smoothed
    // unigram KL(new || old) over the same two overlapping cuts
    "corpus_drift" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"), col("text"))
      CorpusDiff.driftReport(
        d.filter(col("doc_id") % 10 =!= 3), d.filter(col("doc_id") % 7 =!= 2))
        .orderBy(col("source"))
    }),
    // the STREAMING monitor's fold: each epoch scored against everything
    // ingested before it (epoch 0 against the empty reference)
    "corpus_drift_stream" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"), col("text"))
      val perEpoch = (0 until 3).map { e =>
        CorpusDiff.driftReport(
          d.filter(pmod(col("doc_id"), lit(3L)) < e),
          d.filter(pmod(col("doc_id"), lit(3L)) === e))
          .withColumn("epoch", lit(e.toLong))
      }
      perEpoch.reduce(_.unionByName(_)).orderBy(col("epoch"), col("source"))
    }),
    "corpus_diff" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"), col("text"))
      graft.operators.CorpusDiff.report(
        d.filter(col("doc_id") % 10 =!= 3), d.filter(col("doc_id") % 7 =!= 2))
    }),
    "corpus_report" -> ((s, dir) => {
      val q = TextAnalysis.quality(
        s.read.parquet(s"$dir/documents.parquet"), keep = Seq("source"))
      q.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          round(sum(floor(col("quality_score") * lit(1e6) + lit(0.5))).cast("double")
            / count(lit(1)) / lit(1e6), 6).as("mean_quality"))
        .orderBy(col("source"))
    }),
    // batch replay of the streaming first-seen dedup filter (the exact code
    // path that runs under flatMapGroupsWithState in a stream). The corpus
    // has no exact-normalized duplicates, so the workload plants them:
    // an uppercased copy of every doc under a shifted id — normalization
    // maps each copy onto its original's fingerprint, and first-seen must
    // keep exactly the originals.
    "dedup_stream_replay" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
      val planted = d.select((col("doc_id") + 100000L).as("doc_id"), upper(col("text")).as("text"))
      graft.streaming.DedupStream.firstSeenDocs(d.unionByName(planted))
        .select(col("doc_id"), col("fp")).orderBy(col("doc_id"))
    }),

    // --- multimodal plumbing
    "mm_media_meta" -> ((s, dir) =>
      Multimodal.asMedia(s.read.parquet(s"$dir/documents.parquet"))
        .select(col("doc_id"), col("media_type"),
          col("meta.n_bytes").as("n_bytes"), col("meta.checksum").as("checksum"))
        .orderBy(col("doc_id"))),
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.frameSample(Multimodal.asMedia(s.read.parquet(s"$dir/documents.parquet")))
        .select(col("doc_id"), col("media_type"), col("n_frames"), col("first_frame_checksum"))
        .orderBy(col("doc_id"))),
    "mm_resize" -> ((s, dir) =>
      // binary payload exported as md5 — the comparator can't sort raw bytes
      Multimodal.resize(Multimodal.asMedia(s.read.parquet(s"$dir/documents.parquet")))
        .select(col("doc_id"), col("media_type"), col("resized_n"),
          md5(col("resized")).as("resized_checksum"))
        .orderBy(col("doc_id"))),
    "mm_decode_features" -> ((s, dir) => {
      // scalar projection of the feature struct: the driver's comparator
      // sorts columns with pandas, which cannot hash raw array columns —
      // histogram lanes and embedding lanes are exported as scalars
      // (embedding × 1000 recovers the stub's exact integer lane value)
      val f = Multimodal.extractFeatures(Multimodal.asMedia(s.read.parquet(s"$dir/documents.parquet"))).toDF()
      val histCols = (0 until 4).map(k => element_at(col("byte_histogram"), k + 1).as(s"hist_$k"))
      val embCols = (0 until 8).map(j =>
        round(element_at(col("embedding"), j + 1).cast("double") * 1000).cast("long").as(s"emb${j}_x1000"))
      f.select(Seq(col("doc_id"), col("media_type"), col("n_bytes"), col("checksum"),
        col("mean_byte")) ++ histCols ++ embCols: _*)
        .orderBy(col("doc_id"))
    }),
    // REAL image decode: deterministic P6 (binary PPM) payloads built from
    // the corpus, decoded by the actual netpbm-grammar parser — pixel sums
    // and ITU-601 luma are genuine decoded stats, and because the fixture
    // pixel stream is a pure function of the text the oracle replays them
    "text_index_describe" -> ((s, dir) => {
      // serving-state observability: exact per-tree doc/token mass + the
      // live tombstone mass, the numbers an operator reads to decide when
      // to compact — over the worst maintained state (10 epochs + deletes)
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_text_desc_${Integer.toHexString(dir.hashCode)}"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      TextIndex.write(docs.filter(col("doc_id") % 11 === 0), path)
      for (i <- 1 to 10)
        TextIndex.append(docs.filter(col("doc_id") % 11 === i), path)
      TextIndex.delete(docs.filter(col("doc_id") % 7 === 3), path)
      TextIndex.describe(s, path)
    }),
    "ivf_index_describe" -> ((s, dir) => {
      // the vector twin: per-tree vector counts + masked-id count
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_desc_${Integer.toHexString(dir.hashCode)}"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      IvfIndex.write(emb.filter(col("vec_id") % 5 === 0), path, nlist = 16)
      for (i <- 1 to 4)
        IvfIndex.append(emb.filter(col("vec_id") % 5 === i), path)
      IvfIndex.delete(emb.filter(col("vec_id") % 9 === 2), path)
      IvfIndex.describe(s, path)
    }),
    "mm_decode_ppm" -> ((s, dir) =>
      Multimodal.decodePpm(
          Multimodal.encodePpm(s.read.parquet(s"$dir/documents.parquet")))
        .toDF()
        .select(col("doc_id"), col("width"), col("height"), col("maxval"),
          col("n_pixels"), col("sum_r"), col("sum_g"), col("sum_b"),
          col("luma_micro"))
        .orderBy(col("doc_id"))),
    // REAL PNG decode via the JDK's ImageIO codec stack: losslessly
    // compressed fixtures carry the same text-derived raster as the PPM
    // twin, so the identical replayable oracle checks a genuinely
    // different decoder (zlib/PNG, not a hand parser)
    "mm_decode_png" -> ((s, dir) =>
      Multimodal.decodeImage(
          Multimodal.encodePng(s.read.parquet(s"$dir/documents.parquet")))
        .toDF()
        .select(col("doc_id"), col("width"), col("height"), col("maxval"),
          col("n_pixels"), col("sum_r"), col("sum_g"), col("sum_b"),
          col("luma_micro"))
        .orderBy(col("doc_id"))),
    // REAL image resize: the P6 rasters nearest-neighbor point-sampled to
    // 8x8 by the actual parse->resample->re-encode kernel; the channel
    // sums over the RESIZED raster replay from the text in the oracle
    "mm_resize_ppm" -> ((s, dir) =>
      Multimodal.resizePpm(
          Multimodal.encodePpm(s.read.parquet(s"$dir/documents.parquet")))
        .select(col("doc_id"), col("src_height"), col("width"), col("height"),
          col("sum_r"), col("sum_g"), col("sum_b"))
        .orderBy(col("doc_id"))),
    // perceptual image near-dup: every doc_id % 7 == 0 document gets a
    // planted twin whose text differs by ONE character (same length, so
    // the raster geometry is identical); the pairs must surface through
    // the REAL decode -> dHash -> banded-join -> exact-Hamming path
    "mm_near_dup_pairs" -> ((s, dir) =>
      mmNearDupInput(s, dir)._2.orderBy(col("id_a"), col("id_b"))),
    // the decision layers over the perceptual pairs, completing parity
    // with the text dedup family (dedup_clusters / dedup_keepers): group
    // the near-dup graph, then keep the ORIGINAL of each group (planted
    // twins carry the +10M id offset, so originals outrank; ties ->
    // smallest id, the same arg-max rule as canonicalKeepers everywhere)
    "mm_near_dup_clusters" -> ((s, dir) =>
      Dedup.connectedComponents(
          mmNearDupInput(s, dir)._2.select(col("id_a"), col("id_b")))
        .orderBy(col("doc_id"))),
    "mm_near_dup_keepers" -> ((s, dir) => {
      val (media, pairs) = mmNearDupInput(s, dir)
      Dedup.canonicalKeepers(media,
          pairs.select(col("id_a"), col("id_b")),
          when(col("doc_id") < 10000000L, 1).otherwise(0))
        .orderBy(col("doc_id"))
    }),
    // perceptual near-dup for AUDIO: the energy-envelope contour hash
    // (65 integer windows, cross-multiplied mean comparisons — the WAV
    // twin of the image dHash) over the same planted-twin corpus, through
    // the same 4x16-bit banded self-join + exact-Hamming verify
    "mm_wav_near_dup_pairs" -> ((s, dir) =>
      Multimodal.nearDupPairsWav(
          Multimodal.encodeWav(mmTwinnedDocs(s, dir)))
        .orderBy(col("id_a"), col("id_b"))),
    // decision layers over the audio pairs — full parity with the image
    // and text dedup families: components, then keep the original of each
    // group (originals outrank their +10M twins; ties -> smallest id)
    "mm_wav_near_dup_clusters" -> ((s, dir) =>
      Dedup.connectedComponents(
          Multimodal.nearDupPairsWav(Multimodal.encodeWav(mmTwinnedDocs(s, dir)))
            .select(col("id_a"), col("id_b")))
        .orderBy(col("doc_id"))),
    "mm_wav_near_dup_keepers" -> ((s, dir) => {
      val media = mmTwinnedDocs(s, dir)
      Dedup.canonicalKeepers(media,
          Multimodal.nearDupPairsWav(Multimodal.encodeWav(media))
            .select(col("id_a"), col("id_b")),
          when(col("doc_id") < 10000000L, 1).otherwise(0))
        .orderBy(col("doc_id"))
    }),
    "mm_decode_wav" -> ((s, dir) =>
      // real RIFF/PCM audio decode (chunk-walking parser) over payloads
      // whose sample stream is a pure function of the text — the audio
      // twin of mm_decode_ppm, all-integer stats so the oracle is exact
      Multimodal.decodeWav(
          Multimodal.encodeWav(s.read.parquet(s"$dir/documents.parquet")))
        .toDF()
        .select(col("doc_id"), col("n_channels"), col("sample_rate"),
          col("bits"), col("n_frames"), col("dur_micros"), col("sum_abs"),
          col("peak_abs"), col("sum_sq"))
        .orderBy(col("doc_id"))),
    // REAL audio resample: 8 kHz PCM point-sampled to 3 kHz by the actual
    // parse->resample->re-encode kernel; sample aggregates replay from the
    // text in the oracle (integer floor mapping, no interpolation)
    "mm_resample_wav" -> ((s, dir) =>
      Multimodal.resampleWav(
          Multimodal.encodeWav(s.read.parquet(s"$dir/documents.parquet")))
        .select(col("doc_id"), col("src_rate"), col("sample_rate"),
          col("n_frames_src"), col("n_frames"), col("sum_abs"),
          col("peak_abs"), col("sum_sq"))
        .orderBy(col("doc_id"))),
    "mm_decode_avi" -> ((s, dir) =>
      // real video-container decode (recursive RIFF/LIST walker over an
      // uncompressed vids/DIB AVI) with every 2nd frame sampled — the
      // video twin of mm_decode_ppm/mm_decode_wav, all-integer stats so
      // the oracle is exact
      Multimodal.decodeAvi(
          Multimodal.encodeAvi(s.read.parquet(s"$dir/documents.parquet")))
        .toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("us_per_frame"), col("n_frames"), col("dur_micros"),
          col("n_sampled"), col("sum_byte"), col("peak_byte"), col("sum_sq"))
        .orderBy(col("doc_id")))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. The renko scan family (ordered stateful
    * recurrence) is covered by recursive-CTE oracles generated in
    * RenkoOracleSql; the renko operators are additionally validated
    * bit-exactly against reference-generated goldens in src/test
    * (GoldenBatchSpec).
    */
  /** Build the worst-maintained-serving-state lexical index (base + 10
    * append epochs + a tombstone epoch, never compacted) fresh under a
    * `tag`-keyed tmp path — the fixture behind `text_bm25_epochs`, also
    * built untimed by Bench so the probe-only entry measures serving
    * latency without the construction cost.
    */
  private[graft] def buildEpochTextIndex(s: SparkSession, dir: String, tag: String): String = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_text_${tag}_${Integer.toHexString(dir.hashCode)}"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    // per-mutation phase marks ride the bench diag (r17): the entry's cost
    // IS the build — the breakdown shows whether a regression is one slow
    // mutation or a uniform floor
    def timed(tag: String)(op: => Unit): Unit = {
      val t0 = System.nanoTime()
      op
      graft.operators.Renko.logPhase(tag, (System.nanoTime() - t0) / 1e9)
    }
    timed("lexEp write")(TextIndex.write(docs.filter(col("doc_id") % 11 === 0), path))
    for (i <- 1 to 10)
      timed(s"lexEp append$i")(TextIndex.append(docs.filter(col("doc_id") % 11 === i), path))
    timed("lexEp delete")(TextIndex.delete(docs.filter(col("doc_id") % 7 === 3), path))
    path
  }

  /** The declared-record shape of the JSONL dump fixture (the documents
    * table's columns — see [[writeJsonlDump]] / the source_jsonl_* entries).
    */
  private[graft] val docJsonSchema: org.apache.spark.sql.types.StructType =
    new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("text", org.apache.spark.sql.types.StringType)
      .add("lang", org.apache.spark.sql.types.StringType)
      .add("source", org.apache.spark.sql.types.StringType)
      .add("n_chars", org.apache.spark.sql.types.LongType)

  /** One JSONL dump line per document — EXCEPT every doc_id % 13 == 5,
    * which renders as a deterministically truncated (malformed) line: the
    * quarantine fixture. Shared by the source_jsonl_* entries, the
    * PipelineStress ingest arm, and (as a string literal) the
    * sourceJsonlQuarantine oracle, so the plant rate and corrupt prefix
    * cannot drift between the three.
    */
  private[graft] def jsonlDumpLine(
      payload: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
    when(col("doc_id") % 13 === 5,
      concat(lit("{\"doc_id\": "), col("doc_id").cast("string"),
        lit(", \"text\": ")))
      .otherwise(to_json(struct(payload: _*)))

  /** Render the documents table as a GZIP JSONL dump under a tmp path (via
    * [[jsonlDumpLine]]) — 4 .gz files, so `input_file_name` provenance is
    * live in the quarantine output AND the oracle gate covers the codec
    * path dumps actually ship in (gzip is non-splittable: parallelism =
    * #files, exactly the many-small-files layout raw dumps arrive as —
    * VERDICT r16 #4). The content is a pure function of `dir`, so the
    * write runs once per (JVM, dir): the ingest AND quarantine entries
    * (and every Bench rep of each) share one fixture build instead of
    * re-rendering the corpus per call. Success is recorded only AFTER the
    * write completes, under a per-path lock, so a thrown/interrupted build
    * can never leave later callers silently reading a partial dump and two
    * first callers cannot race the write (ADVICE r16). The path carries a
    * per-process nonce: two JVMs against the same data dir (the
    * concurrent-sbt trap) get disjoint fixtures, and 32-bit `hashCode`
    * collisions across different dirs cannot alias.
    */
  private val jsonlDumpBuilt =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
  private val jsonlDumpLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Per-process tmp-path nonce (pid): isolates this JVM's transient
    * fixtures from any other JVM running against the same data dirs.
    */
  private[graft] val tmpNonce: String =
    java.lang.Long.toHexString(ProcessHandle.current().pid())

  /** Fresh-runDir counter for pipeline_e2e_resume: each call gets its own
    * stage store, so the in-entry kill/restart witness is self-contained
    * (a Bench rep never resumes a PREVIOUS rep's stages).
    */
  private val resumeRunTick = new java.util.concurrent.atomic.AtomicLong(0L)

  private[graft] def writeJsonlDump(s: SparkSession, dir: String): String = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_${Integer.toHexString(dir.hashCode)}_$tmpNonce"
    val lock = jsonlDumpLocks.computeIfAbsent(path, _ => new Object)
    lock.synchronized {
      if (!jsonlDumpBuilt.contains(path)) {
        s.read.parquet(s"$dir/documents.parquet")
          .repartition(4, col("doc_id"))
          .select(jsonlDumpLine(Seq(
            col("doc_id"), col("text"), col("lang"), col("source"),
            col("n_chars"))).as("value"))
          .write.mode("overwrite").option("compression", "gzip").text(path)
        jsonlDumpBuilt.add(path)
      }
    }
    path
  }

  /** BOM-corrupted twin of [[writeJsonlDump]]: every doc_id % 13 == 5 line
    * is prefixed with U+FEFF (a RECOVERABLE corruption — the repair is a
    * one-character strip), everything else renders normally — the
    * source_jsonl_reprocess fixture. Same build-once/lock/nonce mechanics;
    * plain text (the gzip codec path is covered by the main dump).
    */
  private[graft] def writeJsonlDumpBom(s: SparkSession, dir: String): String = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_jsonl_bom_${Integer.toHexString(dir.hashCode)}_$tmpNonce"
    val lock = jsonlDumpLocks.computeIfAbsent(path, _ => new Object)
    lock.synchronized {
      if (!jsonlDumpBuilt.contains(path)) {
        s.read.parquet(s"$dir/documents.parquet")
          .repartition(4, col("doc_id"))
          .select(concat(
            when(col("doc_id") % 13 === 5, lit("\uFEFF")).otherwise(lit("")),
            to_json(struct(col("doc_id"), col("text"), col("lang"),
              col("source"), col("n_chars")))).as("value"))
          .write.mode("overwrite").text(path)
        jsonlDumpBuilt.add(path)
      }
    }
    path
  }

  /** The IVF twin of [[buildEpochTextIndex]]: base half + 10 append epochs
    * + a tombstone epoch, never compacted (the `sim_topk_ivf_epochs`
    * fixture).
    */
  private[graft] def buildEpochIvfIndex(s: SparkSession, dir: String, tag: String): String = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_${tag}_${Integer.toHexString(dir.hashCode)}"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    def timed(tag: String)(op: => Unit): Unit = {
      val t0 = System.nanoTime()
      op
      graft.operators.Renko.logPhase(tag, (System.nanoTime() - t0) / 1e9)
    }
    val n = emb.count()
    val half = n / 2
    timed("ivfEp write")(IvfIndex.write(emb.filter(col("vec_id") < half), path))
    val step = math.max(1L, (n - half + 9) / 10)
    for (i <- 0 until 10) {
      val lo = half + i * step
      val hi = if (i == 9) n else math.min(n, lo + step)
      if (lo < hi)
        timed(s"ivfEp append$i")(
          IvfIndex.append(emb.filter(col("vec_id") >= lo && col("vec_id") < hi), path))
    }
    timed("ivfEp delete")(
      IvfIndex.delete(emb.filter(col("vec_id") % 7 === 3).select("vec_id"), path))
    path
  }

  private val Tok = """regexp_split_to_array(trim(text), '\s+')"""

  /** Shared recursive-CTE prefix: exact 0.5-Jaccard pairs → undirected
    * reachability → min-label clusters, ending in `cl(doc_id, cluster_id)`
    * (used by dedup_clusters and dedup_keepers).
    */
  /** The mm near-dup fixture and its dHash banded pairs: documents plus a
    * one-character twin for every doc_id % 7 == 0 (same text LENGTH, so
    * the raster geometry is preserved and the twin lands within a few
    * flipped hash bits) — shared by the pairs/clusters/keepers queries.
    */
  /** The perceptual-near-dup text corpus: every document plus a planted
    * one-char twin (+10M id offset) for ids %7==0.
    */
  private def mmTwinnedDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val twins = docs
      .filter(col("doc_id") % 7 === 0 && length(col("text")) >= 5)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        concat(substring(col("text"), 1, 4), lit("Z"),
          expr("substring(text, 6)")).as("text"))
    docs.unionByName(twins)
  }

  private def mmNearDupInput(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val media = mmTwinnedDocs(s, dir)
    // MIXED-CODEC corpus: originals ship P6 on even ids and PNG on odd,
    // and every planted twin ships the OPPOSITE container of its original
    // (the +10M offset preserves parity, so twin-side parity is flipped
    // explicitly) — every planted near-dup pair SPANS codecs, and finding
    // it proves dhashImage is codec-invariant. The oracle derives the
    // hash from TEXT alone and never knows the container, so it needs no
    // change: codec variance would show up as a hash mismatch here.
    val isTwin = col("doc_id") >= lit(10000000L)
    val asPpm = (pmod(col("doc_id"), lit(2L)) === 0) =!= isTwin
    val payloads = Multimodal.encodePpm(media.filter(asPpm))
      .unionByName(Multimodal.encodePng(media.filter(!asPpm)))
    (media, Multimodal.nearDupPairs(payloads))
  }

  private val ClustersCte =
    s"""WITH RECURSIVE tok AS (
       |  SELECT doc_id, $Tok AS w FROM documents
       |), sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
       |  FROM tok WHERE len(w) >= 3
       |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |shared AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b FROM shared
       |  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
       |  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5),
       |bidir AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(n, l) AS (
       |  SELECT src, src FROM bidir
       |  UNION
       |  SELECT e.dst, r.l FROM reach r JOIN bidir e ON e.src = r.n),
       |cl AS (SELECT n AS doc_id, min(l) AS cluster_id FROM reach GROUP BY n)""".stripMargin

  /** The dHash near-dup replica shared by the mm_near_dup_* oracles:
    * planted one-char twins (+10M id offset), the 9x8 grayscale grid over
    * the text-derived raster (the same integer floor sampling as the
    * resize oracle), the hash as two unsigned 32-bit halves, 4x16-bit
    * bands, exact Hamming — ending at `mmpairs(id_a, id_b, hamming)`.
    * Declared RECURSIVE so the clusters/keepers oracles can append their
    * reachability CTE.
    */
  private val MmPairsCte =
    """WITH RECURSIVE base AS MATERIALIZED (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000,
      |    concat(substr(text, 1, 4), 'Z', substr(text, 6))
      |  FROM documents WHERE doc_id % 7 = 0 AND strlen(text) >= 5),
      |c AS (
      |  SELECT doc_id, strlen(text) AS n,
      |    list_transform(range(1, strlen(text)+1),
      |      i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS codes
      |  FROM base),
      |d AS (
      |  SELECT doc_id, n, codes,
      |    CAST(greatest(1, ((n+2)//3 + 15)//16) AS BIGINT) AS h
      |  FROM c),
      |g AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_transform(range(0, 72), t ->
      |        299*(CASE WHEN ((t//9)*h//8*16 + (t%9)*16//9)*3 + 0 < n
      |          THEN codes[CAST(((t//9)*h//8*16 + (t%9)*16//9)*3 + 1 AS INT)] ELSE 0 END)
      |      + 587*(CASE WHEN ((t//9)*h//8*16 + (t%9)*16//9)*3 + 1 < n
      |          THEN codes[CAST(((t//9)*h//8*16 + (t%9)*16//9)*3 + 2 AS INT)] ELSE 0 END)
      |      + 114*(CASE WHEN ((t//9)*h//8*16 + (t%9)*16//9)*3 + 2 < n
      |          THEN codes[CAST(((t//9)*h//8*16 + (t%9)*16//9)*3 + 3 AS INT)] ELSE 0 END)) AS gray
      |  FROM d),
      |hsh AS MATERIALIZED (
      |  SELECT doc_id,
      |    CAST(coalesce(list_sum(list_transform(range(32, 64), b ->
      |      CASE WHEN gray[CAST((b//8)*9 + (b%8) + 2 AS INT)]
      |              > gray[CAST((b//8)*9 + (b%8) + 1 AS INT)]
      |        THEN CAST(1 AS BIGINT) << CAST(b - 32 AS INT) ELSE 0 END)), 0) AS BIGINT) AS dhash_hi,
      |    CAST(coalesce(list_sum(list_transform(range(0, 32), b ->
      |      CASE WHEN gray[CAST((b//8)*9 + (b%8) + 2 AS INT)]
      |              > gray[CAST((b//8)*9 + (b%8) + 1 AS INT)]
      |        THEN CAST(1 AS BIGINT) << CAST(b AS INT) ELSE 0 END)), 0) AS BIGINT) AS dhash_lo
      |  FROM g),
      |bands AS MATERIALIZED (
      |  SELECT doc_id, dhash_hi, dhash_lo, k,
      |    CASE k WHEN 0 THEN dhash_lo & 65535 WHEN 1 THEN (dhash_lo >> 16) & 65535
      |           WHEN 2 THEN dhash_hi & 65535 ELSE (dhash_hi >> 16) & 65535 END AS band
      |  FROM hsh, (SELECT unnest(range(0, 4)) AS k)),
      |mmpairs AS MATERIALIZED (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
      |    CAST(bit_count(xor(x.dhash_hi, y.dhash_hi))
      |       + bit_count(xor(x.dhash_lo, y.dhash_lo)) AS INT) AS hamming
      |  FROM bands x JOIN bands y ON x.k = y.k AND x.band = y.band
      |    AND x.doc_id < y.doc_id
      |  WHERE bit_count(xor(x.dhash_hi, y.dhash_hi))
      |      + bit_count(xor(x.dhash_lo, y.dhash_lo)) <= 6)""".stripMargin

  /** The WAV energy-envelope near-dup replica (mirrors
    * `Multimodal.envelopeHashWav` + `nearDupPairsWav` over the same
    * planted-twin corpus as [[MmPairsCte]]): text bytes → signed 16-bit
    * little-endian samples (the encodeWav fixture contract), 65
    * floor-boundary windows of absolute-amplitude sums, contour bit b =
    * cross-multiplied mean comparison e_{b+1}·n_b > e_b·n_{b+1}, two
    * unsigned 32-bit halves, the same 4x16-bit bands and exact Hamming —
    * ending at `wpairs(id_a, id_b, hamming)`.
    */
  private val WavPairsCte =
    """WITH RECURSIVE base AS MATERIALIZED (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000,
      |    concat(substr(text, 1, 4), 'Z', substr(text, 6))
      |  FROM documents WHERE doc_id % 7 = 0 AND strlen(text) >= 5),
      |c AS (
      |  SELECT doc_id, strlen(text) AS n,
      |    list_transform(range(1, strlen(text)+1),
      |      i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS codes
      |  FROM base),
      |s AS (
      |  SELECT doc_id, (n + (n % 2)) // 2 AS nf,
      |    list_transform(range(1, ((n + (n % 2)) // 2) + 1),
      |      i -> codes[CAST(2*i - 1 AS INT)]
      |        + 256 * (CASE WHEN 2*i <= n THEN codes[CAST(2*i AS INT)] ELSE 0 END)) AS v
      |  FROM c),
      |t AS (
      |  SELECT doc_id, nf,
      |    list_transform(v, x -> abs(CASE WHEN x >= 32768 THEN x - 65536 ELSE x END)) AS av
      |  FROM s),
      |e AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_transform(range(0, 65), j -> CAST(coalesce(list_sum(
      |      list_transform(range(CAST(nf*j//65 AS INT) + 1, CAST(nf*(j+1)//65 AS INT) + 1),
      |        i -> av[CAST(i AS INT)])), 0) AS BIGINT)) AS en,
      |    list_transform(range(0, 65),
      |      j -> CAST(nf*(j+1)//65 - nf*j//65 AS BIGINT)) AS wn
      |  FROM t),
      |hsh AS MATERIALIZED (
      |  SELECT doc_id,
      |    CAST(coalesce(list_sum(list_transform(range(32, 64), b ->
      |      CASE WHEN en[CAST(b+2 AS INT)] * wn[CAST(b+1 AS INT)]
      |              > en[CAST(b+1 AS INT)] * wn[CAST(b+2 AS INT)]
      |        THEN CAST(1 AS BIGINT) << CAST(b - 32 AS INT) ELSE 0 END)), 0) AS BIGINT) AS ehash_hi,
      |    CAST(coalesce(list_sum(list_transform(range(0, 32), b ->
      |      CASE WHEN en[CAST(b+2 AS INT)] * wn[CAST(b+1 AS INT)]
      |              > en[CAST(b+1 AS INT)] * wn[CAST(b+2 AS INT)]
      |        THEN CAST(1 AS BIGINT) << CAST(b AS INT) ELSE 0 END)), 0) AS BIGINT) AS ehash_lo
      |  FROM e),
      |bands AS MATERIALIZED (
      |  SELECT doc_id, ehash_hi, ehash_lo, k,
      |    CASE k WHEN 0 THEN ehash_lo & 65535 WHEN 1 THEN (ehash_lo >> 16) & 65535
      |           WHEN 2 THEN ehash_hi & 65535 ELSE (ehash_hi >> 16) & 65535 END AS band
      |  FROM hsh, (SELECT unnest(range(0, 4)) AS k)),
      |wpairs AS MATERIALIZED (
      |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
      |    CAST(bit_count(xor(x.ehash_hi, y.ehash_hi))
      |       + bit_count(xor(x.ehash_lo, y.ehash_lo)) AS INT) AS hamming
      |  FROM bands x JOIN bands y ON x.k = y.k AND x.band = y.band
      |    AND x.doc_id < y.doc_id
      |  WHERE bit_count(xor(x.ehash_hi, y.ehash_hi))
      |      + bit_count(xor(x.ehash_lo, y.ehash_lo)) <= 6)""".stripMargin

  /** Shared raster-stats replica for the image-decode fixtures: 16-wide
    * RGB raster, pixel stream = ASCII text bytes zero-padded to 16*h*3
    * with h = max(1, ceil(ceil(n/3)/16)) — channel sums are strided byte
    * sums (padding adds 0), luma is the integer-weighted 601 mean over ALL
    * n_pixels in exact micro-lumas (floor division — no rounding ties).
    * Replays both the hand-parsed P6 decode (mm_decode_ppm) and the
    * ImageIO PNG decode (mm_decode_png): same raster, different decoder.
    */
  private val rasterStatsOracle: String =
    """WITH c AS (
      |  SELECT doc_id, strlen(text) AS n,
      |    list_transform(range(1, strlen(text)+1),
      |      i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS codes
      |  FROM documents),
      |d AS (
      |  SELECT doc_id,
      |    CAST(16 * greatest(1, ((n+2)//3 + 15)//16) AS BIGINT) AS n_pixels,
      |    CAST(greatest(1, ((n+2)//3 + 15)//16) AS BIGINT) AS height,
      |    CAST(coalesce(list_sum(list_transform(range(1, n+1, 3),
      |      i -> codes[CAST(i AS INT)])), 0) AS BIGINT) AS sum_r,
      |    CAST(coalesce(list_sum(list_transform(range(2, n+1, 3),
      |      i -> codes[CAST(i AS INT)])), 0) AS BIGINT) AS sum_g,
      |    CAST(coalesce(list_sum(list_transform(range(3, n+1, 3),
      |      i -> codes[CAST(i AS INT)])), 0) AS BIGINT) AS sum_b
      |  FROM c)
      |SELECT doc_id, CAST(16 AS BIGINT) AS width, height,
      |  CAST(255 AS BIGINT) AS maxval, n_pixels, sum_r, sum_g, sum_b,
      |  CAST((299*sum_r + 587*sum_g + 114*sum_b) * 1000 // n_pixels AS BIGINT) AS luma_micro
      |FROM d ORDER BY doc_id""".stripMargin

  def oracleSql: Map[String, String] = oracleAliases(
    RenkoOracleSql.entries ++ PipelineOracleSql.entries ++ Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_sort" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |LIMIT 100""".stripMargin,
    "q3_join_broadcast" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q4_multijoin" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q5_window_topk" ->
      """SELECT user_id, rn, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
        |  FROM events)
        |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,
    "q6_window_lag" ->
      """SELECT event_id, user_id, value - prev_value AS value_diff FROM (
        |  SELECT event_id, user_id, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |  FROM events)
        |WHERE prev_value IS NOT NULL ORDER BY event_id""".stripMargin,
    "q7_union_distinct" ->
      """SELECT event_type, count(*) AS n_rows, count(DISTINCT user_id) AS n_users FROM (
        |  SELECT * FROM events WHERE event_type = 'purchase'
        |  UNION
        |  SELECT * FROM events WHERE value > 400)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q8_semijoin" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q9_antijoin" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q10_tail" ->
      """SELECT event_id, event_type, value, epoch_ms(ts) AS ts_ms
        |FROM events
        |ORDER BY ts_ms DESC, event_id DESC LIMIT 10""".stripMargin,
    "q11_agg_stats" ->
      """SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        |  min(value) AS min_value, max(value) AS max_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q14_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q15_except" ->
      """SELECT event_id, user_id FROM events WHERE value > 400
        |EXCEPT ALL
        |SELECT event_id, user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "q16_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE value < 50
        |ORDER BY user_id""".stripMargin,
    "q17_time_window" ->
      """SELECT epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_ms,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY window_start_ms, event_type""".stripMargin,
    "q18_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM o),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM m)
        |SELECT user_id, sid, count(*) AS n_events,
        |  epoch_ms(min(ts)) AS start_ms, epoch_ms(max(ts)) AS end_ms
        |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin,
    "q19_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        |  round(CAST(sum(CAST(floor(value * 1e6 + 0.5e0) AS BIGINT)) AS DOUBLE) / 1e6, 6)
        |    AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q20_pivot" ->
      """SELECT user_id % 10 AS user_bucket,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_mv
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_series_compare" ->
      """WITH l AS (
        |  SELECT row_number() OVER (ORDER BY ts) AS pos, value AS self FROM events),
        |r AS (
        |  SELECT row_number() OVER (ORDER BY ts) AS pos,
        |    CASE WHEN event_type = 'click' THEN value * 2 ELSE value END AS other
        |  FROM events)
        |SELECT l.pos, self, other FROM l JOIN r ON l.pos = r.pos
        |WHERE self != other ORDER BY l.pos""".stripMargin,
    "q13_round" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice / 7.0, 5) AS rounded_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, rounded_price LIMIT 200""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH tok AS (
         |  SELECT doc_id, $Tok AS w FROM documents
         |), sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
         |  FROM tok WHERE len(w) >= 3
         |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |shared AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard
         |FROM shared JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
         |WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,
    "dedup_clusters" ->
      s"""$ClustersCte
         |SELECT doc_id, cluster_id FROM cl ORDER BY doc_id""".stripMargin,
    "dedup_keepers" ->
      s"""$ClustersCte,
         |m AS (
         |  SELECT cl.doc_id, cluster_id,
         |    CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 2
         |                WHEN 'src2' THEN 1 ELSE 0 END AS prio
         |  FROM cl JOIN documents ON documents.doc_id = cl.doc_id),
         |k AS (
         |  SELECT cluster_id, doc_id AS keeper_id,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY prio DESC, doc_id ASC) AS rn
         |  FROM m)
         |SELECT m.doc_id, m.cluster_id, k.keeper_id,
         |  m.doc_id = k.keeper_id AS keep
         |FROM m JOIN k ON k.cluster_id = m.cluster_id AND k.rn = 1
         |ORDER BY m.doc_id""".stripMargin,
    // near-dup pairs straddling two splits, per scheme (the pairs CTE is
    // the ClustersCte's >= 0.5 Jaccard pair set)
    "sample_split_leakage" ->
      s"""$ClustersCte,
         |g AS (
         |  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS group_key
         |  FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id),
         |bp AS (
         |  SELECT doc_id,
         |    CASE WHEN b < 800000 THEN 'train' WHEN b < 900000 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |    (((list_reduce(list_prepend(0::BIGINT,
         |      list_transform(range(1, strlen('split:' || CAST(doc_id AS VARCHAR)) + 1),
         |        i -> CAST(ascii(substr('split:' || CAST(doc_id AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))),
         |      (a, x) -> (a * 31 + x) % 2147483647)
         |      * 2654435761 + 12345) % 2147483647) % 1000000) AS b FROM documents)),
         |bg AS (
         |  SELECT doc_id,
         |    CASE WHEN b < 800000 THEN 'train' WHEN b < 900000 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |    (((list_reduce(list_prepend(0::BIGINT,
         |      list_transform(range(1, strlen('split:' || CAST(group_key AS VARCHAR)) + 1),
         |        i -> CAST(ascii(substr('split:' || CAST(group_key AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))),
         |      (a, x) -> (a * 31 + x) % 2147483647)
         |      * 2654435761 + 12345) % 2147483647) % 1000000) AS b FROM g)),
         |lp AS (
         |  SELECT CAST(count(*) AS BIGINT) AS pairs_total,
         |    CAST(sum(CASE WHEN a.split != b.split THEN 1 ELSE 0 END) AS BIGINT) AS pairs_straddling
         |  FROM pairs p JOIN bp a ON a.doc_id = p.id_a JOIN bp b ON b.doc_id = p.id_b),
         |lg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS pairs_total,
         |    CAST(sum(CASE WHEN a.split != b.split THEN 1 ELSE 0 END) AS BIGINT) AS pairs_straddling
         |  FROM pairs p JOIN bg a ON a.doc_id = p.id_a JOIN bg b ON b.doc_id = p.id_b)
         |SELECT * FROM (
         |  SELECT 'per_document' AS scheme, pairs_total, pairs_straddling FROM lp
         |  UNION ALL
         |  SELECT 'grouped', pairs_total, pairs_straddling FROM lg)
         |ORDER BY scheme""".stripMargin,
    // leakage-safe split: the assignSplits bucket arithmetic keyed on
    // coalesce(cluster_id, doc_id) — cluster members co-assigned
    "sample_split_grouped" ->
      s"""$ClustersCte,
         |g AS (
         |  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS group_key
         |  FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id),
         |hg AS (
         |  SELECT doc_id, group_key,
         |    (((list_reduce(list_prepend(0::BIGINT,
         |      list_transform(range(1, strlen('split:' || CAST(group_key AS VARCHAR)) + 1),
         |        i -> CAST(ascii(substr('split:' || CAST(group_key AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))),
         |      (a, x) -> (a * 31 + x) % 2147483647)
         |      * 2654435761 + 12345) % 2147483647) % 1000000) AS b
         |  FROM g)
         |SELECT doc_id, group_key,
         |  CASE WHEN b < 800000 THEN 'train' WHEN b < 900000 THEN 'val' ELSE 'test' END AS split
         |FROM hg ORDER BY doc_id""".stripMargin,
    "dedup_embedding_pairs" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(range(1, len(embedding)+1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_sum(list_transform(range(1, len(a.embedding)+1),
        |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / (a.nrm * b.nrm), 9) AS cos_sim
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |ORDER BY cos_sim DESC, id_a, id_b LIMIT 20""".stripMargin,
    // quantize -> int8 cosine over all pairs -> top 20 candidates/query ->
    // exact rerank -> top 5; same arithmetic as Similarity.quantizedTopK
    // (floor(x+0.5) rounding; scales cancel in the quantized cosine)
    "sim_topk_quantized" ->
      """WITH mx AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
        |  FROM embeddings),
        |qz AS (
        |  SELECT vec_id, embedding,
        |    CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END AS scale
        |  FROM mx),
        |q8 AS (
        |  SELECT vec_id, embedding,
        |    list_transform(embedding, x -> GREATEST(-127, LEAST(127,
        |      CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)))) AS qv
        |  FROM qz),
        |qn AS (
        |  SELECT vec_id, embedding, qv,
        |    sqrt(CAST(list_sum(list_transform(range(1, len(qv)+1),
        |      i -> qv[i] * qv[i])) AS DOUBLE)) AS qnrm
        |  FROM q8),
        |qs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(range(1, len(q.qv)+1),
        |      i -> q.qv[i] * c.qv[i])) AS DOUBLE) / (q.qnrm * c.qnrm) AS qcos
        |  FROM qn q JOIN qn c ON q.vec_id < 10 AND c.vec_id != q.vec_id),
        |cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id ASC) AS qr
        |    FROM qs) WHERE qr <= 20),
        |n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(range(1, len(embedding)+1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |s AS (
        |  SELECT cand.query_id, cand.neighbor_id,
        |    round(list_sum(list_transform(range(1, len(q.embedding)+1),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))) / (q.nrm * c.nrm), 9) AS cos_sim
        |  FROM cand JOIN n q ON q.vec_id = cand.query_id JOIN n c ON c.vec_id = cand.neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id, cos_sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank"
        |  FROM s)
        |SELECT query_id, "rank", neighbor_id, cos_sim FROM r
        |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin,
    "sim_topk_bruteforce" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(range(1, len(embedding)+1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |s AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_sum(list_transform(range(1, len(q.embedding)+1),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))) / (q.nrm * c.nrm), 9) AS cos_sim
        |  FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id != q.vec_id),
        |r AS (
        |  SELECT query_id, neighbor_id, cos_sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank"
        |  FROM s)
        |SELECT query_id, "rank", neighbor_id, cos_sim FROM r
        |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin,

    "text_quality" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(len($Tok) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct($Tok)) AS BIGINT) AS n_unique_tokens,
         |    CAST(len(list_filter($Tok, t -> t IN ('the','a','and','of','to','in'))) AS BIGINT) AS stopword_cnt
         |  FROM documents)
         |SELECT doc_id, n_chars, n_tokens, n_unique_tokens, stopword_cnt,
         |  CAST(n_unique_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
         |  CAST(stopword_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
         |  least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |    + (CAST(n_unique_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.4
         |    + least((CAST(stopword_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 5.0, 1.0) * 0.2 AS quality_score
         |FROM f ORDER BY doc_id""".stripMargin,
    "text_normalize" ->
      """WITH messy AS (
        |  SELECT doc_id,
        |    'Cafe' || chr(769) || chr(7) || ' doc:' || chr(9) || chr(9) || text
        |      || ' ' || chr(13) || chr(10) AS text
        |  FROM documents),
        |norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |      '[ \t\r\n]+', ' ', 'g')) AS norm_text
        |  FROM messy)
        |SELECT doc_id, norm_text,
        |  CAST(length(norm_text) AS BIGINT) AS n_chars_norm
        |FROM norm ORDER BY doc_id""".stripMargin,
    "text_script" ->
      """WITH w AS (
        |  SELECT doc_id, text || ' 汉字漢字 Русский текст 123' AS text
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_cp,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_latin,
        |    CAST(len(regexp_extract_all(text, '[一-鿿]')) AS BIGINT) AS n_cjk,
        |    CAST(len(regexp_extract_all(text, '[Ѐ-ӿ]')) AS BIGINT) AS n_cyrillic,
        |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit
        |  FROM w)
        |SELECT doc_id, n_cp, n_latin, n_cjk, n_cyrillic, n_digit,
        |  CASE WHEN n_latin + n_cjk + n_cyrillic = 0 THEN 'none'
        |       WHEN n_latin >= n_cjk AND n_latin >= n_cyrillic THEN 'latin'
        |       WHEN n_cjk >= n_cyrillic THEN 'cjk'
        |       ELSE 'cyrillic' END AS dominant_script
        |FROM p ORDER BY doc_id""".stripMargin,
    "dedup_blocks" ->
      s"""WITH toks AS (SELECT doc_id, $Tok AS w FROM documents),
         |b AS (
         |  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         |    array_to_string(w[(CAST(u.i AS INT)*8+1):(CAST(u.i AS INT)*8+8)], ' ') AS blk
         |  FROM toks, unnest(range((len(w) + 7) // 8)) AS u(i)),
         |f AS (SELECT blk, min(doc_id * 1048576 + pos) AS keep_key FROM b GROUP BY blk),
         |kept AS (
         |  SELECT b.doc_id, b.pos, b.blk FROM b JOIN f ON b.blk = f.blk
         |  WHERE b.doc_id * 1048576 + b.pos = f.keep_key),
         |r AS (
         |  SELECT doc_id, string_agg(blk, ' ' ORDER BY pos) AS clean_text,
         |    CAST(count(*) AS BIGINT) AS n_kept
         |  FROM kept GROUP BY doc_id),
         |n AS (SELECT doc_id, CAST((len(w) + 7) // 8 AS BIGINT) AS n_blocks FROM toks)
         |SELECT n.doc_id, coalesce(r.clean_text, '') AS clean_text, n.n_blocks,
         |  n.n_blocks - coalesce(r.n_kept, 0) AS n_removed
         |FROM n LEFT JOIN r ON r.doc_id = n.doc_id ORDER BY n.doc_id""".stripMargin,
    "text_boilerplate" ->
      s"""WITH toks AS (SELECT doc_id, $Tok AS w FROM documents),
         |b AS (
         |  SELECT doc_id,
         |    array_to_string(w[(CAST(u.i AS INT)*3+1):(CAST(u.i AS INT)*3+3)], ' ') AS blk
         |  FROM toks, unnest(range((len(w) + 2) // 3)) AS u(i))
         |SELECT blk, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_occurrences
         |FROM b GROUP BY blk HAVING count(DISTINCT doc_id) >= 5
         |ORDER BY blk""".stripMargin,
    "text_boilerplate_removal" ->
      s"""WITH toks AS (SELECT doc_id, $Tok AS w FROM documents),
         |b AS MATERIALIZED (
         |  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         |    array_to_string(w[(CAST(u.i AS INT)*3+1):(CAST(u.i AS INT)*3+3)], ' ') AS blk
         |  FROM toks, unnest(range((len(w) + 2) // 3)) AS u(i)),
         |hot AS (SELECT blk FROM b GROUP BY blk HAVING count(DISTINCT doc_id) >= 5),
         |kept AS (SELECT b.doc_id, b.pos, b.blk FROM b
         |  WHERE b.blk NOT IN (SELECT blk FROM hot)),
         |r AS (
         |  SELECT doc_id, string_agg(blk, ' ' ORDER BY pos) AS clean_text,
         |    CAST(count(*) AS BIGINT) AS n_kept
         |  FROM kept GROUP BY doc_id),
         |n AS (SELECT doc_id, CAST((len(w) + 2) // 3 AS BIGINT) AS n_blocks FROM toks)
         |SELECT n.doc_id, coalesce(r.clean_text, '') AS clean_text, n.n_blocks,
         |  n.n_blocks - coalesce(r.n_kept, 0) AS n_removed
         |FROM n LEFT JOIN r ON r.doc_id = n.doc_id ORDER BY n.doc_id""".stripMargin,
    "text_boilerplate_stream" ->
      s"""WITH toks AS (
         |  SELECT doc_id, doc_id % 3 AS epoch, $Tok AS w FROM documents),
         |b AS MATERIALIZED (
         |  SELECT doc_id, epoch, CAST(u.i AS BIGINT) AS pos,
         |    array_to_string(w[(CAST(u.i AS INT)*3+1):(CAST(u.i AS INT)*3+3)], ' ') AS blk
         |  FROM toks, unnest(range((len(w) + 2) // 3)) AS u(i)),
         |c AS (SELECT blk, epoch, count(DISTINCT doc_id) AS nd FROM b GROUP BY 1, 2),
         |cum AS (
         |  SELECT blk, epoch,
         |    CAST(sum(nd) OVER (PARTITION BY blk ORDER BY epoch) AS BIGINT) AS cnd
         |  FROM c),
         |hot AS (SELECT blk, epoch FROM cum WHERE cnd >= 5),
         |kept AS (
         |  SELECT b.doc_id, b.pos, b.blk FROM b
         |  LEFT JOIN hot ON hot.blk = b.blk AND hot.epoch = b.epoch
         |  WHERE hot.blk IS NULL),
         |r AS (
         |  SELECT doc_id, string_agg(blk, ' ' ORDER BY pos) AS clean_text,
         |    CAST(count(*) AS BIGINT) AS n_kept
         |  FROM kept GROUP BY doc_id),
         |n AS (SELECT doc_id, epoch, CAST((len(w) + 2) // 3 AS BIGINT) AS n_blocks FROM toks)
         |SELECT n.doc_id, coalesce(r.clean_text, '') AS clean_text, n.n_blocks,
         |  n.n_blocks - coalesce(r.n_kept, 0) AS n_removed,
         |  CAST(n.epoch AS BIGINT) AS epoch
         |FROM n LEFT JOIN r ON r.doc_id = n.doc_id ORDER BY n.doc_id""".stripMargin,
    "sample_source_cap" ->
      s"""WITH f AS (
         |  SELECT doc_id, source,
         |    CAST(len($Tok) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct($Tok)) AS BIGINT) AS n_unique_tokens,
         |    CAST(len(list_filter($Tok, t -> t IN ('the','a','and','of','to','in'))) AS BIGINT) AS stopword_cnt
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, source,
         |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |      + (CAST(n_unique_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.4
         |      + least((CAST(stopword_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 5.0, 1.0) * 0.2 AS quality_score
         |  FROM f),
         |r AS (
         |  SELECT doc_id, source, quality_score,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY quality_score DESC, doc_id ASC) AS BIGINT) AS cap_rank
         |  FROM q)
         |SELECT doc_id, source, quality_score, cap_rank
         |FROM r WHERE cap_rank <= 40 ORDER BY source, cap_rank""".stripMargin,
    "text_gopher_rules" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST(len($Tok) AS BIGINT) AS n_tokens,
         |    CAST(list_sum(list_transform($Tok, t -> length(t))) AS BIGINT) AS sum_len,
         |    CAST(len(list_filter($Tok, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
         |    CAST(len(list_filter($Tok, t -> contains(t, '#') OR contains(t, '...') OR contains(t, '…'))) AS BIGINT) AS n_symbol,
         |    CAST(len(list_filter(list_distinct($Tok), t -> t IN ('the','a','and','of','to','in'))) AS BIGINT) AS stop_hits
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_word_len,
         |    CAST(n_symbol AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS symbol_ratio,
         |    CAST(n_alpha AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS alpha_ratio,
         |    stop_hits
         |  FROM f)
         |SELECT doc_id, n_tokens, mean_word_len, symbol_ratio, alpha_ratio, stop_hits,
         |  (n_tokens >= 30 AND n_tokens <= 100000) AS pass_len,
         |  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS pass_word_len,
         |  (symbol_ratio <= 0.1) AS pass_symbol,
         |  (alpha_ratio >= 0.8) AS pass_alpha,
         |  (stop_hits >= 2) AS pass_stop,
         |  (n_tokens >= 30 AND n_tokens <= 100000
         |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |    AND symbol_ratio <= 0.1 AND alpha_ratio >= 0.8
         |    AND stop_hits >= 2) AS keep
         |FROM g ORDER BY doc_id""".stripMargin,
    "corpus_report" ->
      s"""WITH f AS (
         |  SELECT source,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(len($Tok) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct($Tok)) AS BIGINT) AS n_unique_tokens,
         |    CAST(len(list_filter($Tok, t -> t IN ('the','a','and','of','to','in'))) AS BIGINT) AS stopword_cnt
         |  FROM documents),
         |q AS (
         |  SELECT source, n_chars, n_tokens,
         |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |      + (CAST(n_unique_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.4
         |      + least((CAST(stopword_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 5.0, 1.0) * 0.2 AS quality_score
         |  FROM f)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  round(CAST(sum(CAST(floor(quality_score * 1e6 + 0.5e0) AS BIGINT)) AS DOUBLE)
         |    / count(*) / 1e6, 6) AS mean_quality
         |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "text_langid" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter($Tok, t -> t IN ('the','a','and'))) AS BIGINT) AS s_en,
         |    CAST(len(list_filter($Tok, t -> t IN ('der','die','das','und'))) AS BIGINT) AS s_de,
         |    CAST(len(list_filter($Tok, t -> t IN ('el','la','los','y'))) AS BIGINT) AS s_es,
         |    CAST(len(list_filter($Tok, t -> t IN ('le','les','et','une'))) AS BIGINT) AS s_fr,
         |    CAST(len(list_filter($Tok, t -> t IN ('de5','le5','shi4'))) AS BIGINT) AS s_zh
         |  FROM documents)
         |SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh,
         |  CASE WHEN s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
         |       WHEN s_de >= greatest(s_es, s_fr, s_zh) THEN 'de'
         |       WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
         |       WHEN s_fr >= s_zh THEN 'fr'
         |       ELSE 'zh' END AS pred_lang
         |FROM f ORDER BY doc_id""".stripMargin,
    "text_token_stats" ->
      s"""SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(w)) AS BIGINT) AS n_unique_tokens,
         |  CAST(len(list_filter(w, t -> regexp_matches(t, '^[A-Za-z]+$$'))) AS BIGINT) AS n_words_alpha,
         |  CAST(len(list_filter(w, t -> regexp_matches(t, '^[0-9]+$$'))) AS BIGINT) AS n_numbers,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+')) AS BIGINT) AS n_bpe_pretokens
         |FROM (SELECT doc_id, text, $Tok AS w FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "text_winnow" ->
      """WITH h AS (
        |  SELECT doc_id, i,
        |    (CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT) * 1
        |     + CAST(ascii(substr(text, CAST(i+1 AS INT), 1)) AS BIGINT) * 31
        |     + CAST(ascii(substr(text, CAST(i+2 AS INT), 1)) AS BIGINT) * 961
        |     + CAST(ascii(substr(text, CAST(i+3 AS INT), 1)) AS BIGINT) * 29791
        |     + CAST(ascii(substr(text, CAST(i+4 AS INT), 1)) AS BIGINT) * 923521
        |     + CAST(ascii(substr(text, CAST(i+5 AS INT), 1)) AS BIGINT) * 28629151
        |     + CAST(ascii(substr(text, CAST(i+6 AS INT), 1)) AS BIGINT) * 887503681
        |     + CAST(ascii(substr(text, CAST(i+7 AS INT), 1)) AS BIGINT) * 27512614111) % 2147483647 AS kh
        |  FROM documents, unnest(range(1, length(text) - 6)) AS t(i)
        |  WHERE length(text) >= 8
        |), w AS (
        |  SELECT doc_id,
        |    min(kh) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
        |    i, count(*) OVER (PARTITION BY doc_id) AS n
        |  FROM h
        |), d AS (SELECT DISTINCT doc_id, fp FROM w WHERE i <= n - 3)
        |SELECT doc_id, count(*) AS n_fps, CAST(sum(fp) AS BIGINT) AS fp_sum
        |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same fingerprint CTEs as text_winnow, then the MOSS containment join
    "text_winnow_neardup" ->
      """WITH h AS (
        |  SELECT doc_id, i,
        |    (CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT) * 1
        |     + CAST(ascii(substr(text, CAST(i+1 AS INT), 1)) AS BIGINT) * 31
        |     + CAST(ascii(substr(text, CAST(i+2 AS INT), 1)) AS BIGINT) * 961
        |     + CAST(ascii(substr(text, CAST(i+3 AS INT), 1)) AS BIGINT) * 29791
        |     + CAST(ascii(substr(text, CAST(i+4 AS INT), 1)) AS BIGINT) * 923521
        |     + CAST(ascii(substr(text, CAST(i+5 AS INT), 1)) AS BIGINT) * 28629151
        |     + CAST(ascii(substr(text, CAST(i+6 AS INT), 1)) AS BIGINT) * 887503681
        |     + CAST(ascii(substr(text, CAST(i+7 AS INT), 1)) AS BIGINT) * 27512614111) % 2147483647 AS kh
        |  FROM documents, unnest(range(1, length(text) - 6)) AS t(i)
        |  WHERE length(text) >= 8
        |), w AS (
        |  SELECT doc_id,
        |    min(kh) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
        |    i, count(*) OVER (PARTITION BY doc_id) AS n
        |  FROM h
        |), d AS (SELECT DISTINCT doc_id, fp FROM w WHERE i <= n - 3),
        |sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
        |shared AS (
        |  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_shared
        |  FROM d x JOIN d y ON x.fp = y.fp AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, n_shared,
        |  CAST(n_shared AS DOUBLE) / least(sa.n, sb.n) AS containment
        |FROM shared JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE CAST(n_shared AS DOUBLE) / least(sa.n, sb.n) >= 0.7
        |ORDER BY id_a, id_b""".stripMargin,
    // same bucket arithmetic as the Spark side: LCG-scrambled polyhash of
    // 'graft:' || id, reduced mod 1e6
    "sample_stratified" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    ((list_reduce(list_prepend(0::BIGINT,
        |      list_transform(range(1, strlen('graft:' || CAST(doc_id AS VARCHAR)) + 1),
        |        i -> CAST(ascii(substr('graft:' || CAST(doc_id AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 2147483647)
        |      * 2654435761 + 12345) % 2147483647) % 1000000 AS bucket
        |  FROM documents)
        |SELECT doc_id, lang FROM b
        |WHERE bucket < CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 250000
        |                         WHEN 'zh' THEN 100000 ELSE 50000 END
        |ORDER BY doc_id""".stripMargin,
    "text_redact_pii" ->
      """WITH inj AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 2 = 0
        |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
        |    || CASE WHEN doc_id % 3 = 0
        |         THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0
        |         THEN ' call +1555' || lpad(CAST(doc_id AS VARCHAR), 7, '0') ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+[0-9]{7,15}', '<PHONE>', 'g') AS text_redacted,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(text, '\+[0-9]{7,15}')) AS BIGINT) AS n_phones
        |FROM inj ORDER BY doc_id""".stripMargin,
    "text_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] || ' ' || w[CAST(i+2 AS INT)]
        |      || ' ' || w[CAST(i+3 AS INT)] || ' ' || w[CAST(i+4 AS INT)]
        |      || ' ' || w[CAST(i+5 AS INT)] || ' ' || w[CAST(i+6 AS INT)]
        |      || ' ' || w[CAST(i+7 AS INT)] AS gram
        |  FROM toks, unnest(range(1, len(w) - 6)) AS t(i)
        |), bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 7),
        |docg AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 10 <> 7),
        |sz AS (SELECT doc_id, count(*) AS n_grams FROM docg GROUP BY doc_id),
        |ov AS (
        |  SELECT doc_id, count(*) AS n_overlap
        |  FROM docg JOIN bench USING (gram) GROUP BY doc_id
        |)
        |SELECT ov.doc_id, sz.n_grams, ov.n_overlap,
        |  CAST(ov.n_overlap AS DOUBLE) / CAST(sz.n_grams AS DOUBLE) AS overlap_frac
        |FROM ov JOIN sz ON sz.doc_id = ov.doc_id
        |ORDER BY ov.doc_id""".stripMargin,
    // relational reformulation of the per-row sorted-run fold: group the
    // unnested n-grams and pick max by (cnt DESC, gram ASC) — same digest
    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, CAST(length(text) AS DOUBLE) AS lc,
        |    regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents
        |), g2 AS (
        |  SELECT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] AS gram
        |  FROM toks, unnest(range(1, len(w))) AS t(i)
        |), c2 AS (
        |  SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2
        |), t2 AS (
        |  SELECT doc_id, cnt, gram FROM (
        |    SELECT doc_id, cnt, gram,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
        |    FROM c2) WHERE rn = 1
        |), d2 AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN cnt >= 2 THEN cnt * length(gram) ELSE 0 END) AS BIGINT) AS dup_chars
        |  FROM c2 GROUP BY 1
        |), g3 AS (
        |  SELECT doc_id,
        |    w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] || ' ' || w[CAST(i+2 AS INT)] AS gram
        |  FROM toks, unnest(range(1, len(w) - 1)) AS t(i)
        |), c3 AS (
        |  SELECT doc_id, gram, count(*) AS cnt FROM g3 GROUP BY 1, 2
        |), t3 AS (
        |  SELECT doc_id, cnt, gram FROM (
        |    SELECT doc_id, cnt, gram,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
        |    FROM c3) WHERE rn = 1
        |), d3 AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN cnt >= 2 THEN cnt * length(gram) ELSE 0 END) AS BIGINT) AS dup_chars
        |  FROM c3 GROUP BY 1
        |)
        |SELECT t.doc_id,
        |  CAST(len(t.w) AS BIGINT) AS n_tokens,
        |  coalesce(t2.gram, '') AS top2_gram,
        |  coalesce(t2.cnt, 0) AS top2_cnt,
        |  CASE WHEN t.lc = 0 THEN 0e0 ELSE coalesce(t2.cnt * length(t2.gram), 0) / t.lc END AS top2_frac,
        |  CASE WHEN t.lc = 0 THEN 0e0 ELSE coalesce(d2.dup_chars, 0) / t.lc END AS dup2_frac,
        |  coalesce(t3.gram, '') AS top3_gram,
        |  coalesce(t3.cnt, 0) AS top3_cnt,
        |  CASE WHEN t.lc = 0 THEN 0e0 ELSE coalesce(t3.cnt * length(t3.gram), 0) / t.lc END AS top3_frac,
        |  CASE WHEN t.lc = 0 THEN 0e0 ELSE coalesce(d3.dup_chars, 0) / t.lc END AS dup3_frac
        |FROM toks t
        |LEFT JOIN t2 ON t2.doc_id = t.doc_id
        |LEFT JOIN d2 ON d2.doc_id = t.doc_id
        |LEFT JOIN t3 ON t3.doc_id = t.doc_id
        |LEFT JOIN d3 ON d3.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "dedup_stream_replay" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, upper(text) FROM documents
        |), fp AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
        |  FROM corpus)
        |SELECT doc_id, fp FROM (
        |  SELECT doc_id, fp, min(doc_id) OVER (PARTITION BY fp) AS m FROM fp)
        |WHERE doc_id = m ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint
        |  FROM documents)
        |SELECT fingerprint, min(doc_id) AS doc_id, count(*) AS n_docs
        |FROM fp GROUP BY fingerprint ORDER BY fingerprint""".stripMargin,
    "mm_media_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // decode stub replica: byte == codepoint because the corpus is ASCII
    // (verified: max codepoint 121 at sf0.01 and sf0.1); lane accumulator is
    // (acc*31 + byte) % 1000000007 exactly as Multimodal.decodeStub
    "mm_similar_media" -> {
      val lane = (j: Int) =>
        s"""CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(range(${j + 1}, strlen(text)+1, 8),
           |        i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
           |      (a,b) -> (a*31+b) % 1000000007) % 1000 AS DOUBLE)""".stripMargin
      val lanes = (0 until 8).map(lane).mkString(",\n    ")
      s"""WITH e AS (
         |  SELECT doc_id AS vec_id,
         |    [$lanes] AS embedding
         |  FROM documents
         |), n AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_sum(list_transform(range(1, len(embedding)+1),
         |      i -> embedding[i] * embedding[i]))) AS nrm
         |  FROM e),
         |s AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(list_sum(list_transform(range(1, len(q.embedding)+1),
         |      i -> q.embedding[i] * c.embedding[i])) / (q.nrm * c.nrm), 9) AS cos_sim
         |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id != q.vec_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank"
         |  FROM s)
         |SELECT query_id, "rank", neighbor_id, cos_sim FROM r
         |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin
    },
    "mm_decode_features" -> {
      val histCols = (0 until 4).map(k =>
        s"  CAST(len(list_filter(codes, x -> x // 64 = $k)) AS BIGINT) AS hist_$k").mkString(",\n")
      val embCols = (0 until 8).map(j =>
        s"""  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           |    list_transform(range(${j + 1}, strlen(text)+1, 8),
           |      i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
           |    (a,b) -> (a*31+b) % 1000000007) % 1000 AS BIGINT) AS emb${j}_x1000""".stripMargin)
        .mkString(",\n")
      s"""WITH c AS (
         |  SELECT doc_id, text,
         |    list_transform(range(1, strlen(text)+1),
         |      i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS codes
         |  FROM documents)
         |SELECT doc_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         |  CAST(strlen(text) AS BIGINT) AS n_bytes,
         |  md5(text) AS checksum,
         |  CASE WHEN strlen(text) = 0 THEN 0.0
         |       ELSE CAST(list_sum(codes) AS DOUBLE) / strlen(text) END AS mean_byte,
         |$histCols,
         |$embCols
         |FROM c ORDER BY doc_id""".stripMargin
    },
    // PPM fixture replica: 16-wide P6 raster, pixel stream = ASCII text
    // bytes zero-padded to 16*h*3 with h = max(1, ceil(ceil(n/3)/16)) —
    // channel sums are strided byte sums (padding adds 0), luma is the
    // integer-weighted 601 mean over ALL n_pixels in exact micro-lumas
    // (floor division — no cross-engine rounding ties)
    "mm_decode_ppm" -> rasterStatsOracle,
    // the PNG fixture carries the SAME text-derived raster losslessly, so
    // the identical oracle replays the ImageIO decode
    "mm_decode_png" -> rasterStatsOracle,
    "mm_resize_ppm" ->
      """WITH c AS (
        |  SELECT doc_id, strlen(text) AS n,
        |    list_transform(range(1, strlen(text)+1),
        |      i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS codes
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, n, codes,
        |    CAST(greatest(1, ((n+2)//3 + 15)//16) AS BIGINT) AS h
        |  FROM c),
        |s AS (
        |  SELECT doc_id, h,
        |    CAST(coalesce(list_sum(list_transform(range(0, 64), t ->
        |      CASE WHEN ((t//8)*h//8*16 + (t%8)*2)*3 + 0 < n
        |        THEN codes[CAST(((t//8)*h//8*16 + (t%8)*2)*3 + 1 AS INT)] ELSE 0 END)), 0) AS BIGINT) AS sum_r,
        |    CAST(coalesce(list_sum(list_transform(range(0, 64), t ->
        |      CASE WHEN ((t//8)*h//8*16 + (t%8)*2)*3 + 1 < n
        |        THEN codes[CAST(((t//8)*h//8*16 + (t%8)*2)*3 + 2 AS INT)] ELSE 0 END)), 0) AS BIGINT) AS sum_g,
        |    CAST(coalesce(list_sum(list_transform(range(0, 64), t ->
        |      CASE WHEN ((t//8)*h//8*16 + (t%8)*2)*3 + 2 < n
        |        THEN codes[CAST(((t//8)*h//8*16 + (t%8)*2)*3 + 3 AS INT)] ELSE 0 END)), 0) AS BIGINT) AS sum_b
        |  FROM d)
        |SELECT doc_id, h AS src_height, CAST(8 AS BIGINT) AS width,
        |  CAST(8 AS BIGINT) AS height, sum_r, sum_g, sum_b
        |FROM s ORDER BY doc_id""".stripMargin,
    // replays the full dHash near-dup path (see MmPairsCte): planted
    // one-char twins, the 9x8 grayscale grid over the text-derived raster,
    // the hash as two unsigned 32-bit halves, the 4x16-bit bands, and the
    // exact Hamming verify
    "mm_near_dup_pairs" ->
      s"""$MmPairsCte
        |SELECT id_a, id_b, hamming FROM mmpairs ORDER BY id_a, id_b""".stripMargin,
    // replays the WAV envelope-contour near-dup path (see WavPairsCte);
    // the engine side hashes REAL RIFF payloads through the chunk-walking
    // parser — the oracle derives the same 64 bits from the text fixture
    "mm_wav_near_dup_pairs" ->
      s"""$WavPairsCte
        |SELECT id_a, id_b, hamming FROM wpairs ORDER BY id_a, id_b""".stripMargin,
    "mm_wav_near_dup_clusters" ->
      s"""$WavPairsCte,
        |bidir AS (
        |  SELECT id_a AS src, id_b AS dst FROM wpairs
        |  UNION SELECT id_b, id_a FROM wpairs),
        |reach(nn, l) AS (
        |  SELECT src, src FROM bidir
        |  UNION
        |  SELECT e.dst, r.l FROM reach r JOIN bidir e ON e.src = r.nn),
        |cl AS (SELECT nn AS doc_id, min(l) AS cluster_id FROM reach GROUP BY nn)
        |SELECT doc_id, cluster_id FROM cl ORDER BY doc_id""".stripMargin,
    "mm_wav_near_dup_keepers" ->
      s"""$WavPairsCte,
        |bidir AS (
        |  SELECT id_a AS src, id_b AS dst FROM wpairs
        |  UNION SELECT id_b, id_a FROM wpairs),
        |reach(nn, l) AS (
        |  SELECT src, src FROM bidir
        |  UNION
        |  SELECT e.dst, r.l FROM reach r JOIN bidir e ON e.src = r.nn),
        |cl AS (SELECT nn AS doc_id, min(l) AS cluster_id FROM reach GROUP BY nn),
        |m AS (
        |  SELECT doc_id, cluster_id,
        |    CASE WHEN doc_id < 10000000 THEN 1 ELSE 0 END AS prio
        |  FROM cl),
        |k AS (
        |  SELECT cluster_id, doc_id AS keeper_id,
        |    row_number() OVER (PARTITION BY cluster_id
        |      ORDER BY prio DESC, doc_id ASC) AS rn
        |  FROM m)
        |SELECT m.doc_id, m.cluster_id, k.keeper_id,
        |  m.doc_id = k.keeper_id AS keep
        |FROM m JOIN k ON k.cluster_id = m.cluster_id AND k.rn = 1
        |ORDER BY m.doc_id""".stripMargin,
    "mm_near_dup_clusters" ->
      s"""$MmPairsCte,
        |bidir AS (
        |  SELECT id_a AS src, id_b AS dst FROM mmpairs
        |  UNION SELECT id_b, id_a FROM mmpairs),
        |reach(nn, l) AS (
        |  SELECT src, src FROM bidir
        |  UNION
        |  SELECT e.dst, r.l FROM reach r JOIN bidir e ON e.src = r.nn),
        |cl AS (SELECT nn AS doc_id, min(l) AS cluster_id FROM reach GROUP BY nn)
        |SELECT doc_id, cluster_id FROM cl ORDER BY doc_id""".stripMargin,
    "mm_near_dup_keepers" ->
      s"""$MmPairsCte,
        |bidir AS (
        |  SELECT id_a AS src, id_b AS dst FROM mmpairs
        |  UNION SELECT id_b, id_a FROM mmpairs),
        |reach(nn, l) AS (
        |  SELECT src, src FROM bidir
        |  UNION
        |  SELECT e.dst, r.l FROM reach r JOIN bidir e ON e.src = r.nn),
        |cl AS (SELECT nn AS doc_id, min(l) AS cluster_id FROM reach GROUP BY nn),
        |m AS (
        |  SELECT doc_id, cluster_id,
        |    CASE WHEN doc_id < 10000000 THEN 1 ELSE 0 END AS prio
        |  FROM cl),
        |k AS (
        |  SELECT cluster_id, doc_id AS keeper_id,
        |    row_number() OVER (PARTITION BY cluster_id
        |      ORDER BY prio DESC, doc_id ASC) AS rn
        |  FROM m)
        |SELECT m.doc_id, m.cluster_id, k.keeper_id,
        |  m.doc_id = k.keeper_id AS keep
        |FROM m JOIN k ON k.cluster_id = m.cluster_id AND k.rn = 1
        |ORDER BY m.doc_id""".stripMargin,
    "mm_decode_wav" ->
      """WITH c AS (
        |  SELECT doc_id, strlen(text) AS n,
        |    list_transform(range(1, strlen(text)+1),
        |      i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS codes
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, (n + (n % 2)) // 2 AS n_frames,
        |    list_transform(range(1, ((n + (n % 2)) // 2) + 1),
        |      i -> codes[CAST(2*i - 1 AS INT)]
        |        + 256 * (CASE WHEN 2*i <= n THEN codes[CAST(2*i AS INT)] ELSE 0 END)) AS v
        |  FROM c),
        |t AS (
        |  SELECT doc_id, n_frames,
        |    list_transform(v, x -> CASE WHEN x >= 32768 THEN x - 65536 ELSE x END) AS sv
        |  FROM s)
        |SELECT doc_id, CAST(1 AS BIGINT) AS n_channels,
        |  CAST(8000 AS BIGINT) AS sample_rate, CAST(16 AS BIGINT) AS bits,
        |  CAST(n_frames AS BIGINT) AS n_frames,
        |  CAST(n_frames * 1000000 // 8000 AS BIGINT) AS dur_micros,
        |  CAST(coalesce(list_sum(list_transform(sv, x -> abs(x))), 0) AS BIGINT) AS sum_abs,
        |  CAST(coalesce(list_max(list_transform(sv, x -> abs(x))), 0) AS BIGINT) AS peak_abs,
        |  CAST(coalesce(list_sum(list_transform(sv, x -> x*x)), 0) AS BIGINT) AS sum_sq
        |FROM t ORDER BY doc_id""".stripMargin,
    // AVI fixture replica: 8x4 24-bit frames (96 bytes each), frame
    // stream = text bytes zero-padded to whole frames (>= 1), every 2nd
    // frame sampled. Sampled-byte aggregates keep only positions whose
    // frame index is even; padding bytes are 0 so they never move a sum
    // or a max
    "mm_resample_wav" ->
      """WITH c AS (
        |  SELECT doc_id, strlen(text) AS n,
        |    list_transform(range(1, strlen(text)+1),
        |      i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS codes
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, (n + (n % 2)) // 2 AS nf,
        |    list_transform(range(1, ((n + (n % 2)) // 2) + 1),
        |      i -> codes[CAST(2*i - 1 AS INT)]
        |        + 256 * (CASE WHEN 2*i <= n THEN codes[CAST(2*i AS INT)] ELSE 0 END)) AS v
        |  FROM c),
        |w AS (
        |  SELECT doc_id, nf,
        |    list_transform(v, x -> CASE WHEN x >= 32768 THEN x - 65536 ELSE x END) AS sv
        |  FROM s),
        |r AS (
        |  SELECT doc_id, nf, nf * 3000 // 8000 AS no,
        |    list_transform(range(0, nf * 3000 // 8000),
        |      q -> sv[CAST(q * 8000 // 3000 + 1 AS INT)]) AS rv
        |  FROM w)
        |SELECT doc_id, CAST(8000 AS BIGINT) AS src_rate,
        |  CAST(3000 AS BIGINT) AS sample_rate,
        |  CAST(nf AS BIGINT) AS n_frames_src, CAST(no AS BIGINT) AS n_frames,
        |  CAST(coalesce(list_sum(list_transform(rv, x -> abs(x))), 0) AS BIGINT) AS sum_abs,
        |  CAST(coalesce(list_max(list_transform(rv, x -> abs(x))), 0) AS BIGINT) AS peak_abs,
        |  CAST(coalesce(list_sum(list_transform(rv, x -> x*x)), 0) AS BIGINT) AS sum_sq
        |FROM r ORDER BY doc_id""".stripMargin,
    "mm_decode_avi" ->
      """WITH c AS (
        |  SELECT doc_id, strlen(text) AS n,
        |    list_transform(range(1, strlen(text)+1),
        |      i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS codes
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, n, codes, greatest(1, (n + 95)//96) AS nf FROM c),
        |t AS (
        |  SELECT doc_id, nf, (nf + 1) // 2 AS n_sampled,
        |    list_transform(
        |      list_filter(range(1, n+1), i -> (((i-1)//96) % 2) = 0),
        |      i -> codes[CAST(i AS INT)]) AS sb
        |  FROM d)
        |SELECT doc_id, CAST(8 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
        |  CAST(40000 AS BIGINT) AS us_per_frame,
        |  CAST(nf AS BIGINT) AS n_frames,
        |  CAST(nf * 40000 AS BIGINT) AS dur_micros,
        |  CAST(n_sampled AS BIGINT) AS n_sampled,
        |  CAST(coalesce(list_sum(sb), 0) AS BIGINT) AS sum_byte,
        |  CAST(coalesce(list_max(sb), 0) AS BIGINT) AS peak_byte,
        |  CAST(coalesce(list_sum(list_transform(sb, x -> x*x)), 0) AS BIGINT) AS sum_sq
        |FROM t ORDER BY doc_id""".stripMargin
  ))

  /** Queries whose output is identical BY CONSTRUCTION to another query's
    * (e.g. a prefilter that only prunes non-matches before an exact join)
    * share that query's oracle rather than duplicating the SQL.
    */
  private def oracleAliases(m: Map[String, String]): Map[String, String] =
    m + ("text_decontaminate_bloom" -> m("text_decontaminate")) +
      // the streamed moment fold is exact (integer additivity), so the
      // batch oracles replay the streamed covariance/PCA unchanged
      ("emb_covariance_stream" -> m("emb_covariance")) +
      ("emb_pca_stream" -> m("emb_pca_topk"))
}
