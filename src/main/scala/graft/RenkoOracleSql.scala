package graft

/** DuckDB oracle SQL for the renko scan family.
  *
  * The renko fold is an ordered stateful recurrence, so the oracle drives a
  * recursive CTE — but a NAIVE per-tick recursion (one iteration per tick) is
  * hopeless at the driver gate's scale: DuckDB's per-iteration overhead is
  * ~0.8 ms even for a trivial join step, so 10k ticks ≈ 36 s PER ORACLE at
  * sf0.01 and the whole-gate run times out. Three structural tricks keep the
  * oracle exact and ≤~2.5 s at sf0.01:
  *
  *  1. CHUNKED PARALLEL SCAN (sqrt decomposition). Ticks are cut into
  *     ~sqrt(N) chunks of ~sqrt(N). The feasible renko entry states of a
  *     chunk are enumerable: `lr` always lies on the exact float grid
  *     `anchor + k*brickSize` (all multiples of 25 are exact doubles, and
  *     every engine add is an exact add of exact grid values), and after
  *     processing any tick the engine invariant |price − lr| < 2·brick
  *     holds (a same-direction move ≥ 1 brick or a reversal ≥ 2 bricks
  *     would have emitted), so the entry `lr` of every chunk k ≥ 1 is within
  *     ±3 bricks of the last price of chunk k−1 — ≤ 10 grid candidates × 3
  *     directions. ONE recursion of chunk-length steps advances every
  *     (chunk × candidate-state) row simultaneously (the per-tick arithmetic
  *     is unchanged, so every trajectory is the engine's bit-exact one); a
  *     second tiny recursion of #chunks steps threads the TRUE state through
  *     the per-chunk exit table (float-equality joins on exact grid doubles);
  *     the true per-tick trajectory is then a plain join back into the scan.
  *     Total recursion iterations: ~2·sqrt(N) instead of N (100× fewer at
  *     sf0.01 — measured 36 s → 2 s, bit-equal on every entry).
  *  2. The recursion carries only the minimal trajectory `(sym, i, lr, ld)`
  *     (last brick close + direction). Everything else — wick extremes,
  *     volumes, per-brick columns — is reconstructed RELATIONALLY afterwards:
  *     between emissions the state is constant, so segment aggregates
  *     (min/max price, tick counts) recover the accumulators exactly.
  *  3. Bricks emitted by one tick are expanded closed-form (not one
  *     recursion step per brick). Closes advance on the exact brick grid
  *     (`anchor + k*brickSize`, all doubles exact for this corpus), so the
  *     closed form is bit-identical to the engine's sequential adds.
  *
  * Numerics match `graft.core.RenkoEngine` operation-for-operation:
  * `n = (price - lastRenko) * (1/brickSize)`, truncation toward zero, the
  * CPython floor-division anchor (positive-price branch), and the µs
  * truncation of epoch-ns timestamps. Float literals use e-notation because
  * DuckDB parses `25.0` as DECIMAL, and lateral aliases never shadow a FROM
  * column (DuckDB silently prefers the column, shifting state by one row).
  */
object RenkoOracleSql {

  /** (open, high, low) source columns per mode — RenkoModes.sources. */
  private val modeSources: Map[String, (String, String, String)] = Map(
    "wicks" -> (("open", "high", "low")),
    "normal" -> (("open", "normal_high", "normal_low")),
    "nongap" -> (("nongap_open", "high", "low")),
    "reverse-wicks" -> (("open", "reverse_high", "reverse_low")),
    "reverse-nongap" -> (("reverse_nongap_open", "reverse_high", "reverse_low")),
    "fake-r-wicks" -> (("open", "fake_high", "fake_low")),
    "fake-r-nongap" -> (("reverse_fake_nongap_open", "fake_high", "fake_low")))

  /** events as a single anonymous series: (sym, te epoch-µs, price). */
  val eventsSrc: String =
    "SELECT '' AS sym, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS te, value AS price FROM events"

  private val B = "25e0" // EventBrick as an exact DOUBLE literal

  /** The CTE chain computing wide bricks for one tick source.
    *
    * @param p         CTE name prefix (two chains can coexist, cf. resume)
    * @param src       SQL yielding (sym, te BIGINT µs, price DOUBLE)
    * @param initLd    starting direction: batch 0, RenkoWS fresh start 1
    * @param ticksBase 0 = tick 0 is the anchor (consumed, not stepped);
    *                  1 = every tick is stepped (resume from a checkpoint)
    * @param istate    when ticksBase=1: name of a CTE with per-series initial
    *                  state columns (sym, lr0, ld0, w0, vol0)
    */
  def wideCtes(p: String, src: String, initLd: Int = 0, ticksBase: Int = 0,
      istate: Option[String] = None): String = {
    val rnOff = if (ticksBase == 0) "- 1" else ""
    val traj0 = istate match {
      case Some(ist) =>
        s"""${p}traj0 AS MATERIALIZED (
           |  SELECT sym, 0::BIGINT AS i, lr0 AS lr, ld0 AS ld, w0 AS w0x, vol0 AS v0x FROM $ist
           |),""".stripMargin
      case None =>
        s"""${p}anchor AS (
           |  SELECT t.sym,
           |    CASE WHEN dv - floor(dv) > 0.5e0 THEN floor(dv) + 1 ELSE floor(dv) END * $B AS av
           |  FROM (SELECT sym, (price - fmod(price, $B)) / $B AS dv FROM ${p}ticks WHERE i = 0) t
           |),
           |${p}traj0 AS MATERIALIZED (
           |  SELECT sym, 0::BIGINT AS i, av AS lr, $initLd AS ld, av AS w0x, 1::BIGINT AS v0x
           |  FROM ${p}anchor
           |),""".stripMargin
    }
    s"""${p}ticks AS MATERIALIZED (
       |  SELECT sym, CAST(row_number() OVER (PARTITION BY sym ORDER BY te) $rnOff AS BIGINT) AS i,
       |         te, price
       |  FROM ($src)
       |),
       |$traj0
       |${p}prm AS MATERIALIZED (
       |  SELECT sym, mxi, greatest(1::BIGINT, CAST(ceil(sqrt(CAST(mxi AS DOUBLE))) AS BIGINT)) AS clen,
       |         (mxi + greatest(1::BIGINT, CAST(ceil(sqrt(CAST(mxi AS DOUBLE))) AS BIGINT)) - 1)
       |           // greatest(1::BIGINT, CAST(ceil(sqrt(CAST(mxi AS DOUBLE))) AS BIGINT)) AS nch
       |  FROM (SELECT sym, max(i) AS mxi FROM ${p}ticks GROUP BY sym)
       |),
       |${p}cand AS MATERIALIZED (
       |  SELECT p.sym, kk.k AS ck,
       |         t0.lr + (CAST(floor((t.price - t0.lr) * (1e0/$B)) AS BIGINT) + dd.d) * $B AS lr0,
       |         ll.l AS ld0
       |  FROM ${p}prm p
       |  JOIN ${p}traj0 t0 ON t0.sym = p.sym,
       |  unnest(range(1::BIGINT, p.nch)) AS kk(k)
       |  JOIN ${p}ticks t ON t.sym = p.sym AND t.i = kk.k * p.clen,
       |  unnest([-4,-3,-2,-1,0,1,2,3,4,5]) AS dd(d),
       |  unnest([-1,0,1]) AS ll(l)
       |),
       |${p}scan AS (
       |  SELECT sym, ck, lr0, ld0, lr, ld, off FROM (
       |    SELECT sym, 0::BIGINT AS ck, lr AS lr0, ld AS ld0, lr, ld, 0::BIGINT AS off FROM ${p}traj0
       |    UNION ALL
       |    SELECT sym, ck, lr0, ld0, lr0 AS lr, ld0 AS ld, 0::BIGINT AS off FROM ${p}cand
       |  )
       |  UNION ALL
       |  SELECT sym2 AS sym, ck2 AS ck, lr02 AS lr0, ld02 AS ld0, lr2 AS lr, ld2 AS ld, off2 AS off
       |  FROM (
       |    SELECT
       |      s.sym AS sym2, s.ck AS ck2, s.lr0 AS lr02, s.ld0 AS ld02, s.off + 1 AS off2,
       |      t.price AS px,
       |      (px - s.lr) * (1e0/$B) AS nn,
       |      (abs(nn) >= 1e0) AS crossed,
       |      CASE WHEN px - s.lr > 0 THEN 1 ELSE -1 END AS dirx,
       |      (dirx * s.ld >= 0) AS samedir,
       |      CASE WHEN crossed AND NOT samedir AND abs(nn) >= 2e0 THEN 1 ELSE 0 END AS rv,
       |      CASE WHEN NOT crossed THEN 0::BIGINT
       |           WHEN samedir THEN CAST(abs(trunc(nn)) AS BIGINT)
       |           WHEN rv = 1 THEN CAST(abs(trunc(nn - 2*dirx)) AS BIGINT)
       |           ELSE 0::BIGINT END AS ns,
       |      (rv + ns > 0) AS em,
       |      CASE WHEN em THEN s.lr + dirx*(2*rv + ns)*$B ELSE s.lr END AS lr2,
       |      CASE WHEN em THEN dirx ELSE s.ld END AS ld2
       |    FROM ${p}scan s
       |    JOIN ${p}prm pp ON pp.sym = s.sym
       |    JOIN ${p}ticks t ON t.sym = s.sym AND t.i = s.ck * pp.clen + s.off + 1
       |    WHERE s.off < pp.clen
       |  )
       |),
       |${p}scanm AS MATERIALIZED (SELECT * FROM ${p}scan),
       |${p}exits AS MATERIALIZED (
       |  SELECT sym, ck, lr0, ld0, arg_max(lr, off) AS lrx, arg_max(ld, off) AS ldx
       |  FROM ${p}scanm GROUP BY sym, ck, lr0, ld0
       |),
       |${p}comp AS (
       |  SELECT sym, 0::BIGINT AS ck, lr AS elr, ld AS eld FROM ${p}traj0
       |  UNION ALL
       |  SELECT c.sym, c.ck + 1, x.lrx, x.ldx
       |  FROM ${p}comp c
       |  JOIN ${p}exits x ON x.sym = c.sym AND x.ck = c.ck AND x.lr0 = c.elr AND x.ld0 = c.eld
       |  JOIN ${p}prm pp ON pp.sym = c.sym
       |  WHERE c.ck + 1 < pp.nch
       |),
       |${p}traj AS MATERIALIZED (
       |  SELECT sym, i, lr, ld FROM ${p}traj0
       |  UNION ALL
       |  SELECT s.sym, s.ck * pp.clen + s.off AS i, s.lr, s.ld
       |  FROM ${p}scanm s
       |  JOIN ${p}comp c ON c.sym = s.sym AND c.ck = s.ck AND s.lr0 = c.elr AND s.ld0 = c.eld
       |  JOIN ${p}prm pp ON pp.sym = s.sym
       |  WHERE s.off > 0
       |),
       |${p}em0 AS (
       |  SELECT sym, i AS ei, lr, ld AS dir, lag(lr) OVER ${p}w AS prev_lr, lag(ld) OVER ${p}w AS prev_ld
       |  FROM ${p}traj WINDOW ${p}w AS (PARTITION BY sym ORDER BY i)
       |),
       |${p}em1 AS (
       |  SELECT sym, ei, lr, dir, prev_lr, prev_ld,
       |    lag(ei, 1, 0::BIGINT) OVER (PARTITION BY sym ORDER BY ei) AS prev_ei
       |  FROM ${p}em0 WHERE lr != prev_lr
       |),
       |${p}em2 AS (
       |  SELECT e.*, t.te AS ets,
       |    CAST(round(abs(e.lr - e.prev_lr) / $B) AS BIGINT) AS totb,
       |    CASE WHEN e.prev_ld * e.dir < 0 THEN 1 ELSE 0 END AS rev,
       |    totb - 2*rev + CASE WHEN rev = 1 THEN 1 ELSE 0 END AS nbricks,
       |    nbricks - rev AS nsame,
       |    e.ei - e.prev_ei + (CASE WHEN e.prev_ei = 0 THEN
       |      (SELECT t0.v0x FROM ${p}traj0 t0 WHERE t0.sym = e.sym) ELSE 1 END) AS evol,
       |    CASE WHEN e.prev_ei = 0 THEN 1 ELSE e.prev_ei END AS etopen
       |  FROM ${p}em1 e JOIN ${p}ticks t ON t.sym = e.sym AND t.i = e.ei
       |),
       |${p}em3 AS MATERIALIZED (
       |  SELECT e.*,
       |    CASE WHEN e.prev_ei = 0 THEN (SELECT t0.w0x FROM ${p}traj0 t0 WHERE t0.sym = e.sym)
       |         WHEN lag(e.nsame) OVER ${p}v = 0 THEN lag(e.lr - e.dir*$B) OVER ${p}v
       |         ELSE lag(e.lr) OVER ${p}v END AS wreset
       |  FROM ${p}em2 e WINDOW ${p}v AS (PARTITION BY e.sym ORDER BY e.ei)
       |),
       |${p}seg AS (
       |  SELECT e.sym, e.ei, min(t.price) AS smn, max(t.price) AS smx
       |  FROM ${p}em3 e JOIN ${p}ticks t ON t.sym = e.sym AND t.i > e.prev_ei AND t.i <= e.ei
       |  GROUP BY e.sym, e.ei
       |),
       |${p}emx AS (
       |  SELECT e.*, least(e.wreset, s.smn) AS ewmin, greatest(e.wreset, s.smx) AS ewmax
       |  FROM ${p}em3 e JOIN ${p}seg s ON s.sym = e.sym AND s.ei = e.ei
       |),
       |${p}bricks AS (
       |  SELECT
       |    st.sym, st.ei AS i, u.j, st.ets,
       |    (st.rev = 1 AND u.j = 0) AS is_rev_b,
       |    (st.dir = 1) AS isup,
       |    st.prev_lr + st.dir * (CASE WHEN is_rev_b THEN 2 ELSE 2*st.rev + (u.j - st.rev + 1) END) * $B AS close,
       |    close - st.dir*$B AS open,
       |    CASE WHEN u.j = 0 THEN st.ewmin
       |         WHEN u.j = 1 AND st.rev = 1 THEN st.prev_lr + st.dir*$B
       |         ELSE open END AS bwmin,
       |    CASE WHEN u.j = 0 THEN st.ewmax
       |         WHEN u.j = 1 AND st.rev = 1 THEN st.prev_lr + st.dir*$B
       |         ELSE open END AS bwmax,
       |    CASE WHEN isup THEN bwmin ELSE bwmax END AS wick,
       |    CASE WHEN isup THEN close ELSE wick END AS high,
       |    CASE WHEN isup THEN wick ELSE close END AS low,
       |    CASE WHEN isup THEN close ELSE open END AS normal_high,
       |    CASE WHEN isup THEN open ELSE close END AS normal_low,
       |    CASE WHEN (isup AND open > low) OR (NOT isup AND open < high) THEN wick ELSE open END AS nongap_open,
       |    CASE WHEN u.j = 0 THEN st.evol ELSE 1::BIGINT END AS volume,
       |    st.dir AS direction,
       |    CASE WHEN is_rev_b THEN 1 ELSE 0 END AS is_reversal,
       |    CASE WHEN u.j = 0 THEN st.etopen ELSE st.ei END AS tick_index_open,
       |    st.ei AS tick_index_close,
       |    CASE WHEN is_rev_b THEN nongap_open ELSE open END AS reverse_nongap_open,
       |    CASE WHEN is_rev_b THEN st.prev_lr ELSE open END AS reverse_fake_nongap_open,
       |    CASE WHEN is_rev_b THEN high ELSE normal_high END AS reverse_high,
       |    CASE WHEN is_rev_b THEN low ELSE normal_low END AS reverse_low,
       |    CASE WHEN is_rev_b AND NOT isup THEN st.prev_lr ELSE normal_high END AS fake_high,
       |    CASE WHEN is_rev_b AND isup THEN st.prev_lr ELSE normal_low END AS fake_low
       |  FROM ${p}emx st, unnest(range(CAST(st.nbricks AS BIGINT))) AS u(j)
       |),
       |${p}firstts AS (SELECT sym, min(ets) AS fts FROM ${p}bricks GROUP BY sym)""".stripMargin
  }

  /** Batch mode-projected oracle (drop-first rule applied). */
  def modeOracle(mode: String, src: String = eventsSrc): String = {
    val (o, h, l) = modeSources(mode)
    s"""WITH RECURSIVE ${wideCtes("", src)}
       |SELECT b.sym AS symbol, make_timestamp(b.ets) AS datetime,
       |  $o AS open, $h AS high, $l AS low, close, volume, direction, is_reversal,
       |  tick_index_open, tick_index_close
       |FROM bricks b JOIN firstts f ON f.sym = b.sym
       |WHERE b.ets != f.fts
       |ORDER BY b.sym, b.i, b.j""".stripMargin
  }

  /** `to_rws` checkpoint projection oracle. */
  def toRwsOracle: String =
    s"""WITH RECURSIVE ${wideCtes("", eventsSrc)}
       |SELECT b.sym AS symbol, open, high, low, close, volume, direction, is_reversal,
       |  normal_high, normal_low, nongap_open, reverse_nongap_open,
       |  reverse_fake_nongap_open, reverse_high, reverse_low, fake_high, fake_low,
       |  $B AS brick_size, b.ets AS timestamp
       |FROM bricks b JOIN firstts f ON f.sym = b.sym
       |WHERE b.ets != f.fts
       |ORDER BY b.sym, b.i, b.j""".stripMargin

  private val wsCols =
    """open, high, low, close, volume, direction, is_reversal, normal_high,
      |normal_low, nongap_open, reverse_nongap_open, reverse_fake_nongap_open,
      |reverse_high, reverse_low, fake_high, fake_low""".stripMargin

  /** RenkoWS fresh replay: synthetic initial brick at the anchor, starting
    * direction +1, NO drop-first, integer µs `timestamp` column.
    */
  def wsReplayOracle: String =
    s"""WITH RECURSIVE ${wideCtes("", eventsSrc, initLd = 1)}
       |SELECT symbol, timestamp, $wsCols FROM (
       |  SELECT a.sym AS symbol, t.te AS timestamp, a.av AS open, a.av AS high,
       |    a.av AS low, a.av AS close, 1::BIGINT AS volume, 1 AS direction,
       |    1 AS is_reversal, a.av AS normal_high, a.av AS normal_low,
       |    a.av AS nongap_open, a.av AS reverse_nongap_open,
       |    a.av AS reverse_fake_nongap_open, a.av AS reverse_high,
       |    a.av AS reverse_low, a.av AS fake_high, a.av AS fake_low,
       |    -1::BIGINT AS oi, 0::BIGINT AS oj
       |  FROM anchor a JOIN ticks t ON t.sym = a.sym AND t.i = 0
       |  UNION ALL
       |  SELECT b.sym, b.ets, open, high, low, close, volume,
       |    direction, is_reversal, normal_high, normal_low, nongap_open,
       |    reverse_nongap_open, reverse_fake_nongap_open, reverse_high, reverse_low,
       |    fake_high, fake_low, b.i, b.j
       |  FROM bricks b)
       |ORDER BY symbol, oi, oj""".stripMargin

  /** `renko_animate(mode)` oracle (reference renkodf.py:767-858): the
    * ws-replay completed frame mode-projected (incl. the synthetic initial
    * brick) + ONE forming brick per key reconstructed from the
    * end-of-replay accumulators, + the per-key retention window.
    *
    * Forming-state reconstruction is relational, from CTEs the replay
    * already built: the last emission's post-brick wick reset (`lr`, or
    * `lr − dir·brick` after a reversal-only emission, or the anchor when
    * nothing emitted), folded with the min/max price of the post-emission
    * tick segment; volume = 1 + ticks since the last emission; price/ts =
    * the key's last tick. The forming OPEN/HIGH/LOW then follow the
    * reference's adjustment against the key's LAST completed brick:
    * `nongap`-family modes re-open at the wick, `normal` clamps high/low to
    * the last body, the rest re-open at the last body edge.
    */
  def animateOracle(mode: String, maxLen: Int = 0, keep: Int = 0,
      src: String = eventsSrc): String = {
    val (o, h, l) = modeSources(mode)
    val nongapRule =
      Set("nongap", "reverse-nongap", "fake-r-nongap").contains(mode)
    def adj(wick: String, edge: String): String =
      if (nongapRule) wick else edge
    val oAdj =
      s"""CASE WHEN lc.lc IS NULL THEN f.fprice
         |     WHEN lc.lc > lc.lo AND f.fprice > lc.lc THEN ${adj("f.wmin", "lc.lc")}
         |     WHEN lc.lc > lc.lo AND f.fprice < lc.lo THEN ${adj("f.wmax", "lc.lo")}
         |     WHEN NOT (lc.lc > lc.lo) AND f.fprice < lc.lc THEN ${adj("f.wmax", "lc.lc")}
         |     WHEN NOT (lc.lc > lc.lo) AND f.fprice > lc.lo THEN ${adj("f.wmin", "lc.lo")}
         |     ELSE f.fprice END""".stripMargin
    val hCol =
      if (mode == "normal")
        """CASE WHEN lc.lc > lc.lo AND f.fprice < lc.lo THEN lc.lo
          |     WHEN lc.lc IS NOT NULL AND NOT (lc.lc > lc.lo) AND f.fprice < lc.lc THEN lc.lc
          |     ELSE f.fprice END""".stripMargin
      else "f.wmax"
    val lCol =
      if (mode == "normal")
        """CASE WHEN lc.lc > lc.lo AND f.fprice > lc.lc THEN lc.lc
          |     WHEN lc.lc IS NOT NULL AND NOT (lc.lc > lc.lo) AND f.fprice > lc.lo THEN lc.lo
          |     ELSE f.fprice END""".stripMargin
      else "f.wmin"
    val retained =
      if (maxLen == 0) "SELECT * FROM completed"
      else
        s"""SELECT * FROM (
           |  SELECT c.*, count(*) OVER (PARTITION BY symbol) AS n,
           |         row_number() OVER (PARTITION BY symbol ORDER BY oi DESC, oj DESC) AS rk
           |  FROM completed c)
           |WHERE n < $maxLen OR rk <= n - ${maxLen - keep}""".stripMargin
    s"""WITH RECURSIVE ${wideCtes("", src, initLd = 1)},
       |completed AS (
       |  SELECT a.sym AS symbol, t.te AS timestamp, a.av AS open, a.av AS high,
       |    a.av AS low, a.av AS close, 1::BIGINT AS volume, 1 AS direction,
       |    1 AS is_reversal, -1::BIGINT AS oi, 0::BIGINT AS oj
       |  FROM anchor a JOIN ticks t ON t.sym = a.sym AND t.i = 0
       |  UNION ALL
       |  SELECT b.sym, b.ets, $o, $h, $l, close, volume, direction, is_reversal, b.i, b.j
       |  FROM bricks b
       |),
       |mxt AS (SELECT sym, max(i) AS mxi FROM ticks GROUP BY sym),
       |lastp AS (
       |  SELECT t.sym, t.te AS fts, t.price AS fprice, m.mxi
       |  FROM ticks t JOIN mxt m ON m.sym = t.sym AND t.i = m.mxi),
       |lastem AS (
       |  SELECT sym, ei, lr, dir, nsame FROM (
       |    SELECT e.*, row_number() OVER (PARTITION BY e.sym ORDER BY e.ei DESC) AS rn
       |    FROM emx e) WHERE rn = 1),
       |fstate AS (
       |  SELECT p.sym, p.fts, p.fprice,
       |    COALESCE(le.ei, 0::BIGINT) AS lei,
       |    p.mxi - COALESCE(le.ei, 0::BIGINT) + 1 AS fvol,
       |    CASE WHEN le.sym IS NULL THEN (SELECT t0.w0x FROM traj0 t0 WHERE t0.sym = p.sym)
       |         WHEN le.nsame = 0 THEN le.lr - le.dir*$B
       |         ELSE le.lr END AS wreset
       |  FROM lastp p LEFT JOIN lastem le ON le.sym = p.sym),
       |fseg AS (
       |  SELECT f.sym, min(t.price) AS smn, max(t.price) AS smx
       |  FROM fstate f JOIN ticks t ON t.sym = f.sym AND t.i > f.lei
       |  GROUP BY f.sym),
       |fwick AS (
       |  SELECT f.*, least(f.wreset, COALESCE(s.smn, f.wreset)) AS wmin,
       |    greatest(f.wreset, COALESCE(s.smx, f.wreset)) AS wmax
       |  FROM fstate f LEFT JOIN fseg s ON s.sym = f.sym),
       |lastc AS (
       |  SELECT symbol, lo, lc FROM (
       |    SELECT c.symbol, c.open AS lo, c.close AS lc,
       |      row_number() OVER (PARTITION BY c.symbol ORDER BY c.oi DESC, c.oj DESC) AS rn
       |    FROM completed c) WHERE rn = 1),
       |forming AS (
       |  SELECT f.sym AS symbol, f.fts AS timestamp,
       |    $oAdj AS open,
       |    $hCol AS high,
       |    $lCol AS low,
       |    f.fprice AS close, f.fvol AS volume,
       |    CASE WHEN f.fprice > open THEN 1 WHEN f.fprice < open THEN -1 ELSE 0 END AS direction,
       |    0 AS is_reversal
       |  FROM fwick f LEFT JOIN lastc lc ON lc.symbol = f.sym)
       |SELECT symbol, timestamp, open, high, low, close, volume, direction,
       |  is_reversal, is_forming
       |FROM (
       |  SELECT symbol, timestamp, open, high, low, close, volume, direction,
       |    is_reversal, 0 AS is_forming, oi, oj
       |  FROM ($retained)
       |  UNION ALL
       |  SELECT symbol, timestamp, open, high, low, close, volume, direction,
       |    is_reversal, 1, 9223372036854775807::BIGINT, 0::BIGINT
       |  FROM forming)
       |ORDER BY symbol, oi, oj""".stripMargin
  }

  /** Checkpoint/resume splice: batch-compute the head (epoch-ns ≤ midpoint),
    * rehydrate state from the checkpoint's LAST brick (wick/renko reset to
    * its close — the reference's documented approximate splice), replay the
    * tail events (epoch-µs > midpoint/1000) from that state.
    */
  def wsResumeOracle: String = {
    val cutNs = "(SELECT (min(epoch_ns(ts)) + max(epoch_ns(ts))) // 2 FROM events)"
    val headSrc = s"SELECT '' AS sym, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS te, value AS price " +
      s"FROM events WHERE epoch_ns(ts) <= $cutNs"
    val tailSrc = s"SELECT '' AS sym, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS te, value AS price " +
      s"FROM events WHERE epoch_ns(ts) // 1000 > $cutNs // 1000"
    s"""WITH RECURSIVE ${wideCtes("h_", headSrc)},
       |istate AS (
       |  SELECT sym, close AS lr0, direction AS ld0, close AS w0, volume AS vol0
       |  FROM (
       |    SELECT b.*, row_number() OVER (PARTITION BY b.sym ORDER BY b.i DESC, b.j DESC) AS rn
       |    FROM h_bricks b JOIN h_firstts f ON f.sym = b.sym
       |    WHERE b.ets != f.fts)
       |  WHERE rn = 1
       |),
       |${wideCtes("", tailSrc, ticksBase = 1, istate = Some("istate"))}
       |SELECT b.sym AS symbol, b.ets AS timestamp, $wsCols
       |FROM bricks b
       |ORDER BY b.sym, b.i, b.j""".stripMargin
  }

  /** All renko-family oracle entries, keyed by SparkEntry.queries name. */
  def entries: Map[String, String] = {
    val eventsByType =
      "SELECT event_type AS sym, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS te, value AS price FROM events"
    val eventsByUser =
      "SELECT CAST(user_id AS VARCHAR) AS sym, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS te, value AS price FROM events"
    Map(
      "renko_wicks" -> modeOracle("wicks"),
      "renko_normal" -> modeOracle("normal"),
      "renko_nongap" -> modeOracle("nongap"),
      "renko_reverse_wicks" -> modeOracle("reverse-wicks"),
      "renko_reverse_nongap" -> modeOracle("reverse-nongap"),
      "renko_fake_r_wicks" -> modeOracle("fake-r-wicks"),
      "renko_fake_r_nongap" -> modeOracle("fake-r-nongap"),
      "renko_sorted_scan" -> modeOracle("wicks"),
      "renko_parallel_scan" -> modeOracle("wicks"),
      "renko_sql_tvf" -> modeOracle("wicks"),
      "renko_multi_series" -> modeOracle("wicks", src = eventsByType),
      "renko_multi_series_parallel" -> modeOracle("wicks", src = eventsByType),
      // symbol pushdown ≡ restricting the tick SOURCE to that series — the
      // oracle mirrors the pushed plan exactly
      "renko_tvf_pushdown" -> modeOracle("wicks",
        src = eventsByType + " WHERE event_type = 'click'"),
      "renko_by_user" -> modeOracle("wicks", src = eventsByUser),
      "renko_to_rws" -> toRwsOracle,
      "renko_ws_replay" -> wsReplayOracle,
      "renko_ws_resume" -> wsResumeOracle,
      // renko_animate graduated to the driver gate (VERDICT r15 #4):
      // retention exercised on the single-series entry, the multi-key
      // in-plan animate on the by-type entry
      "renko_animate_wicks" -> animateOracle("wicks", maxLen = 500, keep = 250),
      "renko_animate_nongap" -> animateOracle("nongap", src = eventsByType),
      "renko_animate_fake_r_nongap" -> animateOracle("fake-r-nongap"))
  }
}
