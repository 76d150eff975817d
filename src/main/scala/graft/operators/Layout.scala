package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT: Morton (z-order) clustering, exact
  * contiguous file assignment, and per-file zone maps — the storage-layout
  * lever that turns parquet min/max statistics into multi-dimensional
  * pruning. A 100 TB table laid out by one sort key prunes scans on that
  * key only; laid out by the z-interleave of two keys, every file's
  * min/max span is TIGHT IN BOTH dimensions, so a 2-D box predicate skips
  * most files (and, inside a file, most row groups) before any row is
  * read. Measured on the events corpus: a quarter-range box on
  * (ts, value) touches ~4× fewer files under z-order than under the
  * natural time layout (`layout_zorder_pruning` is the oracle-checked
  * witness; LayoutSpec asserts the same on physically written parquet).
  *
  * Cross-engine exactness contract (what makes these oracle-checkable):
  * quantization is `floor(((v - min) / (max - min)) * 2^bits)` on IEEE
  * doubles — subtract, divide, multiply, floor are correctly rounded in
  * both engines — and the bit interleave is integer arithmetic. File
  * assignment is the exact global rank in (z, id) order via the
  * hierarchical 1024-range pattern ([[Sampling.shufflePosition]]'s shape:
  * a tiny broadcast base frame + within-range row_number — never a
  * one-task global window), then integer division `(rank-1)·nFiles div N`.
  *
  * Scale shape: one tiny stats aggregate broadcast back (min/max/count),
  * z-value computation scan-local in whole-stage codegen (built-in bit
  * ops only, no UDF), ONE shuffle for the rank/write (the same shuffle
  * any re-layout pays), zone maps a per-file aggregate.
  */
object Layout {

  /** Quantize `v` against the closed range [vmin, vmax] into `bits`-bit
    * space: 0 at vmin, 2^bits−1 at vmax, clamped (values outside the
    * range — e.g. from a stale stats frame — saturate rather than wrap).
    * Degenerate range (vmax ≤ vmin) maps everything to 0, and a NULL value
    * (or an all-NULL stats range) also quantizes to 0 — consistent with the
    * clamping contract, and required so file assignment stays a pure
    * REORDER: a NULL dim must land in file 0's region, never silently drop
    * the row (a NULL z-value would void the rank join's equi-key).
    */
  def quantize(v: Column, vmin: Column, vmax: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bits must be in [1, 20], got $bits")
    val hi = (1L << bits) - 1L
    val vd = v.cast("double"); val mn = vmin.cast("double"); val mx = vmax.cast("double")
    val scaled = floor(((vd - mn) / (mx - mn)) * lit((1L << bits).toDouble)).cast("long")
    coalesce(
      when(mx <= mn, lit(0L)).otherwise(least(greatest(scaled, lit(0L)), lit(hi))),
      lit(0L))
  }

  /** Morton interleave of two `bits`-wide quantized dims: qx takes the odd
    * bit positions, qy the even — z(qx,qy) = Σ_b qx[b]·2^(2b+1) + qy[b]·2^(2b).
    * The summands occupy disjoint bits, so `+` is exact OR; everything is
    * built-in shift/mask arithmetic — codegen'd, no UDF.
    */
  def interleave2(qx: Column, qy: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc +
        shiftleft(shiftright(qx, b).bitwiseAND(lit(1L)), 2 * b + 1) +
        shiftleft(shiftright(qy, b).bitwiseAND(lit(1L)), 2 * b)
    }
  }

  /** N-dimensional Morton interleave: dim k of `qs` takes bit positions
    * k, k+N, k+2N, … (dim 0 the LOWEST lane, so [[interleave2]]'s (x odd,
    * y even) convention is `interleaveN(Seq(y, x), …)` reversed — 2-dim
    * callers should keep using interleave2). Total width N·bits must fit
    * a long. Disjoint lanes, `+` is exact OR, built-ins only — codegen'd.
    */
  def interleaveN(qs: Seq[Column], bits: Int): Column = {
    require(qs.nonEmpty, "need at least one dimension")
    require(bits >= 1 && qs.size * bits <= 63,
      s"${qs.size} dims x $bits bits must fit a long")
    val n = qs.size
    qs.zipWithIndex.foldLeft(lit(0L)) { case (acc, (q, k)) =>
      (0 until bits).foldLeft(acc) { (a, b) =>
        a + shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * n + k)
      }
    }
  }

  /** Input columns + `zval` over ANY number of numeric dims: per-dim
    * bounds from one broadcast aggregate, `bits` per dim chosen to fit
    * 63 total unless overridden. The 3-dim form is the (time, value,
    * entity) layout a multi-tenant event store prunes with.
    */
  def withZValueN(df: DataFrame, cols: Seq[String], bits: Int = 0): DataFrame = {
    require(cols.nonEmpty, "need at least one dimension")
    val b = if (bits > 0) bits else math.min(16, 63 / cols.size)
    require(cols.size * b <= 63, s"${cols.size} dims x $b bits must fit a long")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val annotated = df.crossJoin(broadcast(stats))
    val qs = cols.map(c => quantize(col(c), col(s"__mn_$c"), col(s"__mx_$c"), b))
    annotated
      .withColumn("zval", interleaveN(qs, b))
      .drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** Internal: annotate `df` with the corpus stats (broadcast one-row
    * frame), the per-dim quantizations `__qx`/`__qy`, and the z-value.
    * Stats columns stay on the frame for downstream file assignment and
    * box arithmetic; public entry points drop them.
    */
  private def corpusStats(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df.agg(
      min(col(xCol).cast("double")).as("__xmn"), max(col(xCol).cast("double")).as("__xmx"),
      min(col(yCol).cast("double")).as("__ymn"), max(col(yCol).cast("double")).as("__ymx"),
      count(lit(1)).as("__total"))

  /** [[annotated]] against a PRE-COMPUTED one-row stats frame — so a
    * caller deriving several layouts of the same corpus (the pruning
    * witness) pays the corpus-wide stats aggregate once, not per layout.
    */
  private def annotatedFrom(
      df: DataFrame, stats: DataFrame, xCol: String, yCol: String, bits: Int): DataFrame =
    df.crossJoin(broadcast(stats))
      .withColumn("__qx", quantize(col(xCol), col("__xmn"), col("__xmx"), bits))
      .withColumn("__qy", quantize(col(yCol), col("__ymn"), col("__ymx"), bits))
      .withColumn("zval", interleave2(col("__qx"), col("__qy"), bits))

  private def annotated(df: DataFrame, xCol: String, yCol: String, bits: Int): DataFrame =
    annotatedFrom(df, corpusStats(df, xCol, yCol), xCol, yCol, bits)

  private val InternalCols = Seq("__xmn", "__xmx", "__ymn", "__ymx", "__total", "__qx", "__qy")

  /** Input columns + `zval`, the Morton z-value of (xCol, yCol) against
    * bounds computed from the data in one tiny broadcast aggregate.
    */
  def withZValue(df: DataFrame, xCol: String, yCol: String, bits: Int = 16): DataFrame =
    annotated(df, xCol, yCol, bits).drop(InternalCols: _*)

  /** Hilbert-curve index of two `bits`-wide quantized dims — the stronger
    * locality sibling of [[interleave2]] (consecutive indices are always
    * adjacent cells; Morton jumps at power-of-two boundaries), via the
    * native codegen'd [[graft.functions.expressions.GraftHilbert2]] (the
    * per-bit rotation fold rewrites x AND y each step, so a composed
    * Column form would double its expression tree per bit).
    */
  def hilbert2(qx: Column, qy: Column, bits: Int = 16): Column =
    graft.functions.expressions.HilbertExpression.hilbert2Native(qx, qy, bits)

  /** Input columns + `hval`, the Hilbert index of (xCol, yCol) against
    * bounds computed from the data in one tiny broadcast aggregate.
    */
  def withHilbertValue(df: DataFrame, xCol: String, yCol: String, bits: Int = 16): DataFrame =
    annotated(df, xCol, yCol, bits)
      .withColumn("hval", hilbert2(col("__qx"), col("__qy"), bits))
      .drop(InternalCols: _*).drop("zval")

  /** Hilbert-curve file assignment — [[zOrderAssign]] with the Hilbert
    * index as the clustering key: input columns + `hval`, `position`,
    * `file_id`.
    */
  def hilbertAssign(
      df: DataFrame, xCol: String, yCol: String,
      nFiles: Int, idCol: String, bits: Int = 16): DataFrame =
    hilbertAssignFrom(annotated(df, xCol, yCol, bits), nFiles, idCol, bits)

  private def hilbertAssignFrom(
      ann: DataFrame, nFiles: Int, idCol: String, bits: Int): DataFrame = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val h = ann.withColumn("hval", hilbert2(col("__qx"), col("__qy"), bits))
    hierarchicalRank(h, col("hval"), shiftright(col("hval"), math.max(1, 2 * bits - 10)), idCol)
      .withColumn("file_id", expr(s"(position - 1) * $nFiles div __total"))
      .drop(InternalCols: _*).drop("zval")
  }

  /** Exact global 1-based rank in (orderCol, idCol) order — hierarchical:
    * a monotone coarse `rangeKey` splits the corpus into ≤1024 ranges, the
    * per-range counts form a broadcast-sized base frame whose exclusive
    * prefix comes from a broadcast self-join ([[graft.util.SmallPrefix]] —
    * no single-task window anywhere), and the rank is base + within-range
    * row_number. The only corpus-sized operation is the within-range
    * window — partitioned, never one task.
    */
  private def hierarchicalRank(
      df: DataFrame, orderCol: Column, rangeKey: Column, idCol: String): DataFrame = {
    val tagged = df.withColumn("__rng", rangeKey).withColumn("__ord", orderCol)
    val rangeBase = graft.util.SmallPrefix.exclusivePrefix(
        tagged.groupBy(col("__rng")).agg(count(lit(1)).as("__rcnt")),
        "__rng", Map("__rcnt" -> "__base"))
      .select(col("__rng"), col("__base"))
    val wIn = Window.partitionBy(col("__rng")).orderBy(col("__ord").asc, col(idCol).asc)
    tagged.join(broadcast(rangeBase), Seq("__rng"))
      .withColumn("position", col("__base") + row_number().over(wIn).cast("long"))
      .drop("__rng", "__ord", "__base")
  }

  /** Z-order file assignment: input columns + `zval`, `position` (exact
    * rank in (zval, id) order) and `file_id` (0-based contiguous range
    * assignment — file k holds ranks (k·N/nFiles, (k+1)·N/nFiles], so each
    * file covers one contiguous z-interval, which is what makes its
    * min/max span tight in BOTH dimensions).
    */
  def zOrderAssign(
      df: DataFrame, xCol: String, yCol: String,
      nFiles: Int, idCol: String, bits: Int = 16): DataFrame =
    zOrderAssignFrom(annotated(df, xCol, yCol, bits), nFiles, idCol, bits)

  private def zOrderAssignFrom(
      ann: DataFrame, nFiles: Int, idCol: String, bits: Int): DataFrame = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    hierarchicalRank(ann, col("zval"), shiftright(col("zval"), math.max(1, 2 * bits - 10)), idCol)
      .withColumn("file_id", expr(s"(position - 1) * $nFiles div __total"))
      .drop(InternalCols: _*)
  }

  /** Single-dimension (natural sort) file assignment — the comparison
    * layout for the pruning witness: same contiguous-range math, ordered
    * by xCol alone.
    */
  def linearAssign(
      df: DataFrame, xCol: String, yCol: String,
      nFiles: Int, idCol: String, bits: Int = 16): DataFrame =
    linearAssignFrom(annotated(df, xCol, yCol, bits), xCol, nFiles, idCol, bits)

  private def linearAssignFrom(
      ann: DataFrame, xCol: String, nFiles: Int, idCol: String, bits: Int): DataFrame = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    hierarchicalRank(ann, col(xCol).cast("double"), shiftright(col("__qx"), math.max(1, bits - 10)), idCol)
      .withColumn("file_id", expr(s"(position - 1) * $nFiles div __total"))
      .drop(InternalCols: _*)
  }

  /** Per-file zone map — exactly the min/max statistics a parquet footer
    * carries per file/row-group: (file_id, n_rows, x_min, x_max, y_min,
    * y_max). A scan with a box predicate reads a file iff its span
    * overlaps the box; everything else is pruned from the listing.
    */
  def zoneMap(assigned: DataFrame, xCol: String, yCol: String): DataFrame =
    assigned.groupBy(col("file_id")).agg(
      count(lit(1)).as("n_rows"),
      min(col(xCol).cast("double")).as("x_min"), max(col(xCol).cast("double")).as("x_max"),
      min(col(yCol).cast("double")).as("y_min"), max(col(yCol).cast("double")).as("y_max"))

  /** The pruning witness, oracle-checkable end to end: lay the corpus out
    * both ways (z-order vs natural x sort) into `nFiles` contiguous files,
    * build both zone maps, and count the files a centered box predicate
    * (`[lo, hi]` as fractions of each dim's range) cannot prune:
    * (layout, files_total, files_hit, rows_in_hit). The z-order row should
    * show files_hit ≈ box-area·nFiles; the linear row shows ≈ box-width·
    * nFiles with every file spanning the full y range.
    */
  def pruningStats(
      df: DataFrame, xCol: String, yCol: String,
      nFiles: Int, idCol: String,
      boxLoFrac: Double = 0.375, boxHiFrac: Double = 0.625,
      bits: Int = 16, withHilbert: Boolean = false): DataFrame = {
    // ONE corpus-stats pass shared by every layout branch AND the box
    // arithmetic (localCheckpoint pins the one-row frame, so the 2-3
    // rank branches re-scan the corpus but never re-aggregate it)
    val stats = corpusStats(df, xCol, yCol).localCheckpoint(true)
    def ann = annotatedFrom(df, stats, xCol, yCol, bits)
    val zm0 =
      zoneMap(zOrderAssignFrom(ann, nFiles, idCol, bits), xCol, yCol)
        .withColumn("layout", lit("zorder"))
        .unionByName(
          zoneMap(linearAssignFrom(ann, xCol, nFiles, idCol, bits), xCol, yCol)
            .withColumn("layout", lit("linear")))
    val zm =
      if (!withHilbert) zm0
      else zm0.unionByName(
        zoneMap(hilbertAssignFrom(ann, nFiles, idCol, bits), xCol, yCol)
          .withColumn("layout", lit("hilbert")))
    val xlo = col("__xmn") + lit(boxLoFrac) * (col("__xmx") - col("__xmn"))
    val xhi = col("__xmn") + lit(boxHiFrac) * (col("__xmx") - col("__xmn"))
    val ylo = col("__ymn") + lit(boxLoFrac) * (col("__ymx") - col("__ymn"))
    val yhi = col("__ymn") + lit(boxHiFrac) * (col("__ymx") - col("__ymn"))
    val hit = col("x_max") >= xlo && col("x_min") <= xhi &&
      col("y_max") >= ylo && col("y_min") <= yhi
    zm.crossJoin(broadcast(stats))
      .groupBy(col("layout")).agg(
        count(lit(1)).as("files_total"),
        sum(when(hit, 1L).otherwise(0L)).as("files_hit"),
        sum(when(hit, col("n_rows")).otherwise(0L)).as("rows_in_hit"))
  }

  /** Physically write the z-ordered layout: range-repartition on zval into
    * `nFiles` output files, sorted within each — so every parquet file
    * (and every row group inside it) carries a tight min/max span on BOTH
    * dimensions, and a pushed-down 2-D box predicate skips row groups at
    * scan time. The range exchange is the one shuffle any re-layout pays.
    */
  def zOrderWrite(
      df: DataFrame, xCol: String, yCol: String,
      nFiles: Int, path: String, bits: Int = 16): Unit =
    withZValue(df, xCol, yCol, bits)
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(path)
}
