package graft

import graft.operators.{Layout, Sampling}
import org.apache.spark.sql.functions._

/** Z-order layout family: bit-level correctness of the Morton interleave,
  * quantization edges, exact file-assignment math, the pruning dividend on
  * PHYSICALLY WRITTEN parquet (not just the zone-map model), and the
  * leakage-safe grouped split.
  */
class LayoutSpec extends SparkTestBase {

  import spark.implicits._

  test("interleave2 puts x on odd bits, y on even — known values") {
    // x=5 (101b) -> bits 1,5 set = 34; y=3 (011b) -> bits 0,2 set = 5
    val r = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.interleave2(col("x"), col("y"), 3).as("z"))
      .head().getLong(0)
    assert(r == 39L)
    // full-width: x = 0xFFFF, y = 0 -> all odd bits of 32 = 0xAAAAAAAA
    val r2 = Seq((65535L, 0L)).toDF("x", "y")
      .select(Layout.interleave2(col("x"), col("y"), 16).as("z"))
      .head().getLong(0)
    assert(r2 == 0xAAAAAAAAL)
    val r3 = Seq((0L, 65535L)).toDF("x", "y")
      .select(Layout.interleave2(col("x"), col("y"), 16).as("z"))
      .head().getLong(0)
    assert(r3 == 0x55555555L)
  }

  test("quantize: min->0, max clamps to 2^bits-1, degenerate range -> 0") {
    val df = Seq((0.0), (1.0), (0.5), (-3.0), (9.0)).toDF("v")
    val q = df.select(Layout.quantize(col("v"), lit(0.0), lit(1.0), 16).as("q"))
      .as[Long].collect().toSeq
    assert(q == Seq(0L, 65535L, 32768L, 0L, 65535L)) // outside clamps, never wraps
    val deg = Seq(7.0).toDF("v")
      .select(Layout.quantize(col("v"), lit(5.0), lit(5.0), 16).as("q"))
      .head().getLong(0)
    assert(deg == 0L)
  }

  test("zOrderAssign: contiguous balanced files, rank == single-task ground truth") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val base = ev.select(col("event_id"),
      SparkTestBase.tsEpochUs(ev).cast("double").as("x"), col("value").as("y"))
    val assigned = Layout.zOrderAssign(base, "x", "y", nFiles = 16, idCol = "event_id")
    val rows = assigned.select("event_id", "zval", "position", "file_id").collect()
    val n = rows.length
    // ground truth: rank by (zval, event_id) computed driver-side
    val truth = rows.sortBy(r => (r.getLong(1), r.getLong(0))).zipWithIndex
      .map { case (r, i) => r.getLong(0) -> ((i + 1).toLong, i.toLong * 16 / n) }.toMap
    rows.foreach { r =>
      val (pos, fid) = truth(r.getLong(0))
      assert(r.getLong(2) == pos, s"position of ${r.getLong(0)}")
      assert(r.getLong(3) == fid, s"file_id of ${r.getLong(0)}")
    }
    // contiguous ranges: every file's rank span is dense and balanced ±1
    val sizes = rows.groupBy(_.getLong(3)).view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"file sizes $sizes")
  }

  test("physically written z-order layout prunes a 2-D box better than the time layout") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val base = ev.select(col("event_id"),
      SparkTestBase.tsEpochUs(ev).cast("double").as("x"), col("value").as("y"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString
    Layout.zOrderWrite(base, "x", "y", nFiles = 16, path = s"$tmp/z")
    base.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$tmp/linear")

    // round trip: the layout is a reorder, never a row change
    val back = spark.read.parquet(s"$tmp/z")
    assert(back.count() == base.count())
    assert(back.select("event_id", "x", "y").except(base).isEmpty &&
      base.except(back.select("event_id", "x", "y")).isEmpty)

    // REAL file spans via input_file_name: the box hits fewer z files
    val st = base.agg(min("x").as("xmn"), max("x").as("xmx"),
      min("y").as("ymn"), max("y").as("ymx")).head()
    val (xmn, xmx, ymn, ymx) =
      (st.getDouble(0), st.getDouble(1), st.getDouble(2), st.getDouble(3))
    val (xlo, xhi) = (xmn + 0.375 * (xmx - xmn), xmn + 0.625 * (xmx - xmn))
    val (ylo, yhi) = (ymn + 0.375 * (ymx - ymn), ymn + 0.625 * (ymx - ymn))
    def filesHit(path: String): (Long, Long) = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      val total = spans.count()
      val hit = spans.filter(col("x1") >= xlo && col("x0") <= xhi &&
        col("y1") >= ylo && col("y0") <= yhi).count()
      (total, hit)
    }
    val (zTotal, zHit) = filesHit(s"$tmp/z")
    val (lTotal, lHit) = filesHit(s"$tmp/linear")
    assert(zTotal >= 12 && lTotal >= 12, s"want ~16 files, got $zTotal / $lTotal")
    assert(zHit < lHit,
      s"z-order must prune better: z $zHit/$zTotal vs linear $lHit/$lTotal")
  }

  test("row-group skipping is real: pushed box filter reads fewer rows off the z layout") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val base = ev.select(col("event_id"),
      SparkTestBase.tsEpochUs(ev).cast("double").as("x"), col("value").as("y"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout-rg").toString
    Layout.zOrderWrite(base, "x", "y", nFiles = 16, path = s"$tmp/z")
    base.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$tmp/linear")
    val st = base.agg(min("x"), max("x"), min("y"), max("y")).head()
    val (xmn, xmx, ymn, ymx) =
      (st.getDouble(0), st.getDouble(1), st.getDouble(2), st.getDouble(3))
    // LITERAL box predicate — what reaches the parquet reader as
    // PushedFilters and drives row-group min/max skipping
    val (xlo, xhi) = (xmn + 0.375 * (xmx - xmn), xmn + 0.625 * (xmx - xmn))
    val (ylo, yhi) = (ymn + 0.375 * (ymx - ymn), ymn + 0.625 * (ymx - ymn))
    def scannedRows(path: String): (Long, Long) = {
      val df = spark.read.parquet(path)
        .filter(col("x") >= xlo && col("x") <= xhi && col("y") >= ylo && col("y") <= yhi)
      // collect() executes THIS queryExecution — its scan metrics are the
      // ones to read (a count() would run a different derived plan)
      val matched = df.collect().length.toLong
      val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no FileSourceScanExec in the plan"))
      assert(scan.metadata.get("PushedFilters").exists(s =>
        s.contains("GreaterThanOrEqual(x,") && s.contains("LessThanOrEqual(y,")),
        s"box predicate not pushed: ${scan.metadata.get("PushedFilters")}")
      (scan.metrics("numOutputRows").value, matched)
    }
    val total = base.count()
    val (zRead, zMatch) = scannedRows(s"$tmp/z")
    val (lRead, lMatch) = scannedRows(s"$tmp/linear")
    assert(zMatch == lMatch, "same rows must match either layout")
    assert(zRead < total, s"z layout must skip row groups: read $zRead of $total")
    assert(zRead < lRead,
      s"z layout must out-skip the time layout: z $zRead vs linear $lRead rows read")
  }

  test("pruningStats model agrees in shape: zorder strictly fewer files hit") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val base = ev.select(col("event_id"),
      SparkTestBase.tsEpochUs(ev).cast("double").as("x"), col("value").as("y"))
    val rows = Layout.pruningStats(base, "x", "y", nFiles = 64, idCol = "event_id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (zt, zh, _) = rows("zorder")
    val (lt, lh, _) = rows("linear")
    assert(zt == 64 && lt == 64)
    assert(zh < lh, s"zorder $zh vs linear $lh files hit")
    assert(zh <= 16, s"a quarter-range box should hit ~area*files, got $zh")
  }

  test("zOrderAssign is partitioning-invariant; empty and single-row inputs degrade sanely") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val base = ev.select(col("event_id"),
      SparkTestBase.tsEpochUs(ev).cast("double").as("x"), col("value").as("y"))
    def assign(df: org.apache.spark.sql.DataFrame) =
      Layout.zOrderAssign(df, "x", "y", nFiles = 16, idCol = "event_id")
        .select("event_id", "zval", "position", "file_id")
        .orderBy("event_id").collect().toSeq
    assert(assign(base) == assign(base.repartition(7)),
      "file assignment must not depend on input partitioning")
    // empty input: empty output, no crash
    assert(assign(base.filter(col("event_id") < 0)).isEmpty)
    // single row: degenerate ranges quantize to 0 -> zval 0, rank 1, file 0
    val one = assign(base.filter(col("event_id") === 0))
    assert(one.size == 1, s"single-row assignment: $one")
    assert(one.head.getLong(1) == 0L && one.head.getLong(2) == 1L &&
      one.head.getLong(3) == 0L, s"single-row assignment: ${one.head}")
  }

  test("grouped split co-assigns cluster members; singletons match assignSplits") {
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters: {1,2,3} and {10,11}; everything else singleton
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val out = Sampling.assignSplitsGrouped(docs, clusters)
      .select("doc_id", "group_key", "split").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(out(10L) == out(11L))
    // singleton assignment == plain assignSplits on the doc's own id
    val plain = Sampling.assignSplits(docs.filter(col("doc_id") > 11))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    plain.foreach { case (id, split) =>
      assert(out(id)._1 == id)
      assert(out(id)._2 == split, s"singleton $id")
    }
  }

  test("splitLeakage: per-document straddles, grouped is zero by construction") {
    val docs = (1L to 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // 50 near-dup pairs chaining (2k-1, 2k): enough that SOME pair lands
    // astride a split boundary under the per-document hash
    val pairs = (1L to 50L).map(k => (2 * k - 1, 2 * k)).toDF("id_a", "id_b")
    val clusters = pairs.select(col("id_a").as("doc_id"), col("id_a").as("cluster_id"))
      .unionByName(pairs.select(col("id_b").as("doc_id"), col("id_a").as("cluster_id")))
    val rows = Sampling.splitLeakage(docs, pairs, clusters)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows("per_document")._1 == 50L && rows("grouped")._1 == 50L)
    assert(rows("grouped")._2 == 0L, s"grouped must never straddle: ${rows("grouped")}")
    assert(rows("per_document")._2 > 0L,
      s"the per-document scheme should leak on 50 pairs: ${rows("per_document")}")
  }

  test("interleaveN: 3-dim lanes disjoint, bijective on a small grid, bounds enforced") {
    // dims (a, b, c) at 2 bits: a -> bits 0,3; b -> bits 1,4; c -> bits 2,5
    val r = Seq((3L, 0L, 0L), (0L, 3L, 0L), (0L, 0L, 3L)).toDF("a", "b", "c")
      .select(Layout.interleaveN(Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .as[Long].collect().toSeq
    assert(r == Seq(9L, 18L, 36L), s"lane values: $r") // 0b001001, 0b010010, 0b100100
    // bijective over the 4x4x4 grid
    val all = (for { a <- 0 to 3; b <- 0 to 3; c <- 0 to 3 } yield (a.toLong, b.toLong, c.toLong))
      .toDF("a", "b", "c")
      .select(Layout.interleaveN(Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .as[Long].collect().toSet
    assert(all.size == 64 && all.min == 0L && all.max == 63L)
    // 2-dim equivalence: interleave2(x, y) == interleaveN(Seq(y, x)) (x odd lanes)
    val eq = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.interleave2(col("x"), col("y"), 3).as("z2"),
        Layout.interleaveN(Seq(col("y"), col("x")), 3).as("zn")).head()
    assert(eq.getLong(0) == eq.getLong(1))
    intercept[IllegalArgumentException] {
      Layout.interleaveN(Seq(col("a"), col("b"), col("c"), col("a")), 16)
    }
    // withZValueN end to end on 3 real dims
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val base = ev.select(col("event_id"),
      SparkTestBase.tsEpochUs(ev).cast("double").as("x"),
      col("value").as("y"), col("user_id").cast("double").as("u"))
    val z3 = Layout.withZValueN(base, Seq("x", "y", "u"))
    assert(z3.columns.toSeq == Seq("event_id", "x", "y", "u", "zval"))
    assert(z3.count() == base.count())
    // 3 dims x 16 bits = 48-bit z-values, never negative
    val zmax = z3.agg(max("zval")).head().getLong(0)
    assert(zmax >= 0L && zmax < (1L << 48), s"zmax $zmax")
  }
}
