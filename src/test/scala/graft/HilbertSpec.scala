package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** The native Hilbert-curve expression: bijectivity and the every-step-
  * adjacent walk (the property Morton does NOT have), known small-grid
  * values, interpreted-vs-codegen parity, and the three-way pruning
  * ordering on real data.
  */
class HilbertSpec extends SparkTestBase {

  import spark.implicits._

  test("bits=1: the canonical 2x2 U: (0,0)->0 (0,1)->1 (1,1)->2 (1,0)->3") {
    val got = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
      .select(Layout.hilbert2(col("x"), col("y"), 1).as("d"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 2L, 3L))
  }

  test("bits=4: bijective over the 16x16 grid AND every consecutive step is 4-adjacent") {
    val n = 16
    val cells = (for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.hilbert2(col("x"), col("y"), 4).as("d"))
      .collect().map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1)))).toMap
    assert(cells.size == n * n, "hilbert must be a bijection on the grid")
    assert(cells.keys.min == 0L && cells.keys.max == (n * n - 1).toLong)
    (0L until (n * n - 1).toLong).foreach { d =>
      val (x0, y0) = cells(d); val (x1, y1) = cells(d + 1)
      assert(math.abs(x0 - x1) + math.abs(y0 - y1) == 1,
        s"steps $d->${d + 1} not adjacent: ($x0,$y0)->($x1,$y1)")
    }
  }

  test("interpreted eval == codegen'd projection; full 16-bit corners") {
    val expr = graft.functions.expressions.GraftHilbert2(
      org.apache.spark.sql.GraftSqlShim.expression(lit(65535L)),
      org.apache.spark.sql.GraftSqlShim.expression(lit(0L)), 16)
    // corner values of the 65536-grid curve: d(0,0)=0, d(65535,0)=2^32-1
    assert(expr.hilbert(0L, 0L) == 0L)
    assert(expr.hilbert(65535L, 0L) == 4294967295L)
    val viaPlan = spark.range(1)
      .select(Layout.hilbert2(lit(65535L), lit(0L), 16).as("d"),
        Layout.hilbert2(lit(0L), lit(65535L), 16).as("d2"),
        Layout.hilbert2(lit(65535L), lit(65535L), 16).as("d3"))
      .head()
    assert(viaPlan.getLong(0) == 4294967295L)
    assert(viaPlan.getLong(1) == 1431655765L)
    assert(viaPlan.getLong(2) == 2863311530L)
    // null contract
    val nullRow = spark.range(1)
      .select(Layout.hilbert2(lit(null).cast("long"), lit(3L), 16).as("d")).head()
    assert(nullRow.isNullAt(0))
  }

  test("graft_hilbert2 callable from SQL, matches the Column API") {
    val (hi, hinfo, hbuilder) = GraftExtensions.graftHilbert2
    spark.sessionState.functionRegistry.registerFunction(hi, hinfo, hbuilder)
    val viaSql = spark.sql(
      "SELECT graft_hilbert2(CAST(5 AS BIGINT), CAST(3 AS BIGINT), 3) AS d").head().getLong(0)
    val viaCol = spark.range(1)
      .select(Layout.hilbert2(lit(5L), lit(3L), 3).as("d")).head().getLong(0)
    assert(viaSql == viaCol)
    // default bits = 16
    val defSql = spark.sql(
      "SELECT graft_hilbert2(CAST(65535 AS BIGINT), CAST(0 AS BIGINT)) AS d").head().getLong(0)
    assert(defSql == 4294967295L)
  }

  test("three-way pruning on events: hilbert <= zorder < linear files hit") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val base = ev.select(col("event_id"),
      SparkTestBase.tsEpochUs(ev).cast("double").as("x"), col("value").as("y"))
    val rows = Layout.pruningStats(base, "x", "y", nFiles = 64, idCol = "event_id",
        withHilbert = true)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rows("hilbert") <= rows("zorder"),
      s"hilbert ${rows("hilbert")} vs zorder ${rows("zorder")}")
    assert(rows("zorder") < rows("linear"),
      s"zorder ${rows("zorder")} vs linear ${rows("linear")}")
  }

  test("hilbertAssign: balanced contiguous files, rank == ground truth") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val base = ev.select(col("event_id"),
      SparkTestBase.tsEpochUs(ev).cast("double").as("x"), col("value").as("y"))
    val rows = Layout.hilbertAssign(base, "x", "y", nFiles = 16, idCol = "event_id")
      .select("event_id", "hval", "position", "file_id").collect()
    val n = rows.length
    val truth = rows.sortBy(r => (r.getLong(1), r.getLong(0))).zipWithIndex
      .map { case (r, i) => r.getLong(0) -> ((i + 1).toLong, i.toLong * 16 / n) }.toMap
    rows.foreach { r =>
      val (pos, fid) = truth(r.getLong(0))
      assert(r.getLong(2) == pos && r.getLong(3) == fid, s"row ${r.getLong(0)}")
    }
    val sizes = rows.groupBy(_.getLong(3)).view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1)
  }
}
