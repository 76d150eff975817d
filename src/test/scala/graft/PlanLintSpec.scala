package graft

import graft.util.PlanLint
import org.apache.spark.sql.functions._

/** Full-sweep plan lint (VERDICT r14 #1): every `SparkEntry.queries` entry
  * is planned (AQE off, so exchanges and windows are visible pre-runtime)
  * and walked for the three silent scale-killers — cartesian products,
  * unwhitelisted empty-partitionSpec windows, and single-partition
  * exchanges of unbounded input. The whitelist (PlanLint.
  * globalWindowWhitelist) is not prose: the `__rng` ≤1024-row bound it
  * asserts is pinned here as a property over the engine's three range-key
  * constructions.
  */
class PlanLintSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Sequential-by-contract queries, allowed exactly ONE single-partition
    * exchange: the single-series renko scans. Brick i+1 depends on brick i
    * within a series, so one series IS one sequential scan (the reference's
    * own execution model — renkodf.py walks the frame row by row); the
    * engine's scale paths for many series / pre-sorted input
    * (renko_multi_series_parallel, renko_sorted_scan, renko_parallel_scan,
    * renko_by_user) stay lint-clean and are verified below by NOT being in
    * this set. Bound: one exchange carries exactly one series.
    */
  private val sequentialByContract: Set[String] = Set(
    "renko_wicks", "renko_normal", "renko_nongap", "renko_reverse_wicks",
    "renko_reverse_nongap", "renko_fake_r_wicks", "renko_fake_r_nongap",
    "renko_to_rws", "renko_sql_tvf")

  test("whitelist bound: every range-key construction yields <= 1024 distinct __rng values") {
    import spark.implicits._
    // 1. hash range key: pmod(h, 2^31) >> 21  (shufflePosition/temperatureSample)
    val hashRngMax = (0L until 100000L).map(h => (h * 2654435761L + 12345L) % 2147483647L >> 21).max
    assert(hashRngMax < 1024, s"hash range key must stay < 1024, got $hashRngMax")
    // 2. shifted z/hilbert key: zval >> (width - 10) for width = 2*bits
    //    (Layout.hierarchicalRank callers pass shiftright(zval, 2*bits-10))
    val bits = 16
    val zMax = (1L << (2 * bits)) - 1L
    assert((zMax >> (2 * bits - 10)) < 1024, "z-range key must stay < 1024")
    // 3. integer-division step key: (t - mn) div step, step = (span+1023) div 1024
    //    (Selection.prCurve) — property-check over adversarial spans
    for (span <- Seq(0L, 1L, 1023L, 1024L, 1025L, 1L << 20, (1L << 62) - 1)) {
      val step = span / 1024L + 1L
      assert(span / step < 1024L, s"span $span: max range id ${span / step} must stay < 1024")
    }
    // and on a real frame: prCurve's plan carries no unwhitelisted window
    val scored = (1 to 500).map(i => (s"d$i", i % 2 == 0, (i * 37 % 211).toLong))
      .toDF("doc_id", "label", "score_micro")
    val pr = graft.operators.Selection.prCurve(scored)
    assert(PlanLint.lint(pr).isEmpty, PlanLint.lint(pr).mkString("\n"))
    // value check vs the flat-window construction it replaced
    val byThresh = scored.groupBy(col("score_micro").as("t"))
      .agg(sum(when(col("label"), 1L).otherwise(0L)).as("p"),
        sum(when(col("label"), 0L).otherwise(1L)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1)
    var (ctp, cfp) = (0L, 0L)
    val expect = byThresh.map { case (t, p, n) =>
      ctp += p; cfp += n; t -> ((ctp, cfp))
    }.toMap
    pr.collect().foreach { r =>
      val t = r.getAs[Long]("threshold_micro")
      assert((r.getAs[Long]("tp"), r.getAs[Long]("fp")) == expect(t),
        s"hierarchical cumulative diverges from flat cumulative at threshold $t")
    }
  }

  test("full sweep: no cartesian product, no unwhitelisted global window, no unbounded single-partition exchange") {
    // AQE off in a cloned session: the lint reads the static physical plan,
    // where every exchange and window is visible before runtime re-planning
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    var linted = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val vs = PlanLint.lint(fn(s, sf)).filterNot(v =>
          sequentialByContract(name) && v.rule == "single-partition-exchange")
        vs.foreach(v => bad += s"$name: $v")
        linted += 1
      } catch {
        case e: Throwable => bad += s"$name: QUERY BUILD FAILED: ${e.getMessage}"
      }
    }
    assert(linted == SparkEntry.queries.size, s"linted $linted of ${SparkEntry.queries.size}")
    assert(bad.isEmpty, s"${bad.size} plan-lint violations:\n${bad.mkString("\n")}")
  }

  test("bounded() is compositional: a corpus frame CARRYING __rng no longer passes; the groupBy(__rng) base frame does") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
    // a real FileScan corpus: a Seq-backed frame collapses limits into the
    // LocalTableScan leaf, which is not the regression class the lint guards
    val corpus = s.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), (col("doc_id") % 211).as("v"))

    // regression class 1 (was silent): a corpus-sized frame that merely
    // PROJECTS a __rng column under a global window
    val tagged = corpus.withColumn("__rng", col("v") % 16)
      .withColumn("r", row_number().over(w))
    assert(PlanLint.lint(tagged).exists(_.rule == "global-window"),
      "a corpus frame projecting __rng must NOT whitelist a global window")

    // regression class 2 (was silent): the bounding aggregate only on the
    // BROADCAST side of a join, probe side streaming the corpus
    val dim = corpus.groupBy().agg(max(col("v")).as("mx"))
    val probe = corpus.crossJoin(broadcast(dim))
      .withColumn("r", row_number().over(w))
    assert(PlanLint.lint(probe).exists(_.rule == "global-window"),
      "an aggregate on the broadcast side must not bound the probe side")

    // the legitimate shape: the per-range base frame (groupBy __rng) stays
    // whitelisted, including through a projection above it
    val base = corpus.withColumn("__rng", col("v") % 16)
      .groupBy(col("__rng")).agg(count(lit(1)).as("c"))
      .withColumn("c2", col("c") + 1)
      .withColumn("r", row_number().over(w.orderBy(col("__rng"))))
    assert(PlanLint.lint(base).isEmpty,
      s"groupBy(__rng) base frame must stay whitelisted: ${PlanLint.lint(base)}")

    // grouping-free aggregates and limits still bound
    val one = corpus.agg(sum(col("v")).as("s"))
      .withColumn("r", row_number().over(w.orderBy(col("s"))))
    assert(PlanLint.lint(one).isEmpty)
    val lim = corpus.limit(50).withColumn("r", row_number().over(w))
    assert(PlanLint.lint(lim).isEmpty)
  }
}
