package graft

import graft.streaming.{BudgetAdmission, BudgetDoc}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming token-budget admission: the stateful gate must agree with the
  * relational per-epoch replay AND with a single flat cumulative-sum window
  * over (epoch, doc_id) order, close strata across micro-batches, and admit
  * the budget-crossing doc exactly once.
  */
class BudgetStreamSpec extends SparkTestBase {

  private val budget = 2000L

  private lazy val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("lang"), col("text"))

  /** (doc_id -> (stratum, n_tokens, cum_tokens)) from the 3-epoch replay fold. */
  private def replayFold: Map[Long, (String, Long, Long)] = {
    var consumed = Map.empty[String, Long]
    (0 until 3).flatMap { e =>
      val batch = corpus.filter(pmod(col("doc_id"), lit(3L)) === lit(e.toLong))
      val adm = BudgetAdmission.admitBatch(consumed, batch, budget, "lang").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      consumed = consumed ++ adm.groupBy(_._2._1).map { case (s, rows) => s -> rows.map(_._2._3).max }
      adm
    }.toMap
  }

  test("3-epoch replay fold == one flat window over (epoch, doc_id); boundary doc admitted") {
    val got = replayFold
    assert(got.nonEmpty)
    val flat = corpus
      .withColumn("epoch", pmod(col("doc_id"), lit(3L)))
      .withColumn("n_tokens", size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(
        Window.partitionBy(col("lang")).orderBy(col("epoch").asc, col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
      .select("doc_id", "lang", "n_tokens", "cum_tokens").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == flat, "stateful epochs must collapse to the flat (epoch, doc_id) window")
    // every stratum's last admission crosses the budget (or exhausted it)
    got.values.groupBy(_._1).foreach { case (lang, rows) =>
      val maxCum = rows.map(_._3).max
      val lastTok = rows.filter(_._3 == maxCum).head._2
      assert(maxCum - lastTok < budget, s"$lang: doc past the budget admitted")
    }
  }

  test("MemoryStream in 3 micro-batches == replay fold; strata close across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = BudgetAdmission.withTokens(corpus, "lang").collect()
    val stream = MemoryStream[BudgetDoc]
    val q = BudgetAdmission.admit(stream.toDS(), budget).writeStream
      .format("memory").queryName("budget_out").outputMode("append").start()
    try {
      (0 until 3).foreach { e =>
        stream.addData(events.filter(_.doc_id % 3 == e).toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table("budget_out").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
    assert(rows.map(_._1).distinct.length == rows.length, "nothing admitted twice")
    val streamed = rows.toMap
    assert(streamed == replayFold, "stream must equal the batch replay fold")
    // cross-batch closure must really trigger: at budget 2000 at least one
    // stratum exhausts its quota before epoch 2 yet receives epoch-2 docs
    val admittedLast = streamed.collect { case (id, (s, _, _)) if id % 3 == 2 => s }.toSet
    val allStrata = corpus.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(admittedLast != allStrata,
      "expected at least one stratum already closed by the final micro-batch")
  }
}
