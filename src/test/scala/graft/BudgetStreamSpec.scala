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

  test("checkpointed file stream survives a RESTART: consumed counters recovered, no dup/gap") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val root = java.nio.file.Files.createTempDirectory("graft-budget-restart").toFile
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    val outDir = new java.io.File(root, "out").getAbsolutePath
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("text", StringType)))

    // three doc_id-ordered slices — each file is one micro-batch, so the
    // admission order is (slice, doc_id): the same order the replay folds
    val all = corpus.orderBy("doc_id").collect()
    val third = all.length / 3
    val slices = Seq(all.slice(0, third), all.slice(third, 2 * third), all.slice(2 * third, all.length))
    def writeChunk(name: String, rows: Array[org.apache.spark.sql.Row]): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
        .coalesce(1).write.parquet(s"$srcDir/$name")

    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*")
      val q = BudgetAdmission.admit(BudgetAdmission.withTokens(src, "lang"), budget)
        .toDF().writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    writeChunk("c1", slices(0))
    runOnce() // phase 1: first slice consumes part of each stratum's budget
    writeChunk("c2", slices(1))
    writeChunk("c3", slices(2))
    runOnce() // phase 2: the RESTART must recover consumed counters from state

    val got = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
    assert(got.map(_._1).distinct.length == got.length, "a doc was admitted twice across the restart")

    // expected: the same three slices folded through the relational form
    var consumed = Map.empty[String, Long]
    val expected = slices.flatMap { sl =>
      val batch = spark.createDataFrame(
        spark.sparkContext.parallelize(sl.toIndexedSeq, 4), schema)
      val adm = BudgetAdmission.admitBatch(consumed, batch, budget, "lang").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      consumed = consumed ++ adm.groupBy(_._2._1).map { case (s, rs) => s -> rs.map(_._2._3).max }
      adm
    }.toMap
    assert(got.toMap == expected,
      "restarted stream must equal the uninterrupted replay fold (lost or reset counters otherwise)")
    // the restart must matter: phase 1 cannot have satisfied every stratum
    val phase1Strata = expected.collect { case (id, (s, _, _)) if id < all(third).getLong(0) => s }
    assert(expected.exists { case (id, _) => id >= all(third).getLong(0) },
      s"fixture too small: no admissions after the restart (phase-1 strata: ${phase1Strata.toSet})")
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
