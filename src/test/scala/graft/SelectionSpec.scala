package graft

import graft.operators.{Sampling, Selection}
import org.apache.spark.sql.functions._

/** Unit-level validation of the model-based selection operators (DSIR
  * importance resampling, the in-engine Naive-Bayes quality classifier,
  * temperature mixture sampling) on handmade corpora with hand-derivable
  * answers; the DuckDB oracle covers the full-corpus forms.
  */
class SelectionSpec extends SparkTestBase {

  import spark.implicits._

  // two clearly-separated vocabularies: "good"-flavored docs repeat target
  // phrasing, "junk"-flavored docs repeat unrelated tokens
  private def corpus() = {
    val good = (0 until 8).map(i =>
      (100L + i, s"the quick brown fox jumps over the lazy dog $i"))
    val junk = (0 until 8).map(i =>
      (200L + i, s"zzz qqq xxx vvv kkk jjj yyy www $i"))
    (good ++ junk).toDF("doc_id", "text")
  }

  test("dsir: exactly k rows, all from raw, target-like docs outscore junk") {
    val docs = corpus()
    val target = docs.filter(col("doc_id") < 104L) // 4 target docs, good-flavored
    val raw = docs.filter(col("doc_id") >= 104L)   // 4 good-flavored + 8 junk
    val out = Selection.dsirSample(raw, target, k = 6).collect()
    assert(out.length == 6)
    val rawIds = raw.select("doc_id").as[Long].collect().toSet
    assert(out.forall(r => rawIds.contains(r.getAs[Long]("doc_id"))))
    // importance scores: every remaining good-flavored doc must outscore
    // every junk doc (Gumbel noise is bounded by construction well below
    // this corpus's score separation)
    val scores = Selection.scoreDocs(
      raw, Selection.logRatioWeights(
        Selection.hashedFeatures(target, 1024),
        Selection.hashedFeatures(raw, 1024), 1024), 1024)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micro")).toMap
    val good = scores.filter(_._1 < 200L).values
    val junk = scores.filter(_._1 >= 200L).values
    assert(good.min > junk.max)
  }

  test("dsir: deterministic and partitioning-independent") {
    val docs = corpus()
    val target = docs.filter(col("doc_id") < 104L)
    val raw = docs.filter(col("doc_id") >= 104L)
    val a = Selection.dsirSample(raw, target, k = 6)
      .orderBy("doc_id").collect().toSeq
    val b = Selection.dsirSample(raw.repartition(7), target.repartition(3), k = 6)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("nb classifier: separates the seeds' vocabularies, pred == score>=0") {
    val docs = corpus()
    val pos = docs.filter(col("doc_id") < 104L)
    val neg = docs.filter(col("doc_id") >= 204L)
    val rest = docs.filter(col("doc_id") >= 104L && col("doc_id") < 204L)
      .unionByName(docs.filter(col("doc_id") >= 200L && col("doc_id") < 204L))
    val out = Selection.nbClassifierScores(rest, pos, neg).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("score_micro"), r.getAs[Boolean]("pred")))).toMap
    // good-flavored held-out docs classify positive, junk-flavored negative
    assert(byId.filter(_._1 < 200L).values.forall(_._2))
    assert(byId.filter(_._1 >= 200L).values.forall(!_._2))
    assert(out.forall(r =>
      r.getAs[Boolean]("pred") == (r.getAs[Long]("score_micro") >= 0L)))
  }

  test("temperature: sqrt quotas, hierarchical rank == flat window rank") {
    // three strata with very different sizes
    val docs = ((0 until 64).map(i => (i.toLong, "aa", s"t $i"))
      ++ (0 until 16).map(i => (100L + i, "bb", s"t $i"))
      ++ (0 until 4).map(i => (200L + i, "cc", s"t $i")))
      .toDF("doc_id", "lang", "text")
    val n = 20L
    val out = Sampling.temperatureSample(docs, n, "lang")
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // quotas by the operator's own integer arithmetic: qs = round(sqrt(n)*1e6),
    // k = (20 * qs) div denom
    val qs = Map("aa" -> 8000000L, "bb" -> 4000000L, "cc" -> 2000000L)
    val denom = qs.values.sum
    val expect = qs.map { case (l, q) => l -> (n * q) / denom }
    assert(counts == expect.filter(_._2 > 0))
    // α = 0.5 up-weights small strata vs proportional draw: cc gets
    // 20*2/14 ≈ 2 docs where proportional would give ~1
    assert(counts("cc") >= 2L)
    // hierarchical rank must equal the flat per-stratum window rank
    val h = pmod(
      graft.functions.TextFunctions.polyHash(
        concat(lit("temp"), lit(":"), col("doc_id").cast("string")))
        * lit(2654435761L) + lit(12345L), lit(2147483647L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(h.asc, col("doc_id").asc)
    val flat = docs.withColumn("flat_rank", row_number().over(w).cast("long"))
    val joined = out.join(flat.select(col("doc_id"), col("flat_rank")), Seq("doc_id"))
    assert(joined.filter(col("draw_rank") =!= col("flat_rank")).isEmpty)
  }

  test("nb model path == direct path bit-for-bit") {
    val docs = corpus()
    val pos = docs.filter(col("doc_id") < 104L)
    val neg = docs.filter(col("doc_id") >= 204L)
    val rest = docs.filter(col("doc_id") >= 104L && col("doc_id") < 204L)
    val direct = Selection.nbClassifierScores(rest, pos, neg)
      .orderBy("doc_id").collect().toSeq
    val (w, prior) = Selection.nbClassifierModel(pos, neg)
    val viaModel = Selection.nbScoreWithModel(rest, w, prior)
      .orderBy("doc_id").collect().toSeq
    assert(viaModel == direct,
      "pre-trained model scoring must be bit-identical to the in-plan form")
  }

  test("temperature: partitioning-independent") {
    val docs = ((0 until 64).map(i => (i.toLong, "aa", s"t $i"))
      ++ (0 until 16).map(i => (100L + i, "bb", s"t $i")))
      .toDF("doc_id", "lang", "text")
    val a = Sampling.temperatureSample(docs, 10L, "lang")
      .select("doc_id", "lang", "draw_rank").orderBy("doc_id").collect().toSeq
    val b = Sampling.temperatureSample(docs.repartition(7), 10L, "lang")
      .select("doc_id", "lang", "draw_rank").orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("prCurve: exact cumulative construction on a hand case") {
    import spark.implicits._
    // scores desc: 90(+), 80(-), 70(+), 70(+), 60(-) -> thresholds 90/80/70/60
    val scored = Seq(
      (1L, true, 90L), (2L, false, 80L), (3L, true, 70L),
      (4L, true, 70L), (5L, false, 60L)
    ).toDF("doc_id", "label", "score_micro")
    val rows = Selection.prCurve(scored)
      .orderBy(col("threshold_micro").desc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.toSeq == Seq(
      (90L, 1L, 0L, 2L, 1.0, 1.0 / 3),
      (80L, 1L, 1L, 2L, 0.5, 1.0 / 3),
      (70L, 3L, 1L, 0L, 0.75, 1.0),
      (60L, 3L, 2L, 0L, 0.6, 1.0)))
    // partitioning-invariant (exact integer arithmetic until the final division)
    val again = Selection.prCurve(scored.repartition(5))
      .orderBy(col("threshold_micro").desc).collect().toSeq
    assert(again == Selection.prCurve(scored).orderBy(col("threshold_micro").desc).collect().toSeq)
  }

  test("prCurve: DOUBLE-typed scores (the pre-range-bucketing API surface) still work") {
    import spark.implicits._
    // same hand case, fractional scores — `x div step` fails analysis on
    // DOUBLE, so the fractional path buckets on clamped float division
    val scored = Seq(
      (1L, true, 0.9), (2L, false, 0.8), (3L, true, 0.7),
      (4L, true, 0.7), (5L, false, 0.6)
    ).toDF("doc_id", "label", "score_micro")
    val rows = Selection.prCurve(scored)
      .orderBy(col("threshold_micro").desc)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (0.9, 1L, 0L, 2L), (0.8, 1L, 1L, 2L), (0.7, 3L, 1L, 0L), (0.6, 3L, 2L, 0L)))

    // larger pseudo-random double corpus vs an in-test flat cumulative
    val rnd = new scala.util.Random(7)
    val big = (0 until 500).map(i =>
      (i.toLong, rnd.nextBoolean(), rnd.nextInt(40) / 7.0 - 2.0))
    val bigDf = big.toDF("doc_id", "label", "score_micro").repartition(9)
    val got = Selection.prCurve(bigDf)
      .orderBy(col("threshold_micro").desc)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val totalP = big.count(_._2).toLong
    val want = big.map(_._3).distinct.sorted(Ordering[Double].reverse).map { t =>
      val tp = big.count(x => x._3 >= t && x._2).toLong
      val fp = big.count(x => x._3 >= t && !x._2).toLong
      (t, tp, fp, totalP - tp)
    }
    assert(got == want, "double-score curve must match the flat descending cumulative")

    // degenerate all-equal doubles: single threshold row, no div-by-zero
    val flat = Seq((1L, true, 0.5), (2L, false, 0.5)).toDF("doc_id", "label", "score_micro")
    val fr = Selection.prCurve(flat).collect()
    assert(fr.length == 1 && fr.head.getLong(1) == 1L && fr.head.getLong(2) == 1L)

    // a non-numeric score column fails loudly, not mid-plan
    val bad = intercept[IllegalArgumentException] {
      Selection.prCurve(
        Seq((1L, true, "hi")).toDF("doc_id", "label", "score_micro"))
    }
    assert(bad.getMessage.contains("must be numeric"))
  }
}
