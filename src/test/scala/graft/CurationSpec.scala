package graft

import graft.operators.{Curation, Decontamination, TextAnalysis}
import org.apache.spark.sql.functions._

/** The composed curation pipeline: bloom path identical to exact, and the
  * per-stage guarantees (contaminated docs never survive, low-quality docs
  * never survive, no near-dup pair survives together) hold on the planted
  * corpus. The composite's VALUES are pinned by the pipeline_curate oracle;
  * these are the semantic invariants.
  */
class CurationSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def corpus = docs.filter(col("doc_id") % 10 =!= 7)
  private def bench = docs.filter(col("doc_id") % 10 === 7)

  private def run(bloom: Option[Long]) = Curation.curate(
    corpus, bench, minTokens = 30L, minQuality = 0.5,
    langFracs = Map("en" -> 0.9, "de" -> 0.5, "zh" -> 0.3), defaultFrac = 0.4,
    bloomGrams = bloom)

  test("bloom-prefiltered decontamination path is output-identical") {
    val exact = run(None).orderBy(col("doc_id")).collect().toSeq
    val bloom = run(Some(65536L)).orderBy(col("doc_id")).collect().toSeq
    assert(exact.nonEmpty, "curated corpus must be non-empty")
    assert(exact == bloom)
  }

  test("stage invariants hold for every curated doc") {
    val kept = run(None).collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty)

    // quality floor: every survivor passes the annotate-stage thresholds
    val q = TextAnalysis.quality(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(7))).toMap
    kept.foreach { id =>
      val (nTok, score) = q(id)
      assert(nTok >= 30L && score >= 0.5, s"doc $id violates quality floor")
    }

    // decontamination: no survivor shares an 8-gram with the bench slice
    val contaminated = Decontamination.overlapReport(corpus, bench)
      .collect().map(_.getLong(0)).toSet
    assert(kept.intersect(contaminated).isEmpty,
      s"contaminated docs survived: ${kept.intersect(contaminated)}")

    // dedup: no verified near-dup pair survives together (the kept member
    // is the lower id)
    val pairs = graft.operators.Dedup.minhashLshPairs(
      corpus.select(col("doc_id"), col("text")), 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(!(kept.contains(a) && kept.contains(b)),
        s"near-dup pair ($a, $b) both curated")
    }
  }

  test("classifier gate: every survivor scores >= 0, gate genuinely filters, downstream invariants hold") {
    val pos = bench
    val neg = docs.filter(col("doc_id") % 10 === 3)
    val gated = Curation.curate(
      corpus, bench, minTokens = 30L, minQuality = 0.5,
      langFracs = Map("en" -> 0.9, "de" -> 0.5, "zh" -> 0.3), defaultFrac = 0.4,
      classifierSeeds = Some((pos, neg)))
      .collect().map(_.getLong(0)).toSet
    val ungated = run(None).collect().map(_.getLong(0)).toSet
    assert(gated.nonEmpty && gated != ungated,
      "the learned gate must keep a non-empty, strictly different set")

    // every survivor passes the classifier cut (scored standalone — the
    // gate is a pure per-doc decision, so composition cannot change it)
    val scores = graft.operators.Selection
      .nbClassifierScores(corpus.select(col("doc_id"), col("text")), pos, neg)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    gated.foreach { id =>
      assert(scores(id) >= 0L, s"doc $id survived below the classifier cut")
    }

    // downstream stages still hold on the gated chain
    val contaminated = Decontamination.overlapReport(corpus, bench)
      .collect().map(_.getLong(0)).toSet
    assert(gated.intersect(contaminated).isEmpty)
  }
}
