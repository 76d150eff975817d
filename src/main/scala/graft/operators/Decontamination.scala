package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag training documents
  * that share verbatim word n-grams with an evaluation/benchmark set — the
  * standard pre-training hygiene step (GPT-3 appendix C and successors use
  * exact n-gram collision at n in 8..13).
  *
  * Scale shape: the benchmark side is inherently tiny (eval sets are
  * megabytes; the corpus is the 100 TB side), so its distinct gram set is
  * BROADCAST and the probe is a map-side hash join against the corpus scan —
  * the corpus never shuffles to discover candidates. Only the matched
  * (doc, gram) pairs (rare by construction) reach the per-doc count, and
  * that aggregation is partial-agg'd on doc_id. Per-doc gram sets come from
  * the same zip-of-slices shingle projection the dedup family uses — scan
  * local, no explode of unmatched grams beyond the join probe itself.
  */
object Decontamination {

  /** Per-document overlap report against `benchmark`: documents sharing at
    * least `minOverlap` distinct word n-grams with any benchmark document.
    *
    * Output: (doc_id, n_grams — distinct n-grams of the doc, n_overlap —
    * how many of those appear in the benchmark set, overlap_frac BIGINT /
    * DOUBLE). Documents below `minOverlap` (the clean ones — virtually the
    * whole corpus) are absent.
    */
  def overlapReport(
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int = 8,
      minOverlap: Long = 1L,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    overlapReportPrepared(docs, benchGramsOf(benchmark, n, textCol), minOverlap, idCol, textCol)

  /** The benchmark side of [[overlapReport]] alone: the distinct word
    * n-gram set of the eval suite. Eval sets are FIXED while the corpus
    * streams past them, so a per-micro-batch caller (the curation front
    * door) computes this once — shingle pass, distinct shuffle, and the
    * broadcast build all happen per STREAM, not per batch — and feeds
    * [[overlapReportPrepared]].
    */
  def benchGramsOf(
      benchmark: DataFrame,
      n: Int = 8,
      textCol: String = "text"): DataFrame = {
    import graft.functions.expressions.ShingleExpression.wordShinglesNative
    benchmark
      .select(explode(wordShinglesNative(col(textCol), n)).as("gram"))
      .distinct()
  }

  /** [[overlapReport]] against a precomputed [[benchGramsOf]] frame —
    * identical output (the gram set is a pure function of the benchmark).
    */
  def overlapReportPrepared(
      docs: DataFrame,
      benchGrams: DataFrame,
      minOverlap: Long = 1L,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8): DataFrame = {
    // one corpus scan: the doc's gram count rides along the explode, so no
    // second scan + join is needed to recover it after the aggregation.
    // Shingling runs in the native one-walk graft_word_shingles expression
    // (the HOF formulation is interpreted CodegenFallback — see Dedup)
    import graft.functions.expressions.ShingleExpression.wordShinglesNative
    val docGrams = docs
      .select(col(idCol).as("doc_id"), wordShinglesNative(col(textCol), n).as("grams"))
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
        explode(col("grams")).as("gram"))
    docGrams
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(max(col("n_grams")).as("n_grams"), count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= lit(minOverlap))
      .select(col("doc_id"), col("n_grams"), col("n_overlap"),
        (col("n_overlap").cast("double") / col("n_grams").cast("double")).as("overlap_frac"))
  }

  /** Contamination-SPAN removal: excise every word `k`-gram span of a
    * corpus document that appears verbatim in the benchmark, keep the rest,
    * and re-emit the cleaned text. [[overlapReport]] + anti-join is the
    * blunt instrument (drop the whole document); this is the surgical form
    * for PARTIALLY contaminated documents — a page that quotes one eval
    * question loses those `k` token runs, not its other 5,000 tokens. Same
    * rewrite contract as `Dedup.removeDupSpans` (the Lee-et-al. span
    * machinery, pointed at benchmark grams instead of cross-doc duplicated
    * grams): output (doc_id, clean_text, n_tokens, n_removed).
    *
    * 100 TB shape: the benchmark gram-hash set is tiny and BROADCAST (the
    * same asymmetry as [[overlapReport]]); corpus-side work is one
    * posexplode + map-side hash join + the per-doc rebuild aggregate — no
    * pairwise stage, no corpus shuffle beyond the per-doc group-by.
    */
  def decontaminateSpans(
      docs: DataFrame,
      benchmark: DataFrame,
      k: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val tok = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
    val grams = tok
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), posexplode(orderedNgramsFromTokens(col("w"), k)).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"), widePolyHash(col("g")).as("h"))
    val benchHashes = benchmark
      .select(tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= k)
      .select(explode(orderedNgramsFromTokens(col("w"), k)).as("g"))
      .select(widePolyHash(col("g")).as("h")).distinct()
    val dropped = grams.join(broadcast(benchHashes), Seq("h"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("t"))
      .distinct()
    Dedup.rebuildExcised(tok, dropped)
  }

  /** Collision-VERIFIED twin of [[decontaminateSpans]]: every corpus gram
    * whose hash matches a benchmark gram hash is confirmed against the
    * benchmark gram TEXT before its span is excised — exact under the raw
    * k-gram text, so a hash collision can never excise an uncontaminated
    * span (the guarantee an eval-integrity audit actually needs).
    *
    * Shape: pass 1 is [[decontaminateSpans]]'s narrow broadcast of the
    * benchmark HASH set — it prunes the corpus gram stream at the scan, so
    * corpus-side cost is unchanged. Pass 2 confirms only the flagged
    * occurrences (contamination-sized) against the benchmark `(hash, gram)`
    * pairs — a wider build side than pass 1's, which is why it is not the
    * first-line filter; AQE broadcasts it while the suite is small and
    * shuffles only the flagged slice when it is not.
    */
  def decontaminateSpansVerified(
      docs: DataFrame,
      benchmark: DataFrame,
      k: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    decontaminateSpansVerifiedWith(docs, benchmark, k, idCol, textCol, widePolyHash)

  /** Contamination PROVENANCE: one row per corpus k-gram occurrence that
    * appears verbatim in the benchmark — (doc_id, pos, bench_doc, gram),
    * where `bench_doc` is the LOWEST benchmark doc containing the gram
    * (the deterministic witness) and `gram` is the quoted text itself.
    * The record an eval-integrity audit replays: not just "doc X is
    * contaminated" but "doc X quotes benchmark doc Y at position P, and
    * here is the quote". Verified by construction — candidates come from
    * the narrow benchmark-hash broadcast, every match is confirmed on the
    * raw gram text, so a hash collision can never name an innocent doc.
    * Exactly the occurrences whose k-token covers
    * [[decontaminateSpansVerified]] excises.
    */
  def contaminationProvenance(
      docs: DataFrame,
      benchmark: DataFrame,
      k: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    contaminationProvenanceWith(docs, benchmark, k, idCol, textCol, widePolyHash)

  /** [[contaminationProvenance]] with a pluggable gram hash (test seam). */
  private[graft] def contaminationProvenanceWith(
      docs: DataFrame,
      benchmark: DataFrame,
      k: Int,
      idCol: String,
      textCol: String,
      hashFn: Column => Column): DataFrame = {
    val grams = Dedup.spanGrams(docs, k, idCol, textCol, hashFn)
    val benchGrams = benchmark
      .select(col(idCol).cast("long").as("bench_doc"), tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= k)
      .select(col("bench_doc"), explode(orderedNgramsFromTokens(col("w"), k)).as("g"))
      .groupBy(col("g")).agg(min(col("bench_doc")).as("bench_doc"))
      .select(col("g"), hashFn(col("g")).as("h"), col("bench_doc"))
    val benchHashes = benchGrams.select(col("h")).distinct()
    // narrow hash broadcast prunes the corpus stream at the scan; the
    // (h, g) join against the witness table confirms on the gram text
    grams.join(broadcast(benchHashes), Seq("h"), "left_semi")
      .join(benchGrams, Seq("h", "g"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("bench_doc"), col("g").as("gram"))
  }

  /** [[decontaminateSpansVerified]] with a pluggable gram hash (test seam:
    * a deliberately colliding hash must leave the result exact).
    */
  private[graft] def decontaminateSpansVerifiedWith(
      docs: DataFrame,
      benchmark: DataFrame,
      k: Int,
      idCol: String,
      textCol: String,
      hashFn: Column => Column): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
    val grams = Dedup.spanGrams(docs, k, idCol, textCol, hashFn)
    val benchGrams = benchmark
      .select(tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= k)
      .select(explode(orderedNgramsFromTokens(col("w"), k)).as("g")).distinct()
      .select(col("g"), hashFn(col("g")).as("h"))
    val benchHashes = benchGrams.select(col("h")).distinct()
    val flagged = grams.join(broadcast(benchHashes), Seq("h"), "left_semi")
    val dropped = flagged.join(benchGrams, Seq("h", "g"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("t"))
      .distinct()
    Dedup.rebuildExcised(tok, dropped)
  }

  /** [[overlapReport]] with a Bloom prefilter on the corpus-gram stream —
    * identical output (the filter only ever passes a superset of the true
    * matches, and the exact gram join then removes the false positives),
    * different 100 TB cost: the corpus's exploded grams are cut to
    * ~(matches + fpp x grams) rows AT THE SCAN, before the join ever sees
    * them. When the eval suite grows past what an exact broadcast set
    * affords (a few GB of distinct grams), the bloom stays megabytes at any
    * benchmark size — this is Spark's own runtime-filter pattern
    * (InjectRuntimeFilter builds the same BloomFilterAggregate /
    * BloomFilterMightContain pair), made explicit and composable.
    *
    * The filter is built by ONE cluster-side aggregate over the benchmark
    * grams, pulled to the driver (bounded: `numBits/8` bytes), and
    * re-entered as a literal so the probe is a scan-local codegen'd
    * expression — no UDF, no per-row broadcast lookup.
    */
  def overlapReportBloom(
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int = 8,
      minOverlap: Long = 1L,
      idCol: String = "doc_id",
      textCol: String = "text",
      estimatedGrams: Long = 4000000L): DataFrame = {
    import graft.functions.expressions.ShingleExpression.wordShinglesNative
    import org.apache.spark.sql.GraftSqlShim
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType

    val benchGrams = benchmark
      .select(explode(wordShinglesNative(col(textCol), n)).as("gram"))
      .distinct()
    val bloomAgg = GraftSqlShim.column(
      new BloomFilterAggregate(
        GraftSqlShim.expression(xxhash64(col("gram"))),
        Literal(estimatedGrams)).toAggregateExpression())
    val bloomBytes = benchGrams.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]]("bf")
    val mightContain = GraftSqlShim.column(
      BloomFilterMightContain(
        Literal(bloomBytes, BinaryType),
        GraftSqlShim.expression(xxhash64(col("gram")))))

    val docGrams = docs
      .select(col(idCol).as("doc_id"), wordShinglesNative(col(textCol), n).as("grams"))
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
        explode(col("grams")).as("gram"))
      .filter(mightContain)
    docGrams
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(max(col("n_grams")).as("n_grams"), count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= lit(minOverlap))
      .select(col("doc_id"), col("n_grams"), col("n_overlap"),
        (col("n_overlap").cast("double") / col("n_grams").cast("double")).as("overlap_frac"))
  }
}
