package graft

import graft.operators.{AsofJoin, Chunking, Clustering, Dedup, RangeJoin, Sampling, Search, Sketches}
import org.apache.spark.sql.functions._

/** Unit-level validation of the round-5 corpus operators (chunking,
  * duplicated-span coverage, BM25, mixture sampling, centroid outliers) on
  * handmade inputs with hand-computable answers; the DuckDB oracle covers
  * the full-corpus forms.
  */
class CorpusOpsSpec extends SparkTestBase {

  import spark.implicits._

  private def docsDF(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("chunking: full coverage, stride overlap, no redundant tail chunk") {
    val words = (1 to 100).map(i => s"w$i").mkString(" ")
    val out = Chunking.chunk(docsDF(1L -> words), chunkSize = 32, stride = 24)
      .orderBy("chunk_id").collect()
    // nChunks = 1 + ceil((100-32)/24) = 1 + 3
    assert(out.length == 4)
    assert(out.map(_.getAs[Long]("chunk_start")).toSeq == Seq(1L, 25L, 49L, 73L))
    assert(out.map(_.getAs[Long]("n_chunk_tokens")).toSeq == Seq(32L, 32L, 32L, 28L))
    // first and last tokens of each chunk line up with the stride
    assert(out(0).getAs[String]("chunk_text").startsWith("w1 ") )
    assert(out(3).getAs[String]("chunk_text").endsWith(" w100"))
    // every token appears in at least one chunk
    val covered = out.flatMap(_.getAs[String]("chunk_text").split(" ")).toSet
    assert(covered == (1 to 100).map(i => s"w$i").toSet)
  }

  test("chunking: short document yields exactly one chunk") {
    val out = Chunking.chunk(docsDF(1L -> "a b c"), chunkSize = 32, stride = 24).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("chunk_text") == "a b c")
    assert(out.head.getAs[Long]("n_chunk_tokens") == 3L)
  }

  test("dup span stats: planted shared 8-gram span is counted in both docs only") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ") // 12 shared tokens
    val a = s"$shared ${(1 to 10).map(i => s"a$i").mkString(" ")}" // 22 tokens
    val b = s"${(1 to 10).map(i => s"b$i").mkString(" ")} $shared" // 22 tokens
    val c = (1 to 22).map(i => s"c$i").mkString(" ")
    val out = Dedup.dupSpanStats(docsDF(1L -> a, 2L -> b, 3L -> c), k = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_pos"), r.getAs[Long]("n_dup_pos")))).toMap
    // each doc: 22 - 8 + 1 = 15 positions; the shared 12-token run yields
    // 12 - 8 + 1 = 5 duplicated 8-gram positions in each of docs 1 and 2
    assert(out(1L) == ((15L, 5L)))
    assert(out(2L) == ((15L, 5L)))
    assert(out(3L) == ((15L, 0L)))
  }

  test("dup span removal: non-canonical copy excised, canonical kept, no residual coverage") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val a = s"$shared ${(1 to 10).map(i => s"a$i").mkString(" ")}"
    val b = s"${(1 to 10).map(i => s"b$i").mkString(" ")} $shared"
    val c = (1 to 22).map(i => s"c$i").mkString(" ")
    val in = docsDF(1L -> a, 2L -> b, 3L -> c)
    val out = Dedup.removeDupSpans(in, k = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_removed")))).toMap
    // doc 1 is the lowest doc containing every shared 8-gram → canonical,
    // untouched; doc 2 drops the whole 12-token shared run; doc 3 untouched
    assert(out(1L) == ((a, 0L)))
    assert(out(2L) == (((1 to 10).map(i => s"b$i").mkString(" "), 12L)))
    assert(out(3L) == ((c, 0L)))
    // the Lee-et-al. postcondition: the cleaned corpus has zero covered
    // positions — every duplicated gram now lives in exactly one doc
    val residual = Dedup.dupSpanStats(
      Dedup.removeDupSpans(in, k = 8).select(col("doc_id"), col("clean_text").as("text")),
      k = 8)
      .agg(org.apache.spark.sql.functions.sum("n_dup_pos")).collect()(0).getLong(0)
    assert(residual == 0L, s"cleaned corpus must have no residual covered spans, got $residual")
  }

  test("dup span removal on the test corpus: removes real spans, leaves no residual coverage") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val cleaned = Dedup.removeDupSpans(docs, k = 8).cache()
    val removed = cleaned.filter(col("n_removed") > 0).count()
    assert(removed > 0, "the corpus plants cross-doc dup spans; some docs must shrink")
    val residual = Dedup.dupSpanStats(
      cleaned.select(col("doc_id"), col("clean_text").as("text")), k = 8)
      .agg(org.apache.spark.sql.functions.sum("n_dup_pos")).collect()(0).getLong(0)
    assert(residual == 0L, s"no residual covered spans above threshold, got $residual")
    cleaned.unpersist()
  }

  test("verified span stats: equals the hash-keyed form on real data, exact under a colliding hash") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val a = s"$shared ${(1 to 10).map(i => s"a$i").mkString(" ")}"
    val b = s"${(1 to 10).map(i => s"b$i").mkString(" ")} $shared"
    val c = (1 to 22).map(i => s"c$i").mkString(" ")
    val in = docsDF(1L -> a, 2L -> b, 3L -> c)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_pos"), r.getAs[Long]("n_dup_pos")))).toMap
    val truth = asMap(Dedup.dupSpanStats(in, k = 8))
    // collision-free data: verified == hash-keyed
    assert(asMap(Dedup.dupSpanStatsVerified(in, k = 8)) == truth)
    // adversarial hash: EVERY gram collides into one bucket — the
    // hash-keyed form would flag all 45 positions, verification must
    // reject every false candidate and reproduce the exact-text answer
    val collided = asMap(Dedup.dupSpanStatsVerifiedWith(
      in, 8, "doc_id", "text", _ => lit(0L)))
    assert(collided == truth,
      s"colliding hash must not change verified stats: $collided vs $truth")
  }

  test("verified span removal: keeper chosen per true gram group even when hash buckets merge") {
    // doc1/doc2 share run X (true keeper 1), doc2/doc3 share run Y (true
    // keeper 2) — under a constant hash both runs land in ONE bucket whose
    // min doc is 1; a hash-keyed keeper would wrongly excise doc 2's Y copy
    val x = (1 to 12).map(i => s"x$i").mkString(" ")
    val y = (1 to 12).map(i => s"y$i").mkString(" ")
    val d1 = s"$x ${(1 to 10).map(i => s"a$i").mkString(" ")}"
    val d2 = s"$x $y"
    val d3 = s"$y ${(1 to 10).map(i => s"c$i").mkString(" ")}"
    val in = docsDF(1L -> d1, 2L -> d2, 3L -> d3)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_removed")))).toMap
    val truth = asMap(Dedup.removeDupSpans(in, k = 8))
    // sanity on the planted layout: doc 2 loses its X copy but keeps Y
    assert(truth(1L)._2 == 0L && truth(2L) == ((y, 12L)) &&
      truth(3L) == (((1 to 10).map(i => s"c$i").mkString(" "), 12L)))
    assert(asMap(Dedup.removeDupSpansVerified(in, k = 8)) == truth)
    val collided = asMap(Dedup.removeDupSpansVerifiedWith(
      in, 8, "doc_id", "text", _ => lit(0L)))
    assert(collided == truth,
      s"colliding hash must not change verified removal: $collided vs $truth")
  }

  test("span provenance: excised occurrences carry true keepers, covers exactly the removed tokens") {
    val x = (1 to 12).map(i => s"x$i").mkString(" ")
    val y = (1 to 12).map(i => s"y$i").mkString(" ")
    val d1 = s"$x ${(1 to 10).map(i => s"a$i").mkString(" ")}"
    val d2 = s"$x $y"
    val d3 = s"$y ${(1 to 10).map(i => s"c$i").mkString(" ")}"
    val in = docsDF(1L -> d1, 2L -> d2, 3L -> d3)
    val prov = Dedup.dupSpanProvenance(in, k = 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"),
        r.getAs[Long]("keeper_doc"), r.getAs[String]("gram")))
    // doc 2's X occurrences (pos 0..4) point at keeper 1; doc 3's Y
    // occurrences (pos 0..4) point at keeper 2 — never the hash-bucket min
    assert(prov.filter(_._1 == 2L).map(p => (p._2, p._3)).sorted.toSeq ==
      (0L to 4L).map(p => (p, 1L)))
    assert(prov.filter(_._1 == 3L).map(p => (p._2, p._3)).sorted.toSeq ==
      (0L to 4L).map(p => (p, 2L)))
    assert(prov.forall(p => p._1 != p._3), "a keeper never appears as its own excised doc")
    assert(prov.forall(_._4.split(" ").length == 8))
    // the trail replays the removal: expanding each occurrence to its
    // k-token cover reproduces removeDupSpansVerified's n_removed per doc
    val coveredByProv = prov.groupBy(_._1).view.mapValues(
      _.flatMap(p => p._2 until p._2 + 8).toSet.size.toLong).toMap
    val removed = Dedup.removeDupSpansVerified(in, k = 8).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_removed")).toMap
    assert(removed.forall { case (d, n) => coveredByProv.getOrElse(d, 0L) == n },
      s"provenance covers $coveredByProv but removal reports $removed")
    // collision seam: an all-colliding hash must not change the trail
    val collided = Dedup.dupSpanProvenanceWith(in, 8, "doc_id", "text", _ => lit(0L))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"),
        r.getAs[Long]("keeper_doc"), r.getAs[String]("gram")))
    assert(collided.sorted.toSeq == prov.sorted.toSeq)
  }

  test("verified contamination removal: exact under a colliding hash, equals the hash-keyed form on real data") {
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val contaminated = s"${(1 to 10).map(i => s"a$i").mkString(" ")} $quote"
    val clean = (1 to 22).map(i => s"c$i").mkString(" ")
    val corpus = docsDF(1L -> contaminated, 2L -> clean)
    val bench = docsDF(100L -> s"$quote ${(1 to 5).map(i => s"z$i").mkString(" ")}")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_removed")))).toMap
    val truth = asMap(graft.operators.Decontamination.decontaminateSpans(corpus, bench, k = 8))
    assert(truth(1L)._2 == 12L && truth(2L)._2 == 0L)
    assert(asMap(graft.operators.Decontamination
      .decontaminateSpansVerified(corpus, bench, k = 8)) == truth)
    // all-colliding hash: the hash-keyed form would excise BOTH docs
    // wholesale; verification must confirm each candidate on the gram text
    // and reproduce the exact answer (doc 2 untouched)
    val collided = asMap(graft.operators.Decontamination
      .decontaminateSpansVerifiedWith(corpus, bench, 8, "doc_id", "text", _ => lit(0L)))
    assert(collided == truth,
      s"colliding hash must not change verified decontamination: $collided vs $truth")
  }

  test("contamination provenance: min-doc witness, covers the verified excision, exact under a colliding hash") {
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val contaminated = s"${(1 to 10).map(i => s"a$i").mkString(" ")} $quote"
    val clean = (1 to 22).map(i => s"c$i").mkString(" ")
    val corpus = docsDF(1L -> contaminated, 2L -> clean)
    // the quote appears in TWO benchmark docs — witness must be the lowest
    val bench = docsDF(200L -> s"$quote x1 x2", 100L -> s"z1 z2 $quote")
    val prov = graft.operators.Decontamination
      .contaminationProvenance(corpus, bench, k = 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"),
        r.getAs[Long]("bench_doc"), r.getAs[String]("gram")))
    // doc 1's quote spans positions 10..14 (5 grams of the 12-token run)
    assert(prov.map(p => (p._1, p._2)).sorted.toSeq == (10L to 14L).map((1L, _)))
    assert(prov.forall(_._3 == 100L), "witness must be the lowest benchmark doc")
    assert(prov.forall(_._4.split(" ").length == 8))
    // cover-equivalence: expanding occurrences to k-token covers matches
    // the verified excision's n_removed
    val covered = prov.flatMap(p => p._2 until p._2 + 8).toSet.size.toLong
    val removed = graft.operators.Decontamination
      .decontaminateSpansVerified(corpus, bench, k = 8).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_removed")).toMap
    assert(removed(1L) == covered && removed(2L) == 0L)
    // collision seam: all-colliding hash must not name the clean doc
    val collided = graft.operators.Decontamination
      .contaminationProvenanceWith(corpus, bench, 8, "doc_id", "text", _ => lit(0L))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"),
        r.getAs[Long]("bench_doc"), r.getAs[String]("gram")))
    assert(collided.sorted.toSeq == prov.sorted.toSeq)
  }

  test("contamination-span removal: benchmark quotes excised, clean text kept, report goes quiet") {
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val contaminated = s"${(1 to 10).map(i => s"a$i").mkString(" ")} $quote"
    val clean = (1 to 22).map(i => s"c$i").mkString(" ")
    val corpus = docsDF(1L -> contaminated, 2L -> clean)
    val bench = docsDF(100L -> s"$quote ${(1 to 5).map(i => s"z$i").mkString(" ")}")
    val out = graft.operators.Decontamination.decontaminateSpans(corpus, bench, k = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_removed")))).toMap
    // doc 1 loses exactly the 12-token quoted run; doc 2 untouched
    assert(out(1L) == (((1 to 10).map(i => s"a$i").mkString(" "), 12L)))
    assert(out(2L) == ((clean, 0L)))
    // postcondition: the cleaned corpus reports zero benchmark overlap
    val residual = graft.operators.Decontamination.overlapReport(
      graft.operators.Decontamination.decontaminateSpans(corpus, bench, k = 8)
        .select(col("doc_id"), col("clean_text").as("text")),
      bench).count()
    assert(residual == 0L, s"cleaned corpus must report no benchmark overlap, got $residual")
  }

  test("contamination-span removal on the test corpus: flagged docs shrink instead of dropping") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = d.filter(col("doc_id") % 10 =!= 7)
    val bench = d.filter(col("doc_id") % 10 === 7)
    val flaggedBefore = graft.operators.Decontamination.overlapReport(corpus, bench)
      .count()
    assert(flaggedBefore > 0, "the corpus plants benchmark overlap; the fixture must exercise it")
    val cleaned = graft.operators.Decontamination.decontaminateSpans(corpus, bench).cache()
    assert(cleaned.count() == corpus.count(), "every document survives (shrunk, not dropped)")
    assert(cleaned.filter(col("n_removed") > 0).count() == flaggedBefore,
      "exactly the overlap-flagged docs lose spans")
    val flaggedAfter = graft.operators.Decontamination.overlapReport(
      cleaned.select(col("doc_id"), col("clean_text").as("text")), bench).count()
    assert(flaggedAfter == 0,
      s"cleaned corpus must report no benchmark overlap, got $flaggedAfter flagged docs")
    cleaned.unpersist()
  }

  test("block dedup: later occurrences drop, first survives, within-doc repeat collapses") {
    val blk = (1 to 8).map(i => s"w$i").mkString(" ")     // one exact 8-token block
    val other = (1 to 8).map(i => s"x$i").mkString(" ")
    val out = Dedup.blockDedup(docsDF(
      1L -> s"$blk $other",        // canonical occurrence of both blocks
      2L -> s"$blk $blk",          // two copies of doc 1's block: both drop
      3L -> other),                // duplicate of doc 1's second block: drops
      blockWords = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == s"$blk $other" && out(1L).getLong(3) == 0)
    assert(out(2L).getString(1) == "" && out(2L).getLong(3) == 2,
      s"both copies in doc 2 must drop, got ${out(2L)}")
    assert(out(3L).getString(1) == "" && out(3L).getLong(3) == 1)
    // every distinct block survives exactly once corpus-wide
    val keptBlocks = out.values.flatMap(r =>
      r.getString(1).split(" ").filter(_.nonEmpty).grouped(8).map(_.mkString(" "))).toSeq
    assert(keptBlocks.distinct == keptBlocks)
  }

  test("cms top terms: estimate >= exact always, exact at wide width, collisions inflate") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val narrow = Sketches.cmsTopTerms(docs, k = 20, depth = 3, width = 8).collect()
    assert(narrow.forall(r => r.getLong(2) >= r.getLong(3)),
      "count-min error is one-sided: est >= exact")
    // a width far above the vocabulary gives no collisions: est == exact,
    // and the ranking equals the exact heavy-hitter ranking
    val wide = Sketches.cmsTopTerms(docs, k = 20, depth = 3, width = 65536)
    assert(wide.collect().forall(r => r.getLong(2) == r.getLong(3)),
      "no-collision sketch must be exact")
  }

  test("rank cap: keeps exactly the top-cap per stratum, ties by id") {
    val df = Seq(
      (1L, "a", 0.9), (2L, "a", 0.7), (3L, "a", 0.7), (4L, "a", 0.1),
      (5L, "b", 0.5)).toDF("doc_id", "source", "score")
    val out = Sampling.rankCap(df, cap = 2, strataCol = "source", scoreCol = "score")
      .orderBy(col("source"), col("cap_rank")).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq ==
      Seq((1L, "a", 1L), (2L, "a", 2L), (5L, "b", 1L)))
  }

  test("drift report: identical snapshots give zero KL, a shifted feed reads positive, partition-free") {
    val a = Seq((1L, "s", "x x x y"), (2L, "s", "x y y z")).toDF("doc_id", "source", "text")
    val same = graft.operators.CorpusDiff.driftReport(a, a).collect()
    assert(same.length == 1 && same(0).getDouble(4) == 0.0,
      s"identical distributions must give exactly 0 KL, got ${same.toSeq}")
    // the new snapshot shifts mass onto z: KL must be strictly positive
    val b = Seq((1L, "s", "z z z z"), (2L, "s", "z z x y")).toDF("doc_id", "source", "text")
    val drift = graft.operators.CorpusDiff.driftReport(a, b).collect()(0)
    assert(drift.getDouble(4) > 0.0, s"shifted feed must drift, got $drift")
    assert(drift.getLong(1) == 8L && drift.getLong(2) == 8L && drift.getLong(3) == 3L)
    // integer-quantized contributions: bit-identical under repartitioning
    val big = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r1 = graft.operators.CorpusDiff.driftReport(
      big.filter(col("doc_id") % 10 =!= 3), big.filter(col("doc_id") % 7 =!= 2)).collect().toSeq
    val r2 = graft.operators.CorpusDiff.driftReport(
      big.filter(col("doc_id") % 10 =!= 3).repartition(7),
      big.filter(col("doc_id") % 7 =!= 2).repartition(5)).collect().toSeq
    assert(r1 == r2, "pico-quantized KL must be partitioning-independent")
  }

  test("overlap matrix: planted shared 8-gram counted once, disjoint pair zero, jaccard exact") {
    val run = (1 to 8).map(i => s"s$i").mkString(" ")  // the shared 8-token run
    val docs = Seq(
      (1L, "a", s"$run a1 a2 a3 a4 a5 a6 a7"),
      (2L, "b", s"$run b1 b2 b3 b4 b5 b6 b7"),
      (3L, "c", "c1 c2 c3 c4 c5 c6 c7 c8")).toDF("doc_id", "source", "text")
    val out = graft.operators.CorpusDiff.overlapMatrix(docs, k = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // each doc has 8 grams (15 tokens), all distinct; a and b share exactly
    // the one planted run gram: jaccard = 1 / (8 + 8 - 1)
    assert(out(("a", "b")) == ((1L, BigDecimal(1.0 / 15).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out(("a", "c")) == ((0L, 0.0)) && out(("b", "c")) == ((0L, 0.0)))
    assert(out.size == 3, "all pairs present, zero-pairs included")
  }

  test("gopher rules: each rule trips on its planted violator, clean doc keeps") {
    val good = (1 to 10).map(_ => "the quick brown fox jumps over a lazy dog kind of").mkString(" ")
    val df = graft.operators.TextAnalysis.gopherRules(docsDF(
      1L -> good,                                   // passes everything
      2L -> "the a of way too short",               // < 30 tokens
      3L -> good.replace("the ", "### ").replace(" a ", " #it# "), // symbols, no stopwords
      4L -> (1 to 30).map(_ => "pneumonoultramicroscopic supercalifragilistic the a").mkString(" ")), // long words
      minTokens = 30)
    val byId = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getBoolean(11), "clean doc must keep")
    assert(!byId(2L).getBoolean(6) && !byId(2L).getBoolean(11), "short doc fails pass_len")
    assert(!byId(3L).getBoolean(8) && !byId(3L).getBoolean(10),
      "symbol doc fails pass_symbol and pass_stop")
    assert(!byId(4L).getBoolean(7) && !byId(4L).getBoolean(11),
      "long-word doc fails pass_word_len")
  }

  test("bm25: rare-term docs outrank common-term docs; tf monotonicity") {
    // 'rare' in one doc, 'com' in all; doc 4 has the highest rare tf
    val corpus = docsDF(
      1L -> "com x x x x x x x",
      2L -> "com x x x x x x x",
      3L -> "com com x x x x x x",
      4L -> "rare rare com x x x x x")
    val out = Search.bm25TopK(corpus, Seq("rare", "com"), k = 4)
      .orderBy("rank").collect()
    assert(out.head.getAs[Long]("doc_id") == 4L, "rare-term doc must rank first")
    // doc 3 (tf=2 for com) above docs 1/2 (tf=1)
    assert(out(1).getAs[Long]("doc_id") == 3L)
    val scores = out.map(_.getAs[Double]("bm25"))
    assert(scores.sameElements(scores.sorted.reverse))
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("mixture sampling: integer weights copy exactly, zero drops, fractional within tolerance") {
    val rows = (0L until 1000L).map(i => (i, if (i % 4 == 0) "dbl" else if (i % 4 == 1) "zero"
      else if (i % 4 == 2) "half" else "one")).toDF("doc_id", "src")
    val out = Sampling.mixtureSample(rows, "src",
      Map("dbl" -> 2.0, "zero" -> 0.0, "half" -> 0.5, "one" -> 1.0))
      .groupBy("src").agg(count(lit(1)).as("n"), count_distinct(col("doc_id")).as("nd"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("dbl") == ((500L, 250L)), "weight 2.0 = exactly two copies of every doc")
    assert(!out.contains("zero"), "weight 0.0 drops the stratum")
    assert(out("one") == ((250L, 250L)))
    val (halfRows, halfDocs) = out("half")
    assert(halfRows == halfDocs, "fractional weight < 1 never duplicates")
    assert(math.abs(halfRows - 125L) <= 25, s"half-rate kept $halfRows of 250")
    // deterministic: same seed, same draw
    val again = Sampling.mixtureSample(rows, "src",
      Map("dbl" -> 2.0, "zero" -> 0.0, "half" -> 0.5, "one" -> 1.0))
      .agg(count(lit(1))).head().getLong(0)
    assert(again == out.values.map(_._1).sum)
  }

  test("centroid outliers: identical vectors give cosine 1, planted outlier found") {
    val base = Array.fill(8)(1.0f)
    val outlier = Array.tabulate(8)(i => if (i < 4) 1.0f else -1.0f) // orthogonal to base
    val rows = ((0L until 9L).map(id => (id, 0, base)) :+ ((9L, 0, outlier))) ++
      (10L until 14L).map(id => (id, 1, Array.tabulate(8)(j => (j + 1).toFloat)))
    val out = Clustering.centroidOutliers(rows.toDF("vec_id", "label", "embedding"), k = 2)
      .orderBy("label", "rank").collect()
    // label 0: the orthogonal vector is rank-1 outlier; a base vector rank 2
    val l0 = out.filter(_.getAs[Int]("label") == 0)
    assert(l0.head.getAs[Long]("vec_id") == 9L)
    assert(l0.head.getAs[Double]("cos_centroid") < l0(1).getAs[Double]("cos_centroid"))
    // label 1: all vectors identical => cosine to centroid = 1 for both ranks
    val l1 = out.filter(_.getAs[Int]("label") == 1)
    assert(l1.forall(r => math.abs(r.getAs[Double]("cos_centroid") - 1.0) < 1e-6))
  }

  test("asof backward: latest-at-or-before match, equal-ts tie, simultaneous tie-break, no-match null") {
    val left = Seq((100L, 1L, 10L), (101L, 1L, 20L), (102L, 1L, 5L), (103L, 2L, 50L))
      .toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      (200L, 1L, 8L, 1.0), (201L, 1L, 20L, 2.0), (202L, 1L, 20L, 3.0), // two at ts=20
      (203L, 2L, 60L, 9.0)) // after the only user-2 left row
      .toDF("event_id", "user_id", "ts_us", "value")
    val out = AsofJoin.asofBackward(left, right, "user_id", "ts_us", "ts_us",
      Seq("event_id", "value"), "event_id")
      .orderBy("event_id").collect()
    def m(i: Int) = (out(i).getAs[Long]("event_id"),
      Option(out(i).getAs[java.lang.Long]("asof_event_id")).map(_.toLong))
    assert(m(0) == ((100L, Some(200L))), "ts 10: only view at 8 precedes")
    assert(m(1) == ((101L, Some(202L))), "ts 20 tie: equal-ts views match, largest event_id wins")
    assert(m(2) == ((102L, None)), "ts 5: nothing precedes -> NULL")
    assert(m(3) == ((103L, None)), "user 2: the view is in the future")
    assert(out(1).getAs[Double]("asof_value") == 3.0)
  }

  test("pack offsets: straddling docs span both packs, groups are independent") {
    val docs = Seq(
      (1L, "g1", (1 to 300).map(_ => "t").mkString(" ")),  // [0, 300)
      (2L, "g1", (1 to 300).map(_ => "t").mkString(" ")),  // [300, 600) straddles 512
      (3L, "g1", (1 to 10).map(_ => "t").mkString(" ")),   // [600, 610)
      (4L, "g2", (1 to 600).map(_ => "t").mkString(" "))   // [0, 600) spans packs 0-1
    ).toDF("doc_id", "source", "text")
    val out = Chunking.packOffsets(docs, budget = 512)
      .orderBy("source", "doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("tok_start"), r.getAs[Long]("pack_first"), r.getAs[Long]("pack_last"))))
      .toMap
    assert(out(1L) == ((0L, 0L, 0L)))
    assert(out(2L) == ((300L, 0L, 1L)), "doc crossing the 512 cut belongs to packs 0 and 1")
    assert(out(3L) == ((600L, 1L, 1L)))
    assert(out(4L) == ((0L, 0L, 1L)), "groups restart at offset 0")
  }

  test("range join: containment exact at bucket boundaries, no duplicate matches, keys isolated") {
    val intervals = Seq((1L, 10L, 0L, 250L), (1L, 11L, 300L, 320L), (2L, 20L, 0L, 1000L))
      .toDF("user_id", "iv_id", "s", "e")
    // bucketWidth 100: interval 10 spans buckets 0-2, a point can only meet
    // it once; points at exact start/end are included; key 2's interval must
    // not capture key 1's points
    val points = Seq((100L, 1L, 0L), (101L, 1L, 250L), (102L, 1L, 260L),
      (103L, 1L, 300L), (104L, 2L, 500L)).toDF("pt_id", "user_id", "ts")
    val out = RangeJoin.intervalJoin(points, intervals, "user_id", "ts", "s", "e", 100L)
      .select("pt_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((100L, 10L), (101L, 10L), (103L, 11L), (104L, 20L)))
    // no duplicates even though interval 10 spans 3 buckets
    val n = RangeJoin.intervalJoin(points, intervals, "user_id", "ts", "s", "e", 100L).count()
    assert(n == 4L)
  }

  test("kmv sketch: exact below k, estimate within 20% above k") {
    // group 'small' has 10 distinct tokens (< k); 'big' has 2000 (> k)
    val small = (1 to 3).map(i => (i.toLong, "small",
      (1 to 10).map(j => s"s$j").mkString(" ")))
    val big = (1 to 40).map(i => (100L + i, "big",
      ((i - 1) * 50 until i * 50).map(j => s"b$j").mkString(" ")))
    val out = Sketches.kmvDistinctTokens((small ++ big).toDF("doc_id", "source", "text"), k = 64)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_kept"), r.getAs[Double]("est_distinct")))).toMap
    assert(out("small") == ((10L, 10.0)), "below k the sketch is exact")
    val (kept, est) = out("big")
    assert(kept == 64L)
    assert(math.abs(est - 2000.0) / 2000.0 < 0.2, s"KMV estimate $est for true 2000")
  }

  test("split assignment: total, stable under corpus growth, proportions near nominal") {
    val small = (0L until 2000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val big = (0L until 6000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    def splitsOf(df: org.apache.spark.sql.DataFrame) =
      Sampling.assignSplits(df).select(col("doc_id"), col("split"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = splitsOf(small)
    val b = splitsOf(big)
    // THE contract: a doc's split never changes as the corpus grows —
    // the hash assignment is a pure function of (seed, id)
    assert(a.forall { case (id, s) => b(id) == s },
      "growing the corpus must not move any existing doc's split")
    // every doc assigned, proportions near nominal on the bigger draw
    assert(b.size == 6000 && b.values.forall(Set("train", "val", "test")))
    val frac = b.values.groupBy(identity).view.mapValues(_.size / 6000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.03, s"train ${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.02, s"val ${frac("val")}")
    assert(math.abs(frac("test") - 0.1) < 0.02, s"test ${frac("test")}")
    // deterministic under repartitioning; different seed reshuffles
    assert(splitsOf(big.repartition(7)) == b, "partitioning-independent")
    val reseeded = Sampling.assignSplits(big, seed = "other")
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("split"))).toMap
    assert(reseeded != b, "a different seed must re-deal the splits")
    // weights must sum to 1 and names be distinct
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(big, splits = Seq("a" -> 0.5, "b" -> 0.2))
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(big, splits = Seq("a" -> 0.5, "a" -> 0.5))
    }
  }

  test("fixed-size sample: exact k per stratum, deterministic, nested in larger draws") {
    val rows = (0L until 500L).map(i => (i, if (i % 5 == 0) "small" else "big"))
      .toDF("doc_id", "src")
    val s20 = Sampling.fixedSizeSample(rows, 20, "src")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s20.count(_._2 == "small") == 20 && s20.count(_._2 == "big") == 20)
    // stratum smaller than k returns everything
    val tiny = Sampling.fixedSizeSample(rows.filter(col("doc_id") < 7), 20, "src").count()
    assert(tiny == 7)
    // same seed = same draw; and the k=10 draw is a PREFIX of the k=20 draw
    // (rank-based, so budgets nest without resampling)
    val s10 = Sampling.fixedSizeSample(rows, 10, "src")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s10.subsetOf(s20.toSet))
    assert(Sampling.fixedSizeSample(rows, 20, "src")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet == s20.toSet)
  }

  test("boilerplate: hot blocks condemned everywhere, cold blocks survive, stats match") {
    val hot = "copyright acme corp"                        // appears in 3 docs (minDocs = 3)
    val docs = docsDF(
      1L -> s"$hot alpha beta gamma",
      2L -> s"delta epsilon zeta $hot",
      3L -> s"$hot $hot eta theta iota",                   // twice in one doc: one doc, 2 occurrences
      4L -> "kappa lambda mu")
    val stats = graft.operators.TextAnalysis.boilerplateStats(docs, blockWords = 3, minDocs = 3)
      .collect()
    assert(stats.length == 1 && stats.head.getString(0) == hot)
    assert(stats.head.getLong(1) == 3L && stats.head.getLong(2) == 4L,
      s"3 distinct docs / 4 occurrences expected, got ${stats.head}")
    val out = graft.operators.TextAnalysis.boilerplateRemove(docs, blockWords = 3, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // EVERY occurrence drops — including the first (unlike blockDedup's keep-first)
    assert(out(1L).getString(1) == "alpha beta gamma" && out(1L).getLong(3) == 1L)
    assert(out(2L).getString(1) == "delta epsilon zeta" && out(2L).getLong(3) == 1L)
    assert(out(3L).getString(1) == "eta theta iota" && out(3L).getLong(3) == 2L)
    // a doc with no hot blocks is untouched
    assert(out(4L).getString(1) == "kappa lambda mu" && out(4L).getLong(3) == 0L)
  }

  test("boilerplate: below-threshold repeats survive removal") {
    val blk = "one two three"
    val docs = docsDF(1L -> s"$blk a b c", 2L -> s"$blk d e f")   // 2 docs < minDocs 3
    val out = graft.operators.TextAnalysis.boilerplateRemove(docs, blockWords = 3, minDocs = 3)
      .collect()
    assert(out.forall(_.getLong(3) == 0L), "nothing reaches the threshold, nothing drops")
    assert(graft.operators.TextAnalysis.boilerplateStats(docs, blockWords = 3, minDocs = 3)
      .isEmpty)
  }

  test("boilerplate incremental: single batch == batch operator; hotness is forward-only") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // one batch over the full corpus is bit-identical to the batch op
    val (oneShot, store) = graft.operators.TextAnalysis.boilerplateRemoveIncremental(
      None, docs, blockWords = 3, minDocs = 5)
    val batchOp = graft.operators.TextAnalysis.boilerplateRemove(
      docs, blockWords = 3, minDocs = 5)
    assert(oneShot.orderBy("doc_id").collect().toSeq ==
      batchOp.orderBy("doc_id").collect().toSeq)
    assert(store.filter(col("n_docs") >= 5).count() ==
      graft.operators.TextAnalysis.boilerplateStats(docs, 3, 5).count())
    // forward-only: a block crossing the threshold in batch 2 condemns
    // batch 2's copy, but batch 1's already-emitted copy stays
    val blk = "acme corp footer"
    val b1 = docsDF(1L -> s"$blk alpha beta gamma", 2L -> s"$blk delta epsilon zeta")
    val b2 = docsDF(3L -> s"$blk eta theta iota", 4L -> "kappa lambda mu")
    val (o1, s1) = graft.operators.TextAnalysis.boilerplateRemoveIncremental(
      None, b1, blockWords = 3, minDocs = 3)
    val (o2, _) = graft.operators.TextAnalysis.boilerplateRemoveIncremental(
      Some(s1.localCheckpoint(true)), b2, blockWords = 3, minDocs = 3)
    assert(o1.collect().forall(_.getLong(3) == 0L), "2 docs < minDocs: batch 1 untouched")
    val m2 = o2.collect().map(r => r.getLong(0) -> r).toMap
    assert(m2(3L).getString(1) == "eta theta iota" && m2(3L).getLong(3) == 1L,
      "cumulative count 3 >= minDocs condemns batch 2's copy")
    assert(m2(4L).getLong(3) == 0L)
  }

  test("chunking and mixture sampling stay shuffle-free (scan-local explode + filter)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (plan <- Seq(
        Chunking.chunk(docs).queryExecution.executedPlan.toString,
        Sampling.mixtureSample(docs, "source", Map("src0" -> 1.5))
          .queryExecution.executedPlan.toString))
      assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }
}
