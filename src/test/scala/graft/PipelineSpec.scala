package graft

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Validation for the pipeline operators without a SQL oracle (MinHash/LSH,
  * SimHash, ANN) — cross-checked against their exact counterparts — plus the
  * multimodal plumbing.
  */
class PipelineSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()

  test("minhash LSH: verified pairs are a high-recall subset of exact jaccard pairs") {
    val exact = Dedup.ngramJaccardPairs(docs, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test corpus should contain planted near-duplicates")
    // precision is exact by construction (candidates are jaccard-verified)
    assert(lsh.subsetOf(exact), s"LSH returned non-duplicate pairs: ${lsh.diff(exact)}")
    // recall: 16 bands x 4 rows at j>=0.8 detects with p ~ 1-(1-j^4)^16 > 0.999
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall (${lsh.size}/${exact.size})")
  }

  test("simhash: near-duplicate docs collide, pair search finds planted dups") {
    val exact = Dedup.ngramJaccardPairs(docs, 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, maxHamming = 11)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // measured separation on this corpus: >=0.9-jaccard pairs sit at
    // shingle-hamming 1-9, unrelated pairs at >= 14 — threshold 11 is
    // inside the gap, so BOTH recall and precision should be essentially 1
    val recall = exact.intersect(sim).size.toDouble / exact.size
    assert(recall >= 0.95, s"simhash recall $recall")
    val loose = Dedup.ngramJaccardPairs(docs, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val precision = sim.count(loose.contains).toDouble / math.max(1, sim.size)
    assert(precision >= 0.95, s"simhash precision $precision (${sim.size} pairs)")
    // and the signature is a deterministic function of the text
    val sigs = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sigs2 = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs == sigs2)
  }

  test("simhash two-of-m blocking: identical output to one-of-m (pigeonhole completeness)") {
    // method forced: auto routes maxHamming=11 to two-of-m, which would
    // make this equality vacuous (two-of-m vs itself)
    val one = Dedup.simhashPairs(docs, maxHamming = 11, method = "chunks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val two = Dedup.simhashPairsTwoOfM(docs, maxHamming = 11).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(one.nonEmpty && one == two,
      s"blocking schemes must agree exactly: ${one.diff(two).take(5)} / ${two.diff(one).take(5)}")
  }

  test("simhash auto method switches to two-of-m exactly below 8-bit chunk width") {
    // 62 bits / (maxHamming+1) chunks: width >= 8 up to maxHamming=6
    for (h <- 0 to 6)
      assert(Dedup.simhashResolveMethod(h, "auto") == "chunks", s"maxHamming=$h")
    for (h <- Seq(7, 11, 20))
      assert(Dedup.simhashResolveMethod(h, "auto") == "two-of-m", s"maxHamming=$h")
    // explicit choices pass through; junk is rejected
    assert(Dedup.simhashResolveMethod(11, "chunks") == "chunks")
    assert(Dedup.simhashResolveMethod(3, "two-of-m") == "two-of-m")
    intercept[IllegalArgumentException](Dedup.simhashResolveMethod(11, "banded"))
  }

  test("two-of-m blocking generates strictly fewer candidates at wide radius") {
    // the reason auto switches: at maxHamming=11 the 5-6-bit one-of-m chunk
    // keys collide massively; pairing chunks squares the key space
    def cands(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").distinct().count()
    val one = cands(Dedup.simhashCandidatesChunks(docs, 11))
    val two = cands(Dedup.simhashCandidatesTwoOfM(docs, 11))
    assert(two < one, s"expected a candidate reduction, got one-of-m=$one two-of-m=$two")
    assert(two.toDouble / one <= 0.5,
      s"reduction weaker than documented: one-of-m=$one two-of-m=$two")
  }

  test("jaccard auto method switches plain->prefix on corpus count; explicit skips counting") {
    assert(Dedup.jaccardResolveMethod("auto", () => 200000L, 200000L) == "plain")
    assert(Dedup.jaccardResolveMethod("auto", () => 200001L, 200000L) == "prefix")
    // an explicit method must never pay the counting job
    def boom() = { fail("explicit method must not count the corpus"); 0L }
    assert(Dedup.jaccardResolveMethod("plain", () => boom(), 100L) == "plain")
    assert(Dedup.jaccardResolveMethod("prefix", () => boom(), 100L) == "prefix")
    intercept[IllegalArgumentException](Dedup.jaccardResolveMethod("lsh", () => 1L, 100L))
    // and the routed path is output-identical to the direct call
    val viaAuto = Dedup.ngramJaccardPairs(docs, 0.8, plainLimit = 1L) // forces prefix
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = Dedup.ngramJaccardPairsPrefix(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaAuto == direct)
  }

  test("native winnow expression == relational winnowing, incl. edge lengths") {
    // corpus cross-check: identical (doc_id, fp) row sets
    val native = TextAnalysis.winnowedFingerprintPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val relational = TextAnalysis.winnowedFingerprintPairsRelational(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native.nonEmpty && native == relational,
      s"native/relational winnow diverge: ${native.diff(relational).take(5)} / ${relational.diff(native).take(5)}")
    // edge lengths around the k + window - 1 = 11 char threshold (k=8, w=4):
    // shorter docs must vanish from both forms
    import spark.implicits._
    val edge = Seq((1L, ""), (2L, "abcdefg"), (3L, "abcdefghij"), (4L, "abcdefghijk"),
      (5L, "aaaaaaaaaaaaaaaa"), (6L, (null: String))).toDF("doc_id", "text")
    val en = TextAnalysis.winnowedFingerprintPairs(edge).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val er = TextAnalysis.winnowedFingerprintPairsRelational(edge).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(en == er, s"edge-case divergence: $en vs $er")
    assert(en.map(_._1) == Set(4L, 5L), "only docs with >= k+window-1 chars fingerprint")
  }

  test("prefix-filtered winnow near-dup == all-pairs formulation (complete candidates)") {
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val pref = TextAnalysis.winnowNearDupPairs(docs, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val all = TextAnalysis.winnowNearDupPairsAllPairs(docs, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(pref == all,
        s"threshold $t: prefix filter changed the result " +
          s"(missing=${all.diff(pref).take(3)} extra=${pref.diff(all).take(3)})")
    }
  }

  test("winnow near-dup shuffle-verify path == broadcast-verify path") {
    // broadcastVerifyMaxBytes = 0 forces the shuffle-hash verification join
    // (the boilerplate-heavy-corpus regime where forcing the broadcast OOMs);
    // output must be identical to the default broadcast path
    val bc = TextAnalysis.winnowNearDupPairs(docs, 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val sh = TextAnalysis.winnowNearDupPairs(docs, 0.7,
        broadcastVerifyMaxBytes = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(bc == sh, s"verify-join strategy changed the result " +
      s"(missing=${bc.diff(sh).take(3)} extra=${sh.diff(bc).take(3)})")
  }

  test("winnow near-dup pairs: planted duplicates found, background rejected") {
    val planted = Dedup.ngramJaccardPairs(docs, 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wn = TextAnalysis.winnowNearDupPairs(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(planted.nonEmpty && wn.nonEmpty)
    // recall: winnowing is robust to the local edits the dup generator makes
    val recall = planted.count(wn.contains).toDouble / planted.size
    assert(recall >= 0.9, s"winnow recall $recall (${wn.size} pairs)")
    // precision vs a loose jaccard ground truth (containment also admits
    // genuine fragment-inclusion, so compare against 0.5-jaccard)
    val loose = Dedup.ngramJaccardPairs(docs, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val precision = wn.keys.count(loose.contains).toDouble / wn.size
    assert(precision >= 0.9, s"winnow precision $precision")
    wn.values.foreach(c => assert(c >= 0.7 && c <= 1.0))
  }

  test("repetition: hand-computed fixture, run tie-break, zero-shuffle plan") {
    import spark.implicits._
    val fix = Seq(
      (1L, "a a a b"),   // 2-grams: [a a, a a, a b]; 3-grams: [a a a, a a b]
      (2L, "x y"),       // single 2-gram, no 3-gram
      (3L, "z")          // no grams at all
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(fix).collect().map(x => x.getLong(0) -> x).toMap
    val d1 = r(1L)
    assert(d1.getString(2) == "a a" && d1.getLong(3) == 2L, "top 2-gram of doc 1")
    assert(math.abs(d1.getDouble(4) - 2 * 3 / 7.0) < 1e-15, "top2_frac = cnt*len/chars")
    assert(math.abs(d1.getDouble(5) - 6 / 7.0) < 1e-15, "dup2 covers only the duplicated gram")
    // both 3-grams occur once: the tie must resolve to the sorted-first gram
    assert(d1.getString(6) == "a a a" && d1.getLong(7) == 1L, "3-gram tie-break")
    assert(d1.getDouble(9) == 0.0, "no duplicated 3-gram")
    val d2 = r(2L)
    assert(d2.getString(2) == "x y" && d2.getLong(3) == 1L && d2.getDouble(5) == 0.0)
    val d3 = r(3L)
    assert(d3.getLong(1) == 1L && d3.getLong(3) == 0L && d3.getString(2) == "")
    // the whole computation is a scan-side projection: no exchange anywhere
    val plan = TextAnalysis.repetition(docs).queryExecution.executedPlan
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
      (p match {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
        case _ => 0
      }) + p.children.map(shuffles).sum
    assert(shuffles(plan) == 0, s"repetition must be shuffle-free:\n$plan")
  }

  test("quantized topk: int8 bounds, exact rerank scores, high recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 20)
    val qz = Similarity.quantize(emb).collect()
    qz.foreach { r =>
      assert(r.getDouble(1) > 0.0, "scale positive")
      r.getSeq[Byte](2).foreach(b => assert(b >= -127 && b <= 127))
    }
    val exact = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val quant = Similarity.quantizedTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(quant.size == exact.size)
    // scores in the quantized result are EXACT cosines: wherever the
    // neighbor agrees with brute force, the score must agree bit-for-bit
    quant.foreach { case (key, (nb, cs)) =>
      exact.get(key).foreach { case (enb, ecs) => if (enb == nb) assert(cs == ecs, s"$key") }
    }
    // int8 on 64 dims preserves ranking almost perfectly; require recall@5 >= 0.9
    val byQuery = exact.keys.map(_._1).toSeq.distinct
    val recalls = byQuery.map { q =>
      val e = (1 to 5).map(r => exact((q, r))._1).toSet
      val g = (1 to 5).map(r => quant((q, r))._1).toSet
      e.intersect(g).size.toDouble / 5
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.9, s"quantized recall@5 $recall")
  }

  test("deterministic sampling: reproducible, monotone in frac, seed-independent draws, rates in range") {
    import graft.operators.Sampling
    val ids = (df: org.apache.spark.sql.DataFrame) =>
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val s50a = ids(Sampling.deterministicSample(docs, 0.5))
    val s50b = ids(Sampling.deterministicSample(docs, 0.5))
    assert(s50a == s50b, "same seed + frac must reproduce exactly")
    val s20 = ids(Sampling.deterministicSample(docs, 0.2))
    assert(s20.subsetOf(s50a), "thresholding is monotone: sample(0.2) is nested in sample(0.5)")
    val n = docs.count().toDouble
    assert(math.abs(s50a.size / n - 0.5) < 0.1, s"rate ${s50a.size / n} far from 0.5")
    val other = ids(Sampling.deterministicSample(docs, 0.5, seed = "other"))
    assert(other != s50a, "different seed draws a different sample")
    assert(math.abs(other.size / n - 0.5) < 0.1)
    // stratified: listed strata sampled at their rate, unlisted at default 0
    val strat = Sampling.stratifiedSample(docs, "lang", Map("en" -> 1.0, "de" -> 0.5))
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val langTotals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(strat("en") == langTotals("en"), "frac 1.0 keeps the whole stratum")
    assert(strat.keySet == Set("en", "de"), "default 0.0 drops unlisted strata entirely")
    assert(math.abs(strat("de").toDouble / langTotals("de") - 0.5) < 0.15)
  }

  test("token-budget sample: hierarchical prefix == flat window, budget boundary exact") {
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.Window
    val budget = 2500L
    val kept = Sampling.tokenBudgetSample(docs, budget, "lang")
      .select("doc_id", "lang", "n_tokens", "cum_tokens").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(kept.nonEmpty)
    // oracle form: ONE flat cumulative-sum window per stratum (what the
    // DuckDB oracle runs); the range-bucketed decomposition must be exact
    val h = pmod(
      graft.functions.TextFunctions.polyHash(concat(lit("budget:"), col("doc_id").cast("string")))
        * lit(2654435761L) + lit(12345L), lit(2147483647L))
    val flat = docs
      .withColumn("n_tokens", size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
      .withColumn("__hv", h)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(
        Window.partitionBy(col("lang")).orderBy(col("__hv").asc, col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
      .select("doc_id", "lang", "n_tokens", "cum_tokens").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(kept == flat, "hierarchical prefix sum must equal the flat window bit-for-bit")
    // boundary: per stratum, the total either crosses the budget via its
    // last draw (kept total >= budget, and removing the last doc goes back
    // under) or the whole stratum fit inside it
    val perLang = kept.values.groupBy(_._1)
    perLang.foreach { case (lang, rows) =>
      val maxCum = rows.map(_._3).max
      val lastTok = rows.filter(_._3 == maxCum).head._2
      assert(maxCum - lastTok < budget, s"$lang: a doc past the budget was kept")
      val stratumTotal = docs.filter(col("lang") === lang)
        .select(sum(size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")))
        .collect()(0).getLong(0)
      assert(maxCum >= budget || maxCum == stratumTotal,
        s"$lang: stopped at $maxCum before reaching budget $budget or stratum end $stratumTotal")
    }
    assert(perLang.keySet == docs.select("lang").distinct().collect().map(_.getString(0)).toSet,
      "every non-empty stratum contributes at least one doc")
  }

  test("shuffle position: exact 1..n permutation, hierarchical == flat window, seed-dependent") {
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.Window
    val pos = Sampling.shufflePosition(docs)
      .select("doc_id", "position").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(pos.size == n && pos.values.toSet == (1L to n).toSet,
      "positions must be a dense 1..n permutation")
    val h = pmod(
      graft.functions.TextFunctions.polyHash(concat(lit("shuffle:"), col("doc_id").cast("string")))
        * lit(2654435761L) + lit(12345L), lit(2147483647L))
    val flat = docs.withColumn("__hv", h)
      .withColumn("position", row_number().over(Window.orderBy(col("__hv").asc, col("doc_id").asc)).cast("long"))
      .select("doc_id", "position").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pos == flat, "hierarchical rank must equal the flat global window")
    val other = Sampling.shufflePosition(docs, seed = "other")
      .select("doc_id", "position").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(other != pos, "a different seed must draw a different permutation")
    assert(other.values.toSet == (1L to n).toSet)
  }

  test("lm score: hand-computed add-one bigram log-likelihoods, empty doc NULL") {
    import spark.implicits._
    // tokens("") = [""] (the repo-wide convention: an empty doc has ONE
    // empty token), so the corpus vocabulary is {a, b, ""}: V=3, unigrams
    // a:3 b:2 "":1; bigrams "a b":2, "b a":1
    // P(a b) = (2+1)/(3+3) = 0.5, P(b a) = (1+1)/(2+3) = 0.4
    val docs = Seq((1L, "a b a"), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    val lpAB = math.floor(math.log(3.0 / 6.0) * 1e6 + 0.5).toLong // -693147
    val lpBA = math.floor(math.log(2.0 / 5.0) * 1e6 + 0.5).toLong // -916291
    assert(lpAB == -693147L && lpBA == -916291L, s"quantized terms $lpAB $lpBA")
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((2L, Some(r9((lpAB + lpBA).toDouble / 2e6)))))
    assert(got(2L) == ((1L, Some(r9(lpAB.toDouble / 1e6)))))
    assert(got(3L) == ((0L, None)), "a sub-2-token doc scores NULL, not an error")
  }

  test("pii redaction: all three pattern types replaced and counted, clean text untouched") {
    import spark.implicits._
    val fix = Seq(
      (1L, "mail a.b+c@x-y.co and d@e.org now"),
      (2L, "servers 192.168.0.1 10.0.0.255 up"),
      (3L, "call +4915112345678 please"),
      (4L, "nothing sensitive here at all"),
      (5L, "mixed bob@corp.io on 8.8.8.8 at +123456789")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(fix).collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r(1L) == (("mail <EMAIL> and <EMAIL> now", 2L, 0L, 0L)))
    assert(r(2L) == (("servers <IP> <IP> up", 0L, 2L, 0L)))
    assert(r(3L) == (("call <PHONE> please", 0L, 0L, 1L)))
    assert(r(4L) == (("nothing sensitive here at all", 0L, 0L, 0L)))
    assert(r(5L) == (("mixed <EMAIL> on <IP> at <PHONE>", 1L, 1L, 1L)))
  }

  test("decontamination: planted cross-split dups are flagged, clean docs are not, bench side broadcasts") {
    import org.apache.spark.sql.DataFrame
    val bench = docs.filter(col("doc_id") % 10 === 7)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val rep = graft.operators.Decontamination.overlapReport(corpus, bench)
    val flagged = rep.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(flagged.nonEmpty, "the planted near-dups must cross the split somewhere")
    // every flagged doc shares a verbatim 8-gram with a benchmark doc: verify
    // one directly by string containment of a shared shingle
    val benchSet = bench.select(explode(graft.functions.TextFunctions.wordShingles(col("text"), 8)).as("g"))
      .distinct().collect().map(_.getString(0)).toSet
    val corpusTexts = corpus.filter(col("doc_id").isin(flagged.keys.toSeq.map(x => x: Any): _*))
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    flagged.foreach { case (id, n) =>
      val grams = corpusTexts(id).trim.split("\\s+").sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSet
      assert(grams.intersect(benchSet).size.toLong == n, s"doc $id overlap count")
    }
    // a doc with no benchmark 8-gram must be absent (take any unflagged id)
    val unflagged = corpus.select("doc_id").collect().map(_.getLong(0)).filterNot(flagged.contains)
    assert(unflagged.nonEmpty)
    // plan: the benchmark gram set must be the broadcast side — the corpus
    // probe never shuffles to find candidates
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"bench side should broadcast:\n$plan")
  }

  test("cosine pairs: lsh candidates score exactly, near-dup threshold form is a precise subset") {
    // exact scores of ALL pairs (small corpus) — ground truth
    val exactAll = Similarity.topCosinePairs(emb, Int.MaxValue, method = "exact").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // lsh-method top-N: every returned pair must carry the true exact score
    // (precision exact; recall is the LSH collision curve and not asserted)
    val lshTop = Similarity.topCosinePairs(emb, 20, method = "lsh").collect()
    assert(lshTop.nonEmpty)
    lshTop.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(exactAll.contains(key) && exactAll(key) == r.getDouble(2),
        s"lsh pair $key score ${r.getDouble(2)} != exact ${exactAll.get(key)}")
    }
    // threshold form: a subset of the exact-threshold pairs, scores exact
    val nd = Similarity.cosineNearDupPairs(emb, 0.42).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(nd.nonEmpty, "expected some pairs above 0.42 on this corpus")
    nd.foreach { case (key, s) =>
      assert(s >= 0.42 && exactAll(key) == s, s"near-dup pair $key score $s mismatch")
    }
    // auto method at this corpus size resolves to exact: bitwise-identical
    val auto = Similarity.topCosinePairs(emb, 20).collect().map(_.toSeq)
    val exact20 = Similarity.topCosinePairs(emb, 20, method = "exact").collect().map(_.toSeq)
    assert(auto.toSeq == exact20.toSeq)
  }

  test("LSH ANN: neighbors are genuine (scores match brute force), recall reported") {
    val queries = emb.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val allScores = Similarity.bruteForceTopK(emb, queries, Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val lsh = Similarity.lshTopK(emb, queries, 5, multiProbe = 3).collect()
    assert(lsh.nonEmpty)
    // every LSH hit must carry the true cosine score for that pair
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(allScores.contains(key) && allScores(key) == r.getDouble(3),
        s"LSH score mismatch for $key")
    }
    val hit = lsh.count(r => bf.contains((r.getLong(0), r.getLong(2))))
    info(s"LSH ANN recall@5 = $hit/${bf.size} (multi-probe, approximate by design)")
    // the multi-probe dial (flip the 3 nearest hyperplane bits per table)
    // must hold serving-grade recall at its bounded 4xL buckets per query
    assert(hit.toDouble / bf.size >= 0.7,
      s"multi-probe LSH recall@5 must be >= 0.7, got $hit/${bf.size}")
    // candidate volume stays bounded: strictly fewer scored pairs than the
    // brute-force all-pairs scan would touch
    val nVecs = emb.count()
    val cands = Similarity.lshTopK(emb, queries, Int.MaxValue, multiProbe = 3).count()
    assert(cands < 10 * (nVecs - 1),
      s"multi-probe candidates $cands must stay below the 10-query brute-force volume")
  }

  test("IVF ANN: exact scores, recall reported; clusters partition the pair graph") {
    val queries = emb.filter(col("vec_id") < 10)
    val allScores = Similarity.bruteForceTopK(emb, queries, Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ivf = Similarity.ivfTopK(emb, queries, 5).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(allScores.contains(key) && allScores(key) == r.getDouble(3))
    }
    val bf = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    info(s"IVF recall@5 = ${ivf.count(r => bf((r.getLong(0), r.getLong(2))))}/${bf.size}")
    // widened input contract: array<double> embeddings and int ids produce
    // the identical result (float->double is exact, so scores are bit-equal)
    val wide = emb.select(col("vec_id").cast("int").as("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val ivfWide = Similarity.ivfTopK(wide, wide.filter(col("vec_id") < 10), 5).collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getInt(1),
        r.getAs[Number](2).longValue(), r.getDouble(3))).toSet
    val ivfOrig = ivf.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(ivfWide == ivfOrig, "array<double>/int-id corpus must score identically")

    // connected components: labels form a valid partition of the pair graph
    val pairs = Dedup.ngramJaccardPairs(docs, 0.5).cache()
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.collect().foreach { r =>
      assert(cc(r.getLong(0)) == cc(r.getLong(1)), "paired docs share a cluster")
    }
    cc.foreach { case (_, label) => assert(cc(label) == label, "cluster ids are roots") }
    pairs.unpersist()
  }

  test("prefix-filtered exact jaccard == plain exact jaccard (complete candidates)") {
    for (t <- Seq(0.5, 0.8)) {
      val plain = Dedup.ngramJaccardPairs(docs, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val prefixed = Dedup.ngramJaccardPairsPrefix(docs, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(prefixed == plain, s"threshold $t: prefix filter changed the result")
    }
  }

  test("dedup_exact keeps one representative per distinct text") {
    val total = docs.count()
    val kept = Dedup.exact(docs)
    assert(kept.agg(sum("n_copies")).collect()(0).getLong(0) == total)
    assert(kept.count() == docs.select("text").distinct().count())
  }

  test("multimodal: binary payload -> batched stub decode, deterministic features") {
    val media = Multimodal.asMedia(docs)
    assert(media.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(media, batchSize = 32).cache()
    assert(feats.count() == docs.count())
    val f = feats.filter(col("doc_id") === 0).collect()(0)
    // checksum equals md5 of the utf-8 text — the blob round-trips intact
    val txt = docs.filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(txt.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(f.checksum == md)
    assert(f.n_bytes == txt.getBytes("UTF-8").length.toLong)
    assert(f.byte_histogram.sum == f.n_bytes)
    assert(f.embedding.length == 8)
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, batchSize = 7)
      .filter(col("doc_id") === 0).collect()(0)
    assert(again.checksum == f.checksum && again.mean_byte == f.mean_byte
      && again.embedding.sameElements(f.embedding))
  }

  test("multimodal frame sampling: exact slicing of the payload") {
    val media = Multimodal.asMedia(docs)
    val fr = Multimodal.frameSample(media, frameLen = 32, stride = 64, maxFrames = 8)
    val row = fr.filter(col("doc_id") === 0).collect()(0)
    val txt = docs.filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    val bytes = txt.getBytes("UTF-8")
    val expectFrames = math.min(8, (bytes.length - 32) / 64 + 1)
    assert(row.getAs[Long]("n_frames") == expectFrames.toLong)
    val frames = row.getSeq[Array[Byte]](row.fieldIndex("frames"))
    frames.zipWithIndex.foreach { case (f, i) =>
      assert(f.length == 32)
      assert(f.sameElements(bytes.slice(i * 64, i * 64 + 32)), s"frame $i slices wrong bytes")
    }
    // short payloads produce zero frames, not an error
    import spark.implicits._
    val tiny = Multimodal.frameSample(
      Multimodal.asMedia(Seq((99L, "ab")).toDF("doc_id", "text")))
    assert(tiny.collect()(0).getAs[Long]("n_frames") == 0L)
  }

  test("text analysis sanity: quality/langid/token stats shapes") {
    val q = TextAnalysis.quality(docs)
    assert(q.count() == docs.count())
    assert(q.filter(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
    val l = TextAnalysis.langId(docs)
    assert(l.select("pred_lang").distinct().collect().map(_.getString(0)).toSet.subsetOf(
      Set("en", "de", "es", "fr", "zh")))
    val t = TextAnalysis.tokenStats(docs)
    assert(t.filter(col("n_words_alpha") + col("n_numbers") > col("n_tokens")).count() == 0)
  }

  test("connected components: driver union-find == distributed label propagation") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(docs, 0.5).cache()
    val local = Dedup.connectedComponents(pairs).orderBy("doc_id").collect()
    val dist = Dedup.connectedComponents(pairs, localEdgeThreshold = -1L)
      .orderBy("doc_id").collect()
    assert(local.nonEmpty && local.length == dist.length)
    local.zip(dist).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    pairs.unpersist()
  }

  test("multimodal P6 decode: real netpbm grammar, exact pixel stats, invalid payloads flagged") {
    import spark.implicits._
    def img(hdr: String, px: Array[Byte]) = hdr.getBytes("US-ASCII") ++ px
    val px = Array[Byte](10, 20, 30, 40, 50, 60) // two RGB pixels
    val rows = Seq(
      1L -> img("P6\n2 1\n255\n", px),                      // canonical header
      2L -> img("P6 # c\n 2\t1 #x\n 255 ", px),             // comments + mixed whitespace
      3L -> img("P6\n2 1\n255\n", px ++ Array[Byte](9, 9)), // trailing bytes tolerated
      4L -> img("P6\n2 1\n255\n", px.take(5)),              // short raster
      5L -> img("P5\n2 1\n255\n", px),                      // wrong magic
      6L -> img("P6\n2 1\n65535\n", px ++ px),              // 2-byte samples unsupported
      7L -> "garbage".getBytes("US-ASCII"))
    val got = Multimodal.decodePpm(rows.toDF("doc_id", "payload"))
      .collect().map(s => s.doc_id -> s).toMap
    for (id <- Seq(1L, 2L, 3L)) {
      val s = got(id)
      assert(s.valid && s.width == 2 && s.height == 1 && s.maxval == 255 &&
        s.n_pixels == 2 && s.sum_r == 50 && s.sum_g == 70 && s.sum_b == 90,
        s"doc $id decoded wrong: $s")
      assert(s.luma_micro == 33150000L, s"doc $id luma: ${s.luma_micro}")
    }
    for (id <- Seq(4L, 5L, 6L, 7L))
      assert(!got(id).valid, s"doc $id must be invalid: ${got(id)}")

    // fixture round-trip: generated payloads are genuinely decodable and
    // the stats equal the text-derived expectation (the oracle's formula)
    val sample = docs.limit(50)
    val decoded = Multimodal.decodePpm(Multimodal.encodePpm(sample)).collect()
    assert(decoded.nonEmpty && decoded.forall(_.valid),
      "every generated PPM must parse")
    val texts = sample.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    decoded.foreach { s =>
      val bytes = texts(s.doc_id).getBytes("UTF-8").map(_ & 0xFF)
      def strided(off: Int) =
        bytes.zipWithIndex.collect { case (b, i) if i % 3 == off => b.toLong }.sum
      assert((s.sum_r, s.sum_g, s.sum_b) == (strided(0), strided(1), strided(2)),
        s"doc ${s.doc_id}: channel sums diverge from the text bytes")
      val npixData = (bytes.length + 2) / 3
      assert(s.height == math.max(1, (npixData + 15) / 16) && s.width == 16)
    }
  }

  test("multimodal dHash near-dup: planted twins pair, hash ignores benign bytes, invalid excluded") {
    import spark.implicits._
    // hash invariants on hand-built rasters: exact copy -> hamming 0;
    // trailing garbage after the raster -> same hash (parser tolerates it);
    // invalid payload -> excluded from pairing entirely
    def img(px: Array[Byte]) = "P6\n4 2\n255\n".getBytes("US-ASCII") ++ px
    val px = Array.tabulate[Byte](24)(i => ((i * 37 + 11) % 251).toByte)
    val rows = Seq(
      1L -> img(px),
      2L -> img(px),                              // exact copy
      3L -> (img(px) ++ Array[Byte](1, 2, 3)),    // trailing bytes: same raster
      4L -> "garbage".getBytes("US-ASCII"))
    val sigs = operators.Multimodal.dhashPpm(rows.toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2), r.getLong(3))).toMap
    assert(sigs(1L) == sigs(2L) && sigs(1L) == sigs(3L), "same raster must hash identically")
    assert(sigs.values.forall { case (_, hi, lo) =>
      hi >= 0 && hi <= 0xFFFFFFFFL && lo >= 0 && lo <= 0xFFFFFFFFL },
      "halves must be unsigned 32-bit values")
    assert(!sigs(4L)._1, "garbage payload must be invalid")
    val pairs0 = operators.Multimodal.nearDupPairs(rows.toDF("doc_id", "payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs0 == Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)),
      s"expected the copy triangle at hamming 0, got $pairs0")

    // planted one-char twins over the real corpus (the query's shape):
    // same text length keeps the raster geometry, so the twin stays within
    // a few flipped bits of its original and must surface as a pair
    val sample = docs.select(col("doc_id"), col("text")).limit(120)
    val twins = sample.filter(length(col("text")) >= 5)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        concat(substring(col("text"), 1, 4), lit("Z"),
          expr("substring(text, 6)")).as("text"))
    val pairs = operators.Multimodal
      .nearDupPairs(operators.Multimodal.encodePpm(sample.unionByName(twins)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.forall { case (a, b, h) => a < b && h >= 0 && h <= 6 },
      "pair invariants: ordered ids, hamming within threshold")
    val twinPairs = pairs.count { case (a, b, _) => b - a == 10000000L }
    val planted = twins.count()
    assert(twinPairs >= planted * 3 / 4,
      s"most planted twins must pair: found $twinPairs of $planted")
    assert(pairs.length == pairs.distinct.length, "pairs must be distinct")

    // decision layers: twins land in their original's cluster, and the
    // keeper rule (original outranks its +10M twin) keeps the original
    val pairDf = pairs.toSeq.toDF("id_a", "id_b", "hamming")
    val clusters = operators.Dedup.connectedComponents(pairDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.filter { case (a, b, _) => b - a == 10000000L }.foreach { case (a, b, _) =>
      assert(clusters(a) == clusters(b), s"twin $b must share $a's cluster")
    }
    val keepers = operators.Dedup.canonicalKeepers(
        sample.unionByName(twins), pairDf,
        when(col("doc_id") < 10000000L, 1).otherwise(0))
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toMap
    pairs.filter { case (a, b, _) => b - a == 10000000L }.foreach { case (_, b, _) =>
      assert(!keepers(b), s"planted twin $b must be dropped, its original kept")
    }
  }

  test("multimodal dHash is codec-invariant: PNG hash == P6 hash of the same raster, cross-codec twins pair") {
    import spark.implicits._
    val sample = docs.select(col("doc_id"), col("text")).limit(80)
    // the same text encoded both ways must produce the SAME 64 bits
    def sigsOf(payloads: org.apache.spark.sql.DataFrame) =
      operators.Multimodal.dhashImage(payloads)
        .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2), r.getLong(3))).toMap
    val viaPpm = sigsOf(operators.Multimodal.encodePpm(sample))
    val viaPng = sigsOf(operators.Multimodal.encodePng(sample))
    assert(viaPpm.nonEmpty && viaPpm == viaPng,
      "dhashImage must hash a raster identically whatever container it ships in")
    // and dhashImage over P6 equals the PPM-only fast path bit-for-bit
    val fastPath = operators.Multimodal.dhashPpm(operators.Multimodal.encodePpm(sample))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2), r.getLong(3))).toMap
    assert(viaPpm == fastPath, "the P6 fast path and the generic kernel must agree")

    // cross-codec planted twins (the mm_near_dup_pairs corpus shape):
    // original as P6, twin as PNG — the pair must still surface
    val twins = sample.filter(length(col("text")) >= 5)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        concat(substring(col("text"), 1, 4), lit("Z"),
          expr("substring(text, 6)")).as("text"))
    val mixed = operators.Multimodal.encodePpm(sample)
      .unionByName(operators.Multimodal.encodePng(twins))
    val pairs = operators.Multimodal.nearDupPairs(mixed)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val twinPairs = pairs.count { case (a, b) => b - a == 10000000L }
    assert(twinPairs >= twins.count() * 3 / 4,
      s"cross-codec twins must pair: found $twinPairs of ${twins.count()}")
  }

  test("multimodal WAV envelope hash: copy is hamming 0, one-char twin flips <= 2 bits, garbage invalid") {
    import spark.implicits._
    val sample = docs.select(col("doc_id"), col("text")).limit(80)
    val wavs = operators.Multimodal.encodeWav(sample)
    val sigs = operators.Multimodal.envelopeHashWav(wavs)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2), r.getLong(3))).toMap
    assert(sigs.values.forall(_._1), "fixture WAVs must all parse")
    assert(sigs.values.forall { case (_, hi, lo) =>
      hi >= 0 && hi <= 0xFFFFFFFFL && lo >= 0 && lo <= 0xFFFFFFFFL },
      "halves must be unsigned 32-bit values")
    // exact copy (new id, same text) -> identical hash -> hamming 0 pair
    val copies = sample.limit(5)
      .select((col("doc_id") + lit(20000000L)).as("doc_id"), col("text"))
    val withCopies = operators.Multimodal.encodeWav(sample.unionByName(copies))
    val copyPairs = operators.Multimodal.nearDupPairsWav(withCopies)
      .filter(col("id_b") - col("id_a") === 20000000L)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(copyPairs.length == 5 && copyPairs.forall(_._2 == 0),
      s"every exact copy must pair at hamming 0: $copyPairs")
    // one-char twin: one sample changes -> one window's energy moves ->
    // at most the two adjacent contour bits flip
    val twins = sample.filter(length(col("text")) >= 5)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        concat(substring(col("text"), 1, 4), lit("Z"),
          expr("substring(text, 6)")).as("text"))
    val twinSigs = operators.Multimodal.envelopeHashWav(operators.Multimodal.encodeWav(twins))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    twinSigs.foreach { case (tid, (thi, tlo)) =>
      val (_, ohi, olo) = sigs(tid - 10000000L)
      val ham = java.lang.Long.bitCount(thi ^ ohi) + java.lang.Long.bitCount(tlo ^ olo)
      assert(ham <= 2, s"one-sample edit must flip <= 2 contour bits, got $ham for $tid")
    }
    // garbage payload -> invalid, excluded from pairing
    val bad = Seq((99L, "not riff".getBytes("US-ASCII"))).toDF("doc_id", "payload")
    val badSig = operators.Multimodal.envelopeHashWav(bad).collect().head
    assert(!badSig.getBoolean(1), "garbage payload must be invalid")
  }

  test("hotBucketCap: star-degraded hot buckets keep exact components and log the skipped pairs") {
    import spark.implicits._
    // 30 byte-identical docs (one giant LSH bucket per band) + 40 distinct
    val boiler = "the same boilerplate navigation header on every page"
    val corpus = ((0 until 30).map(i => (i.toLong, boiler)) ++
      (100 until 140).map(i => (i.toLong, s"distinct document body number $i with its own words")))
      .toDF("doc_id", "text")
    operators.Renko.drainPhaseLog()
    val exact = operators.Dedup.minhashLshPairs(corpus, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = operators.Dedup.minhashLshPairs(corpus, 0.8, hotBucketCap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dropped = operators.Renko.drainPhaseLog()
      .collectFirst { case (p, v) if p.contains("lshHotBucketDroppedPairs") => v }
    assert(exact.size == 30 * 29 / 2, s"uncapped pair list is the full clique: ${exact.size}")
    assert(capped.subsetOf(exact), "capped pairs must be a subset of the exact pairs")
    assert(capped.size < exact.size && capped.size >= 29,
      s"hot bucket degrades to a star, not a clique: ${capped.size}")
    assert(dropped.exists(_ > 0), "the trim must be logged, never silent")
    // the decision layer sees the SAME components either way
    def comps(pairs: Set[(Long, Long)]) =
      operators.Dedup.connectedComponents(
        pairs.toSeq.toDF("id_a", "id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(comps(capped) == comps(exact),
      "star edges must preserve connected components exactly")
  }

  test("multimodal WAV envelope hash: stereo frames sum energy across BOTH channels") {
    import spark.implicits._
    // hand-rolled RIFF builder (the fixtures from encodeWav are mono-only)
    def wav(ch: Int, interleaved: Array[Short]): Array[Byte] = {
      val dataLen = interleaved.length * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(ch.toShort).putInt(8000)
        .putInt(8000 * ch * 2).putShort((ch * 2).toShort).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      interleaved.foreach(out.putShort)
      out.array()
    }
    // 650 frames; L is a rising ramp, R is loud ONLY in the front half —
    // R's energy cliff at frame 325 flips the contour bit at the window-32
    // boundary (the L-only ramp there rises, so the bit differs), proving
    // the hash SEES the second channel
    val n = 650
    val left = Array.tabulate(n)(i => (i % 300).toShort)
    val right = Array.tabulate(n)(i => if (i < n / 2) 20000.toShort else 0.toShort)
    val stereo = wav(2, Array.tabulate(2 * n)(k => if (k % 2 == 0) left(k / 2) else right(k / 2)))
    // a mono stream whose sample i carries |L_i| + |R_i| has the same
    // per-window energies, hence the same contour hash — the documented
    // per-frame contract
    val monoSum = wav(1, Array.tabulate(n)(i =>
      (math.abs(left(i).toInt) + math.abs(right(i).toInt)).toShort))
    val monoLeftOnly = wav(1, left)
    val sigs = operators.Multimodal.envelopeHashWav(
        Seq((1L, stereo), (2L, monoSum), (3L, monoLeftOnly)).toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2), r.getLong(3))).toMap
    assert(sigs.values.forall(_._1), "all three payloads must parse")
    assert(sigs(1L) == sigs(2L),
      "stereo hash must equal the mono |L|+|R| hash (per-frame energy across channels)")
    assert(sigs(1L) != sigs(3L),
      "stereo hash must SEE the right channel (differs from the left-only contour)")
  }

  test("multimodal P6 resize: nearest-neighbor kernel, round-trip decodable, identity at source dims") {
    import spark.implicits._
    def img(hdr: String, px: Array[Byte]) = hdr.getBytes("US-ASCII") ++ px
    // 2x2 image with distinct corner pixels
    val px = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    val rows = Seq(1L -> img("P6\n2 2\n255\n", px),
      2L -> "garbage".getBytes("US-ASCII"))
    // upsample 2x2 -> 4x4: each source pixel becomes a 2x2 block
    val up = Multimodal.resizePpm(rows.toDF("doc_id", "payload"), tw = 4, th = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!up(2L).getBoolean(1), "garbage stays invalid")
    val u = up(1L)
    assert(u.getBoolean(1) && u.getLong(2) == 2 && u.getLong(3) == 2)
    // every source pixel sampled exactly 4 times
    assert(u.getLong(7) == 4L * (1 + 4 + 7 + 10), s"sum_r: ${u.getLong(7)}")
    assert(u.getLong(8) == 4L * (2 + 5 + 8 + 11))
    assert(u.getLong(9) == 4L * (3 + 6 + 9 + 12))
    // the resized payload is itself a decodable P6 with matching stats
    val re = Multimodal.decodePpm(
      Seq(1L -> u.getAs[Array[Byte]](6)).toDF("doc_id", "payload")).collect().head
    assert(re.valid && re.width == 4 && re.height == 4 &&
      re.sum_r == u.getLong(7) && re.sum_g == u.getLong(8) && re.sum_b == u.getLong(9))
    // identity resize returns the source raster bit-for-bit
    val id = Multimodal.resizePpm(rows.take(1).toDF("doc_id", "payload"), tw = 2, th = 2)
      .collect().head
    assert(id.getAs[Array[Byte]](6).toSeq == img("P6\n2 2\n255\n", px).toSeq)
    // downsample 2x2 -> 1x1 keeps the top-left pixel
    val dn = Multimodal.resizePpm(rows.take(1).toDF("doc_id", "payload"), tw = 1, th = 1)
      .collect().head
    assert((dn.getLong(7), dn.getLong(8), dn.getLong(9)) == (1L, 2L, 3L))
    // a parseable zero-dimension P6 has no pixels to sample: resize emits
    // valid=false (never throws), while decode reports a valid empty image
    val zd = Seq(3L -> img("P6\n0 2\n255\n", Array.emptyByteArray))
      .toDF("doc_id", "payload")
    val zr = Multimodal.resizePpm(zd, tw = 2, th = 2).collect().head
    assert(!zr.getBoolean(1), "zero-dimension raster must be invalid for resize")
    assert(Multimodal.decodePpm(zd).collect().head.valid,
      "decode still accepts the parseable empty raster")
  }

  test("multimodal ImageIO decode: PNG == hand-parsed P6 stats, JPEG readable, garbage invalid") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 50)
    // cross-decoder equality: the PNG fixture carries the same raster as
    // the P6 fixture, so the ImageIO path must produce identical stats
    val png = Multimodal.decodeImage(Multimodal.encodePng(docs))
      .toDF().orderBy(col("doc_id")).collect().toSeq
    val ppm = Multimodal.decodePpm(Multimodal.encodePpm(docs))
      .toDF().orderBy(col("doc_id")).collect().toSeq
    assert(png.nonEmpty && png == ppm,
      "ImageIO PNG decode must equal the hand-parsed P6 decode on the same raster")
    // unreadable payloads flag, never throw
    val bad = Multimodal.decodeImage(
      Seq(1L -> "not an image".getBytes("US-ASCII"),
        2L -> Array.emptyByteArray,
        3L -> (null: Array[Byte])).toDF("doc_id", "payload")).collect()
    assert(bad.forall(!_.valid), "garbage payloads must be invalid, not errors")
    // a JPEG payload decodes through the same kernel (lossy — dims and
    // validity are contractual, channel sums are not)
    val img = new java.awt.image.BufferedImage(4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 4) img.setRGB(x, y, (x * 60 << 16) | (y * 80 << 8))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpg = Multimodal.decodeImage(Seq(9L -> bos.toByteArray).toDF("doc_id", "payload"))
      .collect().head
    assert(jpg.valid && jpg.width == 4 && jpg.height == 3 && jpg.n_pixels == 12)
  }

  test("multimodal WAV resample: integer point-sampling, round-trip decodable, identity at source rate") {
    import spark.implicits._
    // 4 frames at 8 kHz: samples 100, -200, 300, -400
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val pcm = Seq(100, -200, 300, -400).flatMap(le16).toArray
    val hdr = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.put("RIFF".getBytes); hdr.putInt(36 + pcm.length); hdr.put("WAVE".getBytes)
    hdr.put("fmt ".getBytes); hdr.putInt(16); hdr.putShort(1); hdr.putShort(1)
    hdr.putInt(8000); hdr.putInt(16000); hdr.putShort(2); hdr.putShort(16)
    hdr.put("data".getBytes); hdr.putInt(pcm.length)
    val wav = hdr.array() ++ pcm
    val rows = Seq(1L -> wav, 2L -> "junk".getBytes)
    // halve the rate: frames 0 and 2 survive (t*8000/4000 = 2t)
    val half = Multimodal.resampleWav(rows.toDF("doc_id", "payload"), targetRate = 4000)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!half(2L).getBoolean(1))
    val h = half(1L)
    assert(h.getLong(5) == 2L && h.getLong(7) == 400L && h.getLong(8) == 300L &&
      h.getLong(9) == (100L * 100 + 300L * 300), s"halved: $h")
    // the resampled payload re-parses with identical aggregates
    val re = Multimodal.decodeWav(
      Seq(1L -> h.getAs[Array[Byte]](6)).toDF("doc_id", "payload")).collect().head
    assert(re.valid && re.sample_rate == 4000 && re.n_frames == 2 &&
      re.sum_abs == h.getLong(7) && re.peak_abs == h.getLong(8) && re.sum_sq == h.getLong(9))
    // identity resample keeps every sample
    val id = Multimodal.resampleWav(rows.take(1).toDF("doc_id", "payload"), targetRate = 8000)
      .collect().head
    assert(id.getLong(5) == 4L && id.getLong(7) == 1000L && id.getLong(8) == 400L)
  }

  test("multimodal WAV decode: real RIFF chunk walking, exact sample stats, invalid payloads flagged") {
    import spark.implicits._
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def chunk(id: String, body: Array[Byte]) =
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def fmt(tag: Int = 1, ch: Int = 1, rate: Int = 8000, bits: Int = 16) =
      chunk("fmt ", le16(tag) ++ le16(ch) ++ le32(rate) ++ le32(rate * ch * bits / 8) ++
        le16(ch * bits / 8) ++ le16(bits))
    def wav(chunks: Array[Byte]*) = {
      val body = chunks.flatten.toArray
      "RIFF".getBytes("US-ASCII") ++ le32(4 + body.length) ++
        "WAVE".getBytes("US-ASCII") ++ body
    }
    // samples 100, -2 → LE bytes (100,0), (254,255)
    val pcm = Array[Byte](100, 0, (-2 & 0xFF).toByte, (-1 & 0xFF).toByte)
    val rows = Seq(
      1L -> wav(fmt(), chunk("data", pcm)),                       // canonical
      2L -> wav(chunk("LIST", "INFOx".getBytes("US-ASCII")),      // odd-size chunk pad +
        fmt(), chunk("data", pcm)),                               // unknown chunk walked over
      3L -> wav(chunk("data", pcm), fmt()),                       // data before fmt
      4L -> wav(fmt(tag = 3), chunk("data", pcm)),                // float PCM rejected
      5L -> wav(fmt(bits = 8), chunk("data", pcm)),               // 8-bit rejected
      6L -> wav(fmt(), "data".getBytes("US-ASCII") ++ le32(99) ++ pcm), // truncated data
      7L -> wav(fmt()),                                           // no data chunk
      8L -> "RIFX1234WAVE".getBytes("US-ASCII"))                  // wrong magic
    val got = Multimodal.decodeWav(rows.toDF("doc_id", "payload"))
      .collect().map(s => s.doc_id -> s).toMap
    for (id <- Seq(1L, 2L, 3L)) {
      val s = got(id)
      assert(s.valid && s.n_channels == 1 && s.sample_rate == 8000 &&
        s.bits == 16 && s.n_frames == 2 && s.dur_micros == 250 &&
        s.sum_abs == 102 && s.peak_abs == 100 && s.sum_sq == 10004,
        s"doc $id decoded wrong: $s")
    }
    for (id <- Seq(4L, 5L, 6L, 7L, 8L))
      assert(!got(id).valid, s"doc $id must be invalid: ${got(id)}")

    // fixture round-trip: generated payloads are genuinely decodable and
    // the stats equal the text-derived expectation (the oracle's formula)
    val sample = docs.limit(50)
    val decoded = Multimodal.decodeWav(Multimodal.encodeWav(sample)).collect()
    assert(decoded.nonEmpty && decoded.forall(_.valid),
      "every generated WAV must parse")
    val texts = sample.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    decoded.foreach { s =>
      val b = texts(s.doc_id).getBytes("UTF-8").map(_ & 0xFF)
      val padded = if (b.length % 2 == 1) b :+ 0 else b
      val samples = padded.grouped(2).map { case Array(lo, hi) =>
        val v = lo | (hi << 8); if (v >= 32768) v - 65536 else v
      }.toSeq
      assert(s.n_frames == samples.size &&
        s.sum_abs == samples.map(x => math.abs(x).toLong).sum &&
        s.peak_abs == (if (samples.isEmpty) 0L else samples.map(math.abs).max.toLong) &&
        s.sum_sq == samples.map(x => x.toLong * x).sum,
        s"doc ${s.doc_id}: sample stats diverge from the text bytes")
    }
  }

  test("multimodal AVI decode: recursive LIST walking, sampled frame stats, invalid payloads flagged") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    // hand-rolled containers for the grammar edges the fixture never hits
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def chunk(id: String, body: Array[Byte]) =
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(form: String, chunks: Array[Byte]*) =
      chunk("LIST", form.getBytes("US-ASCII") ++ chunks.flatten)
    def avih(usf: Int = 40000, w: Int = 2, h: Int = 1) =
      chunk("avih", le32(usf) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++
        le32(0) ++ le32(1) ++ le32(6) ++ le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte))
    def strf(bpp: Int = 24, compression: Int = 0) =
      chunk("strf", le32(40) ++ le32(2) ++ le32(1) ++ le16(1) ++ le16(bpp) ++
        le32(compression) ++ le32(6) ++ Array.fill(16)(0.toByte))
    def avi(chunks: Array[Byte]*) = {
      val body = chunks.flatten.toArray
      "RIFF".getBytes("US-ASCII") ++ le32(4 + body.length) ++
        "AVI ".getBytes("US-ASCII") ++ body
    }
    val frame = Array[Byte](10, 20, 30, 40, 50, 60) // one 2x1 24-bit frame
    val rows = Seq(
      1L -> avi(list("hdrl", avih(), list("strl", strf())),       // canonical
        list("movi", chunk("00db", frame), chunk("00dc", frame))),
      2L -> avi(list("hdrl", avih()),                             // JUNK skipped, odd-size pad,
        chunk("JUNK", Array[Byte](1, 2, 3)),                      // no strl at all
        list("movi", chunk("00db", frame), chunk("00db", frame))),
      3L -> avi(list("hdrl", avih(), list("strl", strf(bpp = 8))), // 8-bpp rejected
        list("movi", chunk("00db", frame))),
      4L -> avi(list("hdrl", avih(), list("strl", strf(compression = 1))), // compressed rejected
        list("movi", chunk("00db", frame))),
      5L -> avi(list("movi", chunk("00db", frame))),              // no avih
      6L -> avi(list("hdrl", avih()), list("movi",                // truncated frame chunk
        "00db".getBytes("US-ASCII") ++ le32(999) ++ frame)),
      7L -> "RIFF1234AVIX".getBytes("US-ASCII"))                  // wrong form
    val got = Multimodal.decodeAvi(rows.toDF("doc_id", "payload"), frameStride = 2)
      .collect().map(s => s.doc_id -> s).toMap
    for (id <- Seq(1L, 2L)) {
      val s = got(id)
      // two frames, stride 2 → frame 0 sampled alone
      assert(s.valid && s.width == 2 && s.height == 1 && s.us_per_frame == 40000 &&
        s.n_frames == 2 && s.dur_micros == 80000 && s.n_sampled == 1 &&
        s.sum_byte == 210 && s.peak_byte == 60 && s.sum_sq == 9100,
        s"doc $id decoded wrong: $s")
    }
    for (id <- Seq(3L, 4L, 5L, 6L, 7L))
      assert(!got(id).valid, s"doc $id must be invalid: ${got(id)}")

    // fixture round-trip: generated payloads decode, and the sampled
    // stats equal the text-derived expectation (the oracle's formula)
    val sample = docs.limit(50)
    val decoded = Multimodal.decodeAvi(Multimodal.encodeAvi(sample)).collect()
    assert(decoded.nonEmpty && decoded.forall(_.valid),
      "every generated AVI must parse")
    val texts = sample.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    decoded.foreach { s =>
      val b = texts(s.doc_id).getBytes("UTF-8").map(_ & 0xFF)
      val nf = math.max(1, (b.length + 95) / 96)
      val kept = b.zipWithIndex.collect { case (v, i) if (i / 96) % 2 == 0 => v }
      assert(s.n_frames == nf && s.n_sampled == (nf + 1) / 2 &&
        s.dur_micros == nf.toLong * 40000 &&
        s.sum_byte == kept.map(_.toLong).sum &&
        s.peak_byte == (if (kept.isEmpty) 0L else kept.max.toLong) &&
        s.sum_sq == kept.map(v => v.toLong * v).sum,
        s"doc ${s.doc_id}: frame stats diverge from the text bytes")
    }
  }

  test("multimodal resize: exact strided byte sampling") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = Multimodal.resize(Multimodal.asMedia(docs), targetLen = 64)
      .select("doc_id", "payload", "resized").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      val got = r.getAs[Array[Byte]]("resized")
      val stride = math.max(1, bytes.length / 64)
      val want = (0 until math.min(64, (bytes.length + stride - 1) / stride))
        .map(i => bytes(i * stride)).toArray
      assert(java.util.Arrays.equals(got, want), s"doc ${r.getLong(0)}")
      assert(got.length <= 64)
    }
  }

  test("salted join is row-identical to the plain join") {
    import graft.operators.Skew
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select("event_id", "user_id", "value")
    val cust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val salted = Skew.saltedJoin(ev, cust, "user_id", col("event_id"), 8)
    assert(!salted.columns.contains("__salt"), "salt must not leak into the output")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))
    val got = salted.select("user_id", "event_id", "value", "c_mktsegment")
      .collect().map(key).sorted
    val want = ev.join(cust, Seq("user_id"))
      .select("user_id", "event_id", "value", "c_mktsegment")
      .collect().map(key).sorted
    assert(got.length == want.length && got.sameElements(want),
      s"salted join diverged: ${got.length} vs ${want.length} rows")
  }

  test("hybrid RRF: rank-k fusion of the BM25 and cosine pools, sentinels outside a pool") {
    import graft.operators.Search
    val res = Search.hybridRrfTopK(docs, emb,
      Seq("dup", "vector", "join", "slow"), queryVecId = 0L, k = 20)
      .orderBy("rank").collect()
    assert(res.length == 20)
    assert(res.map(_.getLong(1)).toSeq == (1L to 20L), "ranks must be dense 1..k")
    res.foreach { r =>
      val (lex, sem, rrf) = (r.getLong(3), r.getLong(4), r.getDouble(2))
      assert(lex != -1L || sem != -1L, "a fused doc must come from at least one arm")
      val expect = (if (lex == -1L) 0.0 else 1.0 / (60 + lex)) +
        (if (sem == -1L) 0.0 else 1.0 / (60 + sem))
      assert(math.abs(rrf - expect) < 1e-6,
        s"doc ${r.getLong(0)}: rrf $rrf != recomputed $expect")
    }
    val rrfs = res.map(_.getDouble(2))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b }, "rrf must be non-increasing")
  }

  test("incremental minhash equals the cross-split slice of the full pair search") {
    val corpus = docs.filter(col("doc_id") % 4 =!= 3)
    val batch = docs.filter(col("doc_id") % 4 === 3)
    val inc = Dedup.minhashIncrementalPairs(corpus, batch, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = Dedup.minhashLshPairs(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // the full search's cross-split pairs, re-oriented to (batch, corpus)
    val cross = full.collect {
      case ((a, b), j) if (a % 4 == 3) != (b % 4 == 3) =>
        (if (b % 4 == 3) (b, a) else (a, b)) -> j
    }
    assert(cross.nonEmpty, "expected planted near-dups to straddle the split")
    assert(inc == cross.toMap,
      s"incremental (${inc.size}) != cross-split of full (${cross.size})")
  }

  test("canonical keepers: one keeper per cluster, chosen by (priority, id)") {
    val prio = when(col("source") === "src0", 3)
      .when(col("source") === "src1", 2)
      .when(col("source") === "src2", 1).otherwise(0)
    val pairs = Dedup.ngramJaccardPairs(docs, 0.5)
    val got = Dedup.canonicalKeepers(docs, pairs, prio).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.nonEmpty)
    // exactly one keeper per cluster, and keep <=> doc == keeper
    got.groupBy(_._2).foreach { case (cid, rows) =>
      assert(rows.count(_._4) == 1, s"cluster $cid keeper count != 1")
      rows.foreach { case (doc, _, keeper, keep) => assert(keep == (doc == keeper)) }
    }
    // re-derive the keeper choice from first principles
    val prioOf = docs.select(col("doc_id"), prio.as("p")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.groupBy(_._2).foreach { case (cid, rows) =>
      val want = rows.map(_._1).minBy(id => (-prioOf(id), id))
      val keeper = rows.find(_._4).get._3
      assert(keeper == want, s"cluster $cid: keeper $keeper, expected $want")
    }
  }

  test("bloom-prefiltered decontamination is row-identical to the exact path") {
    import graft.operators.Decontamination
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val bench = docs.filter(col("doc_id") % 10 === 7)
    val exact = Decontamination.overlapReport(corpus, bench).orderBy("doc_id").collect()
    val bloom = Decontamination.overlapReportBloom(corpus, bench).orderBy("doc_id").collect()
    assert(exact.nonEmpty, "planted cross-split dups must exist")
    assert(exact.sameElements(bloom),
      s"bloom path diverged: ${exact.length} vs ${bloom.length} rows")
    // and the probe really is in the corpus-side plan (scan-local cut)
    val plan = Decontamination.overlapReportBloom(corpus, bench)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected bloom probe:\n${plan.take(1500)}")
  }

  test("polyHash quality: near-zero collisions over the corpus shingle set") {
    import graft.functions.TextFunctions
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val sh = docs.select(explode(TextFunctions.wordShingles3(col("text"))).as("s")).distinct()
    val n = sh.count()
    val h = sh.select(TextFunctions.polyHash(col("s")).as("h")).distinct().count()
    assert(n > 1000)
    // 31-bit hash over a few thousand shingles: collisions should be rare
    assert(h.toDouble / n >= 0.999, s"collision rate too high: $h/$n")
  }
}
