package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: quality scoring, language ID,
  * token statistics, document fingerprinting. Single-pass, per-row
  * projections — embarrassingly parallel, fully codegen'd, no shuffle except
  * where an aggregation is the point (fingerprint groups).
  *
  * Every computation here has an exactly-equivalent DuckDB formulation
  * (same operation order on doubles, same regexes) for the oracle.
  */
object TextAnalysis {

  /** Per-document quality features + a deterministic quality score.
    * Output: (doc_id, n_chars, n_tokens, n_unique_tokens, stopword_cnt,
    * ttr, stopword_ratio, quality_score).
    */
  def quality(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      keep: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val nTok = size(tokens(t)).cast("long")
    val nUniq = size(array_distinct(tokens(t))).cast("long")
    val stop = markerCount(t, StopwordsEn).cast("long")
    docs.select(col(idCol).as("doc_id") +: keep.map(col) :+
      length(t).cast("long").as("n_chars") :+
      nTok.as("n_tokens") :+
      nUniq.as("n_unique_tokens") :+
      stop.as("stopword_cnt"): _*)
      .withColumn("ttr", col("n_unique_tokens").cast("double") / col("n_tokens").cast("double"))
      .withColumn("stopword_ratio", col("stopword_cnt").cast("double") / col("n_tokens").cast("double"))
      .withColumn("quality_score",
        least(col("n_tokens").cast("double") / lit(100.0), lit(1.0)) * lit(0.4)
          + col("ttr") * lit(0.4)
          + least(col("stopword_ratio") * lit(5.0), lit(1.0)) * lit(0.2))
  }

  /** Unicode text canonicalization — the normalization pass a multi-source
    * ingest runs BEFORE any hashing, dedup, or filtering, so that
    * byte-different spellings of the same text (a scraper emitting
    * combining marks vs precomposed accents, stray C0 controls, ragged
    * whitespace) fingerprint identically downstream:
    *
    *  1. Unicode NFC ([[graft.functions.expressions.NfcNormalize]], the
    *     native codegen'd expression — `graft_nfc` in SQL);
    *  2. strip C0/DEL control characters except tab/newline/CR;
    *  3. collapse every `[ \t\r\n]+` run to one space and trim.
    *
    * Returns `docs` with `textCol` replaced by its canonical form — a
    * scan-local, fully codegen'd projection (no shuffle, no UDF). Exactly
    * replayable in DuckDB (`nfc_normalize` + the same RE2-compatible
    * regexes), which is what makes the pass oracle-checkable.
    */
  def normalize(
      docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    val nfc = graft.functions.expressions.StringExpressions.nfcNormalize(col(textCol))
    val noCtl = regexp_replace(nfc, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    docs.withColumn(textCol, trim(regexp_replace(noCtl, "[ \\t\\r\\n]+", " ")))
  }

  /** Gopher-style composite quality gate (Rae et al. 2021, §A1.1 adapted to
    * this engine's whitespace tokenization): the standard rule battery a
    * web-scale curation pipeline runs before any model-based scoring —
    * token-count bounds, mean-word-length band, symbol-to-word ratio,
    * alphabetic-word ratio, and a minimum distinct-stopword hit count.
    *
    * Output: (doc_id, n_tokens, mean_word_len, symbol_ratio, alpha_ratio,
    * stop_hits, pass_len, pass_word_len, pass_symbol, pass_alpha,
    * pass_stop, keep) with `keep` = conjunction of the five rules.
    *
    * Determinism: every ratio is ONE division of two exact integer
    * aggregates (token count, summed token lengths, filtered counts), so
    * the doubles are bit-stable across partitionings and match the
    * oracle's identical formulation. Scale shape: a single scan-local
    * projection — no shuffle, no UDF, fully codegen'd.
    */
  def gopherRules(
      docs: DataFrame,
      minTokens: Long = 30,
      maxTokens: Long = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minAlphaRatio: Double = 0.8,
      minStopHits: Int = 2,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = tokens(col(textCol))
    docs.select(
        col(idCol).as("doc_id"),
        size(w).cast("long").as("n_tokens"),
        aggregate(w, lit(0L), (acc, t) => acc + length(t).cast("long")).as("sum_len"),
        size(filter(w, t => t.rlike("[A-Za-z]"))).cast("long").as("n_alpha"),
        size(filter(w, t => t.contains("#") || t.contains("...") || t.contains("…")))
          .cast("long").as("n_symbol"),
        size(filter(array_distinct(w), t => t.isin(StopwordsEn.map(x => x: Any): _*)))
          .cast("long").as("stop_hits"))
      .withColumn("mean_word_len",
        col("sum_len").cast("double") / col("n_tokens").cast("double"))
      .withColumn("symbol_ratio",
        col("n_symbol").cast("double") / col("n_tokens").cast("double"))
      .withColumn("alpha_ratio",
        col("n_alpha").cast("double") / col("n_tokens").cast("double"))
      .withColumn("pass_len",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("pass_word_len",
        col("mean_word_len") >= minMeanWordLen && col("mean_word_len") <= maxMeanWordLen)
      .withColumn("pass_symbol", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("pass_alpha", col("alpha_ratio") >= minAlphaRatio)
      .withColumn("pass_stop", col("stop_hits") >= minStopHits)
      .withColumn("keep",
        col("pass_len") && col("pass_word_len") && col("pass_symbol") &&
          col("pass_alpha") && col("pass_stop"))
      .select("doc_id", "n_tokens", "mean_word_len", "symbol_ratio",
        "alpha_ratio", "stop_hits", "pass_len", "pass_word_len",
        "pass_symbol", "pass_alpha", "pass_stop", "keep")
  }

  /** Per-document script profile: codepoint-class counts (Latin letters,
    * CJK unified ideographs, Cyrillic, ASCII digits) over the text plus a
    * dominant-script argmax with a fixed tie-break order — the writing-
    * system signal a multilingual curation pipeline routes on before any
    * token-level language ID ([[langId]]) is meaningful. One scan-local
    * codegen'd projection (`regexp_count` per class, no UDF), with the
    * identical RE2-compatible character classes replayable in DuckDB.
    */
  def scriptProfile(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol).as("doc_id"),
      length(t).cast("long").as("n_cp"),
      regexp_count(t, lit("[A-Za-z]")).cast("long").as("n_latin"),
      regexp_count(t, lit("[一-鿿]")).cast("long").as("n_cjk"),
      regexp_count(t, lit("[Ѐ-ӿ]")).cast("long").as("n_cyrillic"),
      regexp_count(t, lit("[0-9]")).cast("long").as("n_digit"))
      .withColumn("dominant_script",
        when(col("n_latin") + col("n_cjk") + col("n_cyrillic") === 0L, lit("none"))
          .when(col("n_latin") >= col("n_cjk") && col("n_latin") >= col("n_cyrillic"), lit("latin"))
          .when(col("n_cjk") >= col("n_cyrillic"), lit("cjk"))
          .otherwise(lit("cyrillic")))
  }

  /** Heuristic language ID via marker-token counts with a fixed argmax
    * tie-break order. Output: (doc_id, s_en, s_de, s_es, s_fr, s_zh, pred_lang).
    */
  def langId(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      keep: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val scored = docs.select(
      (col(idCol).as("doc_id") +: keep.map(col)) ++
        LangMarkers.map { case (lang, markers) => markerCount(t, markers).cast("long").as(s"s_$lang") }: _*)
    val langs = LangMarkers.map(_._1)
    // argmax with ties resolved by declaration order (en first)
    val pred = langs.zipWithIndex.foldRight(lit(langs.last)) { case ((lang, i), rest) =>
      val later = langs.drop(i + 1)
      if (later.isEmpty) rest
      else {
        val maxLater =
          if (later.size == 1) col(s"s_${later.head}")
          else greatest(later.map(l => col(s"s_$l")): _*)
        when(col(s"s_$lang") >= maxLater, lit(lang)).otherwise(rest)
      }
    }
    scored.withColumn("pred_lang", pred)
  }

  /** Token statistics. Output: (doc_id, n_tokens, n_unique_tokens,
    * n_words_alpha, n_numbers) — `n_words_alpha`/`n_numbers` count tokens by
    * a BPE-ish character-class regex.
    */
  def tokenStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = tokens(col(textCol))
    docs.select(
      col(idCol).as("doc_id"),
      size(w).cast("long").as("n_tokens"),
      size(array_distinct(w)).cast("long").as("n_unique_tokens"),
      size(filter(w, t => t.rlike("^[A-Za-z]+$"))).cast("long").as("n_words_alpha"),
      size(filter(w, t => t.rlike("^[0-9]+$"))).cast("long").as("n_numbers"),
      // BPE-style pre-tokenization count (GPT-2-ish segmentation: letter
      // runs, single digits, punctuation runs — a cheap upper bound on the
      // token bill a real BPE would produce; the pattern uses only simple
      // character classes so Java regex and RE2 agree)
      size(regexp_extract_all(col(textCol),
        lit("""[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"""), lit(0))).cast("long").as("n_bpe_pretokens"))
  }

  /** Winnowed rolling-hash document fingerprints (MOSS-style winnowing,
    * public literature): polynomial hash of every k-char gram, then the
    * minimum of each `window` consecutive hashes; the distinct minima are
    * the document's fingerprint set — robust to local edits, and two
    * documents sharing content share fingerprints. Integer-exact and
    * engine-independent (the oracle runs the identical arithmetic).
    *
    * Output: (doc_id, n_fps, fp_sum) — the fingerprint-set digest; use the
    * (doc_id, fp) pair form for candidate joins at scale.
    *
    * Winnowing runs inside the scan via the native `graft_winnow` expression
    * (one byte-walk per document, `array<bigint>` out), so the digest is a
    * pure per-row projection — ZERO shuffle, where the relational
    * formulation (kept below as a cross-check) shuffled O(total corpus
    * characters) rows through two windows.
    */
  def winnowedFingerprints(
      docs: DataFrame,
      k: Int = 8,
      window: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.expressions.WinnowExpression.winnowNative(col(textCol), k, window).as("fps"))
      .filter(size(col("fps")) > 0)
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fps"),
        aggregate(col("fps"), lit(0L), (a, x) => a + x).as("fp_sum"))

  /** The (doc_id, fp) fingerprint pairs themselves: explode of the native
    * per-doc fingerprint array (already distinct) — candidate joins at scale
    * start from here with no winnowing shuffle.
    */
  def winnowedFingerprintPairs(
      docs: DataFrame,
      k: Int = 8,
      window: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    winnowedFingerprintPairsSized(docs, k, window, idCol, textCol)
      .select(col("doc_id"), col("fp"))

  /** [[winnowedFingerprintPairs]] plus the doc's fingerprint-set size as a
    * scan-local column: (doc_id, n, fp), n = `size` of the
    * already-distinct fingerprint array (r17). Every containment
    * computation needs per-doc set sizes, and deriving them at the explode
    * replaces a doc-keyed count aggregate plus two corpus-sized join-backs
    * of it with 8 bytes riding each fingerprint row — exactly equal to
    * `count(*) group by doc_id` over the exploded rows because the array
    * is distinct by construction.
    */
  private def winnowedFingerprintPairsSized(
      docs: DataFrame,
      k: Int,
      window: Int,
      idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.expressions.WinnowExpression
          .winnowNative(col(textCol), k, window).as("__fps"))
      .select(col("doc_id"), size(col("__fps")).cast("long").as("n"),
        explode(col("__fps")).as("fp"))

  /** The relational formulation of `winnowedFingerprintPairs` — same rows,
    * built from built-in functions only (explode + two windows). Quadratic
    * in shuffle volume relative to the native expression; retained as the
    * independent cross-check of the winnowing arithmetic (PipelineSpec
    * asserts equality), mirroring `polyHashHof` vs the native PolyHash.
    */
  def winnowedFingerprintPairsRelational(
      docs: DataFrame,
      k: Int = 8,
      window: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = col(textCol)
    // one row per k-gram start position; `text` is a real attribute so the
    // per-character accesses below don't re-evaluate anything
    val positions = docs
      .filter(length(t) >= k)
      .select(col(idCol).as("doc_id"), t.as("text"),
        explode(sequence(lit(1), length(t) - (k - 1))).as("i"))
    val coef: Array[Long] = Iterator.iterate(1L)(_ * 31L).take(k).toArray
    val kh = (0 until k).map { j =>
      ascii(col("text").substr(col("i") + lit(j), lit(1))).cast("long") * lit(coef(j))
    }.reduce(_ + _)
    val hashed = positions.select(col("doc_id"), col("i"),
      pmod(kh, lit(2147483647L)).as("kh"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    hashed
      .withColumn("fp", min(col("kh")).over(byDoc.rowsBetween(0, window - 1)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .filter(col("i") <= col("n") - (window - 1))
      .select(col("doc_id"), col("fp"))
      .distinct()
  }

  /** Winnow-fingerprint near-duplicate pairs (the MOSS similarity join):
    * document pairs whose fingerprint CONTAINMENT `shared / min(|A|, |B|)`
    * reaches `minContainment` — robust to local edits and to one document
    * embedding a fragment of another, which is exactly what k-gram
    * winnowing is for. Containment, not raw shared count, is the
    * discriminating statistic: same-domain documents share plenty of
    * individual 8-gram fingerprints (measured on this corpus: nearly every
    * pair shares >= 2), but true near-duplicates sit at containment >= 0.9
    * with the background below 0.5 — 0.7 splits the measured gap.
    *
    * Scale shape: fingerprinting is scan-local (native `graft_winnow`);
    * candidates come from a GENERALIZED-PREFIX-filtered equi-join
    * (overlap-join prefix theorem, smaller side): containment >= t needs
    * shared >= o = ceil(t·min(na,nb)), so by pigeonhole a qualifying pair
    * must collide at least `min(prefixSlack, o)` times inside the smaller
    * doc's `na - o + prefixSlack` globally-RAREST fingerprints. Rarest-first
    * ordering keeps boilerplate fingerprints (shared by thousands of docs —
    * the quadratic blowup of the naive self-join) out of the join keys, and
    * the multi-collision requirement kills the co-occurrence background:
    * measured at sf0.1, the naive join enumerates 107M pairs, the 1-collision
    * prefix 5.4M candidates, the 8-collision generalized prefix 46k — for
    * 256 true pairs. Verification never re-joins on fingerprints: the
    * per-doc fingerprint sets of candidate-involved docs only (near-dup
    * suspects — a small fraction of a real corpus) broadcast as arrays, and
    * `array_intersect` computes each candidate's exact shared count in the
    * scan. Candidate completeness + exact verification = output identical
    * to the all-pairs formulation (equality-tested at 3 thresholds).
    * Output: (id_a, id_b, n_shared BIGINT, containment DOUBLE).
    */
  def winnowNearDupPairs(
      docs: DataFrame,
      minContainment: Double = 0.7,
      k: Int = 8,
      window: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text",
      prefixSlack: Int = 8,
      broadcastVerifyMaxBytes: Long = 64L * 1024 * 1024): DataFrame = {
    val (cand, fps) =
      winnowCandidates(docs, minContainment, k, window, idCol, textCol, prefixSlack)
    winnowVerify(cand, fps, minContainment, broadcastVerifyMaxBytes)
  }

  /** The candidate gate of [[winnowNearDupPairs]], exposed so scale
    * harnesses (PipelineStress) can measure candidate-set growth directly:
    * returns (candidates (id_s, id_l), fingerprint table); per-doc
    * fingerprint-set sizes ride the fingerprint rows as column `n`.
    * At a fixed duplication rate the candidate count should grow ~linearly
    * with corpus size — superlinear growth is the gate degenerating.
    */
  private[graft] def winnowCandidates(
      docs: DataFrame,
      minContainment: Double,
      k: Int,
      window: Int,
      idCol: String,
      textCol: String,
      prefixSlack: Int): (DataFrame, DataFrame) = {
    require(prefixSlack >= 1, s"prefixSlack must be >= 1, got $prefixSlack")
    // the fingerprint table feeds the frequency aggregate AND the join
    // sides — materialize it once (localCheckpoint, ContextCleaner-freed;
    // same rationale as the shingle/candidate tables in Dedup) so the
    // native winnow scan over the full corpus runs once. Per-doc set
    // sizes ride the rows (`n`, scan-local — see the Sized variant): the
    // former doc-keyed size aggregate and its TWO corpus-sized join-backs
    // (onto the prefix rows and onto the full side of the candidate join)
    // are gone (r17)
    val fps = winnowedFingerprintPairsSized(docs, k, window, idCol, textCol)
      .localCheckpoint(false)
    val dfreq = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df").asc, col("fp").asc)
    // rarest-first prefix per doc (deterministic (df, fp) global order);
    // SHUFFLE_HASH pinned for the same reason as the jaccard prefix path:
    // an aggregate output's size estimate can fake broadcastability
    val pref = fps
      .join(dfreq.hint("SHUFFLE_HASH"), Seq("fp"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <=
        least(col("n"),
          col("n") - ceil(lit(minContainment) * col("n")) + lit(prefixSlack)))
      .select(col("doc_id"), col("fp"), col("n"))
    // orient each pair (smaller set, larger set): the prefix argument
    // bounds the SMALLER side, so its prefix joins the other side's FULL
    // fingerprint list; lexicographic (n, doc_id) makes each pair generate
    // exactly once. The collision count per pair then gates candidacy:
    // shared >= o forces >= min(prefixSlack, o) prefix collisions (with the
    // clamped prefix the bound only weakens, never breaks completeness).
    // EVERY join in this path carries an explicit strategy hint: all the
    // inputs are aggregate/window outputs whose size estimates can fake
    // broadcastability, and at 200k diverse-vocabulary docs the optimizer
    // did exactly that — it picked the 20M-row fingerprint side of the fp
    // join as the broadcast build and died in BroadcastExchange instead of
    // running the sort-merge this join actually is.
    val full = fps
    val cand = pref.hint("SHUFFLE_MERGE").as("p")
      .join(full.hint("SHUFFLE_MERGE").as("f"), Seq("fp"))
      .filter(col("p.n") < col("f.n") ||
        (col("p.n") === col("f.n") && col("p.doc_id") < col("f.doc_id")))
      .select(col("p.doc_id").as("id_s"), col("f.doc_id").as("id_l"), col("p.n").as("ns"))
      .groupBy(col("id_s"), col("id_l"))
      .agg(count(lit(1)).as("hits"), max(col("ns")).as("ns"))
      .filter(col("hits") >=
        least(lit(prefixSlack.toLong), ceil(lit(minContainment) * col("ns"))))
      .select(col("id_s"), col("id_l"))
      .localCheckpoint(false)
    (cand, fps)
  }

  /** Exact-verification tail of [[winnowNearDupPairs]]. */
  private def winnowVerify(
      cand: DataFrame,
      fps: DataFrame,
      minContainment: Double,
      broadcastVerifyMaxBytes: Long): DataFrame = {
    // exact verify: per-doc fingerprint sets, pruned to candidate-involved
    // docs, probed twice — no fingerprint-level shuffle. Join strategy is
    // ADAPTIVE on the measured candidate fingerprint mass: on a Zipfian
    // corpus the near-dup suspects are a small fraction and the sets
    // broadcast (one hash relation, zero shuffle); on a boilerplate-heavy
    // corpus (every fingerprint df is large — the prefix gate's worst case)
    // candidate-involved docs can approach the WHOLE corpus, and forcing
    // that broadcast is an OOM, not a plan (measured: 200k x ~100-fp docs
    // with a 500-word vocabulary ~ a >150 MB long-array relation that blew
    // an 8 GiB heap). Above the threshold the same aggregate flows through
    // a shuffle-hash join — identical output, bounded per-partition memory.
    // no distinct: the left_semi prune below ignores right-side
    // multiplicity, and `cand` is already pair-distinct (r17)
    val docsInCand = cand.select(col("id_s").as("doc_id"))
      .unionByName(cand.select(col("id_l").as("doc_id")))
    // the candidate sets are consumed by the sizing decision AND both
    // probe joins — materialize them once (the sizing sum then reads the
    // pinned 1-row-per-suspect frame instead of running its own
    // fps-vs-sz join job, and neither probe can recompute the aggregate)
    val csetsAgg = fps.join(docsInCand, Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(collect_list(col("fp")).as("set"), count(lit(1)).as("n"))
      .localCheckpoint(false)
    val candStats = csetsAgg.agg(coalesce(sum(col("n")), lit(0L)))
      .collect()(0).getLong(0)
    // 8 bytes per fingerprint long; the 64 MiB default is comfortably
    // within executor broadcast budgets and far below driver limits
    val csets =
      if (candStats * 8L <= broadcastVerifyMaxBytes) broadcast(csetsAgg)
      else csetsAgg.hint("SHUFFLE_HASH")
    val nShared = size(array_intersect(col("ss"), col("sl"))).cast("long")
    cand
      .join(csets.select(col("doc_id").as("id_s"), col("set").as("ss"), col("n").as("ns")),
        Seq("id_s"))
      .join(csets.select(col("doc_id").as("id_l"), col("set").as("sl"), col("n").as("nl")),
        Seq("id_l"))
      .select(
        least(col("id_s"), col("id_l")).as("id_a"),
        greatest(col("id_s"), col("id_l")).as("id_b"),
        nShared.as("n_shared"),
        (nShared.cast("double") / least(col("ns"), col("nl")).cast("double"))
          .as("containment"))
      .filter(col("containment") >= lit(minContainment))
  }

  /** The all-pairs formulation of [[winnowNearDupPairs]] — every
    * co-occurring pair enumerated through the fingerprint self-join, then
    * counted. Quadratic in the hottest fingerprint's document frequency;
    * kept as the equality cross-check for the prefix-filtered operator.
    */
  private[graft] def winnowNearDupPairsAllPairs(
      docs: DataFrame,
      minContainment: Double = 0.7,
      k: Int = 8,
      window: Int = 4,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val fps = winnowedFingerprintPairs(docs, k, window, idCol, textCol)
      .localCheckpoint(false)
    val sz = fps.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shared = fps.as("x").join(fps.as("y"), Seq("fp"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_shared"))
    shared
      .join(sz.select(col("doc_id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sz.select(col("doc_id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        (col("n_shared").cast("double") / least(col("na"), col("nb")).cast("double"))
          .as("containment"))
      .filter(col("containment") >= lit(minContainment))
  }

  /** Word n-grams of a token-array column, NOT distinct (repetition counts
    * need multiplicity, unlike the shingle sets): `arrays_zip` of n shifted
    * slices, same per-row-constant evaluation shape as
    * `TextFunctions.wordShingles3`. Short docs (fewer than n tokens) yield
    * an empty array via the `greatest(m, 0)` slice-length clamp — no
    * conditional needed.
    */
  private def wordNgrams(w: Column, n: Int): Column = {
    val m = greatest(size(w) - (n - 1), lit(0))
    transform(
      arrays_zip((1 to n).map(i => slice(w, lit(i), m)): _*),
      t => concat_ws(" ", (0 until n).map(j => t.getField(j.toString)): _*))
  }

  /** Per-doc n-gram repetition digest, computed WITHOUT leaving the row:
    * sort the n-gram array, then one `aggregate` fold over the sorted runs
    * (a run = one distinct gram with its multiplicity). Returns
    * struct(cnt, gram, dup_chars):
    *  - cnt/gram — the most frequent n-gram (ties: lexicographically
    *    smallest, i.e. first in sorted order, via the strict `run > best`
    *    replacement);
    *  - dup_chars — Σ cnt·length(gram) over grams occurring ≥ 2 times.
    */
  private def ngramRunStats(w: Column, n: Int): Column = {
    val sorted = array_sort(wordNgrams(w, n))
    val zero = struct(
      lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best_cnt"),
      lit("").as("best_gram"), lit(0L).as("dup_chars"))
    val closeRun = (acc: Column) => {
      val run = acc.getField("run"); val best = acc.getField("best_cnt")
      (when(run > best, run).otherwise(best),
        when(run > best, acc.getField("prev")).otherwise(acc.getField("best_gram")),
        acc.getField("dup_chars")
          + when(run >= 2, run * length(acc.getField("prev")).cast("long")).otherwise(lit(0L)))
    }
    aggregate(
      sorted,
      zero,
      (acc, x) => {
        val (cnt, gram, dup) = closeRun(acc)
        when(x === acc.getField("prev"),
          struct(acc.getField("prev").as("prev"), (acc.getField("run") + lit(1L)).as("run"),
            acc.getField("best_cnt").as("best_cnt"), acc.getField("best_gram").as("best_gram"),
            acc.getField("dup_chars").as("dup_chars")))
          .otherwise(
            struct(x.as("prev"), lit(1L).as("run"),
              cnt.as("best_cnt"), gram.as("best_gram"), dup.as("dup_chars")))
      },
      acc => {
        val (cnt, gram, dup) = closeRun(acc)
        struct(cnt.as("cnt"), gram.as("gram"), dup.as("dup_chars"))
      })
  }

  /** Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    * adapted to single-line documents: word n-grams stand in for lines):
    * per document, the character fraction covered by the single most
    * frequent 2-/3-gram and by ALL duplicated (count ≥ 2) 2-/3-grams.
    * High values flag boilerplate and degenerate repetition — the standard
    * pre-training filter alongside [[quality]].
    *
    * Char coverage is the conventional approximation cnt·length(gram)
    * (overlapping occurrences counted independently), over length(text).
    *
    * Scale shape: tokenize → sort a per-row array → one fold, all inside
    * the scan projection — ZERO shuffle at any corpus size, the same
    * argument as [[winnowedFingerprints]]. Each doc costs O(len·log len)
    * locally.
    *
    * Output: (doc_id, n_tokens, top2_gram, top2_cnt, top2_frac, dup2_frac,
    * top3_gram, top3_cnt, top3_frac, dup3_frac).
    */
  def repetition(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(
      col(idCol).as("doc_id"),
      length(col(textCol)).cast("double").as("lc"),
      tokens(col(textCol)).as("w"))
    // Spark 4 ANSI throws DIVIDE_BY_ZERO for DOUBLE division too, so an
    // empty document (lc = 0 — real corpora have them) must short-circuit
    // to 0.0 rather than reach the divide; 0 is also the honest value (no
    // characters, no repeated characters)
    def frac(chars: Column): Column =
      when(col("lc") === lit(0.0), lit(0.0)).otherwise(chars.cast("double") / col("lc"))
    base
      .withColumn("s2", ngramRunStats(col("w"), 2))
      .withColumn("s3", ngramRunStats(col("w"), 3))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        col("s2.gram").as("top2_gram"),
        col("s2.cnt").as("top2_cnt"),
        frac(col("s2.cnt") * length(col("s2.gram")).cast("long")).as("top2_frac"),
        frac(col("s2.dup_chars")).as("dup2_frac"),
        col("s3.gram").as("top3_gram"),
        col("s3.cnt").as("top3_cnt"),
        frac(col("s3.cnt") * length(col("s3.gram")).cast("long")).as("top3_frac"),
        frac(col("s3.dup_chars")).as("dup3_frac"))
  }

  /** PII patterns shared by the Spark operator and the DuckDB oracle.
    * Deliberately restricted to syntax Java regex and RE2 interpret
    * identically (simple classes, bounded quantifiers, ASCII `\b`):
    * cross-engine parity is part of the operator's contract. Patterns are
    * the standard pre-training scrub set — emails, IPv4 literals,
    * international-format phone numbers.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe = "\\+[0-9]{7,15}"

  /** PII redaction: replace emails / IPv4 addresses / international phone
    * numbers with typed placeholder tokens and count what was removed —
    * the standard scrub pass before text enters a training corpus.
    *
    * Counts are per-pattern match counts over the PRISTINE text, in the
    * same projection as the replaces. The patterns are non-overlapping for
    * ordinary text (emails require `@`, IPs are dotted digit quads, phones
    * are `+`-prefixed digit runs), but not strictly so: the email local
    * part admits `+` and digits, so a contrived `+12345678@example.com` is
    * redacted once as `<EMAIL>` while still counting toward `n_phones` —
    * i.e. counts describe pattern occurrences, not replacement events.
    *
    * Scale shape: per-row codegen'd regexp projection, no shuffle — same
    * trivial-scaling argument as [[quality]].
    *
    * Output: (doc_id, text_redacted, n_emails, n_ips, n_phones).
    */
  def redactPii(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol).as("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("text_redacted"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("long").as("n_phones"))
  }

  /** Normalized-text fingerprint groups (md5 of canonical form): near-exact
    * dedup robust to case/punctuation. Output: (fingerprint, doc_id — the
    * keeper, n_docs).
    */
  /** Exact distributed length quantiles per group (corpus profiling):
    * (group, n_docs, p50, p90, p99 of the character length). Exact
    * `percentile` (sort-based order statistics with linear interpolation —
    * the same definition DuckDB's quantile_cont implements), rounded to
    * 6 dp; at true corpus scale swap in percentile_approx with an error
    * budget — the query shape is identical.
    */
  def lengthQuantiles(
      docs: DataFrame,
      groupCol: String = "source",
      textCol: String = "text"): DataFrame =
    docs.select(col(groupCol), length(col(textCol)).cast("long").as("len"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        expr("percentile(len, array(0.5e0, 0.9e0, 0.99e0))").as("q"))
      .select(col(groupCol), col("n_docs"),
        round(col("q").getItem(0), 6).as("p50"),
        round(col("q").getItem(1), 6).as("p90"),
        round(col("q").getItem(2), 6).as("p99"))

  /** Per-group heavy hitters: top `k` tokens by occurrence count,
    * ties broken by token text. One (group, token) aggregate with map-side
    * partials, then a WindowGroupLimit-bounded rank — never a global sort
    * of the term distribution.
    */
  def topTerms(
      docs: DataFrame,
      k: Int = 5,
      groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col(groupCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(groupCol), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("tok").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("rank").cast("long").as("rank"),
        col("tok"), col("cnt"))
  }

  def fingerprintGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("doc_id"), count(lit(1)).as("n_docs"))
      .select(col("fingerprint"), col("doc_id"), col("n_docs"))

  /** Corpus-conditional bigram LM score — the perplexity-proxy quality
    * filter (score each document by the average add-one-smoothed bigram
    * log-likelihood under the corpus's own statistics; unusually low means
    * degenerate or out-of-distribution text): per bigram (w1, w2),
    * `P = (B(w1 w2) + 1) / (U(w1) + V)` with B = corpus bigram count,
    * U = corpus unigram count, V = vocabulary size.
    *
    * Numerics contract: each bigram's ln P is quantized to integer
    * micro-units via the engine-stable `floor(x * 1e6 + 0.5)` (the
    * [[Similarity.quantize]] rounding trick) BEFORE summing, so the per-doc
    * sum is exact integer arithmetic — order-independent under any
    * partitioning and bit-replicable by the DuckDB oracle. The final
    * average divides two exact integers in double.
    *
    * Scale shape: bigram extraction is scan-local (a zip of the token array
    * with its own tail — no self-join on position); the corpus statistics
    * are two partial-agg'd aggregates; scoring is one shuffle equi-join on
    * the bigram plus one on w1 (AQE handles hot-token skew); the vocabulary
    * size broadcasts as a 1-row frame, never a driver action.
    *
    * Output: (doc_id, n_bigrams, avg_logp) — avg_logp NULL for docs with
    * fewer than two tokens, which every engine orders consistently.
    */
  def lmScore(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
    val uni = toks.select(explode(col("w")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("u"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val big = toks
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(
        zip_with(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => struct(a.as("w1"), concat(a, lit(" "), b).as("b")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.b").as("b"))
    // bc derives from the same lineage as `big`; the renamed join key keeps
    // the self-join unambiguous (fresh exprId) rather than leaning on
    // using-column resolution
    val bc = big.groupBy(col("b")).agg(count(lit(1)).as("c"))
      .withColumnRenamed("b", "bc_b")
    val lp = big
      .join(bc, col("b") === col("bc_b"))
      .join(uni, col("w1") === col("tok"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        floor(log((col("c") + lit(1L)).cast("double") / (col("u") + col("v")).cast("double"))
          * lit(1e6) + lit(0.5)).cast("long").as("lpq"))
    val agg = lp.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lpq")).as("s"))
    docs.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("s").cast("double") /
          (col("n_bigrams").cast("double") * lit(1e6)), 9).as("avg_logp"))
  }

  /** Corpus-wide boilerplate census over fixed `blockWords`-token blocks:
    * the blocks that recur across at least `minDocs` DISTINCT documents
    * (navigation chrome, license headers, share-bar text in a web corpus).
    * Output: (blk, n_docs, n_occurrences), hot blocks only.
    *
    * This is the frequency-threshold complement of
    * [[Dedup.blockDedup]]'s keep-first pass (C4 drops any line that
    * repeats verbatim; RefinedWeb strips lines present on many pages of
    * a site) — there the FIRST occurrence survives, here EVERY occurrence
    * of a hot block is condemned, reference-free.
    *
    * 100 TB shape: one shuffle on the block string for the two-level
    * count-distinct (partial aggregation map-side), no joins — output is
    * proportional to the hot vocabulary, not the corpus.
    */
  def boilerplateStats(
      docs: DataFrame,
      blockWords: Int = 3,
      minDocs: Int = 5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(blockWords >= 1, "blockWords must be >= 1")
    require(minDocs >= 2, "minDocs must be >= 2")
    blockRows(docs, blockWords, idCol, textCol)
      .groupBy(col("blk"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= lit(minDocs.toLong))
  }

  /** The rewrite [[boilerplateStats]] motivates: drop EVERY occurrence of
    * every hot block (>= `minDocs` distinct documents) and re-stitch each
    * document from its surviving blocks in position order.
    * Output: (doc_id, clean_text, n_blocks, n_removed).
    *
    * 100 TB shape: blocks shuffle once on the block string; the hot set
    * is the small side of the equi-join (anti-join on blk) so Catalyst
    * broadcasts it when it fits and hash-joins otherwise — never a
    * cartesian. The rebuild groups by doc_id with a position-keyed
    * array_sort, the same deterministic stitch as [[Dedup.blockDedup]].
    */
  def boilerplateRemove(
      docs: DataFrame,
      blockWords: Int = 3,
      minDocs: Int = 5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(blockWords >= 1, "blockWords must be >= 1")
    require(minDocs >= 2, "minDocs must be >= 2")
    val bw = blockWords
    val tok = docs.select(col(idCol).cast("long").as("doc_id"), tokens(col(textCol)).as("w"))
      .withColumn("n_blocks",
        floor((size(col("w")) + lit(bw - 1)) / lit(bw)).cast("long"))
    val blocks = blockRows(docs, blockWords, idCol, textCol)
    val hot = boilerplateStats(docs, blockWords, minDocs, idCol, textCol)
      .select(col("blk"))
    val kept = blocks.join(hot, Seq("blk"), "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("blk")))),
            x => x.getField("blk")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    tok.select(col("doc_id"), col("n_blocks"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_blocks"),
        (col("n_blocks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** One admission step of the STREAMING boilerplate filter: merge the
    * batch's per-block distinct-doc counts into `seen` (the store of
    * cumulative counts over every batch so far, keyed by the 62-bit block
    * hash), then clean the batch against the POST-merge totals — so a
    * block crossing `minDocs` inside this batch is already condemned for
    * this batch's docs, and a single-batch stream is bit-identical to
    * [[boilerplateRemove]]. Earlier batches' emissions are not retracted
    * when a block turns hot later (the forward-only streaming trade-off,
    * same as every admission store here). Returns (cleaned batch, the
    * merged store to carry forward).
    *
    * 100 TB shape: the store probe + merge is one hash-partitioned
    * equi-join on the block hash — O(batch blocks + touched store rows),
    * never corpus-sized; the store grows by one (hash, count) row per
    * distinct new block.
    */
  def boilerplateRemoveIncremental(
      seen: Option[DataFrame],
      batch: DataFrame,
      blockWords: Int = 3,
      minDocs: Int = 5,
      idCol: String = "doc_id",
      textCol: String = "text"): (DataFrame, DataFrame) = {
    require(blockWords >= 1, "blockWords must be >= 1")
    require(minDocs >= 2, "minDocs must be >= 2")
    val bw = blockWords
    val tok = batch.select(col(idCol).cast("long").as("doc_id"), tokens(col(textCol)).as("w"))
      .withColumn("n_blocks",
        floor((size(col("w")) + lit(bw - 1)) / lit(bw)).cast("long"))
    val blocks = blockRows(batch, blockWords, idCol, textCol)
      .withColumn("h", Dedup.blockHash(col("blk")))
    val batchCounts = blocks.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("bd"))
    val total = seen match {
      case Some(s) =>
        batchCounts.join(s.select(col("h"), col("n_docs").as("sd")), Seq("h"), "full_outer")
          .select(col("h"),
            (coalesce(col("bd"), lit(0L)) + coalesce(col("sd"), lit(0L))).as("n_docs"))
      case None => batchCounts.select(col("h"), col("bd").as("n_docs"))
    }
    val hot = total.filter(col("n_docs") >= lit(minDocs.toLong)).select(col("h"))
    val kept = blocks.join(hot, Seq("h"), "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("blk")))),
            x => x.getField("blk")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    val out = tok.select(col("doc_id"), col("n_blocks"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_blocks"),
        (col("n_blocks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
    (out, total)
  }

  /** (doc_id, pos, blk) rows: each document cut into fixed `blockWords`-
    * token blocks (last block ragged) — the shared explode under the
    * boilerplate census and removal.
    */
  private def blockRows(
      docs: DataFrame, blockWords: Int, idCol: String, textCol: String): DataFrame = {
    val bw = blockWords
    docs.select(col(idCol).cast("long").as("doc_id"), tokens(col(textCol)).as("w"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0L), floor((size(col("w")) + lit(bw - 1)) / lit(bw)).cast("long") - 1),
          i => array_join(slice(col("w"), (i * bw + 1).cast("int"), lit(bw)), " ")))
          .as(Seq("pos", "blk")))
  }
}
