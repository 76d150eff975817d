package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the pipeline operators — all built-in Catalyst
  * expressions (codegen'd), no UDFs. Each helper has an exactly-equivalent
  * ANSI/DuckDB formulation used by the oracle SQL in SparkEntry, so results
  * hash-match across engines.
  */
object TextFunctions {

  /** Whitespace tokenization (regex `\s+` on trimmed text). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Word n-gram shingles (distinct), n=3: `w_i w_i+1 w_i+2`. Caller filters
    * out docs with fewer than 3 tokens.
    *
    * Implementation note: built from `arrays_zip` of three shifted slices
    * rather than `element_at` inside the lambda — a lambda that indexes the
    * tokenization expression re-evaluates the regex split PER ELEMENT
    * (measured ~10x slowdown on the shingle stage); the zip form evaluates
    * it a constant number of times per row.
    */
  def wordShingles3(c: Column): Column = wordShingles(c, 3)

  /** Word n-gram shingles (distinct) for any n — the n-way generalization of
    * [[wordShingles3]], same zip-of-shifted-slices evaluation shape. The
    * `greatest(m, 0)` clamp makes short docs (fewer than n tokens) yield an
    * empty array instead of an error.
    *
    * PERFORMANCE: this inlines the tokenization into n slices + the clamp =
    * n+1 interpreted regex splits per row (higher-order functions are
    * CodegenFallback, so no common-subexpression elimination rescues it —
    * measured ~6x slowdown of the shingle stage at n=8). Operators should
    * project `tokens(text)` to a REAL column first and call
    * [[wordShinglesFromTokens]] on the attribute; CollapseProject keeps the
    * producing projection separate precisely because the reference is
    * non-cheap and multiply-used.
    */
  def wordShingles(c: Column, n: Int): Column = wordShinglesFromTokens(tokens(c), n)

  /** [[wordShingles]] over an ALREADY-TOKENIZED array column — the form
    * every multi-reference call site should use (see the performance note
    * above).
    */
  def wordShinglesFromTokens(w: Column, n: Int): Column = {
    val m = greatest(size(w) - (n - 1), lit(0))
    array_distinct(transform(
      arrays_zip((1 to n).map(i => slice(w, lit(i), m)): _*),
      t => concat_ws(" ", (0 until n).map(j => t.getField(j.toString)): _*)))
  }

  /** Word n-grams IN POSITION ORDER (no distinct) over an already-tokenized
    * array column — for operators that need per-position grams (duplicated
    * span coverage), unlike the dedup shingle sets. Same zip-of-shifted-
    * slices shape as [[wordShinglesFromTokens]]; `posexplode` of the result
    * yields (position, gram) with 0-based positions.
    */
  def orderedNgramsFromTokens(w: Column, n: Int): Column = {
    val m = greatest(size(w) - (n - 1), lit(0))
    transform(
      arrays_zip((1 to n).map(i => slice(w, lit(i), m)): _*),
      t => concat_ws(" ", (0 until n).map(j => t.getField(j.toString)): _*))
  }

  /** 31-bit polynomial string hash: left fold of character codes,
    * `acc = (acc*mult + code) mod prime`. Weaker mixing than xxhash64 but
    * exactly replicable in ANSI SQL (`list_reduce` over codepoints in
    * DuckDB), which makes every operator built on it oracle-checkable; the
    * fold stays in [0, prime) so Spark 4 ANSI mode never sees overflow.
    * Dispatches to a native codegen'd expression (byte walk, no per-string
    * char array); `polyHashHof` is the built-in-function formulation kept as
    * a bit-equality cross-check.
    */
  def polyHash(c: Column, mult: Long = 31L, prime: Long = 2147483647L): Column =
    graft.functions.expressions.StringExpressions.polyHashNative(c, mult, prime)

  /** Double-width (62-bit) polynomial hash: two independent 31-bit folds
    * (distinct multiplier AND modulus) packed as `h1 + h2 * 2^31` — the
    * near-exact identity the SPAN operators key on. A single 31-bit fold
    * expects ~n²/2³² spurious equal pairs (thousands at 10⁹ grams, unusable
    * at corpus scale); the pair drops that to ~n²/2⁶² (≈ negligible below
    * 10¹² distinct grams). Same construction as the block/simhash hashes;
    * DuckDB replays both folds.
    */
  def widePolyHash(c: Column): Column =
    polyHash(c) + polyHash(c, mult = 131L, prime = 2147483629L) * lit(2147483648L)

  /** Higher-order-function form of `polyHash` — same fold, same bits. */
  def polyHashHof(c: Column, mult: Long = 31L, prime: Long = 2147483647L): Column =
    aggregate(
      transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => pmod(acc * lit(mult) + x, lit(prime)))

  /** Canonical normalization for fingerprinting: lowercase, strip
    * non-alphanumerics, squeeze whitespace.
    */
  def normalizedText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** Deterministic document fingerprint: md5 of the normalized text. */
  def fingerprint(c: Column): Column = md5(normalizedText(c))

  /** Count of tokens drawn from a fixed marker set. */
  def markerCount(c: Column, markers: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(markers.map(m => m: Any): _*)))

  val StopwordsEn: Seq[String] = Seq("the", "a", "and", "of", "to", "in")

  /** Language marker tokens (n-gram heuristic langid). The prediction is a
    * deterministic argmax with a fixed tie-break order — the contract is
    * determinism and cross-engine equality, not linguistic accuracy.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "et", "une"),
    "zh" -> Seq("de5", "le5", "shi4")) // romanized placeholders; corpus is latin
}
