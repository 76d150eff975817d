package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning [Sennrich et al. 2016] — tokenizer
  * training as a corpus operator. Classic word-dictionary BPE: the corpus
  * collapses to (distinct word, frequency) once, every word starts as a
  * character-symbol sequence, and each round (a) counts adjacent symbol
  * pairs weighted by word frequency, (b) picks the most frequent pair
  * (ties to the lexicographically smallest (left, right)), (c) applies the
  * merge greedily left-to-right inside every word.
  *
  * The greedy application is the part engines usually do imperatively; here
  * it is RELATIONAL, which is what makes the whole trainer DuckDB-
  * replayable: with match flags m(p) = (sym(p), sym(p+1)) == (L, R), two
  * overlapping matches are necessarily consecutive positions, so greedy
  * left-to-right equals "merge at even offsets within every maximal island
  * of consecutive match positions" — islands via the gaps-and-islands
  * window, even offsets via a row_number parity, the rebuilt word via an
  * ordered list aggregate. No UDF, no loop over characters.
  *
  * Output: (rank, left, right, merged, pair_count) — the learned merge
  * table in application order, `pair_count` the frequency-weighted count
  * that won the round.
  *
  * Scale shape per round: the word dictionary is O(vocabulary), not
  * O(corpus) — the corpus is scanned ONCE up front; pair counting is a
  * partial-aggregated groupBy over exploded adjacencies; the argmax is one
  * tiny TakeOrdered; application windows partition by (short) word. The
  * dictionary is re-pinned each round so lineage stays one round deep.
  */
object Bpe {

  /** Character symbols of a word, via the same substring walk the oracle
    * uses (`split(word, "")` has engine-specific empty-edge behavior;
    * this does not).
    */
  private def charSymbols(word: org.apache.spark.sql.Column) =
    transform(sequence(lit(1), length(word)), c => word.substr(c, lit(1)))

  def learnMerges(
      docs: DataFrame,
      nMerges: Int = 6,
      textCol: String = "text",
      maxDriverWords: Long = MaxDriverWordsDefault): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learn(docs, nMerges, textCol, maxDriverWords)._1
      .map { case (rank, l, r, cnt) => (rank, l, r, l + r, cnt) }
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Tokenize the corpus under the `nMerges`-round learned vocabulary:
    * per document, the whitespace word count and the BPE token count
    * (sum of each word's final symbol-sequence length). One dictionary
    * join back onto the exploded corpus — the "how many tokens is my
    * corpus under this tokenizer" question every training-budget
    * calculation starts from.
    */
  def tokenCounts(
      docs: DataFrame,
      nMerges: Int = 6,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxDriverWords: Long = MaxDriverWordsDefault): DataFrame = {
    val (_, words) = learn(docs, nMerges, textCol, maxDriverWords)
    docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("word"))
      .join(words.select(col("word"), size(col("sym")).cast("long").as("nw")), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("nw")).as("n_bpe_tokens"))
  }

  /** The training loop shared by [[learnMerges]] and [[tokenCounts]]:
    * returns the merge list and the final word dictionary (word, freq,
    * sym).
    */
  /** Dictionary-size gates for the driver-resident fold. Collecting the
    * dictionary materializes, per word, a String plus a per-character
    * String[] — on a JVM each one-char String costs ~50 bytes and the
    * holding array ~16+8/char, so the resident footprint is dominated by
    * total characters, not rows. The fold is taken only when BOTH the row
    * gate and the estimated-byte gate pass (the byte estimate comes from
    * the same aggregate job that counts the rows, so the gate adds no
    * extra job); otherwise the relational per-round loop keeps the
    * O(vocabulary) rounds distributed. Callers of [[learnMerges]] /
    * [[tokenCounts]] who raise `maxDriverWords` must provision driver
    * heap for ~64 bytes per dictionary character.
    */
  private val MaxDriverWordsDefault: Long = 4000000L

  /** Driver-heap budget for the collected dictionary (estimated, not
    * measured): rows*120 + totalChars*64 bytes must stay under this.
    * 1 GiB keeps the fold comfortably inside a default 4-8 GiB driver.
    */
  private val MaxDriverBytesDefault: Long = 1L << 30

  /** Estimated resident bytes of the collected dictionary: per-row fixed
    * overhead (word String header, boxed freq, Row scaffolding) plus
    * per-character cost (the word's chars once in the String, once as a
    * one-char symbol String, plus the symbol array slot).
    */
  private def estDriverBytes(rows: Long, totalChars: Long): Long =
    rows * 120L + totalChars * 64L

  /** Spark compares strings as UTF-8 bytes (codepoint order); Java's
    * `String.compareTo` is UTF-16 code-unit order, which disagrees above
    * the BMP — the driver fold must break count ties exactly like the
    * distributed `orderBy(l, r)` does.
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** The driver-resident merge fold: identical argmax (count desc, then
    * (left, right) ascending in UTF-8 byte order) and identical greedy
    * left-to-right application as the relational loop — bit-equal merges
    * and final dictionary, minus one Spark job per round.
    */
  private def learnDriver(
      words0: DataFrame,
      nMerges: Int): (Seq[(Long, String, String, Long)], DataFrame) = {
    val spark = words0.sparkSession
    import spark.implicits._
    val rows = words0.select(col("word"), col("freq"), col("sym")).collect()
    val wordArr = rows.map(_.getString(0))
    val freqArr = rows.map(_.getLong(1))
    val symArr = rows.map(_.getSeq[String](2).toArray)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= nMerges && !exhausted) {
      // (a) pair counts weighted by word frequency
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]
      var wi = 0
      while (wi < symArr.length) {
        val s = symArr(wi); val f = freqArr(wi)
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) exhausted = true // fully merged — nothing to learn
      else {
        // (b) argmax: count desc, ties to the UTF-8-smallest (l, r)
        var bl: String = null; var br: String = null; var bc = -1L
        counts.foreach { case ((l, rr), c) =>
          if (c > bc || (c == bc &&
              (utf8Lt(l, bl) || (l == bl && utf8Lt(rr, br))))) {
            bl = l; br = rr; bc = c
          }
        }
        merges += ((r.toLong, bl, br, bc))
        // (c) greedy left-to-right application
        val merged = bl + br
        wi = 0
        while (wi < symArr.length) {
          val s = symArr(wi)
          var i = 0
          var touched = false
          while (!touched && i < s.length - 1) {
            touched = s(i) == bl && s(i + 1) == br
            i += 1
          }
          if (touched) {
            val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
            i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == bl && s(i + 1) == br) {
                out += merged; i += 2
              } else { out += s(i); i += 1 }
            }
            symArr(wi) = out.toArray
          }
          wi += 1
        }
      }
      r += 1
    }
    val dict = wordArr.indices
      .map(i => (wordArr(i), freqArr(i), symArr(i).toSeq))
    (merges.toSeq, spark.createDataset(dict).toDF("word", "freq", "sym"))
  }

  private[graft] def learn(
      docs: DataFrame,
      nMerges: Int,
      textCol: String,
      maxDriverWords: Long = MaxDriverWordsDefault,
      maxDriverBytes: Long = MaxDriverBytesDefault): (Seq[(Long, String, String, Long)], DataFrame) = {
    require(nMerges >= 1, "nMerges must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"), charSymbols(col("word")).as("sym"))
      .localCheckpoint(true)
    // gate: a dictionary that fits the driver folds there (one job total);
    // the distributed relational loop below is the large-vocabulary path.
    // One aggregate yields both gates: row count AND total characters,
    // because driver footprint scales with characters (see estDriverBytes).
    val gate = words.agg(
      count(lit(1)).as("rows"),
      coalesce(sum(length(col("word"))), lit(0L)).as("chars")).head()
    val (nRows, nChars) = (gate.getLong(0), gate.getLong(1))
    if (nRows <= maxDriverWords &&
        estDriverBytes(nRows, nChars) <= maxDriverBytes) {
      val out = learnDriver(words, nMerges)
      // words is a localCheckpoint: Dataset.unpersist() would be a no-op
      // on its blocks (see graft.util.LocalCkpt) — release them explicitly
      graft.util.LocalCkpt.release(words)
      return out
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (r <- 1 to nMerges) {
      // (a) pair counts: adjacent symbol pairs weighted by word frequency
      val best = words
        .select(col("freq"),
          explode(arrays_zip(
            slice(col("sym"), lit(1), greatest(size(col("sym")) - 1, lit(0))),
            slice(col("sym"), lit(2), greatest(size(col("sym")) - 1, lit(0))))).as("p"))
        .select(col("p.0").as("l"), col("p.1").as("r"), col("freq"))
        .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) {
        // vocabulary fully merged — nothing left to learn
      } else {
        val (l, rr, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r.toLong, l, rr, cnt))
        // (c) greedy application: flags -> islands -> even offsets
        val pos = words.select(col("word"), col("freq"),
          posexplode(col("sym")).as(Seq("pos", "s")))
        val w = Window.partitionBy(col("word")).orderBy(col("pos"))
        // coalesce keeps m two-valued at the word's last position (lead is
        // null there) — a null m would poison the lag-consumed filter
        val flagged = pos.withColumn("m",
          col("s") === l && coalesce(lead(col("s"), 1).over(w) === rr, lit(false)))
        // island id = pos - rank among this word's match positions; within
        // an island, greedy keeps the 1st, 3rd, ... match (odd parity)
        val wm = Window.partitionBy(col("word"), col("m")).orderBy(col("pos"))
        val kept = flagged
          .withColumn("isl", when(col("m"), col("pos") - row_number().over(wm)))
          .withColumn("kp", col("m") &&
            (row_number().over(Window.partitionBy(col("word"), col("isl"))
              .orderBy(col("pos"))) % 2 === 1))
        // rebuild: a kept position emits the merged symbol, the position
        // after a kept one is consumed, everything else passes through
        val out = kept
          .withColumn("consumed", lag(col("kp"), 1, false).over(w))
          .filter(!col("consumed"))
          .withColumn("osym", when(col("kp"), concat(lit(l), lit(rr))).otherwise(col("s")))
          .groupBy(col("word"), col("freq"))
          .agg(transform(
            array_sort(collect_list(struct(col("pos"), col("osym")))),
            t => t.getField("osym")).as("sym"))
        val next = out.localCheckpoint(true)
        // `next` is eager, so the previous round's checkpoint blocks are
        // no longer reachable — free them now (unpersist() can't)
        graft.util.LocalCkpt.release(words)
        words = next
      }
    }
    (merges.toSeq, words)
  }
}
