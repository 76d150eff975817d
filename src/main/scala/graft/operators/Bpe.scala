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
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learn(docs, nMerges, textCol)._1
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
      textCol: String = "text"): DataFrame = {
    val (_, words) = learn(docs, nMerges, textCol)
    docs.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("word"))
      .join(words.select(col("word"), size(col("sym")).cast("long").as("nw")), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("nw")).as("n_bpe_tokens"))
  }

  /** The training loop shared by [[learnMerges]] and [[tokenCounts]]:
    * returns the merge list and the final word dictionary (word, freq,
    * sym).
    */
  private def learn(
      docs: DataFrame,
      nMerges: Int,
      textCol: String): (Seq[(Long, String, String, Long)], DataFrame) = {
    require(nMerges >= 1, "nMerges must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"), charSymbols(col("word")).as("sym"))
      .localCheckpoint(true)
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
        words.unpersist()
        words = next
      }
    }
    (merges.toSeq, words)
  }
}
