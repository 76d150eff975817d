package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE merge learning: hand-computed merge sequence on a planted
  * dictionary (including the within-word greedy parity case "aaaa" ->
  * [aa, aa]) and partitioning independence.
  */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  test("hand-computed merges: counts, lexicographic ties, greedy island parity") {
    // dictionary: aa x2, ab x2, aaa x1, b x1, aaaa x1
    val docs = Seq("aa aa ab", "aaa ab b", "aaaa").toDF("text")
    val out = Bpe.learnMerges(docs, nMerges = 4).orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(out == Seq(
      // (a,a): aa x2 -> 2, aaa -> 2, aaaa -> 3 = 7
      (1L, "a", "a", "aa", 7L),
      // aaa -> [aa,a], aaaa -> [aa,aa] (greedy parity: TWO merges in one
      // word); then (a,b) x2 beats (aa,a) x1 and (aa,aa) x1
      (2L, "a", "b", "ab", 2L),
      // tie at 1 between (aa,a) and (aa,aa): right "a" < "aa"
      (3L, "aa", "a", "aaa", 1L),
      (4L, "aa", "aa", "aaaa", 1L)),
      s"unexpected merge table: $out")
  }

  test("exhausted vocabulary: later rounds are no-ops, tokenize keeps full counts") {
    // every word is "ab": merge 1 fully merges the vocabulary, rounds 2..6
    // find no pairs and must carry the dictionary forward — the oracle SQL
    // pins the same behavior (LEFT JOIN no-op round), so a degenerate
    // corpus cannot zero text_bpe_tokenize while Spark returns full counts
    val docs = Seq((1L, "ab ab ab"), (2L, "ab")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, nMerges = 6).collect()
    assert(merges.length == 1 && merges.head.getString(3) == "ab",
      "one merge then exhaustion")
    val tk = Bpe.tokenCounts(docs, nMerges = 6).orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(tk == Seq((1L, 3L, 3L), (2L, 1L, 1L)),
      s"fully merged words tokenize to one BPE token each, got $tk")
  }

  test("merge table is partitioning-independent on the corpus fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      Bpe.learnMerges(df, nMerges = 4).orderBy(col("rank")).collect().toSeq
    assert(rows(docs) == rows(docs.repartition(7)),
      "integer pair counts + lexicographic ties must be partition-order-free")
  }

  test("driver-resident fold == distributed relational loop, bit-exact (merges AND token counts)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // maxDriverWords = 0 forces the distributed branch; the default gates
    // this corpus onto the driver fold — both must emit identical tables
    val driver = Bpe.learnMerges(docs, nMerges = 8).orderBy(col("rank")).collect().toSeq
    val dist = Bpe.learnMerges(docs, nMerges = 8, maxDriverWords = 0L)
      .orderBy(col("rank")).collect().toSeq
    assert(driver == dist, s"driver fold diverged from the relational loop:\n$driver\nvs\n$dist")
    val tkDriver = Bpe.tokenCounts(docs, nMerges = 8).orderBy(col("doc_id")).collect().toSeq
    val tkDist = Bpe.tokenCounts(docs, nMerges = 8, maxDriverWords = 0L)
      .orderBy(col("doc_id")).collect().toSeq
    assert(tkDriver == tkDist, "final dictionaries must tokenize identically")
  }

  test("byte gate: an estimated-footprint overflow forces the relational loop, bit-exact") {
    // maxDriverBytes = 0 simulates a dictionary whose estimated driver
    // footprint exceeds the heap budget even though the ROW gate passes —
    // the fold must be refused and the relational loop must produce the
    // identical merge table (the OOM-safety path of ADVICE r12)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val driver = Bpe.learn(docs, 6, "text")._1
    val byteGated = Bpe.learn(docs, 6, "text", maxDriverWords = Long.MaxValue,
      maxDriverBytes = 0L)._1
    assert(driver == byteGated,
      s"byte-gated relational loop diverged from the driver fold:\n$driver\nvs\n$byteGated")
  }

  test("driver fold scale shape: nMerges=1000 completes in seconds") {
    // the sf0.001 vocabulary exhausts at 89 merges; sf0.01 is deep enough
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val t0 = System.nanoTime()
    val merges = Bpe.learnMerges(docs, nMerges = 1000).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    // the synthetic corpus's fixed word list fully merges at 89 rounds —
    // a 1000-round request must run the vocabulary to EXHAUSTION (the
    // strongest completion claim this corpus can express) in seconds
    assert(merges.length > 50, s"expected vocabulary exhaustion, got ${merges.length}")
    // ranks are contiguous from 1 (no skipped rounds before exhaustion)
    val ranks = merges.map(_.getLong(0)).sorted.toSeq
    assert(ranks == (1L to ranks.length).toSeq, "merge ranks must be contiguous")
    assert(sec < 60.0, s"1000-merge training took $sec s — the driver fold gate is not engaging")
  }
}
