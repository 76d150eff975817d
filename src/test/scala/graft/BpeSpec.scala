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

  test("merge table is partitioning-independent on the corpus fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      Bpe.learnMerges(df, nMerges = 4).orderBy(col("rank")).collect().toSeq
    assert(rows(docs) == rows(docs.repartition(7)),
      "integer pair counts + lexicographic ties must be partition-order-free")
  }
}
