package graft

/** Partitioning-independence: the float-sensitive corpus queries must be
  * BIT-identical under different shuffle parallelism — this is the property
  * the integer-scaled centroid sums, fixed-order BM25 term addition, and
  * ordered-fold vector math were designed to guarantee (a distributed float
  * sum would pass sf0.01 by luck and drift at cluster scale).
  */
class DeterminismSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("float-sensitive round-5 queries are bit-identical across shuffle parallelism") {
    for (name <- Seq("emb_outliers", "text_bm25", "dedup_spans", "events_asof",
        "text_vocab_sketch", "sample_fixed_k", "events_session_window",
        // round-5b: RRF fusion (float adds in fixed arm order), the salted
        // join's integer-scaled sum, incremental jaccard division, keeper
        // argmax over (prio, -id), and the bloom-prefiltered report
        "search_hybrid_rrf", "q19_salted_join", "dedup_incremental",
        "dedup_keepers", "text_decontaminate_bloom", "corpus_report",
        "mm_similar_media",
        // round-6: the hierarchical prefix/rank samplers (the range
        // decomposition must not depend on how ranges land on reducers)
        // and the LM score (integer-quantized log terms — THE query a
        // naive float sum would pass at one parallelism and fail at
        // another)
        "sample_token_budget", "sample_shuffle_order", "text_lm_score",
        // round-8: the index-served RRF fusion (float adds in fixed arm
        // order over the IVF pool), SemDeDup's within-cluster cosine
        // threshold, the export manifest's token sums, and the
        // contamination-span rebuild (collect_list re-sorted on position)
        "search_hybrid_rrf_indexed", "dedup_semantic", "export_manifest",
        "text_decontaminate_spans")) {
      def run(parts: String): Array[String] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        // Double.toString is the shortest round-trip representation, so any
        // last-bit difference shows up in the compare
        try SparkEntry.queries(name)(spark, sf).collect().map(_.toString)
        finally spark.conf.set("spark.sql.shuffle.partitions", "4")
      }
      val a = run("3")
      val b = run("11")
      assert(a.length == b.length, s"$name row count differs across parallelism")
      a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
        assert(x == y, s"$name row $i differs across parallelism:\n  p3:  $x\n  p11: $y")
      }
    }
  }
}
