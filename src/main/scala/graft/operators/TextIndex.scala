package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PERSISTED inverted text index: the write-once / probe-many form of
  * [[Search.bm25TopK]], which re-tokenizes the whole corpus on every call.
  * The lexical twin of [[IvfIndex]] — at serving scale the corpus scan IS
  * the query cost, so the index materializes the (doc, term, tf, dl)
  * posting rows ONCE into a term-bucket-partitioned parquet layout; a probe
  * then reads only the buckets its query terms hash into — partition
  * pruning visible as `PartitionFilters` on the postings scan, i.e.
  * ~|terms|/nBuckets of the bytes, with no tokenization and no filter
  * evaluation against non-probed buckets at all (TextIndexSpec pins both
  * the pruning and bit-identity with the in-plan operator).
  *
  * Layout under `path`:
  *   - `meta/` — one row (n_buckets, n_docs, sum_dl): the bucket count the
  *     build hashed with (probes MUST reuse it) and the corpus-wide BM25
  *     stats. `avgdl` is reconstructed at probe time as the same
  *     `sum(dl)::double / n_docs` division the in-plan scan performs, so
  *     the scores are bit-identical, not just close.
  *   - `postings/bucket=<b>/` — (doc_id, dl, tf, term): every (document,
  *     term) pair exactly once, `bucket = pmod(xxhash64(term), n_buckets)`.
  *     Document frequency is NOT stored: the probe re-derives it from the
  *     probed rows with the exact aggregate the in-plan scan uses —
  *     [[Search.bm25Score]] is shared, which is what makes the index
  *     bit-transparent rather than approximately equal.
  *
  * Cluster notes: the build is one tokenize scan + one partial-aggregated
  * groupBy + a partitioned shuffle write. `nBuckets` should scale with
  * vocabulary size so each bucket directory stays a few hundred MB;
  * `filesPerBucket` is the same skew/parallelism dial as [[IvfIndex]]'s
  * `filesPerList` — 1 clusters each bucket into one writer task, raise it
  * when a hot bucket (stopword-heavy) outgrows one task. Probes broadcast
  * only the tiny dfreq/stats frames and shuffle only scored posting rows
  * for the query's terms.
  */
object TextIndex {

  /** Build the index at `path` (overwrites). One corpus scan + one
    * partitioned write.
    */
  def write(
      docs: DataFrame,
      path: String,
      nBuckets: Int = 64,
      idCol: String = "doc_id",
      textCol: String = "text",
      filesPerBucket: Int = 1): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val tok = docs.select(
      col(idCol).cast("long").as("doc_id"),
      tokens(col(textCol)).as("toks"))
    // corpus stats once, at build: the probe must not touch the corpus
    tok.agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("sum_dl"))
      .withColumn("n_buckets", lit(nBuckets))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
    val postings = tok
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
    // the spread branch pins an explicit partition count: without it AQE
    // coalesces a small shuffle back to one task and the dial is a no-op
    val clustered =
      if (filesPerBucket <= 1) postings.repartition(col("bucket"))
      else postings.repartition(nBuckets * filesPerBucket, col("bucket"),
        pmod(xxhash64(col("doc_id")), lit(filesPerBucket.toLong)))
    clustered.write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")
  }

  /** BM25 top-k answered from the persisted index: same output contract as
    * [[Search.bm25TopK]] — (doc_id, rank, bm25 rounded 6 dp), rank over
    * (bm25 DESC, doc_id ASC) — and bit-identical to it over the indexed
    * corpus. The postings scan is partition-pruned to the query terms'
    * buckets; the term filter inside a bucket is an ordinary pushed data
    * filter.
    */
  def bm25TopK(
      spark: SparkSession,
      path: String,
      queryTerms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct == queryTerms, "queryTerms must be distinct")
    import spark.implicits._
    val meta = spark.read.parquet(s"$path/meta").collect().head
    val nDocs = meta.getAs[Long]("n_docs")
    val sumDl = meta.getAs[Long]("sum_dl")
    val nBuckets = meta.getAs[Int]("n_buckets")
    // bucket of each query term via the SAME Catalyst hash the build
    // partitioned with, evaluated over a |terms|-row local relation —
    // never a driver-side reimplementation that could drift from it
    val buckets = queryTerms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(nBuckets.toLong)).as("b"))
      .as[Long].collect().toSeq.distinct
    val tf = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(queryTerms.map(x => x: Any): _*))
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
    // the same sum(dl)::double / n_docs division the in-plan stats
    // aggregate performs — one IEEE op over the stored exact integers
    val stats = spark.range(1).select(
      lit(nDocs).as("n_docs"),
      (lit(sumDl).cast("double") / lit(nDocs)).as("avgdl"))
    Search.bm25Score(tf, stats, queryTerms, k, k1, b)
  }
}
