package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PERSISTED IVF index over an embedding column: the write-once /
  * probe-many form of [[Similarity.ivfTopK]], which re-derives the corpus
  * assignment in-plan on every call. At serving scale the corpus scan is
  * the whole cost, so the index materializes each vector's inverted list
  * ONCE as a cid-partitioned parquet layout; a probe then reads only the
  * `nprobe` directories its queries select — partition pruning visible as
  * `PartitionFilters` in the scan, i.e. ~nprobe/nlist of the bytes, with no
  * filter evaluation against non-probed lists at all (IvfIndexSpec pins
  * both the pruning and bit-identity with the in-plan operator).
  *
  * Layout under `path`:
  *   - `centroids/` — (cid, cv, cnrm): the `nlist` deterministic coarse
  *     centroids ([[Similarity.collectCentroids]] — lowest-id corpus
  *     vectors, no training), a single tiny file read at probe time.
  *   - `lists/cid=<c>/` — (id, v, nrm): each corpus vector in exactly one
  *     inverted list, its L2 norm precomputed at build so probes never
  *     touch arithmetic the build already paid for.
  *
  * Cluster notes: the build is one corpus scan (assignment is the same
  * scan-stage argmax expression ivfTopK uses) plus a partitioned shuffle
  * write; `nlist` should scale with corpus size (sqrt(n) heuristic) so each
  * list stays a few hundred MB — directories-per-table and files-per-probe
  * both stay trivially small. Probes broadcast the (small) query side and
  * shuffle nothing but scored (query, neighbor) rows.
  */
object IvfIndex {

  /** `nlist = 0` on the builders means auto: the sqrt(n) heuristic the
    * layout notes describe (each list ~sqrt(n) vectors keeps both
    * directories-per-table and probe cost balanced as the corpus grows),
    * clamped to [16, 4096] and costed by ONE count job at build time —
    * the same auto-switch convention as `Dedup.ngramJaccardPairs` and
    * `simhashPairs`.
    */
  private def resolveNlist(emb: DataFrame, nlist: Int): Int = {
    require(nlist >= 0, s"nlist must be >= 0 (0 = auto), got $nlist")
    if (nlist > 0) nlist
    else math.min(4096, math.max(16, math.sqrt(emb.count().toDouble).toInt))
  }

  /** Build the index at `path` (overwrites). One scan + one partitioned
    * write. `filesPerList` is the skew/parallelism dial: 1 (default)
    * clusters each inverted list into a single writer task — one file per
    * list, right when lists are modest; raise it for corpora where a hot
    * centroid's list outgrows one task (the write spreads each list over
    * `filesPerList` tasks/files, bounding both task size AND file count —
    * `repartition(cid)` alone writes a 100 GB list single-threaded, while
    * an unpartitioned write emits one file per input-task × cid).
    * `nlist = 0` selects the sqrt(n) auto heuristic ([[resolveNlist]]).
    */
  def write(
      emb: DataFrame,
      path: String,
      nlist: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      filesPerList: Int = 1): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = Similarity.collectCentroids(emb, resolveNlist(emb, nlist), idCol, vecCol)
    cents.toSeq.toDF("cid", "cv", "cnrm")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    val assigned = emb
      .select(col(idCol).as("id"), col(vecCol).as("v"), l2Norm(col(vecCol)).as("nrm"))
      .withColumn("cid", Similarity.centroidAssignExpr(cents))
    val clustered =
      if (filesPerList <= 1) assigned.repartition(col("cid"))
      else assigned.repartition(col("cid"), pmod(xxhash64(col("id")), lit(filesPerList.toLong)))
    clustered.write.mode("overwrite").partitionBy("cid").parquet(s"$path/lists")
  }

  /** Build a QUANTIZED index: like [[write]], but each inverted list also
    * carries the vector's symmetric-int8 form ([[Similarity.quantize]] —
    * `qvec`, its `scale`, and the precomputed quantized norm `qnrm`)
    * alongside the exact float columns. A [[probeQuantized]] candidate scan
    * then reads ONLY (id, qvec, qnrm) of the probed lists — int8 lanes are
    * 4x fewer bytes than float32, the standard memory-ladder rung before
    * PQ — and parquet column pruning keeps the exact `v` pages untouched
    * until the per-query rerank. One corpus scan, one partitioned write,
    * same layout/skew dials as [[write]].
    */
  def writeQuantized(
      emb: DataFrame,
      path: String,
      nlist: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      filesPerList: Int = 1): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = Similarity.collectCentroids(emb, resolveNlist(emb, nlist), idCol, vecCol)
    cents.toSeq.toDF("cid", "cv", "cnrm")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    val q = Similarity.quantize(emb, idCol, vecCol)
    val assigned = emb
      .select(col(idCol).as("id"), col(vecCol).as("v"), l2Norm(col(vecCol)).as("nrm"))
      .join(q.select(col("id"), col("scale"), col("qvec"),
        l2Norm(col("qvec")).as("qnrm")), Seq("id"))
      .withColumn("cid", Similarity.centroidAssignExpr(cents))
    val clustered =
      if (filesPerList <= 1) assigned.repartition(col("cid"))
      else assigned.repartition(col("cid"), pmod(xxhash64(col("id")), lit(filesPerList.toLong)))
    clustered.write.mode("overwrite").partitionBy("cid").parquet(s"$path/lists")
  }

  /** Probe a quantized index ([[writeQuantized]]): rank each probed list's
    * members by int8-dot cosine (per-vector scales cancel), keep
    * `candFactor * k` candidates per query, then exact-rescore only the
    * candidates against the float vectors — the SQ8-and-refine serving
    * pattern. Scores in the output are EXACT cosines (round 9), ties by
    * neighbor_id; recall vs [[probe]] < 1 only where the int8 preselect
    * reorders past the candidate cut. Both scans are partition-pruned to
    * the probed cids; the candidate scan reads no float vector pages.
    * Output: (query_id, rank, neighbor_id, cos_sim).
    */
  def probeQuantized(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 4,
      candFactor: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents: Array[(Long, Array[Double], Double)] =
      spark.read.parquet(s"$path/centroids").orderBy(col("cid")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val qs = Similarity.ivfProbeSide(queries, cents, nprobe, idCol, vecCol)
    val qq = Similarity.quantize(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("qvec").as("qq"),
        l2Norm(col("qvec")).as("qqn"))
    // quantized probe side: (query_id, quantized query, its probed cids)
    val qsq = qs.select(col("query_id"), col("cid"))
      .join(qq, Seq("query_id"))
    val probed = qs.select(col("cid")).distinct().collect().map(_.getLong(0))
    def lists(cols: Column*): DataFrame =
      spark.read.parquet(s"$path/lists")
        .withColumn("cid", col("cid").cast("long"))
        .filter(col("cid").isin(probed.toIndexedSeq: _*))
        .select(cols: _*)
    val qscored = lists(col("id").as("neighbor_id"), col("qvec").as("qv"),
        col("qnrm").as("qnv"), col("cid"))
      .join(broadcast(qsq), Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        try_divide(dot(col("qq"), col("qv")), col("qqn") * col("qnv")).as("qcos"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    val candidates = qscored.withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= k * candFactor)
      .select(col("query_id"), col("neighbor_id"))
    val fq = queries.select(col(idCol).as("query_id"), col(vecCol).as("q"),
      l2Norm(col(vecCol)).as("nq"))
    val rescored = broadcast(candidates)
      .join(lists(col("id").as("neighbor_id"), col("v"), col("nrm")), Seq("neighbor_id"))
      .join(broadcast(fq), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q"), col("v"), col("nq"), col("nrm")), 9).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }

  /** Probe the index: exact cosine top-k of each query over its `nprobe`
    * nearest inverted lists. Output (query_id, rank, neighbor_id, cos_sim)
    * — bit-identical to [[Similarity.ivfTopK]] with the same
    * (nlist, nprobe, k) on the indexed corpus.
    */
  def probe(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // ≤ nlist rows: the coarse quantizer is driver-resident by design
    val cents: Array[(Long, Array[Double], Double)] =
      spark.read.parquet(s"$path/centroids").orderBy(col("cid")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val qs = Similarity.ivfProbeSide(queries, cents, nprobe, idCol, vecCol)
    // the probed-list set is ≤ nlist values regardless of |queries| — an
    // IN over the partition column is what turns the probe into a
    // partition-pruned scan (directories outside it are never listed)
    val probed = qs.select(col("cid")).distinct().collect().map(_.getLong(0))
    val corpus = spark.read.parquet(s"$path/lists")
      .withColumn("cid", col("cid").cast("long"))
      .filter(col("cid").isin(probed.toIndexedSeq: _*))
      .select(col("id").as("neighbor_id"), col("v"), col("nrm"), col("cid"))
    Similarity.ivfRank(corpus, qs, k)
  }
}
