package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design: the query set is small and broadcast (no shuffle of the
  * corpus); norms are computed once per vector in the scan projection; the
  * per-query top-k uses a window over (query, score) which shuffles only
  * (corpus × |queries|) score rows, never the vectors themselves. The LSH
  * variant buckets the corpus by deterministic random-hyperplane signatures
  * so each query only scores its own bucket — the 100 TB path, where the
  * brute-force cross product is no longer affordable.
  */
object Similarity {

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * Output: (query_id, rank, neighbor_id, cos_sim) — cos_sim rounded to
    * 9 dp for cross-engine reproducibility.
    */
  def bruteForceTopK(
      emb: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val corpus = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("v"),
      l2Norm(col(vecCol)).as("nv"))
    val qs = queries.select(col(idCol).as("query_id"), col(vecCol).as("q"),
      l2Norm(col(vecCol)).as("nq"))
    val scored = corpus.join(broadcast(qs), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q"), col("v"), col("nq"), col("nv")), 9).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }

  /** Deterministic random-hyperplane signature: `numPlanes` sign bits from
    * globally-numbered planes `planeBase .. planeBase + numPlanes - 1`.
    * Plane coefficients come from a fixed integer LCG over (plane, dim)
    * mapped to [-0.5, 0.5) — engine-independent, no stored model, and
    * exactly replicable in ANSI SQL (pure integer arithmetic, unlike
    * xxhash64), which makes the bucketed search DuckDB-oracle-checkable.
    */
  private def planeSignature(vec: org.apache.spark.sql.Column, planeBase: Int, numPlanes: Int) = {
    val planeDots = (0 until numPlanes).map { j =>
      val p = planeBase + j
      // dot(v, plane_p) where plane_p[i] = lcg(p, i)/1e6 - 0.5
      aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
          x.cast("double") *
            ((pmod((lit(p.toLong * 1000003L) + i) * lit(2654435761L) + lit(12345L), lit(1000000L))
              .cast("double") / lit(1000000.0)) - lit(0.5))),
        lit(0.0), (acc, x) => acc + x)
    }
    planeDots.zipWithIndex.map { case (d, j) =>
      when(d > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed ANN with `numTables` independent hyperplane tables of
    * `numPlanes` sign bits each: a candidate only needs to share a bucket
    * in ONE table (the standard L-tables recall knob — one table of k bits
    * has recall ~(1 - theta/pi)^k per neighbor, L tables lift it to
    * 1-(1-r)^L). Candidates are deduped across tables, then scored exactly.
    * Output: (query_id, rank, neighbor_id, cos_sim) — approximate (recall
    * < 1), which is the trade the bucket join buys at scale.
    */
  def lshTopK(
      emb: DataFrame,
      queries: DataFrame,
      k: Int,
      numPlanes: Int = 6,
      numTables: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    def buckets(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId),
        explode(array((0 until numTables).map { t =>
          struct(lit(t).as("t"),
            planeSignature(col(vecCol), t * numPlanes, numPlanes).as("b"))
        }: _*)).as("tb"))
        .select(col(outId), col("tb.t").as("t"), col("tb.b").as("b"))
    val cand = buckets(emb, "neighbor_id")
      .join(broadcast(buckets(queries, "query_id")), Seq("t", "b"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val corpus = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("v"),
      l2Norm(col(vecCol)).as("nv"))
    val qs = queries.select(col(idCol).as("query_id"), col(vecCol).as("q"),
      l2Norm(col(vecCol)).as("nq"))
    val scored = cand
      .join(corpus, Seq("neighbor_id"))
      .join(broadcast(qs), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q"), col("v"), col("nq"), col("nv")), 9).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }

  /** IVF-flavored ANN: a coarse quantizer of `nlist` deterministic centroid
    * vectors (the lowest-id corpus vectors — fixed, no training iterations)
    * partitions the corpus into inverted lists; each query scores only the
    * lists of its `nprobe` nearest centroids. Compared to the hyperplane-LSH
    * variant this gives directly tunable probe cost (`nprobe/nlist` of the
    * corpus scanned per query) — the classic memory-bandwidth trade at
    * billion-vector scale. Recall < 1 by design; returned scores are exact.
    * Output: (query_id, rank, neighbor_id, cos_sim).
    */
  def ivfTopK(
      emb: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val normed = emb.select(col(idCol).as("id"), col(vecCol).as("v"), l2Norm(col(vecCol)).as("nrm"))
    val centroids = broadcast(
      normed.orderBy(col("id")).limit(nlist)
        .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm")))
    def assign(df: DataFrame, keep: Int): DataFrame = {
      val scored = df.join(centroids, lit(true))
        .select(df.columns.map(col) :+ col("cid") :+
          cosine(col("v"), col("cv"), col("nrm"), col("cnrm")).as("csim"): _*)
      val w = Window.partitionBy(col("id")).orderBy(col("csim").desc, col("cid").asc)
      scored.withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .drop("csim", "crank")
    }
    val corpus = assign(normed, 1)
      .select(col("id").as("neighbor_id"), col("v"), col("nrm"), col("cid"))
    val qs = assign(
      queries.select(col(idCol).as("id"), col(vecCol).as("v"), l2Norm(col(vecCol)).as("nrm")),
      nprobe)
      .select(col("id").as("query_id"), col("v").as("q"), col("nrm").as("nq"), col("cid"))
    val scored = corpus.join(broadcast(qs), Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q"), col("v"), col("nq"), col("nrm")), 9).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
      .distinct()
  }

  /** Embedding-cosine near-duplicate pairs: global top-N most similar
    * distinct pairs. Output: (id_a, id_b, cos_sim).
    */
  def topCosinePairs(
      emb: DataFrame,
      topN: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val n = emb.select(col(idCol).as("id"), col(vecCol).as("v"), l2Norm(col(vecCol)).as("nrm"))
    val a = n.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb"), col("na"), col("nb")), 9).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
      .limit(topN)
  }
}
