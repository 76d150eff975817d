package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-cluster quality operators: per-label centroids and
  * distance-to-own-centroid outlier ranking — the QA pass a training-data
  * pipeline runs over labeled/clustered embeddings (bad-cluster detection,
  * mislabeled-point mining).
  *
  * Determinism contract: a distributed mean of floats is order-dependent in
  * IEEE arithmetic, so centroids are computed over 1e-6-SCALED INTEGER
  * elements — `floor(x * 1e6 + 0.5)` per element (half-up, like the
  * quantizer in [[Similarity]]; engines disagree on banker's rounding, floor
  * does not), summed exactly as longs (associative — any partitioning gives
  * the same sum; max |sum| ~ corpus_size * 1e6 * max|x|, far inside both
  * long and double exact range), divided once by `1e6 * n`. The oracle
  * replays the identical arithmetic.
  *
  * Scale shape: centroid computation is `posexplode` → hash aggregate on
  * (label, pos) with map-side partials — the canonical O(N·d) → O(labels·d)
  * reduction — then an array re-assembly per label. The outlier pass joins
  * the tiny centroid table back by broadcast and scores each vector in the
  * scan; the only corpus-sized shuffle is the per-label ranking window over
  * narrow (label, id, score) rows.
  */
object Clustering {

  /** Per-label exact-integer centroids: (label, n, centroid array<double>). */
  def labelCentroids(
      emb: DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val sums = emb
      .select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(
        sum(floor(col("x").cast("double") * 1e6 + 0.5).cast("long")).as("sx"),
        count(lit(1)).as("n"))
    // collect_list order is partition-dependent — array_sort on (pos, sx)
    // structs (pos unique per label) restores index order deterministically
    sums.groupBy(col("label"))
      .agg(
        max(col("n")).as("n"),
        transform(
          array_sort(collect_list(struct(col("pos"), col("sx"), col("n")))),
          t => t.getField("sx").cast("double") / (t.getField("n") * 1e6))
          .as("centroid"))
  }

  /** Per-label outliers: the `k` vectors FURTHEST from their own label's
    * centroid by cosine. Output: (label, rank, vec_id, cos_centroid) with
    * cosine rounded to 9 dp and rank over (cos ASC, vec_id ASC).
    */
  def centroidOutliers(
      emb: DataFrame,
      k: Int = 3,
      idCol: String = "vec_id",
      labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val cents = labelCentroids(emb, labelCol, vecCol)
      .select(col("label"), col("centroid"), l2Norm(col("centroid")).as("cnrm"))
    val scored = emb
      .select(col(labelCol).as("label"), col(idCol).as("vec_id"), col(vecCol).as("v"),
        l2Norm(col(vecCol)).as("nv"))
      .join(broadcast(cents), Seq("label"))
      .select(col("label"), col("vec_id"),
        round(cosine(col("v"), col("centroid"), col("nv"), col("cnrm")), 9)
          .as("cos_centroid"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("cos_centroid").asc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("label"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos_centroid"))
  }
}
