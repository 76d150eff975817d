package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Scale shape: centroid computation is ONE hash aggregate over whole
  * vectors (native [[graft.functions.expressions.VectorMicroSum]], map-side
  * partials of labels×dim longs) — the canonical O(N·d) → O(labels·d)
  * reduction without exploding rows. The outlier pass joins
  * the tiny centroid table back by broadcast and scores each vector in the
  * scan; the only corpus-sized shuffle is the per-label ranking window over
  * narrow (label, id, score) rows.
  */
object Clustering {

  /** Per-label exact-integer centroids: (label, n, centroid array<double>).
    * One hash aggregate over WHOLE vectors via the native
    * [[graft.functions.expressions.VectorMicroSum]] — map-side partials are
    * labels×dim long-vectors, so the shuffle is O(labels·d) instead of the
    * exploded twin's rows×d element rows — with identical micro-quantized
    * integer arithmetic, so the result is bit-equal under any partitioning.
    */
  def labelCentroids(
      emb: DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame =
    // null embeddings are expected input (matching meanPool/momentSums):
    // drop them BEFORE the aggregate so `n` counts only the vectors
    // VectorMicroSum actually summed — otherwise centroids deflate and an
    // all-null label emits an (label, n>0, null) row instead of vanishing
    emb.filter(col(vecCol).isNotNull)
      .groupBy(col(labelCol).as("label"))
      .agg(
        count(lit(1)).as("n"),
        graft.functions.expressions.VectorSumAgg.vectorMicroSum(col(vecCol)).as("sx"))
      .select(col("label"), col("n"),
        transform(col("sx"), x => x.cast("double") / (col("n") * 1e6)).as("centroid"))

  /** Chunk→document embedding pooling: the elementwise exact-integer mean
    * of each group's vectors — what a pipeline runs after chunk-level
    * embedding to get one document vector (or per-cluster/per-label
    * prototypes). Same micro-quantized arithmetic as [[labelCentroids]],
    * but computed by the native [[graft.functions.expressions.VectorMicroSum]]
    * aggregate: one hash aggregate over WHOLE vectors with map-side
    * combine (`groups × dim` longs shuffle), instead of the exploded
    * twin's `rows × dim` element shuffle + collect_list reassembly.
    * Integer addition is order-independent, so the result is bit-identical
    * to [[labelCentroids]] and the DuckDB oracle under any partitioning.
    * Output: (`groupCol`, n, pooled array<double>).
    */
  def meanPool(
      chunks: DataFrame,
      groupCol: String = "doc_id",
      vecCol: String = "embedding"): DataFrame =
    chunks.filter(col(vecCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        graft.functions.expressions.VectorSumAgg.vectorMicroSum(col(vecCol)).as("sx"),
        count(lit(1)).as("n"))
      .select(col(groupCol), col("n"),
        transform(col("sx"), s => s.cast("double") / (col("n") * 1e6)).as("pooled"))

  /** Deterministic distributed Lloyd k-means over the embedding column —
    * the trainer for the IVF coarse quantizer ([[IvfIndex.write]]'s
    * `trainIters` dial) and a standalone clustering operator. No RNG
    * anywhere: initialization is the repo's lowest-id convention
    * ([[Similarity.collectCentroids]]), assignment is the native
    * nearest-centroid argmax by cosine with ties to the lowest cid, and
    * each update is the exact-integer scaled mean ([[labelCentroids]]'
    * arithmetic), so any partitioning — and the DuckDB oracle — reproduces
    * the centroids bit-for-bit. A cluster that loses every member keeps
    * its previous centroid (count 0) instead of being reseeded, keeping
    * the iteration a pure function of the corpus.
    *
    * Scale shape per iteration: one corpus scan (the assignment is a
    * scan-stage compiled expression, nlist-independent codegen) + ONE
    * hash aggregate on cid over whole vectors (native
    * [[graft.functions.expressions.VectorMicroSum]], map-side partials of
    * k·d longs) — O(N·d) → O(k·d) without exploding rows — and a k-row
    * collect; centroids stay driver-resident like every coarse-quantizer
    * consumer here (k <= 4096).
    *
    * Returns the final centroids and the member counts of the assignment
    * that PRODUCED them (the last update's; retained empty clusters count
    * 0).
    */
  private[graft] def kmeansTrain(
      emb: DataFrame,
      k: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): (Array[(Long, Array[Double], Double)], Map[Long, Long]) = {
    require(k >= 1, "k must be >= 1")
    require(iters >= 1, "iters must be >= 1")
    // same null contract as labelCentroids: a null vector would land in a
    // null-cid group whose sx is null and NPE the driver-side update read.
    // Seeding reads the SAME filtered frame — a null vector among the k
    // lowest ids must not reach collectCentroids' element decode either.
    val nonNull = emb.filter(col(vecCol).isNotNull)
    var cents = Similarity.collectCentroids(nonNull, k, idCol, vecCol)
    var counts: Map[Long, Long] = cents.map(_._1 -> 0L).toMap
    val base = nonNull
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        l2Norm(col(vecCol)).as("nrm"))
    for (_ <- 0 until iters) {
      val assigned = base.withColumn("cid", Similarity.centroidAssignExpr(cents))
      // centroid update on the native vector aggregate: ONE hash aggregate
      // on cid whose map-side partials are k·d long-vectors — the shuffle
      // carries O(k·d) rather than the exploded rows×d — with the exact
      // same micro-quantized integer arithmetic (floor(x·1e6 + 0.5) summed
      // as longs) the exploded twin used, so centroids stay bit-identical
      // under any partitioning and the existing oracle replays unchanged
      val rows = assigned.groupBy(col("cid"))
        .agg(
          graft.functions.expressions.VectorSumAgg.vectorMicroSum(col("v")).as("sx"),
          count(lit(1)).as("n"))
        .collect()
      val updated = rows.map { r =>
        val sx = r.getSeq[Long](1)
        val n = r.getLong(2)
        val cv = new Array[Double](sx.length)
        var acc = 0.0
        var i = 0
        while (i < cv.length) {
          cv(i) = sx(i).toDouble / (n * 1e6)
          acc += cv(i) * cv(i)
          i += 1
        }
        r.getLong(0) -> ((cv, math.sqrt(acc)))
      }.toMap
      val newCounts = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
      cents = cents.map { case (cid, oldCv, oldNrm) =>
        updated.get(cid) match {
          case Some((cv, nrm)) => (cid, cv, nrm)
          case None => (cid, oldCv, oldNrm)
        }
      }
      counts = cents.map { case (cid, _, _) => cid -> newCounts.getOrElse(cid, 0L) }.toMap
    }
    (cents, counts)
  }

  /** [[kmeansTrain]] as a relation: one row per (cluster, dimension) —
    * (cid, pos, x, n) with `x` the centroid element and `n` the last
    * update's member count. Scalar rows rather than an array column so the
    * result is directly hash-comparable against the oracle.
    */
  def kmeansCentroids(
      emb: DataFrame,
      k: Int = 4,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (cents, counts) = kmeansTrain(emb, k, iters, idCol, vecCol)
    cents.toSeq.flatMap { case (cid, cv, _) =>
      cv.zipWithIndex.map { case (x, pos) => (cid, pos.toLong, x, counts(cid)) }
    }.toDF("cid", "pos", "x", "n")
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

  /** Exact corpus covariance of the embedding coordinates — the d x d
    * second-moment summary under PCA/whitening/drift analyses, emitted as
    * the upper triangle (pos_i <= pos_j): (pos_i, pos_j, cov, n).
    *
    * One pass, one aggregate: each row contributes its d(d+1)/2
    * upper-triangle products as a single array, elementwise-summed by the
    * native [[graft.functions.expressions.VectorMicroSum]] aggregate
    * (micro-quantized longs — order-independent integer addition, so any
    * partitioning and the DuckDB oracle agree bit-for-bit), alongside the
    * plain coordinate sums for the mean correction. The shuffle is ONE
    * buffer of d(d+1)/2 + d longs — never `rows x d^2` exploded elements,
    * and nothing about it grows with the corpus.
    *
    * cov = E[x_i x_j] - E[x_i] E[x_j], each expectation from the
    * quantized integer sums, rounded to 9 dp.
    */
  def covariance(emb: DataFrame, vecCol: String = "embedding"): DataFrame =
    covarianceFromSums(momentSums(emb, vecCol))

  /** The corpus second-moment sums covariance derives from, as ONE
    * aggregate row (pp: upper-triangle micro-product sums, sx: micro
    * element sums, n, d). Every component is an exact integer sum —
    * ADDITIVE across any partition of the corpus, which is what the
    * streaming fold ([[graft.streaming.EmbStats]]) builds on: summing
    * per-batch moment rows elementwise equals the one-shot aggregate
    * bit-for-bit.
    */
  private[graft] def momentSums(emb: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val d = size(v)
    val tri = flatten(transform(sequence(lit(0), d - 1), i =>
      transform(sequence(i, d - 1), j =>
        element_at(v, (i + 1).cast("int")).cast("double") *
          element_at(v, (j + 1).cast("int")).cast("double"))))
    emb.filter(v.isNotNull).agg(
      graft.functions.expressions.VectorSumAgg.vectorMicroSum(tri).as("pp"),
      graft.functions.expressions.VectorSumAgg.vectorMicroSum(v).as("sx"),
      count(lit(1)).as("n"),
      max(d).as("d"))
  }

  /** The covariance relation from a (pp, sx, n, d) moment row — the exact
    * division/rounding the one-shot [[covariance]] has always used.
    */
  private[graft] def covarianceFromSums(agg: DataFrame): DataFrame = {
    // re-derive the (i, j) labels in the exact order the triangle was
    // flattened, zip them back onto the aggregated sums, and explode
    val ij = flatten(transform(sequence(lit(0), col("d") - 1), i =>
      transform(sequence(i, col("d") - 1), j =>
        struct(i.cast("long").as("i"), j.cast("long").as("j")))))
    val denom = col("n").cast("double") * lit(1e6)
    agg.select(col("n"), col("sx"),
        posexplode(arrays_zip(ij.as("ij"), col("pp").as("pq"))).as(Seq("t", "z")))
      .select(
        col("z.ij.i").as("pos_i"), col("z.ij.j").as("pos_j"),
        round(col("z.pq").cast("double") / denom
          - (element_at(col("sx"), (col("z.ij.i") + 1).cast("int")).cast("double") / denom)
            * (element_at(col("sx"), (col("z.ij.j") + 1).cast("int")).cast("double") / denom),
          9).as("cov"),
        col("n"))
  }

  /** Top principal component by `iters` deterministic power iterations on
    * [[covariance]]'s exact second-moment matrix — PCA as a corpus
    * operator. The corpus-sized work is the ONE covariance aggregate; the
    * d x d matrix is then driver-resident (bounded, the same contract as
    * the k-means centroids) and each iteration is a d^2 mat-vec with the
    * iterate re-quantized to micro units after normalization — every
    * arithmetic step is sequential and integer-anchored, so the DuckDB
    * oracle replays all `iters` rounds bit-for-bit.
    *
    * Convergence is the caller's dial, not a promise: `iters` rounds of
    * power iteration (the k-means `iters` contract); on near-isotropic
    * corpora the eigengap is small and the direction is a deterministic
    * partial iterate — which is exactly what the oracle checks. Output:
    * (pos, loading, lambda_micro) — loading is the quantized unit
    * iterate, lambda_micro = floor(||C v|| * 1e6 + 0.5) from the final
    * round (the power-iteration estimate of the top eigenvalue, micro
    * units).
    */
  def pcaPower(emb: DataFrame, iters: Int = 8, vecCol: String = "embedding"): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = emb.sparkSession
    val m = covarianceMatrix(emb, vecCol)
    val (v, lambdaMicro) = powerIterate(m, iters)
    import spark.implicits._
    v.toSeq.zipWithIndex.map { case (x, i) => (i.toLong, x, lambdaMicro) }
      .toDF("pos", "loading", "lambda_micro")
  }

  /** Top-k principal components by HOTELLING DEFLATION over the same
    * driver-resident exact covariance [[pcaPower]] iterates on: component
    * c is `iters` power rounds on `C_c`, then `C_{c+1} = C_c − λ v vᵀ`
    * using the QUANTIZED pair (λ in micro units, v the micro-quantized
    * unit iterate) — every arithmetic step stays sequential and
    * integer-anchored, so the oracle replays all k·iters rounds plus each
    * deflation bit-for-bit. Corpus work is unchanged: still the single
    * covariance aggregate; deflation is a driver-side d² update per
    * component (d bounded, same contract as the k-means centroids).
    *
    * Output: (component, pos, loading, lambda_micro) — one d-row block per
    * component, lambda_micro non-increasing in expectation (deflation
    * removes the dominant direction; with a finite-`iters` partial
    * iterate the residual matrix is what the oracle checks, not
    * convergence).
    */
  def pcaTopK(
      emb: DataFrame,
      nComponents: Int = 2,
      iters: Int = 8,
      vecCol: String = "embedding"): DataFrame =
    pcaTopKOf(emb.sparkSession, covarianceMatrix(emb, vecCol), nComponents, iters)

  /** The deflation chain over an already-materialized covariance matrix —
    * shared by [[pcaTopK]] and the streamed-moments path. NOTE: deflation
    * mutates `m`.
    */
  private[graft] def pcaTopKOf(
      spark: SparkSession,
      m: Array[Array[Double]],
      nComponents: Int,
      iters: Int): DataFrame = {
    import spark.implicits._
    pcaComponents(m, nComponents, iters).flatMap { case (c, v, lambdaMicro) =>
      v.zipWithIndex.map { case (x, i) => (c.toLong, i.toLong, x, lambdaMicro) }
    }.toDF("component", "pos", "loading", "lambda_micro")
  }

  /** The raw deflation chain: (component, quantized unit loadings, λ in
    * micro units) per component. NOTE: deflation mutates `m`.
    */
  private def pcaComponents(
      m: Array[Array[Double]],
      nComponents: Int,
      iters: Int): Seq[(Int, Array[Double], Long)] = {
    require(nComponents >= 1, "nComponents must be >= 1")
    require(iters >= 1, "iters must be >= 1")
    val d = m.length
    require(nComponents <= d, s"nComponents $nComponents exceeds dimension $d")
    (0 until nComponents).map { c =>
      val (v, lambdaMicro) = powerIterate(m, iters)
      // deflate with the quantized (λ, v) the component REPORTS — the
      // subtraction is then a pure function of emitted values, which is
      // what lets the SQL oracle replay it exactly
      val lam = lambdaMicro.toDouble / 1e6
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { m(i)(j) -= lam * v(i) * v(j); j += 1 }
        i += 1
      }
      (c, v, lambdaMicro)
    }
  }

  /** PCA WHITENING: each vector's centered projection onto the top-k
    * deflation components, scaled to unit variance — `w_c = (x − μ)·v_c /
    * sqrt(λ_c)` — the standard embedding preprocessing before clustering /
    * semantic dedup (it stops dominant directions from swamping cosine).
    * One corpus aggregate (the same moment sums covariance uses: μ comes
    * from the SAME integer element sums) + one scan-local projection pass;
    * components and mean are driver-resident literals, so the projection
    * is a codegen'd per-row fold with NO shuffle and no second corpus
    * aggregate. Every arithmetic step (micro-quantized μ, quantized
    * loadings, index-order fold, round 9) is engine-exact, so the oracle
    * replays the whole chain.
    *
    * Output: one row per (id, component) — (idCol, component, w).
    */
  def pcaWhiten(
      emb: DataFrame,
      nComponents: Int = 2,
      iters: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    // ONE corpus aggregate: collect the moment row, derive covariance,
    // mean, and the deflation chain from it on the driver
    val momRow = momentSums(emb, vecCol).collect().head
    val n = momRow.getAs[Long]("n")
    require(n > 0, "pcaWhiten needs a non-empty corpus")
    val sx = momRow.getSeq[Long](momRow.fieldIndex("sx"))
    val d = momRow.getAs[Int]("d")
    val mean = sx.map(_.toDouble / (n * 1e6)).toArray
    val momDf = {
      import spark.implicits._
      Seq((momRow.getSeq[Long](momRow.fieldIndex("pp")), sx, n, d))
        .toDF("pp", "sx", "n", "d")
    }
    val comps = pcaComponents(matrixOf(covarianceFromSums(momDf)), nComponents, iters)
    val adj = zip_with(col(vecCol), lit(mean),
      (x, mu) => x.cast("double") - mu)
    val perComp = comps.map { case (c, v, lambdaMicro) =>
      require(lambdaMicro > 0L,
        s"component $c has zero variance — cannot whiten along it")
      val lam = lambdaMicro.toDouble / 1e6
      struct(lit(c.toLong).as("component"),
        round(
          aggregate(zip_with(adj, lit(v), (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x) / math.sqrt(lam),
          9).as("w"))
    }
    emb.select(col(idCol), explode(array(perComp: _*)).as("z"))
      .select(col(idCol), col("z.component").as("component"), col("z.w").as("w"))
  }

  /** [[covariance]] collected into the driver-resident full matrix. */
  private def covarianceMatrix(emb: DataFrame, vecCol: String): Array[Array[Double]] =
    matrixOf(covariance(emb, vecCol))

  /** A (pos_i, pos_j, cov) upper-triangle relation as the full symmetric
    * driver-resident matrix — shared by the batch PCA entrypoints and the
    * streamed-moments path ([[graft.streaming.EmbStats.pcaTopK]]).
    */
  private[graft] def matrixOf(cov: DataFrame): Array[Array[Double]] = {
    val tri = cov.select(col("pos_i"), col("pos_j"), col("cov")).collect()
    require(tri.nonEmpty, "PCA needs a non-empty corpus")
    val d = (tri.map(_.getLong(1)).max + 1).toInt
    val m = Array.ofDim[Double](d, d)
    tri.foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt; val c = r.getDouble(2)
      m(i)(j) = c; m(j)(i) = c
    }
    m
  }

  /** `iters` deterministic power rounds on `m` from the canonical
    * `1/sqrt(d)` start: (quantized unit iterate, λ in micro units) —
    * the shared kernel of [[pcaPower]] and [[pcaTopK]].
    */
  private def powerIterate(
      m: Array[Array[Double]], iters: Int): (Array[Double], Long) = {
    val d = m.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lastNrm = 0.0
    for (_ <- 1 to iters) {
      val y = new Array[Double](d)
      var i = 0
      while (i < d) {
        var sum = 0.0
        var j = 0
        while (j < d) { sum += m(i)(j) * v(j); j += 1 }
        y(i) = sum
        i += 1
      }
      var sq = 0.0
      i = 0
      while (i < d) { sq += y(i) * y(i); i += 1 }
      lastNrm = math.sqrt(sq)
      v = y.map(x => math.floor(x / lastNrm * 1e6 + 0.5).toLong / 1e6)
    }
    (v, math.floor(lastNrm * 1e6 + 0.5).toLong)
  }
}
