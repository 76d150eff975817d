package graft

import graft.operators.{Clustering, IvfIndex, Similarity}
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means and the trained IVF coarse quantizer:
  * partitioning independence of the exact-integer updates, the
  * empty-cluster retention contract, and exhaustive-probe equality of the
  * trained index against brute force.
  */
class KmeansSpec extends SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("kmeans is partitioning-independent and counts cover the corpus") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      Clustering.kmeansCentroids(df, k = 4, iters = 2)
        .orderBy(col("cid"), col("pos")).collect().toSeq
    val a = rows(emb)
    val b = rows(emb.repartition(7))
    assert(a == b, "scaled-integer means must be bit-identical under any partitioning")
    val n = emb.count()
    val counts = a.groupBy(_.getLong(0)).map { case (_, rs) => rs.head.getLong(3) }.sum
    assert(counts == n, s"last-update member counts must cover the corpus: $counts != $n")
    // training moved at least one centroid off its lowest-id seed
    val init = Similarity.collectCentroids(emb, 4, "vec_id", "embedding")
    val trained = a.groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)).map(_.getDouble(2)).toArray)
    assert(init.exists { case (cid, cv, _) => !java.util.Arrays.equals(cv, trained(cid)) },
      "two Lloyd iterations should move the centroids")
  }

  /** The exploded centroid formulation the native aggregate replaced:
    * posexplode → (label, pos) long sums → deterministic reassembly. Kept
    * here as the bit-equality twin for the VectorMicroSum paths.
    */
  private def explodedCentroids(
      df: org.apache.spark.sql.DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding"): org.apache.spark.sql.DataFrame =
    df.select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(
        sum(floor(col("x").cast("double") * 1e6 + 0.5).cast("long")).as("sx"),
        count(lit(1)).as("n"))
      .groupBy(col("label"))
      .agg(
        max(col("n")).as("n"),
        transform(
          array_sort(collect_list(struct(col("pos"), col("sx"), col("n")))),
          t => t.getField("sx").cast("double") / (t.getField("n") * 1e6))
          .as("centroid"))

  test("native mean-pool aggregate == exploded labelCentroids twin, bit-exact under any partitioning") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def pooled(df: org.apache.spark.sql.DataFrame) =
      Clustering.meanPool(df, groupCol = "label")
        .orderBy(col("label"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toSeq)).toSeq
    val a = pooled(emb)
    val b = pooled(emb.repartition(7)) // different partial-agg merge order
    assert(a == b, "integer micro-sums must be bit-identical under any partitioning")
    // the exploded twin: posexplode → (label, pos) sums → reassembly
    val twin = explodedCentroids(emb)
      .orderBy(col("label"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toSeq)).toSeq
    assert(a == twin, "native aggregate must equal the exploded-formulation twin")
    // labelCentroids (now native itself) must match the exploded twin too,
    // including under repartitioning
    val lc = Clustering.labelCentroids(emb.repartition(7))
      .orderBy(col("label"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toSeq)).toSeq
    assert(lc == twin, "labelCentroids on VectorMicroSum must equal the exploded twin")
    // null vectors contribute nothing; a group of only nulls disappears
    val withNulls = emb.withColumn("embedding",
      when(col("vec_id") % 5 === 0, lit(null)).otherwise(col("embedding")))
    val c = pooled(withNulls)
    val twinNN = Clustering.labelCentroids(
        withNulls.filter(col("embedding").isNotNull))
      .orderBy(col("label"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toSeq)).toSeq
    assert(c == twinNN, "null vectors must be skipped, not zero-summed")
  }

  test("kmeans centroid update on VectorMicroSum == exploded-update twin, under repartitioning") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // the exploded Lloyd twin: identical init/assignment, centroid update
    // via the posexplode formulation — must be bit-equal to the native path
    def twinCentroids(df: org.apache.spark.sql.DataFrame, k: Int, iters: Int) = {
      var cents = Similarity.collectCentroids(df, k, "vec_id", "embedding")
      var counts: Map[Long, Long] = cents.map(_._1 -> 0L).toMap
      val base = df.select(col("vec_id").cast("long").as("id"), col("embedding").as("v"),
        graft.functions.VectorFunctions.l2Norm(col("embedding")).as("nrm"))
      for (_ <- 0 until iters) {
        val assigned = base.withColumn("cid", Similarity.centroidAssignExpr(cents))
        val rows = explodedCentroids(assigned, labelCol = "cid", vecCol = "v").collect()
        val updated = rows.map { r =>
          val cv = r.getSeq[Double](2).toArray
          r.getLong(0) -> ((cv, math.sqrt(cv.map(x => x * x).sum)))
        }.toMap
        val newCounts = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
        cents = cents.map { case (cid, oldCv, oldNrm) =>
          updated.get(cid).map { case (cv, nrm) => (cid, cv, nrm) }
            .getOrElse((cid, oldCv, oldNrm))
        }
        counts = cents.map { case (cid, _, _) => cid -> newCounts.getOrElse(cid, 0L) }.toMap
      }
      cents.toSeq.flatMap { case (cid, cv, _) =>
        cv.zipWithIndex.map { case (x, pos) => (cid, pos.toLong, x, counts(cid)) }
      }.sorted
    }
    val native = Clustering.kmeansCentroids(emb.repartition(7), k = 4, iters = 2)
      .orderBy(col("cid"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(native == twinCentroids(emb, 4, 2),
      "native centroid updates must be bit-identical to the exploded twin")
  }

  test("a cluster that loses every member keeps its previous centroid at count 0") {
    // ids 0 and 1 are identical vectors; both seed clusters, but every
    // point tied between them assigns to the lowest cid — cluster 1 goes
    // empty and must survive with its seed centroid
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val out = Clustering.kmeansCentroids(emb, k = 3, iters = 2)
      .orderBy(col("cid"), col("pos")).collect()
    val byCid = out.groupBy(_.getLong(0))
    assert(byCid(1L).forall(_.getLong(3) == 0L), "cluster 1 must be empty")
    assert(byCid(1L).map(_.getDouble(2)).toSeq == Seq(1.0, 0.0),
      "empty cluster must keep its seed centroid")
    assert(byCid(0L).head.getLong(3) == 3L && byCid(2L).head.getLong(3) == 2L)
  }

  test("trained quantized index: exhaustive candidate cut equals the trained exact probe") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val exact = java.nio.file.Files.createTempDirectory("graft-ivf-tq-e").toString
    val quant = java.nio.file.Files.createTempDirectory("graft-ivf-tq-q").toString
    IvfIndex.write(emb, exact, nlist = 8, trainIters = 2)
    IvfIndex.writeQuantized(emb, quant, nlist = 8, trainIters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("query_id"), col("rank")).collect().toSeq
    val want = rows(IvfIndex.probe(spark, exact, emb.filter(col("vec_id") < 5), k = 5, nprobe = 4))
    val got = rows(IvfIndex.probeQuantized(spark, quant,
      emb.filter(col("vec_id") < 5), k = 5, nprobe = 4, candFactor = 100000))
    assert(got == want,
      "exhaustive-cut quantized probe under trained centroids must equal the trained exact probe")
  }

  test("trained index with exhaustive nprobe equals brute force") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-trained").toString
    IvfIndex.write(emb, path, nlist = 8, trainIters = 2)
    val probe = IvfIndex.probe(spark, path, emb.filter(col("vec_id") < 5), k = 5, nprobe = 8)
    val brute = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos_sim"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("rank").cast("long"), col("neighbor_id"), col("cos_sim"))
        .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(rows(probe) == rows(brute),
      "exhaustive probe must be centroid-independent and equal brute force")
  }

  test("covariance: hand-computed 2-dim fixture, exact values") {
    // x = (1, 0), y = (0, 1): var = 0.25 each, cov = -0.25
    val emb = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Clustering.covariance(emb)
      .orderBy(col("pos_i"), col("pos_j")).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq ==
      Seq((0L, 0L, 0.25, 2L), (0L, 1L, -0.25, 2L), (1L, 1L, 0.25, 2L)))
  }

  test("covariance is partitioning-independent and diagonal matches exact variance") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = Clustering.covariance(emb).orderBy(col("pos_i"), col("pos_j")).collect().toSeq
    val b = Clustering.covariance(emb.repartition(13))
      .orderBy(col("pos_i"), col("pos_j")).collect().toSeq
    assert(a == b, "micro-quantized integer sums must be partitioning-independent")
    assert(a.length == 64 * 65 / 2 && a.forall(_.getLong(3) == 500L))
    // diagonal entries are variances: non-negative, and within the 1e-6
    // quantization tolerance of the exact double-precision computation
    val vecs = emb.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val diag = a.filter(r => r.getLong(0) == r.getLong(1)).map(_.getDouble(2))
    for (i <- Seq(0, 17, 63)) {
      val xs = vecs.map(_(i))
      val exact = xs.map(x => x * x).sum / xs.length - math.pow(xs.sum / xs.length, 2)
      assert(math.abs(diag(i) - exact) < 2e-6,
        s"diag($i): quantized ${diag(i)} vs exact $exact")
    }
    assert(diag.forall(_ >= 0.0), "variances must be non-negative")
  }

  test("pca power iteration: recovers a planted dominant axis exactly") {
    // all mass on the x-axis, means zero: C = [[2.5, 0], [0, 0]] exactly
    // (micro-quantization is exact on these values), so one iteration
    // lands on (1, 0) and stays there; lambda = 2.5
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)),
      (3L, Seq(2.0f, 0.0f)), (4L, Seq(-2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Clustering.pcaPower(emb, iters = 8).orderBy(col("pos")).collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((0L, 1.0), (1L, 0.0)))
    assert(out.head.getLong(2) == 2500000L, s"lambda: ${out.head.getLong(2)}")
  }

  test("pca power iteration: deterministic under repartitioning, unit iterate") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = Clustering.pcaPower(emb, iters = 8).orderBy(col("pos")).collect()
    val b = Clustering.pcaPower(emb.repartition(11), iters = 8)
      .orderBy(col("pos")).collect()
    assert(a.map(_.getDouble(1)).toSeq == b.map(_.getDouble(1)).toSeq &&
      a.head.getLong(2) == b.head.getLong(2),
      "integer-anchored iteration must be partitioning-independent")
    val nrm = math.sqrt(a.map(r => r.getDouble(1) * r.getDouble(1)).sum)
    assert(math.abs(nrm - 1.0) < 1e-4, s"iterate must be unit up to quantization: $nrm")
    assert(a.head.getLong(2) > 0L)
  }

  test("pca top-k deflation: recovers two planted orthogonal axes in order") {
    // x-mass 2.5, y-mass 0.625, zero means: C = diag(2.5, 0.625) exactly;
    // component 0 = (1,0) with lambda 2.5, the deflation zeroes the x row
    // and component 1 = (0,1) with lambda 0.625
    val emb = Seq(
      (1L, Seq(1.0f, 0.5f)), (2L, Seq(-1.0f, -0.5f)),
      (3L, Seq(2.0f, 1.0f)), (4L, Seq(-2.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    // NB: that corpus is rank-1 (y = x/2): C = [[2.5, 1.25], [1.25, 0.625]],
    // component 0 is the (2,1)/sqrt(5) direction with lambda = 3.125 and
    // the deflated matrix is ~0 everywhere — use it to check the residual
    val out = Clustering.pcaTopK(emb, nComponents = 2, iters = 16)
      .orderBy(col("component"), col("pos")).collect()
    val c0 = out.filter(_.getLong(0) == 0L)
    val dir0 = c0.map(_.getDouble(2))
    assert(math.abs(dir0(0) - 2.0 / math.sqrt(5)) < 1e-5 &&
      math.abs(dir0(1) - 1.0 / math.sqrt(5)) < 1e-5,
      s"component 0 must be the planted direction, got ${dir0.toSeq}")
    assert(math.abs(c0.head.getLong(3) - 3125000L) <= 2,
      s"lambda0 ~ 3.125: ${c0.head.getLong(3)}")
    val c1 = out.filter(_.getLong(0) == 1L)
    assert(c1.head.getLong(3) < 1000L,
      s"rank-1 corpus: deflated top eigenvalue must be ~0, got ${c1.head.getLong(3)}")
  }

  test("pca top-k: component 0 equals pcaPower; deflation is partitioning-independent") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val topk = Clustering.pcaTopK(emb, nComponents = 2, iters = 8)
      .orderBy(col("component"), col("pos")).collect()
    val single = Clustering.pcaPower(emb, iters = 8).orderBy(col("pos")).collect()
    val c0 = topk.filter(_.getLong(0) == 0L)
    assert(c0.map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq ==
      single.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq,
      "component 0 must be exactly the single-component iteration")
    val b = Clustering.pcaTopK(emb.repartition(11), nComponents = 2, iters = 8)
      .orderBy(col("component"), col("pos")).collect()
    assert(topk.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq,
      "deflation chain must be partitioning-independent")
    // components are roughly orthogonal: exact only at convergence, and 8
    // rounds on this near-isotropic synthetic corpus is a partial iterate
    // (the contract is determinism, not convergence — measured ~0.06 here)
    val v0 = c0.map(_.getDouble(2))
    val v1 = topk.filter(_.getLong(0) == 1L).map(_.getDouble(2))
    val dot = v0.zip(v1).map { case (a2, b2) => a2 * b2 }.sum
    assert(math.abs(dot) < 0.15, s"components should be roughly orthogonal: $dot")
  }

  test("pca whitening: centered unit-variance projections, partitioning-independent") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = Clustering.pcaWhiten(emb, nComponents = 2, iters = 8)
      .orderBy(col("vec_id"), col("component")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val b = Clustering.pcaWhiten(emb.repartition(11), nComponents = 2, iters = 8)
      .orderBy(col("vec_id"), col("component")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(a == b, "whitening must be bit-identical under any partitioning")
    // per component: mean ~ 0 (centered) and variance ~ 1 (scaled by the
    // component's own lambda; exact only at convergence — 8 rounds on a
    // near-isotropic corpus is a partial iterate, so tolerances are loose)
    for (c <- 0L to 1L) {
      val ws = a.filter(_._2 == c).map(_._3)
      val mu = ws.sum / ws.length
      val varw = ws.map(x => (x - mu) * (x - mu)).sum / ws.length
      assert(math.abs(mu) < 1e-3, s"component $c mean: $mu")
      assert(varw > 0.8 && varw < 1.2, s"component $c variance: $varw")
    }
    // cross-check one row against the emitted loadings/means by hand
    val comps = Clustering.pcaTopK(emb, nComponents = 2, iters = 8)
      .orderBy(col("component"), col("pos")).collect()
    val first = emb.orderBy(col("vec_id")).select(col("vec_id"), col("embedding"))
      .collect().head
    val x = first.getSeq[Float](1).map(_.toDouble)
    val nAll = emb.count()
    val sums = emb.select(
      graft.functions.expressions.VectorSumAgg.vectorMicroSum(col("embedding")))
      .collect().head.getSeq[Long](0)
    val mean = sums.map(_.toDouble / (nAll * 1e6))
    for (c <- 0 to 1) {
      val cc = comps.filter(_.getLong(0) == c.toLong).sortBy(_.getLong(1))
      val lam = cc.head.getLong(3).toDouble / 1e6
      var acc = 0.0
      for (i <- x.indices) acc += (x(i) - mean(i)) * cc(i).getDouble(2)
      val want = BigDecimal(acc / math.sqrt(lam))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      val got = a.find(r => r._1 == first.getLong(0) && r._2 == c.toLong).get._3
      assert(math.abs(got - want) < 2e-9,
        s"row 0 component $c: got $got want $want")
    }
  }

  test("jl projection: linear, deterministic, and contract-scoped (payload compression)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = Similarity.jlProject(emb, outDim = 16)
    val rows = p.orderBy(col("vec_id")).collect()
    assert(rows.length == 500 && rows.forall(_.getSeq[Double](1).length == 16))
    // deterministic under repartitioning (pure per-row fold, no model state)
    val again = Similarity.jlProject(emb.repartition(9), outDim = 16)
      .orderBy(col("vec_id")).collect()
    assert(rows.map(_.getSeq[Double](1)).toSeq == again.map(_.getSeq[Double](1)).toSeq)
    // linearity: proj(2x) == 2 * proj(x) exactly (doubles scale by powers of 2)
    val doubled = Similarity.jlProject(
      emb.withColumn("embedding",
        transform(col("embedding"), x => (x * lit(2.0f)).cast("float"))),
      outDim = 16).orderBy(col("vec_id")).collect()
    for ((r, d) <- rows.zip(doubled))
      assert(r.getSeq[Double](1).map(_ * 2.0) == d.getSeq[Double](1))
    // the guarantee JL actually gives: a planted NEAR-DUPLICATE (cosine
    // ~0.999) stays the projected-space top-1 — big margins survive the
    // eps ~ 1/sqrt(16) sketch noise; small top-k margins do NOT (measured
    // recall@5 ~0.07 on this isotropic corpus — documented in jlProject's
    // scaladoc, which is why there is deliberately no projected ANN rung)
    val base = rows.take(20).map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val planted = Similarity.jlProject(
      emb.filter(col("vec_id") === 0L)
        .withColumn("vec_id", lit(100000L))
        .withColumn("embedding",
          transform(col("embedding"), x => (x * lit(1.001f)).cast("float")))
        .unionByName(emb), outDim = 16)
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    val q = planted(100000L)
    val best = planted.filter(_._1 != 100000L).maxBy { case (_, v) => cos(q, v) }
    assert(best._1 == 0L, s"planted near-dup must be projected top-1, got ${best._1}")
  }

  test("labelCentroids and kmeans accept null vectors DIRECTLY, bit-equal to the pre-filtered twin") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // vec_id 0 is nulled: a null among the k lowest ids is exactly the
    // seeding path (collectCentroids element decode) that used to NPE
    val withNulls = emb.withColumn("embedding",
      when(col("vec_id") % 5 === 0, lit(null)).otherwise(col("embedding")))
    val filtered = withNulls.filter(col("embedding").isNotNull)
    def lc(df: org.apache.spark.sql.DataFrame) =
      Clustering.labelCentroids(df).orderBy(col("label"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toSeq)).toSeq
    assert(lc(withNulls) == lc(filtered),
      "labelCentroids on null-containing input must equal the pre-filtered twin")
    def km(df: org.apache.spark.sql.DataFrame) =
      Clustering.kmeansCentroids(df, k = 4, iters = 2)
        .orderBy(col("cid"), col("pos")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val direct = km(withNulls)
    assert(direct == km(filtered),
      "kmeans on null-containing input (null among the first k ids) must equal the pre-filtered twin")
    // the null ids must not seed: cluster ids are the lowest NON-NULL ids
    assert(direct.map(_._1).distinct.sorted == Seq(1L, 2L, 3L, 4L),
      "seeds must come from the lowest non-null vec_ids")
  }

  test("pcaWhiten on an empty corpus fails fast") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      Clustering.pcaWhiten(emb.filter(lit(false)), nComponents = 2, iters = 2).collect()
    }
    assert(e.getMessage.contains("non-empty"),
      s"empty corpus must fail with the non-empty message, got: ${e.getMessage}")
  }
}
