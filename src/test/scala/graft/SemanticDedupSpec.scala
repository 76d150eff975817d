package graft

import graft.functions.VectorFunctions._
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic dedup: cluster-bounded keeper selection over the
  * embedding table. The reference for the keeper rule is recomputed here
  * with an unbounded brute-force pair scan restricted to the operator's own
  * cluster assignment — so the spec checks the RULE (drop iff a smaller-id
  * τ-neighbor shares the cluster), not a re-implementation of the plan.
  */
class SemanticDedupSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val tau = 0.42

  test("keeper rule matches a brute-force within-cluster reference; every vector decided once") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = Similarity.semanticDedup(emb, tau).orderBy(col("vec_id")).collect()
    assert(out.length == emb.count(), "one decision per input vector")
    assert(out.map(_.getLong(0)).distinct.length == out.length, "no duplicated ids")

    // brute-force reference over the operator's own (id, cid) assignment
    val assigned = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = emb.select(col("vec_id").cast("long"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ids = vecs.keys.toSeq.sorted
    val wantDropped = ids.filter { a =>
      ids.exists(b => b < a && assigned(b) == assigned(a) && cos(vecs(a), vecs(b)) >= tau)
    }.toSet
    val gotDropped = out.filter(!_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(gotDropped == wantDropped,
      s"keeper rule mismatch: extra=${gotDropped -- wantDropped} missing=${wantDropped -- gotDropped}")
    assert(gotDropped.nonEmpty, "fixture must exercise the drop path at this threshold")

    // the smallest id of every cluster can have no smaller-id neighbor
    val minPerCluster = assigned.groupBy(_._2).map { case (_, m) => m.keys.min }.toSet
    assert(out.filter(r => minPerCluster.contains(r.getLong(0))).forall(_.getBoolean(2)),
      "cluster-minimum ids are always kept")
  }

  test("decisions are partitioning-independent") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("vec_id")).collect().toSeq
    assert(rows(Similarity.semanticDedup(emb, tau)) ==
      rows(Similarity.semanticDedup(emb.repartition(7), tau)),
      "semantic dedup must not depend on input partitioning")
  }
}
