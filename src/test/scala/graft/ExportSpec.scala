package graft

import graft.operators.{Export, Sampling}
import org.apache.spark.sql.functions._

/** Training-export shard packing: round-robin deal over the deterministic
  * shuffle order. Checks the invariants a training job relies on — balance,
  * within-shard order, manifest consistency, and independence from input
  * partitioning.
  */
class ExportSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("round-robin deal: balanced shards, dense within-shard order, consistent manifest") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = docs.count()
    val assigned = Export.shardAssign(docs, nShards = 8)
      .select("doc_id", "position", "shard", "shard_pos", "n_tokens").collect()
    assert(assigned.length == n, "every document is dealt exactly once")

    // shard = (position-1) % 8, shard_pos dense from 1 within each shard
    assert(assigned.forall(r => r.getLong(2) == (r.getLong(1) - 1) % 8))
    val byShard = assigned.groupBy(_.getLong(2))
    assert(byShard.size == 8 && byShard.values.map(_.length).max
      - byShard.values.map(_.length).min <= 1, "round-robin balances doc counts to +-1")
    byShard.values.foreach { rs =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to rs.length),
        "within-shard positions are dense from 1")
    }

    // manifest aggregates the same deal
    val man = Export.shardManifest(docs, nShards = 8).orderBy(col("shard")).collect()
    assert(man.length == 8)
    man.foreach { m =>
      val rs = byShard(m.getLong(0))
      assert(m.getLong(1) == rs.length, "manifest n_docs")
      assert(m.getLong(2) == rs.map(_.getLong(4)).sum, "manifest n_tokens")
      assert(m.getLong(3) == rs.minBy(_.getLong(3)).getLong(0), "manifest head-of-order doc")
    }
  }

  test("assignment is partitioning-independent and seed-sensitive") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "shard", "shard_pos").orderBy(col("doc_id")).collect().toSeq
    val base = rows(Export.shardAssign(docs, 8))
    assert(rows(Export.shardAssign(docs.repartition(7), 8)) == base,
      "shard deal must not depend on input partitioning")
    assert(rows(Export.shardAssign(docs, 8, seed = "other")) != base,
      "a different seed is an independent permutation")
  }

  test("position equals the flat shufflePosition contract") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val viaExport = Export.shardAssign(docs, 8)
      .select("doc_id", "position").orderBy(col("doc_id")).collect().toSeq
    val direct = Sampling.shufflePosition(docs)
      .select("doc_id", "position").orderBy(col("doc_id")).collect().toSeq
    assert(viaExport == direct)
  }

  test("token-balanced snake deal: tighter token spread than round-robin, counts still +-1") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bal = Export.shardAssignTokenBalanced(docs, nShards = 8)
      .select("doc_id", "position", "shard", "shard_pos", "n_tokens").collect()
    assert(bal.length == docs.count(), "every document is dealt exactly once")

    // snake shape: position rank is token-desc; even rounds deal 0..7,
    // odd rounds 7..0; shard_pos = round+1
    bal.foreach { r =>
      val p0 = r.getLong(1) - 1
      val expect = if ((p0 / 8) % 2 == 0) p0 % 8 else 7 - p0 % 8
      assert(r.getLong(2) == expect && r.getLong(3) == p0 / 8 + 1)
    }
    val byShard = bal.groupBy(_.getLong(2))
    assert(byShard.values.map(_.length).max - byShard.values.map(_.length).min <= 1,
      "snake deal still balances doc counts to +-1")

    // the point of the operator: per-shard TOKEN mass is much tighter than
    // the round-robin deal's on a heterogeneous corpus
    def spread(rows: Array[org.apache.spark.sql.Row]) = {
      val sums = rows.groupBy(_.getLong(2)).values.map(_.map(_.getLong(4)).sum)
      sums.max - sums.min
    }
    val rr = Export.shardAssign(docs, nShards = 8)
      .select("doc_id", "position", "shard", "shard_pos", "n_tokens").collect()
    assert(spread(bal) < spread(rr),
      s"snake spread ${spread(bal)} must beat round-robin ${spread(rr)}")
    // folded dealing over a sorted order stays within ~one max-doc of even
    assert(spread(bal) <= bal.map(_.getLong(4)).max,
      "snake spread should be bounded by the largest document")

    // deterministic under repartitioning
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "shard", "shard_pos").orderBy(col("doc_id")).collect().toSeq
    assert(rows(Export.shardAssignTokenBalanced(docs.repartition(7), 8)) ==
      rows(Export.shardAssignTokenBalanced(docs, 8)))
  }

  test("grouped deal: per-group rank equals the group's flat rank, shards never mix groups") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("grp", concat(lit("g"), pmod(col("doc_id"), lit(3L))))
    val dealt = Export.shardAssignGrouped(docs, nShards = 4, groupCol = "grp")
      .select("grp", "doc_id", "position", "shard", "shard_pos", "n_tokens").collect()
    assert(dealt.length == docs.count(), "every document is dealt exactly once")

    dealt.groupBy(_.getString(0)).foreach { case (g, rs) =>
      // within the group: position is the flat per-group shufflePosition
      // (hierarchical rank restricted to the group's rows), shard
      // round-robin over it, doc counts balanced to +-1
      val flat = Sampling.shufflePosition(docs.filter(col("grp") === g))
        .select("doc_id", "position").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      rs.foreach { r =>
        assert(r.getLong(2) == flat(r.getLong(1)),
          s"group $g doc ${r.getLong(1)}: grouped rank must equal the group-restricted flat rank")
        assert(r.getLong(3) == (r.getLong(2) - 1) % 4 &&
          r.getLong(4) == (r.getLong(2) - 1) / 4 + 1)
      }
      val byShard = rs.groupBy(_.getLong(3))
      assert(byShard.values.map(_.length).max - byShard.values.map(_.length).min <= 1,
        s"group $g: per-group deal balances to +-1")
    }
    // the property the train/test export needs: a (group, shard) cell is
    // single-group by construction — shard ids repeat across groups but
    // the deal never routes two groups into one group's cell
    assert(dealt.map(r => (r.getString(0), r.getLong(3))).distinct.length == 3 * 4)
  }
}
