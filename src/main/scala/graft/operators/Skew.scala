package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large-x-large equi-joins: salted key replication.
  *
  * A shuffle join sends every row of a key to ONE reducer; a hot key (one
  * user with 10^9 events, one domain with half the crawl) makes that
  * reducer the whole job's critical path. Salting splits each key into
  * `salts` sub-keys — fact rows take a deterministic salt in [0, salts) and
  * the dim side replicates each row across ALL `salts` sub-keys — so a hot
  * key's rows spread over `salts` reducers while the join stays exact.
  * This is the manual form of what AQE's OptimizeSkewedJoin does for
  * sort-merge plans at runtime; the salted form also covers shuffle-hash
  * joins and pre-bucketed layouts AQE cannot re-split, and it composes with
  * downstream aggregation (the partial aggregate runs on the already-spread
  * partitions).
  *
  * Dim-side cost is `salts`x replication — size `salts` to the observed
  * skew factor (tens), never to the partition count.
  */
object Skew {

  /** Exact inner equi-join of `fact` to `dim` on `key`, executed over
    * salted sub-keys. `saltBy` must be a deterministic per-row integral
    * column of `fact` (any stable id works — it only spreads rows, it never
    * reaches the output); the result is row-identical to the plain join.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltBy: Column,
      salts: Int = 32): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // coalesce: pmod(null) = null would match NO dim salt, silently dropping
    // fact rows whose saltBy is NULL even when their join key is non-null —
    // salt 0 keeps them joinable (slightly hotter reducer 0 is acceptable;
    // a NULL spread column is a caller smell, not a correctness event)
    val f = fact.withColumn("__salt",
      coalesce(pmod(saltBy.cast("long"), lit(salts.toLong)), lit(0L)))
    val d = dim.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    // hint a shuffle-hash join: salting exists FOR the shuffle-join case —
    // were the dim side broadcast-able there would be no skew to fix (and
    // no shuffle of the fact side at all)
    f.join(d.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }
}
