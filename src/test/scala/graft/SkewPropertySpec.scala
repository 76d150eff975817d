package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property: the salted join is row-identical to the plain inner join for
  * ANY key distribution (uniform, heavily skewed, keys with no dim match,
  * dim keys with no facts) and any salt count — exactness is the operator's
  * whole contract, so it gets randomized coverage, not one fixture.
  */
class SkewPropertySpec extends SparkTestBase {

  private case class Case(
      factKeys: List[Long], dimKeys: List[Long], salts: Int)

  private val genCase: Gen[Case] = for {
    nFact <- Gen.choose(0, 120)
    // skew knob: most keys drawn from a tiny hot set, the rest spread
    hot <- Gen.choose(1L, 3L)
    factKeys <- Gen.listOfN(nFact, Gen.frequency(
      (3, Gen.const(hot)), (1, Gen.choose(0L, 20L))))
    nDim <- Gen.choose(0, 12)
    dimKeys <- Gen.listOfN(nDim, Gen.choose(0L, 20L))
    salts <- Gen.oneOf(1, 2, 7, 32)
  } yield Case(factKeys, dimKeys, salts)

  test("salted join == plain join on randomized skewed inputs") {
    import spark.implicits._
    (0 until 25).foreach { i =>
      val c = genCase.pureApply(Gen.Parameters.default, Seed(7L + i))
      val fact = c.factKeys.zipWithIndex
        .map { case (k, idx) => (idx.toLong, k) }.toDF("row_id", "key")
      val dim = c.dimKeys.distinct.map(k => (k, s"tag_$k")).toDF("key", "tag")
      val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1), r.getString(2))
      val got = Skew.saltedJoin(fact, dim, "key", col("row_id"), c.salts)
        .select("row_id", "key", "tag").collect().map(key).sorted
      val want = fact.join(dim, Seq("key"))
        .select("row_id", "key", "tag").collect().map(key).sorted
      assert(got.sameElements(want),
        s"case $i (salts=${c.salts}, facts=${c.factKeys.size}, dims=${c.dimKeys.distinct.size}): " +
          s"${got.length} vs ${want.length} rows")
    }
  }

  test("NULL saltBy rows still join (salt coalesces to 0, rows are not dropped)") {
    import spark.implicits._
    // row_id NULL on two rows whose key HAS a dim match: the plain join
    // keeps them, so the salted join must too (pmod(null)=null used to
    // match no dim salt and silently drop them)
    val fact = Seq[(java.lang.Long, Long)]((1L, 10L), (null, 10L), (null, 20L), (4L, 20L))
      .toDF("row_id", "key")
    val dim = Seq((10L, "a"), (20L, "b")).toDF("key", "tag")
    val got = Skew.saltedJoin(fact, dim, "key", col("row_id"), 8)
    assert(got.count() == 4, s"expected all 4 fact rows to survive, got ${got.count()}")
    assert(got.filter(col("row_id").isNull).count() == 2)
  }
}
