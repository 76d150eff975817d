package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's correctness gate hashes each `SparkEntry.queries` result
  * against DuckDB running the matching `SparkEntry.oracleSql` entry. A query
  * without an oracle only gets a weak rows-only check, and an oracle without
  * a query is dead SQL — both are wiring mistakes, so pin exact key parity.
  */
class EntryParitySpec extends AnyFunSuite {

  test("every query has an oracle SQL entry, and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    info(s"${q.size} queries / ${o.size} oracles")
    assert(
      (o -- q).isEmpty,
      s"oracle entries without a query: ${(o -- q).toSeq.sorted.mkString(", ")}")
    assert(
      (q -- o).isEmpty,
      s"queries without an oracle: ${(q -- o).toSeq.sorted.mkString(", ")}")
  }

  test("query count matches the documented count (README/COVERAGE say 210)") {
    // Bump this alongside README.md and COVERAGE.md when adding a query —
    // the docs are the audit trail and must not drift from the code.
    assert(SparkEntry.queries.size == 210,
      s"documented 210 queries but SparkEntry.queries has ${SparkEntry.queries.size}")
  }
}
