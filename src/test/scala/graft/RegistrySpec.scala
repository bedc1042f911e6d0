package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract registry is a flatMap-merge of the query packs —
  * a duplicate name across packs would silently drop one pack's query
  * (Map semantics), and a dangling oracle records a hard FAIL in the
  * driver's gate. Both are pinned here. */
class RegistrySpec extends AnyFunSuite {

  test("pack query names are globally unique (no silent map override)") {
    val all = SparkEntry.packs.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query names across packs: $dups")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle refers to an existing query, and counts line up") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val dangling = o -- q
    assert(dangling.isEmpty, s"oracles without a query (driver gate FAIL): $dangling")
    // EVERY query carries an oracle — the rows-only allowlist is empty
    // since round 8 (t20's encode stage is replayed by a recursive-CTE
    // DuckDB encoder over the learned merge table; training correctness
    // stays in BpeSpec).
    val ungated = q -- o
    assert(ungated.isEmpty, s"queries without an oracle (weak rows-only check): $ungated")
  }
}
