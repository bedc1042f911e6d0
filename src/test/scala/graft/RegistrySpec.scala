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
    // non-SQL-expressible ops, rows-only at the driver gate — each must
    // carry its correctness in a spec instead (listed explicitly so a
    // forgotten oracle still fails here):
    //   t20: BPE merge learning is an iterative driver-side loop (BpeSpec)
    val rowsOnly = Set("t20_bpe_tokens")
    val ungated = q -- o -- rowsOnly
    assert(ungated.isEmpty, s"queries without an oracle (weak rows-only check): $ungated")
    assert((rowsOnly -- q).isEmpty, s"stale rows-only allowlist: ${rowsOnly -- q}")
  }
}
