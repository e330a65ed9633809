package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself: every query must carry an
  * oracle (the t2 gate treats an omitted key as a weaker rows-only
  * check — drift here silently downgrades correctness coverage), and
  * no oracle may reference a query that no longer exists. */
class ContractSpec extends AnyFunSuite {
  test("every SparkEntry query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
  }

  test("query names are unique across operator modules") {
    // Map ++ silently overwrites duplicate keys — a name collision
    // between modules would shadow one operator's entry entirely.
    // The module list comes from SparkEntry.modules (the same registry
    // that builds SparkEntry.queries), so a new module cannot skip this
    // guard by omission.
    val names = SparkEntry.modules.flatMap(_.queries.keys)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(names.size == SparkEntry.queries.size)
    // And the registry must actually be what SparkEntry serves.
    assert(names.toSet == SparkEntry.queries.keySet)
  }
}
