package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract: every query needs a DuckDB oracle (else the gate
  * silently degrades to a rows-only check), every oracle must name an
  * existing query, and names must be unique across packs (Map ++ would
  * silently shadow an earlier pack's entry).
  */
class SparkEntryContractSpec extends AnyFunSuite {

  // the one intentional rows-only entry: engine-native approximate
  // sketches are not hash-matchable across engines by design
  private val rowsOnly = Set("approx_stats")

  test("every query has an oracle (except the declared rows-only set)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without an oracle: ${missing.toSeq.sorted}")
  }

  test("every oracle names an existing query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: ${orphans.toSeq.sorted}")
  }

  test("query names are unique across packs") {
    val all = SparkEntry.packs.flatMap(_._1.keys)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query names across packs: ${dups.toSeq.sorted}")
  }

  test("oracle names are unique across packs") {
    val all = SparkEntry.packs.flatMap(_._2.keys)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate oracle names across packs: ${dups.toSeq.sorted}")
  }
}
