package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static contract checks on the driver interface — a typo'd oracle
  * key silently downgrades a query to the weaker rows-only check, so
  * the map invariants are pinned here where they fail loudly.
  */
class SparkEntrySpec extends AnyFunSuite {

  /** The only queries allowed to ship without a DuckDB oracle: the
    * engine-specific sketches whose exact output is not portable.
    */
  private val rowsOnlyByDesign = Set("x_approx_distinct", "x_approx_percentiles")

  test("every oracle key names a registered query (no orphaned oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("every query has an oracle, except the documented rows-only sketches") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == rowsOnlyByDesign,
      s"queries silently downgraded to rows-only: ${missing -- rowsOnlyByDesign}; " +
      s"sketches unexpectedly gaining oracles: ${rowsOnlyByDesign -- missing}")
  }

  test("oracle SQL carries no tz-converting timestamp constructors") {
    // to_timestamp returns TIMESTAMPTZ in DuckDB and casting it
    // converts through the HOST session TimeZone — an oracle using it
    // false-fails the gate on any non-UTC box (found live on
    // x_hopping_window; naive epoch interval arithmetic is the
    // replacement)
    val offenders = SparkEntry.oracleSql.collect {
      case (k, sql) if sql.toLowerCase.contains("to_timestamp") => k
    }
    assert(offenders.isEmpty, s"tz-dependent oracle SQL in: $offenders")
  }

  test("query names follow the ref_/x_ naming contract") {
    val bad = SparkEntry.queries.keySet.filterNot(n =>
      n.startsWith("ref_") || n.startsWith("x_"))
    assert(bad.isEmpty, s"unprefixed query names: $bad")
  }
}
