package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene guards — the invariants the driver's correctness
  * gate assumes but nothing previously enforced at test time:
  *
  *  - every registered query has a DuckDB oracle (the board is 100%
  *    oracle-checked; a new query without an oracle row would silently
  *    land as a weaker rows-only check);
  *  - no oracle exists without its query (a dangling oracle is dead
  *    SQL the gate never exercises);
  *  - names follow the `q_*`/`wc_*` convention the tooling greps on.
  */
class RegistryConsistencySpec extends AnyFunSuite {

  test("every registered query has an oracle; no oracle dangles") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    val missing = queries -- oracles
    assert(missing.isEmpty,
      s"queries without a DuckDB oracle: ${missing.toSeq.sorted.mkString(", ")}")
    val dangling = oracles -- queries
    assert(dangling.isEmpty,
      s"oracles without a registered query: ${dangling.toSeq.sorted.mkString(", ")}")
  }

  test("query names follow the grep-able conventions") {
    val bad = SparkEntry.queries.keySet
      .filterNot(n => n.startsWith("q_") || n.startsWith("wc_") ||
        n.matches("q\\d+_.*"))
    assert(bad.isEmpty, s"unconventional names: ${bad.toSeq.sorted.mkString(", ")}")
  }

  test("registry is at least the round-7 size (no silent shrinkage)") {
    assert(SparkEntry.queries.size >= 171,
      s"registry shrank to ${SparkEntry.queries.size}")
  }
}
