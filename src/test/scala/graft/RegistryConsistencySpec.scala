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

  /** Categories whose SURVEY row is legitimately suite-evidence-only
    * (the DataFrame→DuckDB harness cannot reach them); every other
    * category row must name at least one registered query. */
  private val SuiteOnlyCategories = Set("Streaming")

  test("SURVEY §2.3 and the registry cannot drift: categories name registered " +
      "queries, and every registered query is documented") {
    val survey = {
      val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
      try src.mkString finally src.close()
    }
    val s23 = survey.substring(
      survey.indexOf("### 2.3"),
      survey.indexOf("## 3. Query lifecycle"))
    val nameRe = "`((?:q_|wc_)[a-z0-9_]+|q\\d+_[a-z0-9_]+)`".r
    val rows = s23.linesIterator
      .filter(l => l.startsWith("| ") && !l.startsWith("| Category") &&
        !l.startsWith("|---"))
      .toSeq
    assert(rows.nonEmpty, "SURVEY §2.3 category table not found")
    val registered = SparkEntry.queries.keySet
    // (a) every category row names >= 1 REGISTERED query (or is an
    // allowlisted suite-only row that says so)
    rows.foreach { row =>
      val category = row.stripPrefix("| ").takeWhile(_ != '|').trim
      val named = nameRe.findAllMatchIn(row).map(_.group(1)).toSet
      if (SuiteOnlyCategories(category))
        assert(row.contains("suite"),
          s"suite-only category '$category' must cite its suite evidence")
      else
        assert(named.exists(registered),
          s"SURVEY §2.3 category '$category' names no registered query " +
            s"(orphaned row — mentioned: ${named.toSeq.sorted.mkString(", ")})")
    }
    // (b) no documented query is unregistered (doc rot / typo guard)
    val mentioned = nameRe.findAllMatchIn(s23).map(_.group(1)).toSet
    val rot = mentioned -- registered
    assert(rot.isEmpty,
      s"SURVEY §2.3 mentions unregistered queries: ${rot.toSeq.sorted.mkString(", ")}")
    // (c) every registered query appears in §2.3 — a new query cannot
    // land without its category row
    val undocumented = registered.filterNot(s23.contains)
    assert(undocumented.isEmpty,
      s"registered queries missing from SURVEY §2.3: " +
        s"${undocumented.toSeq.sorted.mkString(", ")}")
  }
}
