package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Data-constrained epoching greedy on a hand-computable census: the
  * value-ordered prefix under the 5/2 budget, the (value DESC, source,
  * epoch) tie-break, and the decayed effective-token accounting. */
class EpochMixSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("greedy fills the budget in slot-value order with decay") {
    // census: a=1000, b=500, c=100 → total 1600, budget = 5*1600/2 = 4000
    // slot order: a1(v1000,cum1000) a2(v500,cum2000) b1(v500,cum2500)
    //   a3(v250,cum3500) b2(v250,cum4000=budget) | a4(v125,cum5000) cut
    val census = Seq(("a", 1000L), ("b", 500L), ("c", 100L))
      .toDF("source", "n_tokens")
    val out = TextAnalysis.epochAllocOf(census).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") == ((1000L, 3L, 3000L, 1750L))) // 1000+500+250
    assert(out("b") == ((500L, 2L, 1000L, 750L))) // 500+250
    assert(out("c") == ((100L, 0L, 0L, 0L))) // below the cut line
  }

  test("a lone domain gets exactly ⌊budget/n⌋ = 2 epochs at the 5/2 ratio") {
    // slots cost n each; cum e·n ≤ 2.5n admits e = 2 — the prefix rule
    // made arithmetic
    val census = Seq(("solo", 1000L)).toDF("source", "n_tokens")
    val out = TextAnalysis.epochAllocOf(census).collect().head
    assert(out.getLong(2) == 2L) // epochs
    assert(out.getLong(3) == 2000L) // tokens
    assert(out.getLong(4) == 1500L) // 1000 + 500 effective
  }

  test("sweep allocations are monotone in the budget dial") {
    val census = Seq(("a", 1000L), ("b", 500L), ("c", 100L))
      .toDF("source", "n_tokens")
    val rows = TextAnalysis.epochSweepOf(census).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(3)).toMap
    val budgets = TextAnalysis.EpochSweepPct.sorted
    for (Seq(lo, hi) <- budgets.sliding(2); s <- Seq("a", "b", "c"))
      assert(rows((lo, s)) <= rows((hi, s)),
        s"budget $lo -> $hi not monotone for $s")
    // the registered 250 arm of the sweep equals the standalone greedy
    val standalone = TextAnalysis.epochAllocOf(census).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    Seq("a", "b", "c").foreach(s => assert(rows((250L, s)) == standalone(s)))
    // the starvation arm is live: 75% budget leaves some domain at zero
    assert(Seq("a", "b", "c").exists(s => rows((75L, s)) == 0L))
  }

  test("registered budget is data-constrained: epochs differ by domain size") {
    val out = TextAnalysis.epochMix(spark, "/root/testdata/sf0.001").collect()
    val epochs = out.map(_.getLong(2)).toSet
    assert(out.forall(_.getLong(2) >= 1L)) // every domain trains at least once
    assert(epochs.size > 1, s"degenerate allocation: $epochs")
    // budget compliance: Σ tokens_alloc ≤ 5/2 · Σ unique_tokens
    val totalUnique = out.map(_.getLong(1)).sum
    val totalAlloc = out.map(_.getLong(3)).sum
    assert(totalAlloc <= 5L * totalUnique / 2L)
  }
}
