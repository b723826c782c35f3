package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Known-answer and invariant pins for the UniMax waterfilling
  * allocation (Chung et al. 2023). The closed form under test:
  * a_d = min(E·n_d, L) with L set so Σ a_d = B, found via the
  * integer-exact saturation prefix. */
class UnimaxSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-computed waterfilling: caps 20/40/60/80, budget 190") {
    // E=2, n=[10,20,30,40] -> caps [20,40,60,80], T=100, B=|_19T/10_|=190.
    // Saturation prefix: 20·4=80<=190, 40·3+20=140<=190, 60·2+60=180<=190,
    // 80·1+120=200>190 -> L=(190-120)/1=70 -> alloc [20,40,60,70].
    val census = Seq(("a", 10L), ("b", 20L), ("c", 30L), ("d", 40L))
      .toDF("source", "n_tokens")
    val out = TextAnalysis.unimaxAllocOf(census).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Int]("saturated"), r.getAs[Double]("allocated"),
          r.getAs[Double]("epochs"))).toMap
    assert(out("a") == ((1, 20.0, 2.0)))
    assert(out("b") == ((1, 40.0, 2.0)))
    assert(out("c") == ((1, 60.0, 2.0)))
    assert(out("d") == ((0, 70.0, 1.75)))
  }

  test("uniform domains never saturate: everyone gets the fair share") {
    // equal caps: B/D = 1.9·n < cap = 2·n for every domain
    val census = (1 to 5).map(i => (s"s$i", 100L)).toDF("source", "n_tokens")
    val out = TextAnalysis.unimaxAllocOf(census).collect()
    assert(out.forall(_.getAs[Int]("saturated") == 0))
    assert(out.forall(_.getAs[Double]("allocated") == 190.0))
    assert(out.forall(_.getAs[Double]("epochs") == 1.9))
  }

  test("invariants on the registered corpus: budget exhausted, cap respected") {
    val dir = "/root/testdata/sf0.001"
    val rows = TextAnalysis.unimaxMix(spark, dir).collect()
    assert(rows.nonEmpty)
    val totTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val budget = TextAnalysis.UnimaxBudgetNum * totTokens /
      TextAnalysis.UnimaxBudgetDen
    val allocated = rows.map(_.getAs[Double]("allocated")).sum
    // Σ alloc = B up to the 2dp output rounding of each row
    assert(math.abs(allocated - budget) < 0.01 * rows.length)
    rows.foreach { r =>
      assert(r.getAs[Double]("epochs") <= TextAnalysis.UnimaxEpochCap + 1e-9)
      assert(r.getAs[Double]("allocated") <=
        r.getAs[Long]("cap").toDouble + 1e-6)
      // saturated <=> pinned at exactly the epoch cap
      assert((r.getAs[Int]("saturated") == 1) ==
        (math.abs(r.getAs[Double]("epochs") - 2.0) < 1e-9))
    }
    // the waterline is a single level: every unsaturated row allocates
    // the same amount
    val levels = rows.filter(_.getAs[Int]("saturated") == 0)
      .map(_.getAs[Double]("allocated")).distinct
    assert(levels.length <= 1)
  }
}
