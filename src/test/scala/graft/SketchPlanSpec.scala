package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, TextAnalysis}

/** Plan-shape REGRESSION GUARDS for the round-7 materialization fixes —
  * the r5→r6 lesson was that lazily-shared subtrees silently multiply
  * corpus scans when someone refactors; these pin the executed shape,
  * not just the answer:
  *
  *  - the retained-result queries must plan as ONE `Scan ExistingRDD`
  *    (corpus work done at build time, storage released on retire);
  *  - the audit dataflows over materialized inputs must read ZERO
  *    parquet (every consumer on the shared frame);
  *  - heavy-hitters' sketch phase must shuffle O(P) buffers through a
  *    single-partition exchange, with the candidate set BROADCAST onto
  *    the recount — never an item-keyed corpus-wide shuffle for
  *    non-candidates.
  */
class SketchPlanSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def executedString(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.toRdd.foreachPartition(_ => ())
    df.queryExecution.executedPlan.toString
  }

  test("retained-result queries plan as a single ExistingRDD scan") {
    Seq(
      TextAnalysis.bm25Retrieve(spark, dir),
      TextAnalysis.rrfFuse(spark, dir),
      TextAnalysis.bottomKUnion(spark, dir),
      TextAnalysis.heavyHitters(spark, dir),
      Dedup.lshBandSweep(spark, dir)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Scan ExistingRDD"), plan.take(200))
      assert(!plan.contains("FileScan"),
        "retained result must not re-scan parquet:\n" + plan.take(400))
    }
  }

  test("bottom-k union audit dataflow reads zero parquet") {
    val plan = executedString(TextAnalysis.bottomKUnionPlanOf(spark, dir))
    assert(!plan.contains("FileScan parquet"), plan.take(400))
    assert(plan.contains("Scan ExistingRDD"))
  }

  test("lsh sweep audit dataflow reads zero parquet") {
    val plan = executedString(Dedup.lshBandSweepPlanOf(spark, dir))
    assert(!plan.contains("FileScan parquet"), plan.take(400))
    assert(plan.contains("Scan ExistingRDD"))
  }

  test("heavy hitters: partial/final MG through one single-partition " +
      "exchange; candidates broadcast onto the recount") {
    // the registered query returns the retained materialized result;
    // the live two-pass dataflow is audited via its PlanOf hook
    val df = TextAnalysis.heavyHittersPlanOf(spark, dir)
    val plan = executedString(df)
    assert(plan.contains("partial_misragriesaggregator"),
      "map-side MG partials missing")
    assert(plan.contains("Exchange SinglePartition"),
      "sketch merge must be a single-partition buffer exchange")
    // the candidate set must reach the recount as a broadcast build side
    assert(plan.contains("BroadcastExchange"), "candidates not broadcast")
    // and the corpus must never hash-shuffle raw items to the recount:
    // the only item-keyed exchange aggregates candidate counts (count in
    // the FINAL adaptive section only — toString repeats the initial plan)
    val finalPlan = plan.split("== Initial Plan ==").head
    val itemExchanges = "Exchange hashpartitioning\\(item".r
      .findAllIn(finalPlan).size
    assert(itemExchanges <= 1,
      s"expected at most one item-keyed exchange (candidate counts), got $itemExchanges")
  }
}
