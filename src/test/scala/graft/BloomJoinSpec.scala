package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ScaleTechniques
import graft.sources.Tables

/** Invariants of the relational Bloom runtime-filter join that the
  * DuckDB oracle (which checks only end-result equality) can't see:
  * zero false negatives at the filter itself, and an actual fact-side
  * reduction — the property that makes the technique worth its probes.
  */
class BloomJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def dim = Tables.orders(spark, dir)
    .filter(col("o_totalprice") > 400000)
    .select("o_orderkey")

  test("bloom filter admits every true key (no false negatives)") {
    val bits = ScaleTechniques.bloomBuild(dim)
    val missed = dim.crossJoin(broadcast(bits))
      .filter(!ScaleTechniques.bloomMightContain(col("o_orderkey")))
      .count()
    assert(missed == 0L)
  }

  test("bloom prune shrinks the fact side ahead of the join") {
    val fact = Tables.lineitem(spark, dir).select("l_orderkey")
    val bits = ScaleTechniques.bloomBuild(dim)
    val kept = fact.crossJoin(broadcast(bits))
      .filter(ScaleTechniques.bloomMightContain(col("l_orderkey")))
      .count()
    val trueHits = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .count()
    val total = fact.count()
    assert(kept < total / 2, s"prune kept $kept of $total")
    // false-positive slack stays small at this fill factor
    assert(kept >= trueHits)
    assert(kept - trueHits <= total / 20,
      s"fp rows ${kept - trueHits} of $total")
  }

  test("bloom-pruned join equals the plain join exactly") {
    val fact = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice")
    val d = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000)
      .select("o_orderkey", "o_orderpriority")
    val pruned = ScaleTechniques
      .bloomPrunedJoin(fact, d, "l_orderkey", "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("s"))
      .collect().map(_.toString).sorted.toSeq
    val plain = fact.join(d, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("s"))
      .collect().map(_.toString).sorted.toSeq
    assert(pruned == plain)
  }
}
