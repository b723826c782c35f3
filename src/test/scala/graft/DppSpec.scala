package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ScaleTechniques

/** Pins the dynamic-partition-pruning mechanism: the executed fact scan
  * must carry a `dynamicpruning` partition filter (the runtime
  * subquery), and the pruned result must equal the unpartitioned join.
  */
class DppSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("executed plan prunes fact partitions through the join at runtime") {
    val dir = "/root/testdata/sf0.001"
    val df = ScaleTechniques.dppRevenueByMonth(spark, dir)
    // drive THIS queryExecution so the adaptive plan is final
    df.queryExecution.toRdd.foreachPartition(_ => ())
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("dynamicpruning"),
      "fact scan must carry a dynamicpruning partition filter")
    // only the dim's 3 months survive
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1995-01", "1995-02", "1995-03"))
  }

  test("regenerated source content under the same dir is not served stale") {
    val sf = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp_stale")
      .toFile.getAbsolutePath
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.parquet(s"$tmp/lineitem.parquet")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.parquet(s"$tmp/orders.parquet")
    def items = ScaleTechniques.dppRevenueByMonth(spark, tmp)
      .agg(sum("n_items")).collect()(0).getLong(0)
    val first = items
    // regenerate the fact source in place: half the rows, same path —
    // the content-fingerprinted cache key must pick the new data up
    spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_orderkey") % 2 === 0)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val second = items
    assert(second < first,
      s"stale DPP fact cache: $second rows served after regeneration vs $first")
  }

  test("pruned result equals the unpartitioned join") {
    val dir = "/root/testdata/sf0.001"
    val got = ScaleTechniques.dppRevenueByMonth(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val li = graft.sources.Tables.lineitem(spark, dir)
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
    val dim = graft.sources.Tables.orders(spark, dir)
      .filter(col("o_orderdate").between(
        lit("1995-01-01").cast("timestamp"), lit("1995-03-31").cast("timestamp")))
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("ship_month"))
      .distinct()
    val expect = li.join(dim, "ship_month")
      .groupBy("ship_month")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("ship_month").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == expect.toSeq)
  }
}
