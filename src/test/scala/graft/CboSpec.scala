package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import graft.sources.Tables

/** Cost-based optimization evidence: with ANALYZE'd column statistics
  * and CBO enabled, Catalyst estimates a selective filter's output from
  * NDV stats and promotes the join build side to broadcast AT PLAN TIME
  * — the decision a 100 TB warehouse wants made before launching a
  * shuffle, complementing AQE's runtime promotion (which needs the
  * shuffle's map stage to run first). AQE is disabled throughout so the
  * static planner's choice is what's asserted.
  */
class CboSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def joins(plan: SparkPlan): Seq[String] = plan.collect {
    case _: BroadcastHashJoinExec => "broadcast"
    case _: SortMergeJoinExec => "smj"
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ANALYZE'd stats flip a selective-filter join to broadcast at plan time") {
    Tables.orders(spark, dir).write.mode("overwrite").saveAsTable("cbo_orders")
    Tables.lineitem(spark, dir).write.mode("overwrite").saveAsTable("cbo_lineitem")
    try {
      spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR ALL COLUMNS")
      spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS")
      // one order's key: the filter keeps ~1 of 1500 rows — visible to
      // the planner only through the o_orderkey NDV column statistic
      val key = spark.table("cbo_orders").select(min("o_orderkey")).head.getLong(0)
      // threshold below the UNFILTERED table's size: without column
      // stats the filter's estimate stays at table size -> sort-merge;
      // with CBO the equality selectivity (1/NDV) shrinks it -> broadcast
      val threshold = "10240" // 10 KB
      def planJoins(): Seq[String] = {
        val df = spark.table("cbo_lineitem")
          .join(spark.table("cbo_orders").filter(col("o_orderkey") === key),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderstatus").agg(sum("l_quantity"))
        joins(df.queryExecution.executedPlan)
      }
      withConfs(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> threshold,
        "spark.sql.cbo.enabled" -> "false") {
        assert(planJoins() == Seq("smj"),
          "without CBO the filtered dimension must not look broadcastable")
      }
      withConfs(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> threshold,
        "spark.sql.cbo.enabled" -> "true") {
        assert(planJoins() == Seq("broadcast"),
          "with CBO the NDV-estimated filter output must broadcast")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS cbo_orders")
      spark.sql("DROP TABLE IF EXISTS cbo_lineitem")
    }
  }
}
