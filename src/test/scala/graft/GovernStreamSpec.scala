package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiling
import graft.streaming.GovernStream

/** Streaming data-quality gate: stream ≡ batch on every row-local
  * constraint (the predicates are shared Column objects, this pins the
  * plumbing around them), and the monitor's state is 5 rows forever
  * while the input grows. */
class GovernStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def writeOneFile(df: DataFrame, dest: Path): Unit = {
    val tmp = Files.createTempDirectory("graft-gov-stage").toString + "/out"
    df.coalesce(1).write.parquet(tmp)
    val part = Files.list(Paths.get(tmp))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    Files.move(part, dest)
  }

  test("stream ≡ batch on the row-local constraints; state stays at 5 rows") {
    // the planted fact, split into 3 arriving files
    val planted = Profiling.plantedOrders(
      graft.sources.Tables.orders(spark, dir))
    val in = Files.createTempDirectory("graft-gov-in")
    val parts = planted.withColumn("part", pmod(col("o_orderkey"), lit(3)))
    (0 until 3).foreach { p =>
      writeOneFile(parts.filter(col("part") === p).drop("part"),
        in.resolve(s"b$p.parquet"))
    }
    val cust = graft.sources.Tables.customer(spark, dir).select("c_custkey")
    val ckpt = Files.createTempDirectory("graft-gov-ckpt").toString
    val q = GovernStream.constraintMonitor(
        spark.readStream.schema(GovernStream.orderSchema)
          .option("maxFilesPerTrigger", "1").parquet(in.toString),
        cust)
      .writeStream.format("memory").queryName("gov_mon")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000L)
    val got = spark.table("gov_mon").collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // batch reference: the registered report on the same planted fact
    val want = Profiling.constraintReportOf(planted, cust).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == want.keySet - "uniqueness") // the batch-only check
    got.foreach { case (name, (checked, viol)) =>
      assert((checked, viol) == want(name), s"constraint $name diverged")
      }
    // bounded state: one row per constraint
    val state = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      .map(_.stateOperators.map(_.numRowsTotal).sum)
    assert(state.nonEmpty)
    state.foreach(s => assert(s <= 5L, s"state rows grew: $state"))
  }
}
