package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** Known-answer semantics for the as-of join composition, including the
  * inclusive tie (purchase at exactly the click's timestamp counts) and
  * the no-prior-purchase null — cases the random events data cannot be
  * relied on to exercise.
  */
class AsofJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-asof").toString
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1: purchase@10:00, click@10:30 (normal), click@10:00 (tie ->
    //   inclusive), purchase@11:00 + click@10:45 (must pick 10:00 one)
    // user 2: click with NO prior purchase -> nulls
    Seq(
      (100L, ts("2024-01-01 10:00:00"), 1L, "purchase", 5.0, "{}"),
      (101L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (102L, ts("2024-01-01 10:30:00"), 1L, "click", 1.0, "{}"),
      (103L, ts("2024-01-01 11:00:00"), 1L, "purchase", 7.0, "{}"),
      (104L, ts("2024-01-01 10:45:00"), 1L, "click", 1.0, "{}"),
      (200L, ts("2024-01-01 09:00:00"), 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      // events loader reads nanos-as-long; write micros * 1000 as long
      .withColumn("ts", org.apache.spark.sql.functions.expr("unix_micros(ts) * 1000"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("as-of join: inclusive ties, intermediate picks, and left nulls") {
    val rows = graft.operators.EventsOps.asofPriorPurchase(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    assert(rows(101L) == (Some(100L), Some(0L)))          // tie: same-ts purchase counts
    assert(rows(102L) == (Some(100L), Some(30L * 60000000L))) // 30 min gap
    assert(rows(104L) == (Some(100L), Some(45L * 60000000L))) // 11:00 purchase is later
    assert(rows(200L) == (None, None))                    // no prior purchase
  }
}
