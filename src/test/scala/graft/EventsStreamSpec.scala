package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.operators.EventsOps
import graft.streaming.EventsStream

/** Batch/stream equivalence on a bounded replay of the sf0.001 events
  * table: the streaming hourly aggregation (complete mode, AvailableNow)
  * must produce exactly the batch result — same windows, same counts,
  * same rounded sums.
  */
class EventsStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("streaming hourly counts == batch hourly counts on bounded input") {
    val dir = "/root/testdata/sf0.001"
    val q = EventsStream.hourlyTypeCounts(
        EventsStream.readEvents(spark, dir))
      .writeStream
      .format("memory")
      .queryName("hourly_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val streamed = spark.table("hourly_test").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val batch = EventsOps.hourlyTypeCounts(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("file sink + checkpoint: restart resumes exactly-once, no dupes") {
    import java.nio.file.Files
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft-stream-sink").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    def runOnce(): Unit = {
      val q = EventsStream.readEvents(spark, dir)
        .select("event_id", "user_id", "value")
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000L)
    }
    runOnce()
    // second run with the same checkpoint: the source offsets are
    // committed, so NOTHING should be reprocessed or duplicated
    runOnce()
    val sunk = spark.read.parquet(out)
    val expected = graft.sources.Tables.events(spark, dir).count()
    assert(sunk.count() == expected)
    assert(sunk.select("event_id").distinct().count() == expected)
  }

  test("backlog catch-up: files landing between runs process incrementally") {
    // the production backfill flow: a staging directory accumulates
    // files; each AvailableNow run drains exactly the files that landed
    // since the last committed offset — no reprocessing, no gaps
    import java.nio.file.Files
    val dir = "/root/testdata/sf0.001"
    val staging = Files.createTempDirectory("graft-stage").toString
    val out = Files.createTempDirectory("graft-stage-out").toString
    val ckpt = Files.createTempDirectory("graft-stage-ckpt").toString
    val base = graft.sources.Tables.events(spark, dir)
      .select("event_id", "user_id", "value")
    val half1 = base.filter(org.apache.spark.sql.functions.col("event_id") % 2 === 0)
    val half2 = base.filter(org.apache.spark.sql.functions.col("event_id") % 2 === 1)
    def drain(): Unit = {
      val q = spark.readStream.schema(base.schema).parquet(staging)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000L)
    }
    half1.write.mode("append").parquet(staging)
    drain()
    assert(spark.read.parquet(out).count() == half1.count())
    // new files land; the next run must pick up ONLY those
    half2.write.mode("append").parquet(staging)
    drain()
    val sunk = spark.read.parquet(out)
    assert(sunk.count() == base.count())
    assert(sunk.select("event_id").distinct().count() == base.count())
  }

  test("stream-stream interval join == the batch attribution join") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val q = EventsStream.clickPurchaseAttribution(
        EventsStream.readEvents(spark, dir))
      .writeStream
      .format("memory")
      .queryName("attr_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val streamed = spark.table("attr_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch twin: the same inner interval join on the static table
    val ev = graft.sources.Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    val batch = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(EventsStream.AttributionWindow))
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming dedup collapses a doubled stream to the distinct events") {
    val dir = "/root/testdata/sf0.001"
    val src = EventsStream.readEvents(spark, dir)
    val q = EventsStream.dedupedEvents(src.unionByName(src))
      .groupBy()
      .count()
      .writeStream
      .format("memory")
      .queryName("dedup_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val streamed = spark.table("dedup_test").collect().head.getLong(0)
    val batch = graft.sources.Tables.events(spark, dir)
      .select("event_id").distinct().count()
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState running totals converge to the batch totals") {
    val dir = "/root/testdata/sf0.001"
    val q = EventsStream.userRunningTotals(
        EventsStream.readEvents(spark, dir))
      .writeStream
      .format("memory")
      .queryName("totals_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    // append mode emits one row per (user, microbatch); the LAST state
    // per user must equal the batch aggregate
    val last = spark.table("totals_test").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(rows => rows.maxBy(r => (r.getLong(1), r.getLong(3)))).toMap
    val batch = graft.sources.Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("value").as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(last.keySet == batch.keySet)
    last.foreach { case (u, row) =>
      assert(row.getLong(1) == batch(u)._1)
      assert(math.abs(row.getDouble(2) - batch(u)._2) < 1e-6)
    }
  }

  test("streaming session windows: totals conserve events and value per user") {
    val dir = "/root/testdata/sf0.001"
    val q = EventsStream.userSessions(
        EventsStream.readEvents(spark, dir))
      .writeStream
      .format("memory")
      .queryName("sessions_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val perUser = spark.table("sessions_test").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val batchTotals = graft.sources.Tables.events(spark, dir)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUser == batchTotals)
  }

  test("streaming z-order layout ingest: routing == batch, delta files land " +
      "in the batch-named blk dirs") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft-zingest").toString
    val q = graft.streaming.LayoutStream.routeToBlocks(
        EventsStream.readEvents(spark, dir))
      .writeStream
      .format("parquet")
      .partitionBy("blk")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/chk")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val streamed = spark.read.parquet(s"$out/data").collect()
      .map(r => (r.getLong(0), r.getAs[Number]("blk").longValue())).toMap
    val batch = graft.streaming.LayoutStream.routeToBlocks(
        graft.sources.Tables.events(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    // exact routing parity, row for row (integer interleave, not float)
    assert(streamed == batch && batch.nonEmpty)
    // physical layout: delta files live only under blk= dirs the batch names
    val dirs = new java.io.File(s"$out/data").listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("blk=")).map(_.stripPrefix("blk=").toLong).toSet
    assert(dirs == batch.values.toSet)
  }
}
