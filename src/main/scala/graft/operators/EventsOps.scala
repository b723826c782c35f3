package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Batch analytics over the `events` stream table: time bucketing,
  * sessionization, semi-structured (JSON) extraction. The same transforms
  * run unchanged under Structured Streaming (graft.streaming.EventsStream)
  * — the point of declaring them on DataFrames.
  */
object EventsOps {

  /** Tumbling-hour aggregation. Batch twin of the streaming windowed agg;
    * hour is emitted as a string so the oracle compare is precision-proof
    * (events.ts is nanosecond parquet — Spark truncates to micros). */
  def hourlyTypeCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("hour", "event_type")

  /** Gap-based sessionization (30-min inactivity boundary), the classic
    * lag→flag→cumsum pattern. Per-user windows shuffle once on user_id;
    * at scale the state is bounded per key, never global. */
  def userSessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val ev = Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        // exact integer microseconds in both engines (epoch_us in DuckDB):
        // second-granularity unix_timestamp would disagree at gap boundaries
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ev.groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("session_value"))
      .groupBy("user_id")
      .agg(max(col("session_seq")).as("n_sessions"),
        round(avg(col("n_events")), 2).as("avg_events_per_session"),
        round(sum(col("session_value")), 2).as("total_value"))
      .orderBy("user_id")
  }

  /** Semi-structured extraction: pull `k` out of the JSON `props` column
    * and histogram it. Spark side uses the JSON path reader; the oracle
    * uses a regex — same values, engine-native implementations. */
  def propsKeyHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"))
      .orderBy("k")

  /** Per-type daily event funnel with conversion-style ratios. */
  def dailyTypeShare(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val byDay = Window.partitionBy("day")
    daily
      .withColumn("day_total", sum(col("n")).over(byDay))
      .withColumn("share", round(col("n") / col("day_total"), 4))
      .select("day", "event_type", "n", "share")
      .orderBy("day", "event_type")
  }
}
