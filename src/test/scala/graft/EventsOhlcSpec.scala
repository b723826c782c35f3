package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventsOps

/** OHLC downsampling on a constructed event log where every candle is
  * hand-computable: open/close must select by (ts, event_id) order —
  * including the same-timestamp tie broken by event_id — and high/low/
  * volume/total are the plain aggregates. */
class EventsOhlcSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("candles select open/close by (ts, event_id) and aggregate the rest") {
    val events = Seq(
      // one hour, one type: open 10 (earliest), close 40 (latest)
      (1L, ts("2024-01-01 09:05:00"), 1L, "click", 10.0, "{}"),
      (2L, ts("2024-01-01 09:20:00"), 1L, "click", 50.0, "{}"),
      (3L, ts("2024-01-01 09:40:00"), 1L, "click", 5.0, "{}"),
      (4L, ts("2024-01-01 09:55:00"), 1L, "click", 40.0, "{}"),
      // same-timestamp tie: event_id 5 opens, event_id 6 closes
      (5L, ts("2024-01-01 10:30:00"), 2L, "view", 7.0, "{}"),
      (6L, ts("2024-01-01 10:30:00"), 2L, "view", 9.0, "{}"),
      // a second type in hour 09 keeps its own candle
      (7L, ts("2024-01-01 09:10:00"), 3L, "view", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft-ohlc").toString
    events.write.parquet(s"$dir/events.parquet")
    val out = EventsOps.ohlcResample(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7)))).toMap
    assert(out(("2024-01-01 09:00", "click")) ==
      ((10.0, 50.0, 5.0, 40.0, 4L, 105.0)))
    assert(out(("2024-01-01 10:00", "view")) == ((7.0, 9.0, 7.0, 9.0, 2L, 16.0)))
    assert(out(("2024-01-01 09:00", "view")) == ((3.0, 3.0, 3.0, 3.0, 1L, 3.0)))
    assert(out.size == 3)
  }

  test("registered query: candles cover every (hour, type) of the log") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = EventsOps.ohlcResample(spark, dir)
    val expected = graft.sources.Tables.events(spark, dir)
      .select(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00")
        .as("hour"), col("event_type")).distinct().count()
    assert(out.count() == expected)
    // candle invariants: low <= open/close <= high, volume >= 1
    assert(out.filter(col("low") > col("open") || col("low") > col("close") ||
      col("high") < col("open") || col("high") < col("close") ||
      col("volume") < 1).count() == 0)
  }
}
