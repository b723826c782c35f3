package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.EventsStream

/** Pins `Tables.normalizeTs`'s two-vintage dispatch on BOTH physical
  * encodings the driver's generator has shipped for `events.ts` —
  * INT64 nanos surfaced as BIGINT (via the nanosAsLong legacy flag) and
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) read as TIMESTAMP_NTZ —
  * through the batch loader and the streaming reader. The current
  * testdata is the micros vintage, so without this test the legacy
  * nanos branch is only exercised if the generator flips back. Also
  * pins the loud-failure contract for an unexpected ts type. */
class TsVintageSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Epoch-micros fixture values (µs-aligned, as the generator writes). */
  private val micros = Seq(0L, 999999L, 1723500000000000L, 1723503600000000L)

  private def rows: DataFrame =
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, i.toLong % 2, "click", 1.5 * i, us) }
      .toDF("event_id", "user_id", "event_type", "value", "us")

  /** Write `df` as a single FILE named events.parquet under a fresh dir
    * (the generator's layout — the streaming reader's pathGlobFilter
    * matches the file name, so a directory-table would not be seen). */
  private def writeVintage(df: DataFrame): String = {
    val root = java.nio.file.Files.createTempDirectory("ts_vintage")
    val tmp = java.nio.file.Files.createTempDirectory("ts_vintage_stage").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, root.resolve("events.parquet"))
    root.toString
  }

  private lazy val nanosDir = writeVintage(
    rows.select(col("event_id"), col("user_id"), col("event_type"),
      col("value"), (col("us") * 1000L).as("ts")))

  private lazy val ntzDir = writeVintage(
    rows.select(col("event_id"), col("user_id"), col("event_type"),
      col("value"), timestamp_micros(col("us")).cast("timestamp_ntz").as("ts")))

  private def batchMicros(dir: String): Seq[Long] =
    Tables.events(spark, dir)
      .select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq

  test("batch loader: both vintages normalize to identical timestamps") {
    assert(Tables.events(spark, nanosDir).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(batchMicros(nanosDir) == micros.sorted)
    assert(batchMicros(ntzDir) == micros.sorted)
  }

  private def streamMicros(dir: String, name: String): Seq[Long] = {
    val q = EventsStream.readEvents(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).select("us").as[Long].collect().sorted.toSeq
  }

  test("streaming reader: both vintages normalize to identical timestamps") {
    assert(streamMicros(nanosDir, "vintage_nanos") == micros.sorted)
    assert(streamMicros(ntzDir, "vintage_ntz") == micros.sorted)
  }

  test("an unexpected ts type fails loudly at the loader") {
    val bad = rows.select(col("event_id"), col("us").cast("string").as("ts"))
    val e = intercept[IllegalStateException](Tables.normalizeTs(bad))
    assert(e.getMessage.contains("unexpected type"))
  }
}
