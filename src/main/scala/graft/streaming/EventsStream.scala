package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed state for [[EventsStream.userRunningTotals]]. */
final case class UserTotals(
    user_id: Long,
    n_events: Long,
    total_value: Double,
    last_seen_us: Long)

/** Structured Streaming surface over the `events` table — the streaming
  * twins of the batch queries in [[graft.operators.EventsOps]]. The
  * transforms are declared once on (streaming) DataFrames; Catalyst plans
  * the incremental stateful execution, watermarks bound the state.
  *
  * The reference has no data-plane streaming (its TCP loop is phase
  * control, `asio_client/main.cpp:50-77` — SURVEY.md §2.2), so this
  * module is designed from Spark idioms: file-source → watermark →
  * windowed/stateful agg → sink.
  *
  * State posture at scale: every aggregation below is keyed by
  * (bounded window × group key), and the watermark lets Spark evict
  * state for closed windows — state size is O(open windows × keys),
  * independent of stream length.
  */
object EventsStream {

  /** Bounded file-source stream over the events parquet in an sf
    * directory (the file source wants a directory, so `dir` is the sf
    * root and a glob filter picks the table) — `maxFilesPerTrigger`
    * paces replay. The stream source needs an explicit schema; PROBE the
    * file's batch schema instead of hard-coding one, because the
    * generator has shipped `ts` as both INT64 TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across driver rounds — then apply the same
    * per-type normalization as `Tables.events` so every downstream
    * streaming transform sees TimestampType either way. The probe makes
    * this throw at PLAN time when `events.parquet` is absent (the old
    * hard-coded schema deferred the failure to the first micro-batch) —
    * fail-fast at the loader is the intended behavior. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val fileSchema = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(dir).schema
    graft.sources.Tables.normalizeTs(
      spark.readStream
        .schema(fileSchema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Streaming twin of `EventsOps.hourlyTypeCounts`: tumbling 1-hour
    * windows per event type, 2-hour watermark for late data. */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Native session windows (30-min inactivity gap) per user — the
    * streaming analog of the batch lag→flag→cumsum sessionization in
    * `EventsOps.userSessions`, using Spark's built-in `session_window`
    * state machine instead of the window-function idiom (which needs the
    * whole per-user history and so only exists in batch). */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("session_value"))

  /** Streaming deduplication: drop repeated `event_id`s across
    * micro-batches, state bounded by the watermark (an event older than
    * the watermark can never collide again, so its key is evicted) —
    * the streaming twin of exact dedup, and the standard
    * exactly-once-ification of an at-least-once ingest. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicates("event_id", "ts")

  /** Custom keyed state via `flatMapGroupsWithState`: a per-user running
    * profile (event count, value sum, last-seen timestamp) re-emitted on
    * every update — the template for state Spark's built-in windows can't
    * express (counters, sessions with custom close rules, ML feature
    * state). State is one small case class per user with a processing-
    * time TTL, so the store stays O(active users) at any stream length. */
  def userRunningTotals(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "value", "unix_micros(ts) AS ts_us")
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (userId, rows, state: GroupState[UserTotals]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0, Long.MinValue))
            val next = rows.foldLeft(prev) { (acc, r) =>
              UserTotals(userId, acc.n_events + 1, acc.total_value + r._2,
                math.max(acc.last_seen_us, r._3))
            }
            state.update(next)
            state.setTimeoutDuration("1 hour")
            Iterator.single(next)
          }
      }
      .toDF()
  }

  /** Attribution horizon for [[clickPurchaseAttribution]]. */
  val AttributionWindow = "INTERVAL 1 HOUR"

  /** STREAM-STREAM interval join — the attribution staple: every
    * (click, purchase) pair by the same user where the purchase lands
    * within [[AttributionWindow]] at-or-after the click. Both sides are
    * the same watermarked stream (a stream self-join), and the join
    * condition carries explicit time bounds, which is what makes it
    * scale: the bounds + watermark tell Spark exactly how long a
    * buffered row can still match, so each side's join state is evicted
    * after watermark + horizon — O(in-flight interval), independent of
    * stream length. Without the time bounds the state would grow
    * forever, which Spark rejects for append output. */
  def clickPurchaseAttribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(AttributionWindow))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("value"))
  }

  /** Demo main: replays an events directory as a bounded stream and runs
    * the hourly aggregation to completion (AvailableNow), printing the
    * final row count. `args(0)` = sf dir (default sf0.001). */
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = hourlyTypeCounts(readEvents(spark, dir))
      .writeStream
      .format("memory")
      .queryName("hourly")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    println(s"hourly rows: ${spark.table("hourly").count()}")
    spark.stop()
  }
}
