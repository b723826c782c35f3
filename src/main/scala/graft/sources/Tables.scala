package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md) plus the
  * reference-style text-corpus source.
  *
  * The reference engine's only source is a directory scan of line-oriented
  * text files (`asio_deep/main.cpp:230-234`, contract
  * `asio_deep/headers/FileProcessorBase.hpp:82-84`); [[textCorpus]] is its
  * Spark-native equivalent. The relational loaders cover the extension
  * surface mandated by BASELINE.json.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** The events table with `ts` normalized to TimestampType, whatever
    * physical type the generator wrote — see [[normalizeTs]]. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(load(spark, dir, "events"))

  /** Normalize the generator's `ts` column to TimestampType (µs). The
    * driver's generator has shipped two vintages of `events.ts`:
    * INT64 TIMESTAMP(NANOS) — which Spark's vectorized reader rejects
    * unless `spark.sql.legacy.parquet.nanosAsLong=true` surfaces it as
    * BIGINT (every entry point sets it) — and plain TIMESTAMP(MICROS,
    * isAdjustedToUTC=false), which surfaces as TIMESTAMP_NTZ. Dispatch on
    * the OBSERVED type so both vintages (and an already-normalized frame)
    * read identically:
    *  - BIGINT nanos: `div 1000` is lossless (values are µs-aligned) and
    *    matches DuckDB's epoch_us exactly;
    *  - TIMESTAMP_NTZ: cast to TimestampType interprets the wall time in
    *    the session time zone — every entry point pins UTC, so the micros
    *    value is preserved bit-exactly and DuckDB (which reads the same
    *    file as a naive timestamp) agrees on every derived epoch/bucket. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df // already normalized (or a micros vintage)
      case other => throw new IllegalStateException(
        s"events.ts has unexpected type $other — expected BIGINT nanos, " +
          "TIMESTAMP_NTZ, or TIMESTAMP; fix the loader, not the query")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Adaptive fan-out for compute-heavy narrow stages. Small inputs (a
    * single parquet row group at test SF) arrive as ONE partition, which
    * serializes expensive per-row expressions (md5 signature arrays,
    * token folds) on a single core no matter how many the machine has —
    * parquet assigns a row group to the split holding its midpoint, so
    * byte-range splitting cannot help. Repartition only when the scan
    * yields fewer partitions than total cores; at 100 TB the input
    * already has thousands of row groups and this is a no-op (no
    * shuffle is ever added on large inputs).
    *
    * The partition-count probe (`df.rdd`) forces a physical-planning
    * pass outside AQE, so its verdict is memoized per (input files,
    * target) — repeated query builds over the same table (Verify/Bench
    * run dozens) pay it once per process. */
  private val fanOutSmall = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val files = df.inputFiles
    // only file-backed frames get a meaningful cache key; an in-memory
    // frame would collide every caller on the empty key, so probe those
    // directly (they are rare and cheap to plan)
    val small =
      if (files.isEmpty) df.rdd.getNumPartitions < target
      else fanOutSmall.computeIfAbsent(files.sorted.mkString(",") + "#" + target,
        _ => df.rdd.getNumPartitions < target)
    // Round-robin on purpose, even though round-robin exchanges never
    // canonicalize equal (so self-join branches re-scan the small input
    // rather than reuse one stage): a hash-repartition on the lead key
    // was tried and benched severalfold slower on the dedup self-joins —
    // the changed partition stats flip AQE's downstream join picks,
    // which costs far more than the duplicated tiny scan saves.
    if (small) df.repartition(target) else df
  }

  /** Directory-of-text-files source, the Spark analog of the reference's
    * `FileProcessorInput` (scan + partition; SURVEY.md §2.1 #1). One row per
    * line; `file` carries provenance — the reference's aggregation-scope key
    * (`asio_deep/main.cpp:457-459` — reducers never merge across files).
    *
    * The reference's fixed 2000-line partitioning
    * (`FileProcessorInput.so → processFile`, const 2000) is an arbitrary
    * parallelism knob; Spark's input-split machinery
    * (`spark.sql.files.maxPartitionBytes`) subsumes it, and all downstream
    * operators are partition-count invariant (FIXTURES.md invariants).
    */
  def textCorpus(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.textFile(dir).toDF("line")
      .withColumn("file", input_file_name())
      .select("file", "line")
  }
}
