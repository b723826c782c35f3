package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Profiling

/** Streaming DATA-QUALITY GATE — the streaming twin of
  * [[graft.operators.Profiling.constraintSuite]]: arriving fact rows
  * validated against the broadcast dimension as they land, violation
  * counters cumulative per constraint. The production shape of a
  * Deequ-style suite on an ingest feed: the batch suite certifies a
  * snapshot, this certifies the STREAM — same predicates, so a row the
  * batch suite would flag is flagged at ingest time instead of at the
  * next nightly audit.
  *
  * Kernel sharing is structural: the five row-local predicates are the
  * SAME Column objects as the batch report's ([[Profiling.RowChecks]]),
  * evaluated after the same broadcast `c_present` dimension join. The
  * batch-only residue is exactly the uniqueness NDV check — corpus-
  * scoped by nature; its streaming analog (watermarked dropDuplicates)
  * is a different state contract and is covered by the dedup twins.
  *
  * State: ONE row per constraint (5 total) in the running aggregate —
  * complete-mode output over a constraint-keyed count is the textbook
  * bounded-state monitor, audited in `GovernStreamSpec` alongside the
  * stream ≡ batch parity pin. */
object GovernStream {

  /** Parquet schema of the orders table for the file source. */
  val orderSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType)))

  /** Bounded file-source stream over the orders table at a testdata
    * root: points at the `orders.parquet` PATH itself so both shapes
    * stream — a single file (the driver's fixtures) and a Spark-written
    * directory of part files (a glob filter on the parent would match
    * only the single-file shape and silently yield an empty stream for
    * the directory shape). */
  def readOrders(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(orderSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir + "/orders.parquet")

  /** Cumulative per-constraint violation counters over an arriving
    * orders stream: the broadcast dimension join, then one explode of
    * the shared check predicates into (check_name, violated) coordinates
    * and a constraint-keyed running count — 5 state rows forever. */
  def constraintMonitor(newOrders: DataFrame, custKeys: DataFrame): DataFrame = {
    val flagged = Profiling.withCustPresent(newOrders, custKeys)
      .select(explode(array(Profiling.RowChecks.map { case (name, target, pred) =>
        struct(lit(name).as("check_name"), lit(target).as("target"),
          pred.cast("boolean").as("violated"))
      }: _*)).as("c"))
      .select(col("c.check_name").as("check_name"),
        col("c.target").as("target"), col("c.violated").as("violated"))
    flagged.groupBy("check_name", "target")
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("violated"), 1L).otherwise(0L)).as("n_violations"))
  }
}
