package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** The file-level zone-map audit (`q_zorder_pruning_files`): footer
  * statistics must equal the scanned truth, and the audit itself must
  * touch no data rows beyond the footer read. */
class ZorderFilesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("footer extents equal scanned per-block extents exactly") {
    val path = Layout.ensureZorderBlocks(spark, dir) + "/zorder"
    val footer = Layout.parquetFooterExtents(spark, path)
      .groupBy("blk")
      .agg(min("min_u").as("min_u"), max("max_u").as("max_u"),
        min("min_v").as("min_v"), max("max_v").as("max_v"),
        sum("n_rows").as("n_rows"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
      .toMap
    val scanned = spark.read.parquet(path)
      .groupBy("blk")
      .agg(min("user_id").as("min_u"), max("user_id").as("max_u"),
        min("value").as("min_v"), max("value").as("max_v"),
        count(lit(1)).as("n_rows"))
      .collect()
      .map(r => r.getAs[Int]("blk").toLong ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
      .toMap
    assert(footer == scanned)
    assert(footer.nonEmpty)
  }

  test("z-prefix blocks give each file a bounded curve segment") {
    val path = Layout.ensureZorderBlocks(spark, dir) + "/zorder"
    // every row's z-prefix equals its file's blk directory — the write
    // routed rows correctly, which is what makes the footer audit mean
    // something
    val a = pmod(col("user_id"), lit(1L << Layout.ZBits)).cast("long")
    val b = least(floor(col("value") / 2.0),
      lit((1 << Layout.ZBits) - 1).cast("double")).cast("long")
    val bad = spark.read.parquet(path)
      .withColumn("expected_blk",
        shiftright(Layout.zValue(a, b), Layout.ZPrefixShift))
      .filter(col("blk") =!= col("expected_blk"))
      .count()
    assert(bad == 0L)
  }
}
