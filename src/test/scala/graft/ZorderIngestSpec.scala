package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Z-order layout ingest (`q_zorder_ingest`): the add path must
  * preserve pruning, grow rows by exactly the batch, and write the
  * delta only into blocks the batch touches. */
class ZorderIngestSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("ingest preserves blocks_read, grows rows by the batch, reruns idempotent") {
    def rows() = Layout.zorderIngest(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val r1 = rows()
    val (preBlocks, preRead, preRows) = r1("zorder_pre")
    val (postBlocks, postRead, postRows) = r1("zorder_post")
    // pruning preserved: identical skip decision before and after
    assert(preRead == postRead && preBlocks == postBlocks)
    // rows grew by exactly the mod-97 batch
    val batch = graft.sources.Tables.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("event_id") % 97 === 0).count()
    assert(postRows == preRows + batch && batch > 0)
    // the add path is idempotent per snapshot (overwrite delta)
    assert(rows() == r1)
  }

  test("delta files land only in blocks the batch touches") {
    Layout.zorderIngest(spark, dir).collect()
    val deltaRoot = new java.io.File(
      graft.operators.ScaleTechniques.layoutPath(dir, "events.parquet", "zdelta"),
      "zorder").getAbsolutePath
    val deltaBlks = Layout.parquetFooterExtents(spark, deltaRoot)
      .select("blk").distinct().collect().map(_.getLong(0)).toSet
    // recompute the batch's expected block set relationally
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, dir)
      .filter(col("event_id") % 97 === 0)
    val a = pmod(col("user_id"), lit(1L << Layout.ZBits)).cast("long")
    val b = least(floor(col("value") / 2.0),
      lit((1 << Layout.ZBits) - 1).cast("double")).cast("long")
    val expected = ev.select(
        shiftright(Layout.zValue(a, b), Layout.ZPrefixShift).as("blk"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(deltaBlks == expected && deltaBlks.nonEmpty)
  }
}
