package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Hilbert layout ingest (`q_hilbert_ingest`): the add path must
  * preserve pruning, grow rows by exactly the batch, and write the
  * delta only into blocks the batch's frozen curve walk touches —
  * mirroring [[ZorderIngestSpec]]. */
class HilbertIngestSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("ingest preserves blocks_read, grows rows by the batch, reruns idempotent") {
    def rows() = Layout.hilbertIngest(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val r1 = rows()
    val (preBlocks, preRead, preRows) = r1("hilbert_pre")
    val (postBlocks, postRead, postRows) = r1("hilbert_post")
    assert(preRead == postRead && preBlocks == postBlocks)
    val batch = graft.sources.Tables.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("event_id") % 97 === 0).count()
    assert(postRows == preRows + batch && batch > 0)
    assert(rows() == r1)
  }

  test("delta files land only in blocks the batch's curve walk touches") {
    Layout.hilbertIngest(spark, dir).collect()
    val deltaRoot = new java.io.File(
      graft.operators.ScaleTechniques.layoutPath(dir, "events.parquet", "hdelta"),
      "hilbert").getAbsolutePath
    val deltaBlks = Layout.parquetFooterExtents(spark, deltaRoot)
      .select("blk").distinct().collect().map(_.getLong(0)).toSet
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, dir)
      .filter(col("event_id") % 97 === 0)
    val a = pmod(col("user_id"), lit(1L << Layout.ZBits)).cast("long")
    val b = least(floor(col("value") / 2.0),
      lit((1 << Layout.ZBits) - 1).cast("double")).cast("long")
    val expected = Layout.withHilbert(
        ev.select(col("event_id"), a.as("cx"), b.as("cy"), lit(0L).as("hd")),
        Seq("event_id"))
      .select(shiftright(col("hd"), Layout.ZPrefixShift).as("blk"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(deltaBlks == expected && deltaBlks.nonEmpty)
  }
}
