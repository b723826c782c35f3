package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Streaming LAYOUT INGEST — the streaming twin of the z-order add
  * path ([[graft.operators.Layout.zorderIngest]]): arriving events
  * route to their clustered block with the SAME frozen row-local
  * z-prefix the snapshot was written with — one narrow projection, no
  * bounds retraining, no state, no watermark (STATELESS: exactly-once
  * under any restart via the file-sink manifest). The
  * `partitionBy("blk")` parquet sink appends per-trigger delta files
  * beside the snapshot — the small-file debris whose fold-up is
  * exactly `q_layout_compaction`'s operator, and whose footer extents
  * join the manifest union `q_zorder_ingest` audits.
  *
  * Parity contract: the routing expression is [[Layout.zValue]]'s
  * integer shift/mask interleave verbatim — pure integer arithmetic,
  * so stream ≡ batch is exact, not empirical (`EventsStreamSpec` pins
  * row-for-row equality and that delta files land only in blk= dirs
  * the batch routing names). */
object LayoutStream {

  /** One narrow row-local projection: (event_id, user_id, value, blk). */
  def routeToBlocks(events: DataFrame): DataFrame = {
    val a = pmod(col("user_id"), lit(1L << Layout.ZBits)).cast("long")
    val b = least(floor(col("value") / 2.0),
      lit((1 << Layout.ZBits) - 1).cast("double")).cast("long")
    events.select(col("event_id"), col("user_id"), col("value"),
      shiftright(Layout.zValue(a, b), Layout.ZPrefixShift).as("blk"))
  }
}
