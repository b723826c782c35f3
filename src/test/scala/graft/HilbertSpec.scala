package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Hilbert curve kernel + bake-off pins: the unrolled xy→d walk is a
  * BIJECTION on the full 256×256 grid (the property that makes it a
  * valid linearization), adjacent curve steps move exactly one cell
  * (the locality property the bake-off measures), and on the standard
  * box Hilbert never reads more blocks than Z-order. */
class HilbertSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val grid = {
    val n = 1 << Layout.ZBits
    val base = spark.range(n.toLong * n)
      .selectExpr("id", s"id div $n AS cx", s"id % $n AS cy",
        "CAST(0 AS BIGINT) AS hd")
    // cx/cy are the walk's WORKING registers (rotated in place);
    // original coordinates re-derive from the passed-through id
    Layout.withHilbert(base, Seq("id"))
      .selectExpr(s"id div $n AS cx", s"id % $n AS cy", "hd").cache()
  }

  test("xy→d is a bijection onto [0, n²)") {
    val n = 1 << Layout.ZBits
    val stats = grid.selectExpr("count(DISTINCT hd) AS ndv",
      "min(hd) AS lo", "max(hd) AS hi").collect().head
    assert(stats.getLong(0) == n.toLong * n)
    assert(stats.getLong(1) == 0L && stats.getLong(2) == n.toLong * n - 1)
  }

  test("consecutive curve positions are grid neighbors (unit steps)") {
    // |Δcx| + |Δcy| = 1 between d and d+1 — Hilbert's defining locality;
    // Z-order fails this at every quadrant seam. Renamed right leg: a
    // cached self-join would silently resolve both sides to the same
    // attributes and count zero steps
    val right = grid.select($"cx".as("cx2"), $"cy".as("cy2"), $"hd".as("hd2"))
    val bad = grid.join(right, $"hd" + 1 === $"hd2")
      .selectExpr("abs(cx - cx2) + abs(cy - cy2) AS step")
      .filter($"step" =!= 1).count()
    assert(bad == 0L)
  }

  test("bake-off: hilbert reads no more blocks than z-order, same matches") {
    val out = Layout.hilbertPruning(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out("hilbert")._2 == out("zorder")._2) // identical row matches
    assert(out("hilbert")._1 <= out("zorder")._1,
      s"hilbert ${out("hilbert")._1} blocks vs zorder ${out("zorder")._1}")
  }

  test("file twin: real footers agree with the prefix-block model") {
    val out = Layout.hilbertPruningFiles(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4))))
      .toMap
    // both physical layouts hold the whole table
    assert(out("hilbert_files")._3 == out("zorder_files")._3)
    // the locality claim survives the move to real files
    assert(out("hilbert_files")._2 <= out("zorder_files")._2,
      s"hilbert ${out("hilbert_files")._2} vs zorder ${out("zorder_files")._2}")
    // reruns read the published write-once layouts — row-identical
    val again = Layout.hilbertPruningFiles(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(out == again)
  }

  test("hilbert layout footers equal scanned per-block extents exactly") {
    import org.apache.spark.sql.functions._
    val path = Layout.ensureHilbertBlocks(spark, "/root/testdata/sf0.001") +
      "/hilbert"
    val footer = Layout.parquetFooterExtents(spark, path)
      .groupBy("blk")
      .agg(min("min_u").as("min_u"), max("max_u").as("max_u"),
        min("min_v").as("min_v"), max("max_v").as("max_v"),
        sum("n_rows").as("n_rows"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5))))
      .toMap
    val scanned = spark.read.parquet(path)
      .groupBy("blk")
      .agg(min("user_id").as("min_u"), max("user_id").as("max_u"),
        min("value").as("min_v"), max("value").as("max_v"),
        count(lit(1)).as("n_rows"))
      .collect()
      .map(r => r.getAs[Int]("blk").toLong ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5))))
      .toMap
    assert(footer.nonEmpty)
    assert(footer == scanned)
  }
}
