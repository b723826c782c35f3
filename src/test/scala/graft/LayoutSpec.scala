package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Layout
import graft.sources.Tables
import java.nio.file.Files

/** Layout-quality evidence: the z-ordered write must bound per-file
  * extents in BOTH cluster dimensions (a single-column sort leaves the
  * other dimension spanning the whole domain), and compaction must
  * shrink file counts without touching rows.
  */
class LayoutSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("zValue interleave matches a bit-twiddling reference") {
    import spark.implicits._
    def ref(a: Long, b: Long): Long =
      (0 until Layout.ZBits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val samples = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L),
      (1L, 2L), (170L, 85L), (100L, 200L))
    val got = samples.toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"))).as[Long].collect()
    samples.zip(got).foreach { case ((a, b), z) =>
      assert(z == ref(a, b), s"($a,$b)")
    }
    // 16-bit codomain, monotone corner cases
    assert(ref(255L, 255L) == (1 << (2 * Layout.ZBits)) - 1)
  }

  test("z-order bounds per-file extents in BOTH dimensions") {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
    val zPath = Files.createTempDirectory("graft-zorder").toString
    val sPath = Files.createTempDirectory("graft-usersort").toString
    Layout.zorderWrite(ev, ("user_id", "value"), 8, zPath)
    // the strawman: clustered on user_id only
    ev.repartitionByRange(8, col("user_id"))
      .write.mode("overwrite").parquet(sPath)

    // normalize by the MEASURED global span (value is heavy-tailed, so
    // a hard-coded domain would overstate pruning for every layout)
    def span(c: String): Double = {
      val r = ev.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      r.getDouble(1) - r.getDouble(0)
    }
    def avgExtent(path: String, c: String): Double = {
      val rows = Layout.fileRangeStats(spark, path, Seq("user_id", "value"))
        .select(col(s"max_$c").cast("double") - col(s"min_$c").cast("double"))
        .collect().map(_.getDouble(0))
      rows.sum / rows.length / span(c)
    }
    val zUser = avgExtent(zPath, "user_id")
    val zValue = avgExtent(zPath, "value")
    val sUser = avgExtent(sPath, "user_id")
    val sValue = avgExtent(sPath, "value")
    info(f"user-sorted: user $sUser%.3f value $sValue%.3f; z-order: user $zUser%.3f value $zValue%.3f")
    // single-column sort: tight on user, wide on value
    assert(sUser < 0.5, s"user-sorted user extent $sUser")
    assert(sValue > 0.6, s"user-sorted value extent $sValue")
    // z-order: meaningfully bounded on BOTH dimensions — the point of
    // the curve is that neither dimension pays the other's full span
    assert(zValue < 0.7 * sValue, s"zorder value extent $zValue vs $sValue")
    assert(zUser < 0.9, s"zorder user extent $zUser")
    // row conservation
    assert(spark.read.parquet(zPath).count() == ev.count())
  }

  test("compaction merges small files without changing rows") {
    val ev = Tables.events(spark, dir).select("event_id", "user_id", "value")
    val inPath = Files.createTempDirectory("graft-small").toString
    val outPath = Files.createTempDirectory("graft-compact").toString
    ev.repartition(64).write.mode("overwrite").parquet(inPath)
    def files(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files(inPath) == 64)
    Layout.compact(spark, inPath, outPath, 8L * 1024 * 1024)
    assert(files(outPath) <= 2)
    assert(spark.read.parquet(outPath).count() == ev.count())
    assert(spark.read.parquet(outPath).agg(sum("event_id")).head().getLong(0) ==
      ev.agg(sum("event_id")).head().getLong(0))
  }

  test("co-bucketed tables join with ZERO exchanges on either side") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("custkey"), col("c_name"))
    Layout.writeBucketed(orders, "t_orders_bkt", "custkey", 4)
    Layout.writeBucketed(cust, "t_cust_bkt", "custkey", 4)
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("t_orders_bkt")
        .join(spark.table("t_cust_bkt"), "custkey")
      def exchanges(p: SparkPlan): Seq[SparkPlan] =
        p.collect { case e: ShuffleExchangeExec => e }
      // the bucketed layout provides the join-key partitioning on BOTH
      // sides: the write-time shuffle replaces every run-time one
      assert(exchanges(j.queryExecution.executedPlan).isEmpty,
        j.queryExecution.executedPlan.toString)
      // answer parity with the plain (shuffling) join
      val plain = orders.join(cust, "custkey")
      assert(j.count() == plain.count())
      assert(math.abs(j.agg(sum("o_totalprice")).head().getDouble(0) -
        plain.agg(sum("o_totalprice")).head().getDouble(0)) < 1e-6)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS t_cust_bkt")
    }
  }

  test("zone-map audit: z-order prunes blocks the natural layout cannot") {
    val rows = graft.operators.Layout
      .zonemapPruning(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("blocks_read"),
          r.getAs[Long]("rows_matched"))).toMap
    val (nbN, readN, matchN) = rows("natural")
    val (nbZ, readZ, matchZ) = rows("zorder")
    // both layouts hold the same data: identical block and match counts
    assert(nbN == graft.operators.Layout.ZoneBlocks && nbN == nbZ)
    assert(matchN == matchZ && matchN > 0)
    // pruning soundness: must-read blocks can never be fewer than the
    // blocks that actually contain matches (>= 1 if any match)
    assert(readZ >= 1 && readN >= 1)
    // the point of the layout: the interleaved order confines the box
    // to strictly fewer blocks than ingest order
    assert(readZ < readN,
      s"z-order should prune: natural=$readN zorder=$readZ")
  }
}
