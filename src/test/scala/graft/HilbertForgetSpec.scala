package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{CorpusMerge, Layout}

/** Hilbert layout FORGET pins (r12 VERDICT directive #3 — the
  * maintenance grid's last cell), mirroring [[ZorderForgetSpec]]:
  *
  *  - LOCATOR COMPLETENESS: after the rewrite, no erased row survives
  *    anywhere in the patched manifest, and base blocks OUTSIDE the
  *    touched set contain no erased row to begin with (the row-local
  *    curve walk finds every erased row's block);
  *  - PRUNING SURVIVES RETRACTION: `blocks_read` post ≤ pre, row
  *    accounting exact (post = pre − erased);
  *  - ALL-ERASED BLOCK EXIT: a constructed block whose rows are all
  *    erased leaves the manifest entirely, while a sibling untouched
  *    block is never rewritten;
  *  - IDEMPOTENT RERUNS via the write-once layout machinery.
  */
class HilbertForgetSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("registered report: erased gone, untouched blocks clean, accounting exact") {
    val rows = Layout.hilbertForget(spark, dir).collect()
    assert(rows.length == 2)
    val post = rows.find(_.getString(0) == "hilbert_post").get
    val pre = rows.find(_.getString(0) == "hilbert_pre").get
    val erased = post.getLong(5)
    assert(erased > 0L, "the sf0.001 corpus must have erased events")
    assert(post.getLong(3) == pre.getLong(3) - erased) // n_rows
    assert(post.getLong(1) <= pre.getLong(1)) // n_blocks
    assert(post.getLong(2) <= pre.getLong(2)) // blocks_read
    assert(post.getLong(4) >= 1L) // blocks_touched

    val root = s"${graft.operators.ScaleTechniques.layoutPath(
      dir, "events.parquet", "hblocks")}/hilbert"
    val forgetRoot = graft.operators.ScaleTechniques.layoutPath(
      dir, "events.parquet", "hforget")
    val touched = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(forgetRoot, "touched.txt")), "UTF-8")
      .split("\n").filter(_.nonEmpty).map(_.toLong).toSet
    val erasedPred =
      col("event_id") % CorpusMerge.ForgetMod === CorpusMerge.ForgetRem
    val base = spark.read.option("basePath", root).parquet(root)
    assert(base.filter(!col("blk").cast("long").isin(touched.toSeq: _*))
      .filter(erasedPred).count() == 0L)
    val patched = spark.read.parquet(s"$forgetRoot/hilbert")
    assert(patched.filter(erasedPred).count() == 0L)
  }

  test("an all-erased block exits; a clean sibling block is not rewritten") {
    val tmpBase = java.nio.file.Files.createTempDirectory("hfg_base").toString
    val tmpPatch = java.nio.file.Files.createTempDirectory("hfg_patch").toString
    // grid corner A (0,0): ids ≡ 3 (mod 7) — all erased; grid corner B
    // (255, 255): ids ≡ 1 (mod 7) — kept, untouched. Their Hilbert
    // prefix blocks are derived with the SAME frozen walk the operator
    // uses, and must land apart (corner-to-corner curve distance far
    // exceeds one 2^10-cell prefix block).
    val ev = Seq(
      (3L, 0L, 0.0), (10L, 0L, 0.0), (17L, 0L, 0.0),
      (1L, 255L, 1e9), (8L, 255L, 1e9)
    ).toDF("event_id", "user_id", "value")
    val a = pmod(col("user_id"), lit(1L << Layout.ZBits)).cast("long")
    val b = least(floor(col("value") / 2.0),
      lit((1 << Layout.ZBits) - 1).cast("double")).cast("long")
    val blocks = Layout.withHilbert(
      ev.select(col("event_id"), col("user_id"), col("value"),
        a.as("cx"), b.as("cy"), lit(0L).as("hd")),
      Seq("event_id", "user_id", "value"))
      .select(col("event_id"), col("user_id"), col("value"),
        shiftright(col("hd"), Layout.ZPrefixShift).as("blk"))
    val blkOf = blocks.select("user_id", "blk").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(blkOf(0L) != blkOf(255L),
      "constructed corners must land in distinct Hilbert prefix blocks")
    blocks.write.mode("overwrite").partitionBy("blk").parquet(tmpBase)
    val cleanDir = new java.io.File(tmpBase, s"blk=${blkOf(255L)}")
    val before = cleanDir.listFiles().map(f => f.getName -> f.lastModified).toMap

    val erasedPred =
      col("event_id") % CorpusMerge.ForgetMod === CorpusMerge.ForgetRem
    val touched = Layout.hilbertForgetPatch(spark, tmpBase, ev, erasedPred, tmpPatch)
    assert(touched.toSeq == Seq(blkOf(0L)))
    // all rows of the erased corner's block were erased: no patch dir
    val patchDirs = Option(new java.io.File(tmpPatch, "hilbert").listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("blk=")).map(_.getName)
    assert(patchDirs.isEmpty,
      s"all-erased block must exit the manifest, got ${patchDirs.mkString(",")}")
    val after = cleanDir.listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(after == before)
  }

  test("rerun serves the identical report") {
    val r1 = Layout.hilbertForget(spark, dir).collect().map(_.toString).toSeq
    val r2 = Layout.hilbertForget(spark, dir).collect().map(_.toString).toSeq
    assert(r1 == r2)
  }
}
