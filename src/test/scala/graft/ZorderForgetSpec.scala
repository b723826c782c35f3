package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{CorpusMerge, Layout}

/** Z-order layout FORGET pins (r11 VERDICT directive #3):
  *
  *  - LOCATOR COMPLETENESS: after the rewrite, no erased row survives
  *    anywhere in the patched manifest — and the base blocks OUTSIDE
  *    the touched set contain no erased row to begin with (the
  *    row-local routing finds every erased row's block, the property
  *    that lets untouched files stay untouched);
  *  - PRUNING SURVIVES RETRACTION: `blocks_read` post ≤ pre, row
  *    accounting exact (post = pre − erased);
  *  - ALL-ERASED BLOCK EXIT: a constructed block whose rows are all
  *    erased leaves the manifest entirely (zero rewritten files for
  *    it), while a sibling untouched block is never rewritten;
  *  - IDEMPOTENT RERUNS: the write-once layout machinery serves the
  *    same report on a second call.
  */
class ZorderForgetSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("registered report: erased gone, untouched blocks clean, accounting exact") {
    val rows = Layout.zorderForget(spark, dir).collect()
    assert(rows.length == 2)
    val post = rows.find(_.getString(0) == "zorder_post").get
    val pre = rows.find(_.getString(0) == "zorder_pre").get
    val erased = post.getLong(5)
    assert(erased > 0L, "the sf0.001 corpus must have erased events")
    assert(post.getLong(3) == pre.getLong(3) - erased) // n_rows
    assert(post.getLong(1) <= pre.getLong(1)) // n_blocks
    assert(post.getLong(2) <= pre.getLong(2)) // blocks_read
    assert(post.getLong(4) >= 1L) // blocks_touched

    // locator completeness: base blocks outside the touched set hold no
    // erased row (so never rewriting them loses nothing)
    val root = s"${graft.operators.ScaleTechniques.layoutPath(
      dir, "events.parquet", "zblocks2")}/zorder"
    val forgetRoot = graft.operators.ScaleTechniques.layoutPath(
      dir, "events.parquet", "zforget")
    val touched = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(forgetRoot, "touched.txt")), "UTF-8")
      .split("\n").filter(_.nonEmpty).map(_.toLong).toSet
    val erasedPred =
      col("event_id") % CorpusMerge.ForgetMod === CorpusMerge.ForgetRem
    val base = spark.read.option("basePath", root).parquet(root)
    assert(base.filter(!col("blk").cast("long").isin(touched.toSeq: _*))
      .filter(erasedPred).count() == 0L)
    // and the patched files hold none either
    val patched = spark.read.parquet(s"$forgetRoot/zorder")
    assert(patched.filter(erasedPred).count() == 0L)
  }

  test("an all-erased block exits; a clean sibling block is not rewritten") {
    val tmpBase = java.nio.file.Files.createTempDirectory("zfg_base").toString
    val tmpPatch = java.nio.file.Files.createTempDirectory("zfg_patch").toString
    // block 0: user_id 0 / value 0 rows, ALL ids ≡ 3 (mod 7) — erased;
    // block 63: max-coordinate rows, ids ≡ 1 (mod 7) — kept, untouched
    val ev = Seq(
      (3L, 0L, 0.0), (10L, 0L, 0.0), (17L, 0L, 0.0),
      (1L, 255L, 1e9), (8L, 255L, 1e9)
    ).toDF("event_id", "user_id", "value")
    val a = pmod(col("user_id"), lit(1L << Layout.ZBits)).cast("long")
    val b = least(floor(col("value") / 2.0),
      lit((1 << Layout.ZBits) - 1).cast("double")).cast("long")
    ev.withColumn("blk",
        shiftright(Layout.zValue(a, b), Layout.ZPrefixShift))
      .write.mode("overwrite").partitionBy("blk").parquet(tmpBase)
    val baseDirs = new java.io.File(tmpBase).listFiles()
      .filter(_.getName.startsWith("blk=")).map(_.getName).toSet
    assert(baseDirs == Set("blk=0", "blk=63"))
    val before63 = new java.io.File(tmpBase, "blk=63").listFiles()
      .map(f => f.getName -> f.lastModified).toMap

    val erasedPred =
      col("event_id") % CorpusMerge.ForgetMod === CorpusMerge.ForgetRem
    val touched = Layout.zorderForgetPatch(spark, tmpBase, ev, erasedPred, tmpPatch)
    assert(touched.toSeq == Seq(0L))
    // all rows of block 0 were erased: the patch writes NO blk dir for it
    val patchDirs = Option(new java.io.File(tmpPatch, "zorder").listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("blk=")).map(_.getName)
    assert(patchDirs.isEmpty,
      s"all-erased block must exit the manifest, got ${patchDirs.mkString(",")}")
    // the clean sibling's files were never rewritten
    val after63 = new java.io.File(tmpBase, "blk=63").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    assert(after63 == before63)
  }

  test("rerun serves the identical report") {
    val r1 = Layout.zorderForget(spark, dir).collect().map(_.toString).toSeq
    val r2 = Layout.zorderForget(spark, dir).collect().map(_.toString).toSeq
    assert(r1 == r2)
  }
}
