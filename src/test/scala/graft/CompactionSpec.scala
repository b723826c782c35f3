package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Small-file compaction (`q_layout_compaction`): the rewrite must be
  * lossless, actually shrink the file count to the packed bins, pack
  * contiguous size-ordered runs, and be deterministic across runs. */
class CompactionSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def compactedRoot: String = new java.io.File(
    graft.operators.ScaleTechniques.layoutPath(dir, "documents.parquet", "compacted"),
    "docs").getAbsolutePath

  private def listParquet(root: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(root)).sortBy(_.getAbsolutePath)
  }

  test("audit rows: compaction shrinks files to the bin count, content totals equal") {
    val rows = Layout.compactionAudit(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val (cFiles, cRows, cChars, cHash) = rows("compacted")
    val (fFiles, fRows, fChars, fHash) = rows("fragmented")
    assert(cFiles < fFiles, s"no shrink: $cFiles vs $fFiles")
    assert(cFiles <= Layout.CompactBins)
    assert((cRows, cChars, cHash) == ((fRows, fChars, fHash)), "rewrite lost content")
  }

  test("every row landed in its packed bin and bins are contiguous in shard order") {
    Layout.compactionAudit(spark, dir).collect()
    val out = spark.read.parquet(compactedRoot)
    // bin must be non-decreasing in shard order: recompute each row's
    // shard and check the (shard -> bin) map is monotone
    val shardBin = out
      .withColumn("shard", col("hx") % Layout.CompactFragments)
      .groupBy("shard").agg(min(col("bin").cast("long")).as("bin_lo"),
        max(col("bin").cast("long")).as("bin_hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(shardBin.forall { case (_, lo, hi) => lo == hi },
      "a shard split across bins")
    val ordered = shardBin.sortBy(_._1).map(_._2)
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b },
      "bins not contiguous in shard order")
  }

  test("two compactions of the same corpus are byte-identical") {
    Layout.compactionAudit(spark, dir).collect()
    // key by (bin dir, position): part-file names carry per-job UUIDs,
    // the CONTENT is what the determinism contract covers
    def digest(): Seq[(String, String)] = listParquet(compactedRoot)
      .groupBy(_.getParentFile.getName).toSeq.sortBy(_._1)
      .flatMap { case (bin, files) =>
        files.zipWithIndex.map { case (f, i) =>
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          val md = java.security.MessageDigest.getInstance("MD5")
          s"$bin#$i" -> md.digest(bytes).map("%02x".format(_)).mkString
        }
      }
    val first = digest()
    Layout.compactionAudit(spark, dir).collect()
    assert(digest() == first)
  }
}
