package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Layout
import java.nio.file.Files

/** The sharded training export must be a DETERMINISTIC pure function of
  * the corpus: shard assignment follows the content-hash formula, rows
  * are conserved across the partitioned write, rows within a shard come
  * back hash-ordered, and two exports of the same corpus are
  * row-identical in every shard.
  */
class ExportShardsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = (0 until 64)
    .map(i => (i.toLong, s"document number $i with some shared words and tail$i"))
    .toDF("doc_id", "text")

  private def readBack(path: String) =
    spark.read.parquet(path).select("doc_id", "text", "h", "shard")

  test("export conserves rows and shard follows the content-hash formula") {
    val out = Files.createTempDirectory("graft-export").toString
    Layout.exportWrite(docs, out)
    val back = readBack(out)
    assert(back.count() == 64)
    val wrong = back.filter(
      col("shard") =!=
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
          % Layout.ExportShards)
      .count()
    assert(wrong == 0)
    assert(back.select("doc_id").distinct().count() == 64)
  }

  test("two exports of the same corpus are row-identical per shard") {
    val o1 = Files.createTempDirectory("graft-export1").toString
    val o2 = Files.createTempDirectory("graft-export2").toString
    Layout.exportWrite(docs, o1)
    Layout.exportWrite(docs, o2)
    val a = readBack(o1).orderBy("shard", "h").collect().toSeq
    val b = readBack(o2).orderBy("shard", "h").collect().toSeq
    assert(a == b)
  }

  test("rows inside one shard directory come back hash-ordered") {
    val out = Files.createTempDirectory("graft-export3").toString
    Layout.exportWrite(docs, out)
    val dir = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).head
    val hs = spark.read.parquet(dir.toString)
      .select("h").collect().map(_.getString(0)).toSeq
    assert(hs.nonEmpty && hs == hs.sorted)
  }

  test("manifest totals reconcile with the corpus") {
    val dir = Files.createTempDirectory("graft-export-man").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val man = Layout.exportManifest(spark, dir)
    val totals = man.agg(sum("docs"), sum("chars")).collect()(0)
    assert(totals.getLong(0) == 64)
    val expectChars = docs.agg(sum(length(col("text")))).collect()(0).getLong(0)
    assert(totals.getLong(1) == expectChars)
  }
}
