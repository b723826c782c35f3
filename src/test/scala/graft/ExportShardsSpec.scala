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

  test("incremental exports merge by addition: manifest(A ∪ B) = manifest(A) + manifest(B)") {
    // every manifest column is distributive, so two batch exports'
    // manifests must sum to the combined corpus's manifest (min/max
    // checked as elementwise min/max) — the contract that lets a 100 TB
    // export run incrementally without re-scanning history
    val d1 = Files.createTempDirectory("graft-exp-a").toString
    val d2 = Files.createTempDirectory("graft-exp-b").toString
    val d12 = Files.createTempDirectory("graft-exp-ab").toString
    def writeDocs(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
      df.withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val a = docs.filter(col("doc_id") < 32)
    val b = docs.filter(col("doc_id") >= 32)
    writeDocs(a, d1); writeDocs(b, d2); writeDocs(a.unionByName(b), d12)
    def manifest(dir: String) = Layout.exportManifest(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val (ma, mb, mab) = (manifest(d1), manifest(d2), manifest(d12))
    mab.foreach { case (shard, r) =>
      def f(m: Map[Long, org.apache.spark.sql.Row], i: Int): Long =
        m.get(shard).map(_.getLong(i)).getOrElse(0L)
      assert(r.getLong(1) == f(ma, 1) + f(mb, 1), s"docs shard $shard")
      assert(r.getLong(2) == f(ma, 2) + f(mb, 2), s"tokens shard $shard")
      assert(r.getLong(3) == f(ma, 3) + f(mb, 3), s"chars shard $shard")
      assert(r.getLong(4) == f(ma, 4) + f(mb, 4), s"hash_sum shard $shard")
      val mins = Seq(ma, mb).flatMap(_.get(shard)).map(_.getString(5))
      assert(r.getString(5) == mins.min, s"h_min shard $shard")
      val maxs = Seq(ma, mb).flatMap(_.get(shard)).map(_.getString(6))
      assert(r.getString(6) == maxs.max, s"h_max shard $shard")
    }
  }

  test("streaming incremental export: per-batch manifests merge to the corpus manifest") {
    // the production flow: docs arrive as micro-batches, each batch is
    // exported to its own dated prefix via foreachBatch, and the batch
    // manifests ADD up to the manifest of the whole corpus — no history
    // re-scan, exactly the additivity the batch test proves, driven
    // through the real streaming machinery
    import org.apache.spark.sql.streaming.Trigger
    val inputDir = Files.createTempDirectory("graft-sexp-in")
    val exportRoot = Files.createTempDirectory("graft-sexp-out").toString
    val ckpt = Files.createTempDirectory("graft-sexp-ckpt").toString
    val fullDir = Files.createTempDirectory("graft-sexp-full").toString
    def writeBatchFile(from: Int, until: Int, name: String): Unit =
      docs.filter(col("doc_id") >= from && col("doc_id") < until)
        .coalesce(1).write.parquet(inputDir.resolve(name).toString)
    writeBatchFile(0, 20, "b1")
    writeBatchFile(20, 64, "b2")
    val schema = docs.schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inputDir.toString + "/*")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        Layout.exportWrite(batch, s"$exportRoot/batch=$id"): Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000L)
    // manifest of each batch export, summed per shard
    val batchDirs = new java.io.File(exportRoot).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.toString)
    assert(batchDirs.length == 2)
    val summed = batchDirs
      .map(d => spark.read.parquet(d)
        .groupBy("shard").agg(count(lit(1)).as("docs"),
          sum(length(col("text")).cast("long")).as("chars")))
      .reduce(_ unionByName _)
      .groupBy("shard").agg(sum("docs").as("docs"), sum("chars").as("chars"))
    // manifest of the corpus exported in one shot
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$fullDir/documents.parquet")
    val whole = Layout.exportManifest(spark, fullDir)
      .select("shard", "docs", "chars")
    val a = summed.orderBy("shard").collect().map(_.toSeq).toSeq
    val b = whole.orderBy("shard").collect().map(_.toSeq).toSeq
    assert(a == b)
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

  private lazy val jdocs = (0 until 48)
    .map(i => (i.toLong, s"jsonl doc $i body with tail$i", if (i % 2 == 0) "en" else "de", s"src${i % 3}"))
    .toDF("doc_id", "text", "lang", "source")

  test("jsonl export: byte-identical reruns, ordered shards, round-trip parse") {
    val o1 = Files.createTempDirectory("graft-jsonl1").toString
    val o2 = Files.createTempDirectory("graft-jsonl2").toString
    Layout.exportJsonl(jdocs, o1, shards = 4)
    Layout.exportJsonl(jdocs, o2, shards = 4)
    def shardBytes(root: String): Map[String, String] =
      new java.io.File(root).listFiles.filter(_.getName.startsWith("shard="))
        .map { d =>
          val parts = d.listFiles.filter(_.getName.endsWith(".txt")).sortBy(_.getName)
          d.getName -> parts.map(f =>
            new String(Files.readAllBytes(f.toPath), "UTF-8")).mkString
        }.toMap
    val b1 = shardBytes(o1)
    // two exports are byte-identical shard for shard
    assert(b1 == shardBytes(o2))
    assert(b1.keySet == (0 until 4).map(k => s"shard=$k").toSet)
    // every line parses back; the full round-trip recovers the corpus
    val back = spark.read.schema("doc_id LONG, lang STRING, source STRING, text STRING")
      .json(spark.read.text(s"$o1/shard=*").select("value").as[String])
    assert(back.count() == 48)
    val orig = jdocs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    val got = back.collect().map(r => (r.getLong(0), r.getString(3), r.getString(1), r.getString(2))).toSet
    assert(got == orig)
    // in-shard order is (h, doc_id): lines within a shard are sorted by
    // the md5 of their text field - recompute and check one shard
    val lines = b1("shard=0").split("\n").filter(_.nonEmpty)
    val md5s = lines.map { l =>
      val t = spark.read.schema("doc_id LONG, lang STRING, source STRING, text STRING")
        .json(Seq(l).toDS).head
      org.apache.commons.codec.digest.DigestUtils.md5Hex(t.getString(3))
    }
    assert(md5s.toSeq == md5s.toSeq.sorted)
  }
}
