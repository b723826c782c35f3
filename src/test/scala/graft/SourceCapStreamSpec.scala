package graft

import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.DocsStream

/** Pins the streaming per-source cap: FIFO admission in doc_id order
  * within a batch, quota continuation across a query RESTART (the state
  * store carries each source's admitted count), contiguous admit
  * sequences, and the O(|sources|) state contract.
  */
class SourceCapStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val Cap = 7L

  private def writeOneFile(df: DataFrame, dest: Path): Unit = {
    val tmp = Files.createTempDirectory("graft-cap-stage").toString + "/out"
    df.coalesce(1).write.parquet(tmp)
    val part = Files.list(Paths.get(tmp))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    Files.move(part, dest)
  }

  test("cap admits first K per source in doc_id order, resuming across restarts") {
    val dir = "/root/testdata/sf0.001"
    val inputDir = Files.createTempDirectory("graft-cap-in")
    val out = Files.createTempDirectory("graft-cap-sink").toString
    val ckpt = Files.createTempDirectory("graft-cap-ckpt").toString
    val docs = graft.sources.Tables.documents(spark, dir)
    val batch1 = docs.filter(col("doc_id") % 2 === 0)
    val batch2 = docs.filter(col("doc_id") % 2 === 1)

    def runStream(): Unit = {
      val q = DocsStream.sourceCapAdmission(
          spark.readStream.schema(DocsStream.docSchema)
            .option("maxFilesPerTrigger", "1").parquet(inputDir.toString),
          Cap)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000L)
    }
    def sunk(): Seq[(String, Long, Long)] = spark.read.parquet(out)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

    writeOneFile(batch1, inputDir.resolve("batch1.parquet"))
    runStream()
    val run1 = sunk()
    // run 1: per source, the Cap smallest even doc_ids (or all if fewer)
    val expect1 = batch1.select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.flatMap { case (s, rs) =>
        rs.map(_._2).sorted.take(Cap.toInt).zipWithIndex
          .map { case (id, i) => (s, id, i + 1L) }.toSeq
      }.toSet
    assert(run1.toSet == expect1)

    // run 2 RESTARTS the query from the checkpoint: each source's quota
    // continues where run 1 stopped — batch-2 docs only fill leftover room
    writeOneFile(batch2, inputDir.resolve("batch2.parquet"))
    runStream()
    val run2 = sunk()
    assert(run2.toSet.intersect(run1.toSet) == run1.toSet) // append-only, no replay
    val perSource = run2.groupBy(_._1)
    perSource.foreach { case (_, rows) =>
      assert(rows.length <= Cap)
      // admit_seq contiguous 1..n across the whole stream lifetime
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
    }
    val run1Count = run1.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    run2.filterNot(run1.toSet).foreach { case (s, id, seq) =>
      assert(id % 2 == 1, "second-run admissions come from batch 2")
      assert(seq > run1Count.getOrElse(s, 0L), "sequence continues, never rewinds")
    }
    // sources whose quota filled in run 1 admit nothing in run 2
    run1Count.filter(_._2 == Cap).keys.foreach { s =>
      assert(run2.count(_._1 == s) == Cap)
    }
  }

  test("single batch with more docs than cap stops exactly at the cap") {
    import spark.implicits._
    val inputDir = Files.createTempDirectory("graft-cap2-in")
    val out = Files.createTempDirectory("graft-cap2-sink").toString
    val ckpt = Files.createTempDirectory("graft-cap2-ckpt").toString
    val docs = (1L to 30L).map(i => (i, s"text $i", "en", "srcX", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    writeOneFile(docs, inputDir.resolve("b.parquet"))
    val q = DocsStream.sourceCapAdmission(
        spark.readStream.schema(DocsStream.docSchema)
          .option("maxFilesPerTrigger", "1").parquet(inputDir.toString), Cap)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._1).sameElements(1L to Cap))
    assert(got.map(_._2).sameElements(1L to Cap))
  }
}
