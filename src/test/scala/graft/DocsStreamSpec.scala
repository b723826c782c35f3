package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Dedup
import graft.streaming.DocsStream

/** Batch≡stream equivalence for near-dup screening: streaming the
  * odd-id documents of sf0.001 against the static band index of the
  * even-id documents must reproduce exactly the batch
  * `incrementalMinhash` answer (which splits the same corpus the same
  * way) — including the per-row lambda signatures matching the batch
  * path's relational groupBy/min signatures bit-for-bit.
  */
class DocsStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("streaming near-dup screen == batch incrementalMinhash on bounded input") {
    val dir = "/root/testdata/sf0.001"
    val corpusBands = Dedup.bandIndexOf(
      graft.sources.Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0))
    val stream = DocsStream.readDocs(spark, dir).filter(col("doc_id") % 2 === 1)
    val q = DocsStream.nearDupScreen(stream, corpusBands)
      .writeStream
      .format("memory")
      .queryName("neardup_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val streamed = spark.table("neardup_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Dedup.incrementalMinhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stream probes a PERSISTED band index - the production snapshot flow") {
    import java.nio.file.Files
    val dir = "/root/testdata/sf0.001"
    val idx = Files.createTempDirectory("graft-bandidx").toString + "/bands"
    // snapshot the corpus index once (in production: a periodic batch
    // job, bucketed by the band key), then the stream reads it like any
    // static table — signature arrays must survive the parquet round-trip
    Dedup.bandIndexOf(
        graft.sources.Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0))
      .write.parquet(idx)
    val q = DocsStream.nearDupScreen(
        DocsStream.readDocs(spark, dir).filter(col("doc_id") % 2 === 1),
        spark.read.parquet(idx))
      .writeStream
      .format("memory")
      .queryName("neardup_persisted")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val streamed = spark.table("neardup_persisted").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Dedup.incrementalMinhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("near-dup screen restart with checkpoint is exactly-once (stateless query)") {
    import java.nio.file.Files
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft-neardup-sink").toString
    val ckpt = Files.createTempDirectory("graft-neardup-ckpt").toString
    val corpusBands = Dedup.bandIndexOf(
      graft.sources.Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0))
    def runOnce(): Unit = {
      val q = DocsStream.nearDupScreen(
          DocsStream.readDocs(spark, dir).filter(col("doc_id") % 2 === 1),
          corpusBands)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000L)
    }
    runOnce()
    runOnce() // committed offsets: nothing reprocessed, nothing duplicated
    val sunk = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = Dedup.incrementalMinhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sunk.sorted == expected.sorted) // Seq compare: dupes would differ
  }
}
