package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.SimSearch
import graft.sources.Tables
import graft.streaming.EmbeddingsStream

/** The streaming embedding-drift monitor must agree with the batch
  * monitor exactly: same quantizer, same assignments, same smoothed-PSI
  * rows. The reference/new split and planted +DriftShift offset mirror
  * `SimSearch.embeddingDrift`, so the batch side IS the registered
  * oracle-checked query's plan. */
class EmbeddingsStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val e = Tables.embeddings(spark, dir)
  private lazy val ref = e.filter(col("vec_id") % 2 === 0)
  private lazy val cur = e.filter(col("vec_id") % 2 === 1)
    .select(col("vec_id"),
      when(col("vec_id") % 10 < 3,
          transform(col("embedding"), x => x.cast("double") + lit(SimSearch.DriftShift)))
        .otherwise(transform(col("embedding"), x => x.cast("double")))
        .as("embedding"))
  private lazy val quant = SimSearch.trainedQuantizerArrays(ref)

  /** Write `df` as N single parquet files `embeddings_i.parquet` under
    * a fresh dir — the multi-shard arrival layout the stream replays
    * one file per micro-batch. */
  private def writeShards(df: DataFrame, n: Int): String = {
    val root = java.nio.file.Files.createTempDirectory("emb_stream")
    (0 until n).foreach { i =>
      val stage = java.nio.file.Files.createTempDirectory("emb_stage").toString
      df.filter(pmod(col("vec_id"), lit(n)) === i)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        root.resolve(s"embeddings_$i.parquet"))
    }
    root.toString
  }

  private def streamCounts(dir: String, name: String): DataFrame = {
    val q = EmbeddingsStream.clusterArrivals(
        EmbeddingsStream.readEmbeddings(spark, dir), quant)
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  test("stream arrivals equal the batch assignment, across multi-file replay") {
    val batch = EmbeddingsStream.clusterArrivals(cur, quant)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 shards -> 3 micro-batches under maxFilesPerTrigger=1; the
    // complete-mode table after the drain must equal the batch counts
    val streamed = streamCounts(writeShards(cur, 3), "emb_arrivals")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    assert(batch.values.sum == cur.count())
  }

  test("streamed counts + PSI tail reproduce the batch drift monitor") {
    val refCounts = EmbeddingsStream.clusterArrivals(ref, quant)
      .withColumnRenamed("n_cur", "n_ref")
    val streamed = streamCounts(writeShards(cur, 2), "emb_arrivals2")
    val got = EmbeddingsStream.psiReport(quant.map(_._1), refCounts, streamed)
      .collect().map(_.toSeq)
    val want = SimSearch.embeddingDriftOf(ref, cur).collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("planted drift lights up: shifted mass leaves some cluster") {
    val rows = SimSearch.embeddingDriftOf(ref, cur).collect()
    assert(rows.map(_.getDouble(5)).sum > 0.01) // total PSI clearly nonzero
  }
}
