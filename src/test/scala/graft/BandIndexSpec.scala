package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Dedup
import graft.streaming.DocsStream

/** The persisted band-index snapshot — the operator a 100 TB corpus
  * actually ships: `writeBandIndex` buckets the LSH index by the probe
  * join key, so every later batch/stream probe joins WITHOUT an exchange
  * on the index side. These tests pin (a) that plan property, (b) answer
  * parity with the in-flight `incrementalMinhash`, and (c) the streaming
  * probe against the same snapshot.
  */
class BandIndexSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"
  private def evenDocs = graft.sources.Tables.documents(spark, dir)
    .filter(col("doc_id") % 2 === 0)
  private def oddDocs = graft.sources.Tables.documents(spark, dir)
    .filter(col("doc_id") % 2 === 1)

  private def withConfs(confs: Seq[(String, String)])(body: => Unit): Unit = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("probe join has NO exchange on the bucketed index side") {
    // static plan (AQE off) + no broadcast, so the join shape is a
    // deterministic SMJ we can walk: the index-side subtree must go
    // scan -> sort -> join with no ShuffleExchange, because the bucketed
    // layout already provides the join key partitioning; only the
    // (batch-sized) probe side shuffles
    withConfs(Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      Dedup.writeBandIndex(evenDocs, "band_idx_plan_test", buckets = 4)
      try {
        val probe = Dedup.probeBandIndex(
          oddDocs, Dedup.readBandIndex(spark, "band_idx_plan_test"))
        val plan = probe.queryExecution.executedPlan
        val smj = plan.collectFirst { case j: SortMergeJoinExec => j }
        assert(smj.nonEmpty, s"expected a sort-merge probe join:\n$plan")
        def scansIndex(p: SparkPlan): Boolean = p.collectFirst {
          case f: FileSourceScanExec
            if f.tableIdentifier.exists(_.table == "band_idx_plan_test") => f
        }.nonEmpty
        val indexSide = Seq(smj.get.left, smj.get.right).find(scansIndex)
        assert(indexSide.nonEmpty, s"index scan not under the join:\n$plan")
        val shuffles = indexSide.get.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.isEmpty,
          s"bucketed index side must not shuffle:\n${indexSide.get}")
        // and the scan really is bucket-pruned/bucketed, not a plain read
        assert(indexSide.get.toString.contains("SelectedBucketsCount"),
          s"expected a bucketed scan on the index side:\n${indexSide.get}")
      } finally spark.sql("DROP TABLE IF EXISTS band_idx_plan_test")
    }
  }

  test("probe through the bucketed snapshot == in-flight incrementalMinhash") {
    Dedup.writeBandIndex(evenDocs, "band_idx_parity_test", buckets = 4)
    try {
      val viaSnapshot = Dedup.probeBandIndex(
          oddDocs, Dedup.readBandIndex(spark, "band_idx_parity_test"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val inFlight = Dedup.incrementalMinhash(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(viaSnapshot == inFlight && inFlight.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS band_idx_parity_test")
  }

  test("stream probes the bucketed snapshot - the production flow end to end") {
    Dedup.writeBandIndex(evenDocs, "band_idx_stream_test", buckets = 4)
    try {
      val q = DocsStream.nearDupScreen(
          DocsStream.readDocs(spark, dir).filter(col("doc_id") % 2 === 1),
          Dedup.readBandIndex(spark, "band_idx_stream_test"))
        .writeStream
        .format("memory")
        .queryName("neardup_bucketed")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000L)
      val streamed = spark.table("neardup_bucketed").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = Dedup.incrementalMinhash(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS band_idx_stream_test")
  }
}
