package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Pins for the retrieval rank-quality audit
  * ([[TextAnalysis.retrievalRankQuality]]): the fixed-point discount
  * table's exact values, the full hybrid's in-band reference row
  * (nDCG = MRR = 1 by construction), and the cap-doesn't-bind identity
  * (on a corpus where no term's posting list exceeds the cap, the
  * capped hybrid IS the hybrid, so its row must also read 1.0/1.0). */
class RankQualitySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("ndcg_mini").toFile
    d.deleteOnExit()
    val base = d.getAbsolutePath
    def w(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$base/$name.parquet")
    w(Seq(
        (0L, "the zebra grazes", "en", "s0", 16L),
        (1L, "the zebra sleeps here quietly", "en", "s0", 29L),
        (2L, "the zebra runs", "en", "s0", 14L),
        (3L, "the cat sits on the mat", "en", "s0", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"), "documents")
    w(Seq(
        (0L, Seq(1.0f, 0.0f, 0.0f), 0),
        (1L, Seq(0.0f, 1.0f, 0.0f), 0),
        (2L, Seq(0.9f, 0.1f, 0.0f), 0),
        (3L, Seq(0.8f, 0.0f, 0.6f), 0))
      .toDF("vec_id", "embedding", "label"), "embeddings")
    base
  }

  test("fixed-point discount table: exact values, length, strictly decreasing") {
    val d = TextAnalysis.NdcgDiscFp
    assert(d.length == TextAnalysis.NdcgDepth)
    assert(d.head == 1000000L)        // 1e6 / log2(2)
    assert(d(2) == 500000L)           // 1e6 / log2(4)
    assert(d(6) == 333333L)           // 1e6 / log2(8), truncating round
    d.sliding(2).foreach { case Seq(a, b) => assert(b < a); case _ => () }
  }

  test("the full hybrid is its own ground truth: nDCG = MRR = 1") {
    val rows = TextAnalysis.retrievalRankQuality(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows("hybrid") == ((1.0, 1.0)))
  }

  test("cap-doesn't-bind: capped hybrid row is exactly the reference row") {
    // every posting list here is <= 4 docs, far under Bm25CapK — the
    // capped index equals the full index, so the capped arm must score
    // a perfect 1.0/1.0 (any deviation means the cap path diverges
    // from the full path even when the cap is inert)
    val rows = TextAnalysis.retrievalRankQuality(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows("hybrid_capped") == ((1.0, 1.0)), rows.toString)
  }

  test("all metrics in [0,1], n_queries counts the probe set, deterministic") {
    val a = TextAnalysis.retrievalRankQuality(spark, dir).collect()
    val b = TextAnalysis.retrievalRankQuality(spark, dir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.length == 3)
    a.foreach { r =>
      assert(r.getLong(1) == 4L) // 4 docs, all under Bm25NQueries = 5
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }
}
