package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimSearch

/** Pins for the Matryoshka dimension-dial recall audit
  * ([[SimSearch.mrlRecall]]): on a corpus whose information really is
  * nested in the leading dims (the MRL training contract), the 8-dim
  * prefix must already achieve perfect recall; on the registered
  * corpus the audit is deterministic with one row per dial position. */
class MrlRecallSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** 60 vectors in 10 clusters of 6 (queries 0..9 land one per
    * cluster): the first two dims carry the cluster angle (18° apart —
    * intra-cluster cosine ~1 vs inter ~0.95), dims 3..8 are zero, and
    * dims 9..64 carry per-vector noise at 1e-3 — so the top-5 of every
    * query is exactly its 5 co-cluster members at EVERY dial position,
    * and recall@5 must be 1.0 from dims=8 up. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("mrl_mini").toFile
    d.deleteOnExit()
    val rnd = new scala.util.Random(7)
    val rows = (0 until 60).map { i =>
      val c = i % 10
      val theta = c * math.Pi / 10.0
      val head = Array(math.cos(theta).toFloat, math.sin(theta).toFloat,
        0f, 0f, 0f, 0f, 0f, 0f)
      val tail = Array.fill(56)((rnd.nextFloat() - 0.5f) * 2e-3f)
      (i.toLong, (head ++ tail).toSeq, c)
    }
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/embeddings.parquet")
    d.getAbsolutePath
  }

  test("nested geometry: the 8-dim prefix already retrieves perfectly") {
    val rows = SimSearch.mrlRecall(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(rows.keySet == SimSearch.MrlDims.map(_.toLong).toSet)
    SimSearch.MrlDims.foreach { d =>
      val (hits, recall, mono) = rows(d.toLong)
      assert(hits == (SimSearch.K * SimSearch.NQueries).toLong, s"dims=$d: $rows")
      assert(recall == 1.0, s"dims=$d")
      assert(mono, s"dims=$d")
    }
  }

  test("registered corpus: deterministic, one row per dial, recall in [0,1]") {
    val a = SimSearch.mrlRecall(spark, "/root/testdata/sf0.001").collect()
    val b = SimSearch.mrlRecall(spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.length == SimSearch.MrlDims.length)
    a.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }
}
