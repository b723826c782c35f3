package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimSearch

/** Pins the k-center greedy selection: cluster coverage (the property
  * that makes farthest-first a diversity sampler), the non-increasing
  * coverage-radius sequence, distinctness, and determinism.
  */
class KcenterSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Three well-separated clusters with skewed sizes: uniform sampling
    * would almost surely draw from the big cluster thrice. */
  private def clustered = {
    def vec(base: Float, j: Int) = Array.fill(8)(base) ++ Array(j.toFloat / 100)
    val big = (0 until 50).map(j => (j.toLong, vec(0f, j)))
    val mid = (0 until 5).map(j => (100L + j, vec(10f, j)))
    val tiny = Seq((200L, vec(20f, 0)))
    (big ++ mid ++ tiny).toDF("vec_id", "embedding")
  }

  test("k=3 centers land in all three clusters despite 50:5:1 skew") {
    val sel = SimSearch.kcenterSelectOf(clustered, 3).collect()
    val clusters = sel.map(_.getLong(1)).map {
      case id if id < 100 => "big"
      case id if id < 200 => "mid"
      case _ => "tiny"
    }.toSet
    assert(clusters == Set("big", "mid", "tiny"))
  }

  test("coverage radii are non-increasing from round 2") {
    val sel = SimSearch.kcenterSelectOf(clustered, 6).collect()
    val radii = sel.sortBy(_.getLong(0)).drop(1).map(_.getDouble(2))
    radii.sliding(2).foreach {
      case Array(a, b) => assert(b <= a)
      case _ => ()
    }
  }

  /** Max-over-points min squared distance to the selected centers —
    * the k-center objective, computed exactly on the driver. */
  private def coverageRadius(points: Seq[(Long, Array[Float])],
      centerIds: Set[Long]): Double = {
    val centers = points.filter(p => centerIds(p._1)).map(_._2)
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) =>
        (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    points.map(p => centers.map(c => l2(p._2, c)).min).max
  }

  test("batch farthest-first: cluster coverage in 2 passes, radius within 4x of Gonzalez") {
    val pts = {
      def vec(base: Float, j: Int) = Array.fill(8)(base) ++ Array(j.toFloat / 100)
      val big = (0 until 50).map(j => (j.toLong, vec(0f, j)))
      val mid = (0 until 5).map(j => (100L + j, vec(10f, j)))
      val tiny = Seq((200L, vec(20f, 0)))
      big ++ mid ++ tiny
    }
    val batch = SimSearch.kcenterSelectBatchOf(clustered, 4, 2).collect()
    val got = batch.map(_.getLong(1)).toSet
    // the β=1/4 separation filter must still land centers in all three
    // clusters despite the 50:5:1 skew
    val buckets = got.map {
      case id if id < 100 => "big"
      case id if id < 200 => "mid"
      case _ => "tiny"
    }
    assert(buckets == Set("big", "mid", "tiny"))
    // only 1 + passes driver round-trips were paid; coverage must be
    // within the oversampling guarantee band of sequential Gonzalez at
    // the same center count
    val seq = SimSearch.kcenterSelectOf(clustered, got.size).collect()
      .map(_.getLong(1)).toSet
    val rBatch = coverageRadius(pts, got)
    val rSeq = coverageRadius(pts, seq)
    assert(rBatch <= 4 * math.max(rSeq, 1e-12),
      s"batch radius $rBatch vs sequential $rSeq")
    // seed is round 0 at the min vec_id; radii are positive past it
    assert(batch.head.getLong(0) == 0L && batch.head.getLong(1) == 0L)
  }

  test("batch vs sequential: coverage within 4x across random geometries") {
    // five FIXED seeds — deterministic, but geometry-diverse enough to
    // exercise the admission filter beyond the planted clusters
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val pts = (0 until (12 + rnd.nextInt(24))).map(i =>
        (i.toLong, Array.fill(6)(rnd.nextFloat() * 4f - 2f)))
      val df = pts.toDF("vec_id", "embedding")
      val batch = SimSearch.kcenterSelectBatchOf(df, 4, 2).collect()
        .map(_.getLong(1)).toSet
      assert(batch.size >= 1 && batch.size <= 1 + 4 * 2, s"seed $seed size")
      val seq = SimSearch.kcenterSelectOf(df, batch.size).collect()
        .map(_.getLong(1)).toSet
      val rB = coverageRadius(pts, batch)
      val rS = coverageRadius(pts, seq)
      assert(rB <= 4 * math.max(rS, 1e-12),
        s"seed $seed: batch radius $rB vs sequential $rS")
    }
  }

  test("empty input yields an empty selection, not an NPE") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(SimSearch.kcenterSelectOf(empty, 3).collect().isEmpty)
  }

  test("registered query: distinct centers, seed at min vec_id, deterministic") {
    val dir = "/root/testdata/sf0.001"
    val a = SimSearch.kcenterSelect(spark, dir).collect()
    val b = SimSearch.kcenterSelect(spark, dir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.length == SimSearch.KCenterK)
    assert(a.map(_.getLong(1)).distinct.length == a.length)
    assert(a.head.getLong(1) ==
      graft.sources.Tables.embeddings(spark, dir)
        .agg(org.apache.spark.sql.functions.min("vec_id"))
        .collect()(0).getLong(0))
    assert(a.head.getDouble(2) == 0.0)
  }
}
