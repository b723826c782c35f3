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

  /** An arbitrary (but total) cell assignment plus its geometry — the
    * prune must be exactness-preserving under ANY quantizer, not just a
    * trained one. */
  private def cellsOf(df: org.apache.spark.sql.DataFrame, mod: Int) = {
    import org.apache.spark.sql.functions._
    val assign = df.select(col("vec_id"), (col("vec_id") % mod).as("cell"))
    (assign, SimSearch.cellGeometryOf(df, assign))
  }

  test("pruned sequential selects the bit-identical center sequence as exact Gonzalez") {
    // cluster-aligned cells (the trained-quantizer shape): tight radii
    // against wide inter-cell distances is what lets the bound bite
    val assign = {
      import org.apache.spark.sql.functions._
      clustered.select(col("vec_id"), (col("vec_id") / 100).cast("long").as("cell"))
    }
    val geo = SimSearch.cellGeometryOf(clustered, assign)
    val exact = SimSearch.kcenterSelectOf(clustered, 6).collect()
    val tel = scala.collection.mutable.ArrayBuffer.empty[SimSearch.KcenterRoundPrune]
    val pruned = SimSearch.kcenterSelectPrunedOf(clustered, 6, assign, geo,
      telemetry = Some(tel)).collect()
    assert(pruned.map(_.toString).toSeq == exact.map(_.toString).toSeq)
    // the well-separated clusters make the triangle bound bite: at
    // least one round must actually skip a cell, or the prune is dead
    // code on the geometry built to exercise it
    assert(tel.map(_.cellsSkipped).sum > 0, tel.mkString(", "))
  }

  test("pruned ≡ exact across random geometries and assignments") {
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      val pts = (0 until (20 + rnd.nextInt(30))).map(i =>
        (i.toLong, Array.fill(6)(rnd.nextFloat() * 4f - 2f)))
      val df = pts.toDF("vec_id", "embedding")
      val (assign, geo) = cellsOf(df, 1 + rnd.nextInt(6))
      val exact = SimSearch.kcenterSelectOf(df, 5).collect()
      val pruned = SimSearch.kcenterSelectPrunedOf(df, 5, assign, geo).collect()
      assert(pruned.map(_.toString).toSeq == exact.map(_.toString).toSeq,
        s"seed $seed")
    }
  }

  test("pruned re-materialization (matEvery) does not change the sequence") {
    val (assign, geo) = cellsOf(clustered, 3)
    val a = SimSearch.kcenterSelectPrunedOf(clustered, 7, assign, geo,
      matEvery = 2).collect()
    val b = SimSearch.kcenterSelectPrunedOf(clustered, 7, assign, geo,
      matEvery = 16).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("batch arm: prune guards do not change admissions") {
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(200 + seed)
      val pts = (0 until (20 + rnd.nextInt(30))).map(i =>
        (i.toLong, Array.fill(6)(rnd.nextFloat() * 4f - 2f)))
      val df = pts.toDF("vec_id", "embedding")
      val (assign, geo) = cellsOf(df, 1 + rnd.nextInt(5))
      val plain = SimSearch.kcenterSelectBatchOf(df, 4, 2).collect()
      val pruned = SimSearch.kcenterSelectBatchOf(df, 4, 2,
        assign = Some(assign), geo = Some(geo)).collect()
      assert(pruned.map(_.toString).toSeq == plain.map(_.toString).toSeq,
        s"seed $seed")
    }
  }

  test("coreset weights are the Voronoi masses: 50:5:1 clusters weigh 50/5/1") {
    val centers = SimSearch.kcenterSelectOf(clustered, 3)
    val w = SimSearch.kcenterWeightsOf(clustered, centers).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // one center per cluster (pinned above); its weight is the cluster size
    val byCluster = w.map { case (id, wt) =>
      (if (id < 100) "big" else if (id < 200) "mid" else "tiny") -> wt }
    assert(byCluster == Map("big" -> 50L, "mid" -> 5L, "tiny" -> 1L), w.toString)
    assert(w.values.sum == clustered.count())
    assert(w.keySet == centers.collect().map(_.getLong(1)).toSet)
  }

  test("registered weights sum to the corpus size") {
    val dir = "/root/testdata/sf0.001"
    val w = SimSearch.kcenterWeights(spark, dir).collect()
    assert(w.map(_.getLong(1)).sum ==
      graft.sources.Tables.embeddings(spark, dir).count())
    assert(w.length == SimSearch.KCenterK)
  }

  test("registered pruned query equals the exact form on testdata") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.sources.Tables.fanOut(
      graft.sources.Tables.embeddings(spark, dir))
    val exact = SimSearch.kcenterSelectOf(e, SimSearch.KCenterK).collect()
    val pruned = SimSearch.kcenterSelectPruned(spark, dir).collect()
    assert(pruned.map(_.toString).toSeq == exact.map(_.toString).toSeq)
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
