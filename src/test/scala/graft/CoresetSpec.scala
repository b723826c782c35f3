package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimSearch

/** Lightweight-coreset sampling (Bachem et al. 2018) on constructed
  * geometry where every quantity is hand-computable in exact binary:
  * 60 cluster points at the origin and 4 outliers at x = 10 give mean
  * x = 40/64 = 0.625 (exact), d² = 0.390625 / 87.890625 (exact), and
  * sensitivities q = 1/120 and 1/8 exactly — so the 1/(m·q) weights
  * must come out 3.75 and 0.25 on the nose. */
class CoresetSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val planted = {
    val cluster = (0 until 60).map(i =>
      (i.toLong, Array(0.0f, 0.0f, 0.0f, 0.0f)))
    val outliers = (60 until 64).map(i =>
      (i.toLong, Array(10.0f, 0.0f, 0.0f, 0.0f)))
    (cluster ++ outliers).toDF("vec_id", "embedding")
  }

  test("sensitivities and weights are the hand-computed exact values") {
    val out = SimSearch.coresetTailOf(SimSearch.coresetScoredOf(planted))
      .collect()
    assert(out.length == SimSearch.CoresetM)
    assert(out.map(_.getLong(0)).toSeq == (1L to SimSearch.CoresetM.toLong))
    val byKind = out.map { r =>
      (r.getLong(1), r.getDouble(2), r.getDouble(3))
    }
    byKind.foreach { case (id, weight, d2) =>
      if (id >= 60) { // outlier: q = 0.5/64 + 0.5*87890625/375000000 = 1/8
        assert(weight == 0.25, s"outlier $id weight $weight")
        assert(d2 == 87.890625)
      } else {        // cluster: q = 1/128 + 1/1920 = 1/120
        assert(weight == 3.75, s"cluster $id weight $weight")
        assert(d2 == 0.390625)
      }
    }
    // both strata are present in a 32-point draw at these sensitivities
    assert(byKind.exists(_._1 >= 60) && byKind.exists(_._1 < 60))
    // no vec_id drawn twice (A-Res is without replacement)
    assert(out.map(_.getLong(1)).distinct.length == out.length)
  }

  test("all-identical corpus degrades to the pure uniform draw (no 0/0)") {
    val flat = (0 until 40).map(i => (i.toLong, Array(1.5f, -2.0f)))
      .toDF("vec_id", "embedding")
    val out = SimSearch.coresetTailOf(SimSearch.coresetScoredOf(flat))
      .collect()
    assert(out.length == SimSearch.CoresetM)
    // q = 1/N = 1/40, weight = 1/(32/40) = 1.25, d2 = 0
    assert(out.forall(r => r.getDouble(2) == 1.25 && r.getDouble(3) == 0.0))
  }

  test("the draw is reproducible: two runs select identical rows") {
    val a = SimSearch.coresetTailOf(SimSearch.coresetScoredOf(planted))
      .collect().map(_.toString).toSeq
    val b = SimSearch.coresetTailOf(SimSearch.coresetScoredOf(planted))
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("train kernel matches a driver-side weighted-Lloyd replay exactly") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def roundL(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def l2(a: Seq[Float], b: Seq[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) =>
        acc + (a(i).toDouble - b(i)) * (a(i).toDouble - b(i)))
    val emb = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val coreset = SimSearch.coresetTailOf(SimSearch.coresetScoredOf(planted))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // replay: wfx, seeds = first K by rnk, one assign + recenter pass
    val pts = coreset.map { case (rnk, id, w) =>
      (rnk, id, roundL(w * 1e6), emb(id)) }
    val seeds = pts.filter(_._1 <= SimSearch.CoresetTrainK)
      .map(p => p._1 -> p._4.map(_.toDouble)).toMap
    def assign(v: Seq[Float], cents: Map[Long, Seq[Double]]): Long =
      cents.toSeq.map { case (cid, c) => (round6(l2(v, c)), cid) }.min._2
    val a1 = pts.map(p => (assign(p._4, seeds), p._3, p._4))
    val cents = a1.groupBy(_._1).map { case (cid, rows) =>
      val sw = rows.map(_._2).sum
      cid -> rows.head._3.indices.map { d =>
        rows.map(r => r._2 * roundL(r._3(d).toDouble * 1e6)).sum.toDouble /
          (sw.toDouble * 1e6)
      }
    }
    val corpusAsg = emb.toSeq.map { case (id, v) =>
      val cid = assign(v, cents)
      (cid, round6(l2(v, cents(cid))))
    }
    val expected = corpusAsg.groupBy(_._1).map { case (cid, rows) =>
      cid -> ((a1.count(_._1 == cid).toLong, 0.0,
        rows.length.toLong, rows.map(r => roundL(r._2 * 1e6)).sum))
    }
    val out = SimSearch.coresetTrainOf(planted,
      SimSearch.coresetTailOf(SimSearch.coresetScoredOf(planted))).collect()
    assert(out.map(_.getLong(3)).sum == 64L) // every corpus point assigned
    out.foreach { r =>
      val e = expected(r.getLong(0))
      assert(r.getLong(1) == e._1, s"n_coreset for cid ${r.getLong(0)}")
      assert(r.getLong(3) == e._3, s"n_corpus for cid ${r.getLong(0)}")
      assert(math.abs(r.getDouble(4) - e._4.toDouble / 1e6) < 1e-4,
        s"sse for cid ${r.getLong(0)}")
      assert(math.abs(r.getDouble(2) -
        a1.filter(_._1 == r.getLong(0)).map(_._2).sum.toDouble / 1e6) < 1e-4,
        s"mass for cid ${r.getLong(0)}")
    }
  }

  test("registered query: m rows, positive weights, rnk is a permutation prefix") {
    val out = SimSearch.coresetLightweight(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == SimSearch.CoresetM)
    assert(out.map(_.getLong(0)).toSeq == (1L to SimSearch.CoresetM.toLong))
    assert(out.forall(_.getDouble(2) > 0.0))
  }
}
