package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SimSearch

/** OPQ (rotate-then-PQ) tests over a corpus PLANTED to be anisotropic in
  * exactly the way OPQ exists to fix: both dominant variance directions
  * (dims 0 and 1) live inside subspace 0, so plain PQ must quantize a
  * wide 2-D spread with subspace 0's 16 codewords while the other 7
  * codebooks see only noise. The Householder rotation spreads the top
  * principal direction across every subspace, so rotated-PQ recall must
  * beat plain-PQ recall — the Ge et al. claim, machine-checked. */
class OpqSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def noise(i: Int, d: Int): Float = (((i * 131 + d * 17) % 7) - 3) * 0.02f

  private def vec(i: Int): Seq[Float] = {
    val a = (i % 23).toFloat
    val b = ((i * 5) % 19).toFloat
    (0 until 64).map { d =>
      val base = if (d == 0) a else if (d == 1) b else 0f
      base + noise(i, d)
    }
  }

  private lazy val planted =
    (0 until 240).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  private def l2sq(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("Householder rotation preserves pairwise L2 distances") {
    val orig = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val rot = SimSearch.opqRotatedOf(planted).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rot.keySet == orig.keySet)
    for (i <- 0L until 20L; j <- (i + 1) to 20L) {
      val dOrig = l2sq(orig(i), orig(j))
      val dRot  = l2sq(rot(i), rot(j))
      // exact orthogonality up to the 6dp element rounding
      assert(math.abs(dOrig - dRot) < 1e-2 * math.max(1.0, dOrig),
        s"pair ($i,$j): orig=$dOrig rot=$dRot")
    }
  }

  test("rotated-PQ recall beats plain-PQ recall on the anisotropic corpus") {
    val means = SimSearch.pqRecallOf(planted)
      .groupBy("method").agg(avg("recall").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // measured: opq_adc ≈ 0.73, pq_adc ≈ 0.37 — pin a wide margin so
    // the test asserts the mechanism, not the third decimal
    assert(means("opq_adc") >= means("pq_adc") + 0.2,
      s"opq=${means("opq_adc")} pq=${means("pq_adc")}")
  }

  test("deterministic across repartitionings") {
    val a = SimSearch.opqTopKOf(planted).collect().map(_.toSeq).toSeq
    val b = SimSearch.opqTopKOf(planted.repartition(7)).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("identity guard: a corpus whose top PC is the balanced diagonal is untouched") {
    // x = t·1 exactly: the scatter is rank-1 on the all-ones direction,
    // power iteration lands on w = 1/8 per dim exactly (binary-exact
    // seed, symmetric normalize), so u = 0 and uᵀu = 0 — the f=0 guard
    // must leave every vector as-is (6dp-rounded) instead of dividing 0/0
    val diag = (1 to 40)
      .map(i => (i.toLong, Seq.fill(64)(i.toFloat))).toDF("vec_id", "embedding")
    val rot = SimSearch.opqRotatedOf(diag).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    (1 to 40).foreach { i =>
      assert(rot(i.toLong).forall(v => math.abs(v - i.toDouble) < 1e-6),
        s"vector $i moved")
    }
  }
}
