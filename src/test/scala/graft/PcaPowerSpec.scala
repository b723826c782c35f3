package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimSearch

/** Planted-geometry tests for the relational PCA power iteration
  * (`SimSearch.pcaPowerOf`): a corpus whose variance is concentrated
  * along one known axis must yield a loading vector aligned with that
  * axis, a unit-norm loading, and an explained fraction that reflects
  * the planted concentration. */
class PcaPowerSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** 40 vectors in R^4: ±10 along axis 2 plus small fixed off-axis
    * noise, so the dominant eigenvector of the (uncentered) scatter is
    * e2 and its eigenvalue dwarfs the rest. */
  private lazy val planted = {
    val rows = (0 until 40).map { i =>
      val sign = if (i % 2 == 0) 1f else -1f
      val noise = (i % 5).toFloat * 0.01f
      (i.toLong, Seq(noise, 10f * sign, -noise, 0.02f * sign))
    }
    rows.toDF("vec_id", "embedding")
  }

  private lazy val result = SimSearch.pcaPowerOf(planted).collect()

  test("one row per dimension, in order") {
    assert(result.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
  }

  test("dominant loading is the planted axis, others near zero") {
    val loads = result.map(r => math.abs(r.getDouble(1)))
    assert(loads(1) > 0.999, s"axis-1 loading ${loads(1)}")
    assert(loads(0) < 0.01 && loads(2) < 0.01 && loads(3) < 0.01,
      s"off-axis loadings ${loads.toSeq}")
  }

  test("loading vector has unit norm") {
    val n2 = result.map(_.getDouble(1)).map(x => x * x).sum
    // loadings are 6dp-rounded, so allow the accumulated rounding slack
    assert(math.abs(n2 - 1.0) < 1e-5, s"norm^2 $n2")
  }

  test("explained fraction captures the planted concentration") {
    val fracs = result.map(_.getDouble(2)).distinct
    assert(fracs.length == 1) // one global scalar, repeated per row
    assert(fracs.head > 0.99 && fracs.head <= 1.0, s"eigval_frac ${fracs.head}")
  }

  test("deterministic across repartitionings") {
    val shuffled = SimSearch.pcaPowerOf(planted.repartition(7)).collect()
    assert(result.map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq ==
      shuffled.map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq)
  }
}
