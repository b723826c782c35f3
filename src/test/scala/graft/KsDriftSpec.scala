package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiling

/** Pins the two-sample KS statistic: hand-computed sup values, the
  * zero case for identical samples, bounds, and the deterministic sup
  * tie-break.
  */
class KsDriftSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ks(ref: Seq[Long], cur: Seq[Long]) =
    Profiling.ksDriftOf(
      (ref.map(("ref", _)) ++ cur.map(("cur", _))).toDF("snap", "v"))
      .collect().head

  test("identical samples give KS = 0") {
    val r = ks(Seq(1L, 2L, 3L, 3L), Seq(1L, 2L, 3L, 3L))
    assert(r.getDouble(3) == 0.0)
    assert(!r.getBoolean(5))
  }

  test("disjoint supports give KS = 1 at the boundary value") {
    val r = ks(Seq(1L, 1L, 2L), Seq(5L, 6L, 7L))
    assert(r.getDouble(3) == 1.0)
    assert(r.getLong(0) == 2L) // sup attained at ref's max value
    // crit = 1.358·√(6/9) ≈ 1.109 > 1: three-point samples cannot
    // reject even at maximal separation — the significance floor works
    assert(!r.getBoolean(5))
  }

  test("hand-computed mixed case") {
    // ref = [1,2,3,4], cur = [3,4,5,6]
    // F_ref: 1→.25, 2→.5, 3→.75, 4→1 ; F_cur: 3→.25, 4→.5, 5→.75, 6→1
    // gaps: v=1 .25, v=2 .5, v=3 .5, v=4 .5, v=5 .25, v=6 0
    // sup = 0.5 first attained at v=2 (tie-break asc)
    val r = ks(Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L))
    assert(r.getDouble(3) == 0.5)
    assert(r.getLong(0) == 2L)
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
  }

  test("registered query: bounds and census at sf0.001") {
    val r = Profiling.ksDrift(spark, "/root/testdata/sf0.001").collect().head
    val (tRef, tCur, stat, crit) =
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
    assert(stat >= 0.0 && stat <= 1.0)
    assert(crit > 0.0)
    val n = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001").count()
    assert(tRef + tCur == n)
    // parity split of one generator distribution: no real drift signal
    assert(r.getBoolean(5) == (stat > crit))
  }
}
