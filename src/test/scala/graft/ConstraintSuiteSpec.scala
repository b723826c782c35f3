package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiling

/** The Deequ-style constraint suite on hand-built facts where every
  * violation count is computable by eye — both verdict branches live:
  * a clean fact passes all six checks at 10^6 ppm, and each plant
  * modulus trips exactly its own constraint. */
class ConstraintSuiteSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ordersOf(rows: Seq[(Long, java.lang.Long, String, Double, Timestamp)]) =
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate")

  private val cust = Seq(1L, 2L, 3L).toDF("c_custkey")

  private def report(df: org.apache.spark.sql.DataFrame) =
    Profiling.constraintReportOf(df, cust).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap

  test("a clean fact passes all six constraints at 1e6 ppm") {
    val clean = ordersOf(Seq(
      (1L, 1L, "O", 100.0, ts("1995-06-01 00:00:00")),
      (2L, 2L, "F", 50.0, ts("1993-01-15 00:00:00")),
      (3L, 3L, "P", 75.0, ts("1998-12-31 00:00:00"))))
    val out = report(clean)
    assert(out.size == 6)
    out.foreach { case (name, (checked, viol, ppm, passed)) =>
      assert(checked == 3L, name)
      assert(viol == 0L, name)
      assert(ppm == 1000000L, name)
      assert(passed, name)
    }
  }

  test("each plant modulus trips exactly its own constraint") {
    // one order per plant modulus plus one clean row; the plant step
    // corrupts each mod slice with its constraint's defect
    val base = ordersOf(Seq(
      (1L, 1L, "O", 100.0, ts("1995-06-01 00:00:00")),
      (Profiling.PlantNullMod, 1L, "O", 10.0, ts("1995-06-01 00:00:00")),
      (Profiling.PlantDupMod, 2L, "F", 20.0, ts("1995-06-01 00:00:00")),
      (Profiling.PlantStatMod, 3L, "O", 30.0, ts("1995-06-01 00:00:00")),
      (Profiling.PlantNegMod, 1L, "F", 40.0, ts("1995-06-01 00:00:00")),
      (Profiling.PlantDateMod, 2L, "O", 50.0, ts("1995-06-01 00:00:00")),
      (Profiling.PlantRefMod, 3L, "P", 60.0, ts("1995-06-01 00:00:00"))))
    val out = report(Profiling.plantedOrders(base))
    // 7 base rows + 1 duplicated row
    out.foreach { case (name, (checked, _, _, _)) => assert(checked == 8L, name) }
    assert(out("completeness") == ((8L, 1L, 875000L, false)))
    assert(out("uniqueness") == ((8L, 1L, 875000L, false)))
    assert(out("set_membership") == ((8L, 1L, 875000L, false)))
    assert(out("non_negative") == ((8L, 1L, 875000L, false)))
    assert(out("freshness") == ((8L, 1L, 875000L, false)))
    assert(out("ref_integrity") == ((8L, 1L, 875000L, false)))
  }

  test("null custkeys do not count as referential violations") {
    val df = ordersOf(Seq(
      (1L, null, "O", 10.0, ts("1995-06-01 00:00:00")),
      (2L, 999L, "O", 10.0, ts("1995-06-01 00:00:00"))))
    val out = report(df)
    assert(out("completeness")._2 == 1L) // the null
    assert(out("ref_integrity")._2 == 1L) // only the dangling 999
  }
}
