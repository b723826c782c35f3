package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusMerge, SimSearch}

/** IVF-PQ index retraction (FAISS remove_ids semantics): serving from
  * the retracted inverted lists must equal a full re-encode at the
  * SAME frozen artifacts with the forgotten rows excluded, and a
  * forgotten vector must never surface as a neighbor. */
class AnnForgetSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val e = graft.sources.Tables.fanOut(
    graft.sources.Tables.embeddings(spark, dir))

  test("retracted serve == rebuilt-at-frozen-artifacts on the kept corpus") {
    import spark.implicits._
    val snap = e.filter(col("vec_id") % 2 === 0)
    val batch = e.filter(col("vec_id") % 2 === 1)
    val forgetIds = e.filter(col("vec_id") % 5 === 2).select("vec_id")
    val retracted = SimSearch.annIndexForgetServeOf(e, snap, batch, forgetIds)
      .collect().map(_.toString).toSeq
    // rebuild arm: same frozen snap artifacts, union minus the erased
    val keptUnion = e.join(forgetIds, Seq("vec_id"), "left_anti")
    val rebuilt = SimSearch.annIndexRebuildServeOf(e, snap, keptUnion)
      .collect().map(_.toString).toSeq
    assert(retracted == rebuilt)
    assert(retracted.nonEmpty)
  }

  test("registered serve: no forgotten vector is ever a neighbor") {
    val out = SimSearch.annIndexForgetServe(spark, dir)
    assert(out.filter(col("neighbor") % CorpusMerge.ForgetMod
      === CorpusMerge.ForgetRem).count() == 0)
    // every query still gets a full top-k from the surviving lists
    assert(out.count() == SimSearch.NQueries * 3L)
  }

  test("retraction decrements the list counts by the erased membership") {
    import spark.implicits._
    val snap = e.filter(col("vec_id") % 2 === 0)
    val (cents, book, snapAssign, snapCodes) =
      SimSearch.annMergeScaleFrames(snap)
    val forgetIds = e.filter(col("vec_id") % 5 === 2).select("vec_id")
    val (fa, _) = SimSearch.annIndexForgetOf(snapAssign, snapCodes, forgetIds)
    val before = SimSearch.mergedListCounts(snapAssign).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after = SimSearch.mergedListCounts(fa).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val erasedPerCell = snapAssign.join(forgetIds, "vec_id")
      .groupBy("cent_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    before.foreach { case (cell, n) =>
      assert(after.getOrElse(cell, 0L) == n - erasedPerCell.getOrElse(cell, 0L))
    }
    val _ = (cents, book)
  }
}
