package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CorpusMerge

/** Snapshot diff (`q_snapshot_diff`): the round-trip identity
  * diff(apply(S, delta), S) == delta, plus the empty-diff and
  * classification edges on constructed snapshots. */
class SnapshotDiffSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("diff recovers exactly the applied change batch (ops and keys)") {
    val recovered = CorpusMerge.snapshotDiff(spark, dir)
      .select("doc_id", "op").as[(Long, String)].collect().toSet
    val applied = CorpusMerge.changeBatch(spark, dir)
      .select("doc_id", "op").as[(Long, String)].collect().toSet
    assert(recovered == applied)
    assert(recovered.nonEmpty)
  }

  test("diff of identical snapshots is empty") {
    val s = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    assert(CorpusMerge.snapshotDiffOf(s, s).count() == 0)
  }

  test("classification: only-new is I, only-old is D, changed text is U, " +
      "unchanged emits nothing") {
    val before = Seq((1L, "keep"), (2L, "gone"), (3L, "old text")).toDF("doc_id", "text")
    val after = Seq((1L, "keep"), (3L, "new text"), (4L, "fresh")).toDF("doc_id", "text")
    val got = CorpusMerge.snapshotDiffOf(before, after)
      .select("doc_id", "op").as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "D", 3L -> "U", 4L -> "I"))
  }

  test("update rows carry both hashes; inserts/deletes carry one side null") {
    val before = Seq((2L, "gone"), (3L, "old")).toDF("doc_id", "text")
    val after = Seq((3L, "new"), (4L, "fresh")).toDF("doc_id", "text")
    val rows = CorpusMerge.snapshotDiffOf(before, after)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(rows(2L)._1 == "D" && rows(2L)._2.isDefined && rows(2L)._3.isEmpty)
    assert(rows(4L)._1 == "I" && rows(4L)._2.isEmpty && rows(4L)._3.isDefined)
    assert(rows(3L)._1 == "U" && rows(3L)._2.isDefined && rows(3L)._3.isDefined &&
      rows(3L)._2 != rows(3L)._3)
  }
}
