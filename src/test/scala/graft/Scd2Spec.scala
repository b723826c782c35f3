package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CorpusMerge

/** Pins for the SCD Type-2 history build ([[CorpusMerge.scd2Of]] /
  * [[CorpusMerge.scd2History]]): interval chaining, the at-most-one
  * current version invariant, delete-closes / insert-reopens, and the
  * constructed-log arithmetic. */
class Scd2Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("constructed log: update supersedes, delete closes, insert reopens") {
    val log = Seq(
      // key 1: insert -> update -> current
      (1L, 1L, "I", "one v1"), (1L, 2L, "U", "one v2"),
      // key 2: insert -> delete (no current version)
      (2L, 1L, "I", "two v1"), (2L, 2L, "D", ""),
      // key 3: insert -> delete -> REINSERT (revived, current)
      (3L, 1L, "I", "three v1"), (3L, 2L, "D", ""), (3L, 3L, "I", "three v3"),
      // key 4: single insert, never touched
      (4L, 1L, "I", "four v1"))
      .toDF("doc_id", "version", "op", "text")
    val h = CorpusMerge.scd2Of(log).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
      .toSet
    assert(h == Set(
      (1L, 1L, Some(2L), false), (1L, 2L, None, true),
      (2L, 1L, Some(2L), false),
      (3L, 1L, Some(2L), false), (3L, 3L, None, true),
      (4L, 1L, None, true)))
  }

  test("registered history: intervals chain and at most one current per key") {
    val rows = CorpusMerge.scd2History(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
    rows.groupBy(_._1).foreach { case (key, ivs) =>
      assert(ivs.count(_._4) <= 1, s"key $key has multiple current versions")
      // closed intervals are exactly the non-current ones
      ivs.foreach { case (_, _, to, cur) => assert(to.isEmpty == cur) }
      // intervals are well-formed and never overlap: sorted by
      // valid_from, each closed interval ends at or before the next
      // interval's start (a delete may leave a gap before a revival)
      val sorted = ivs.sortBy(_._2)
      sorted.foreach { case (_, from, to, _) =>
        to.foreach(t => assert(t > from, s"key $key: empty interval"))
      }
      sorted.sliding(2).foreach {
        case Array((_, _, to, _), (_, from2, _, _)) =>
          assert(to.exists(_ <= from2), s"key $key: overlapping intervals")
        case _ => ()
      }
    }
    // doc 0 is divisible by 101 (v2 delete) and 89 (v3 update): the
    // delete-then-revive key — one closed [1,2) interval, one open [3,_)
    val doc0 = rows.filter(_._1 == 0L).sortBy(_._2)
    assert(doc0.toSeq == Seq((0L, 1L, Some(2L), false), (0L, 3L, None, true)))
    // the v2 arrival that v3 deletes: one closed interval, none current
    val killed = rows.filter(_._1 == CorpusMerge.InsertedDocs(1)._1)
    assert(killed.toSeq == Seq((CorpusMerge.InsertedDocs(1)._1, 2L, Some(3L), false)))
    // the v2 arrival that v3 revises: closed [2,3) then open [3,_)
    val revised = rows.filter(_._1 == CorpusMerge.InsertedDocs(0)._1).sortBy(_._2)
    assert(revised.map(t => (t._2, t._3, t._4)).toSeq ==
      Seq((2L, Some(3L), false), (3L, None, true)))
  }

  test("time travel: AS-OF 1 is the load, AS-OF 2 is the merged corpus") {
    val dir = "/root/testdata/sf0.001"
    val census = CorpusMerge.timeTravelCensus(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val snap = graft.sources.Tables.documents(spark, dir)
    assert(census(1L) == snap.count())
    val merged = CorpusMerge.mergeUpsert(snap,
      CorpusMerge.changeBatch(spark, dir), "doc_id",
      Seq("text", "lang", "source"))
    assert(census(2L) == merged.count())
  }
}
