package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CorpusMerge
import graft.sources.Tables

/** Semantics of the keyed MERGE: row-level resolution on a tiny frame
  * where every case is enumerable, then conservation invariants of the
  * registered summary query on the real snapshot.
  */
class CorpusMergeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("mergeUpsert resolves insert / update / delete / carry per key") {
    val snap = Seq((1L, "one", "en", "a"), (2L, "two", "en", "a"),
      (3L, "three", "de", "b"))
      .toDF("doc_id", "text", "lang", "source")
    val changes = Seq(
      (CorpusMerge.OpUpdate, 2L, "two-v2", "en", "a"),
      (CorpusMerge.OpDelete, 3L, "", "de", "b"),
      (CorpusMerge.OpInsert, 4L, "four", "fr", "c"))
      .toDF("op", "doc_id", "text", "lang", "source")
    val merged = CorpusMerge
      .mergeUpsert(snap, changes, "doc_id", Seq("text", "lang", "source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged == Map(1L -> "one", 2L -> "two-v2", 4L -> "four"))
  }

  test("merge summary conserves rows: after == before - deletes + inserts") {
    val before = Tables.documents(spark, dir).count()
    val batch = CorpusMerge.changeBatch(spark, dir)
    val dels = batch.filter(col("op") === CorpusMerge.OpDelete).count()
    val ins = batch.filter(col("op") === CorpusMerge.OpInsert).count()
    val summary = CorpusMerge.mergeSummary(spark, dir).collect()
    val after = summary.map(_.getLong(1)).sum
    assert(after == before - dels + ins)
    // the planted source arrives intact
    val planted = summary.find(_.getString(0) == "planted_merge").get
    assert(planted.getLong(1) == 3 && planted.getLong(3) == 3)
  }

  test("updated text carries the revision suffix into chars_after") {
    // chars_after must exceed the pre-merge char total of surviving rows
    // by exactly |" [rev2]"| per update (7 chars) for non-planted sources
    val snap = Tables.documents(spark, dir)
    val surviving = snap.filter(col("doc_id") % 101 =!= 0)
    val preChars = surviving
      .groupBy("source").agg(sum(length(col("text"))).cast("long").as("pre"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nUpd = surviving.filter(col("doc_id") % 97 === 0)
      .groupBy("source").agg(count(lit(1)).as("n_upd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = CorpusMerge.mergeSummary(spark, dir)
      .filter(col("source") =!= "planted_merge")
      .select("source", "chars_after").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (src, charsAfter) =>
      assert(charsAfter == preChars(src) + 7L * nUpd.getOrElse(src, 0L), src)
    }
  }
}
