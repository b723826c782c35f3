package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Index retraction (the right-to-be-forgotten path): the retracted
  * index must be ROW-FOR-ROW the index rebuilt on the kept corpus —
  * stats refold, df decrements, last-posting words drop — and a
  * forgotten document must never surface in a serve again. */
class Bm25ForgetSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana cherry"),
    (2L, "apple banana"),
    (3L, "apple unique3 unique3"),  // to forget: sole holder of unique3
    (4L, "banana cherry cherry"),
    (5L, "apple cherry")).toDF("doc_id", "text")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toString).sorted.toSeq

  test("retracted index == index rebuilt on the kept corpus, row for row") {
    val forget = Seq(3L).toDF("doc_id")
    val retracted = TextAnalysis.bm25ForgetIndexOf(
      TextAnalysis.bm25Postings(docs), forget)
    val rebuilt = TextAnalysis.bm25IndexOf(docs.filter($"doc_id" =!= 3L))
    assert(rows(retracted) == rows(rebuilt))
    // the forgotten doc's private vocabulary left the index entirely
    assert(retracted.filter($"word" === "unique3").count() == 0)
    assert(retracted.filter($"doc_id" === 3L).count() == 0)
  }

  test("an empty erasure list is the identity") {
    val retracted = TextAnalysis.bm25ForgetIndexOf(
      TextAnalysis.bm25Postings(docs), Seq.empty[Long].toDF("doc_id"))
    assert(rows(retracted) == rows(TextAnalysis.bm25IndexOf(docs)))
  }

  test("registered serve: no forgotten doc is ever returned") {
    import org.apache.spark.sql.functions.col
    val out = TextAnalysis.bm25IndexForgetServe(spark, "/root/testdata/sf0.001")
    assert(out.filter(col("doc_id") % graft.operators.CorpusMerge.ForgetMod
      === graft.operators.CorpusMerge.ForgetRem).count() == 0)
    assert(out.count() > 0)
    // probe 3 queries with its own erased text and cannot find itself
    assert(out.filter(col("query_id") === 3L).count() > 0 ||
      out.filter(col("query_id") === 1L).count() > 0)
  }
}
