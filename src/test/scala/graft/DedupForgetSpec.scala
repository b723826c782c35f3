package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusMerge, Dedup}

/** Erasure propagation through the persisted LSH band index: the
  * minhash signatures are doc-local (no corpus-derived stats to
  * refold), so retraction is exactly the broadcast anti-join — the
  * spec pins retracted ≡ rebuilt and that a forgotten document never
  * surfaces as a dup_of again. */
class DedupForgetSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val d = graft.sources.Tables.fanOut(
    graft.sources.Tables.documents(spark, dir))

  test("retracted band index == index rebuilt on the kept snapshot") {
    val evens = d.filter(col("doc_id") % 2 === 0)
    val forget = d.filter(
        col("doc_id") % CorpusMerge.ForgetMod === CorpusMerge.ForgetRem)
      .select("doc_id")
    val batch = d.filter(col("doc_id") % 2 === 1)
    val retracted = Dedup.probeBandIndex(batch,
        Dedup.bandIndexOf(evens)
          .join(forget, Seq("doc_id"), "left_anti"))
      .collect().map(_.toString).sorted.toSeq
    val rebuilt = Dedup.probeBandIndex(batch,
        Dedup.bandIndexOf(evens.join(forget, Seq("doc_id"), "left_anti")))
      .collect().map(_.toString).sorted.toSeq
    assert(retracted == rebuilt)
    assert(retracted.nonEmpty)
  }

  test("registered screen: no forgotten doc ever surfaces as dup_of") {
    val out = Dedup.bandIndexForgetScreen(spark, dir)
    assert(out.filter(col("dup_of") % CorpusMerge.ForgetMod
      === CorpusMerge.ForgetRem).count() == 0)
    assert(out.count() > 0)
  }
}
