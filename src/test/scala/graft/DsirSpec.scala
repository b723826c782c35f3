package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Invariants for DSIR importance resampling beyond the DuckDB hash
  * oracle: the selection must actually be target-enriched (the whole
  * point of importance weighting), the weights must be finite and
  * consistent with the target-likeness ordering, and repeated calls
  * must return the identical deterministic sample.
  */
class DsirSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  // sf0.01: the resampling step needs a corpus larger than DsirK for the
  // selection (and its enrichment property) to be non-trivial
  private val dir = "/root/testdata/sf0.01"

  test("dsir selects exactly K docs, deterministically") {
    val a = TextAnalysis.dsirResample(spark, dir).collect()
    val b = TextAnalysis.dsirResample(spark, dir).collect()
    assert(a.length == TextAnalysis.DsirK)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    // ranks are 1..K with the key ordering honored
    assert(a.map(_.getAs[Int]("rank")).toSeq == (1 to TextAnalysis.DsirK))
    val keys = a.map(_.getAs[Double]("key"))
    assert(keys.zip(keys.tail).forall { case (x, y) => x >= y })
    a.foreach { r =>
      assert(!r.getAs[Double]("weight").isNaN)
      assert(!r.getAs[Double]("key").isInfinite)
    }
  }

  test("dsir enriches the target language vs the corpus base rate") {
    val sel = TextAnalysis.dsirResample(spark, dir)
    val selEn = sel.filter(col("lang") === "en").count().toDouble /
      sel.count()
    val docs = Tables.documents(spark, dir)
    val baseEn = docs.filter(col("lang") === "en").count().toDouble /
      docs.count()
    // importance weights fit on the en subset must upweight en docs
    assert(selEn > baseEn,
      s"selected en-share $selEn should exceed base rate $baseEn")
  }

  test("planted vocabulary shift: selection is dominated by target docs") {
    // the corpus tables draw every lang's text from ONE shared word pool
    // (lang is a label, not a lexical reality), so corpus-level
    // enrichment is a weak signal; this planted frame gives the target
    // domain a real vocabulary of its own — the regime DSIR exists for —
    // and pins that the selection then decisively favors it
    import spark.implicits._
    val shared = (0 until 4).map(i => s"shared$i").mkString(" ")
    val docs = (0 until 400).map { i =>
      val tgt = i % 2 == 0
      val vocab = if (tgt) (0 until 8).map(j => s"tgt${(i + j) % 20}")
        else (0 until 8).map(j => s"raw${(i + j) % 20}")
      (i.toLong, s"$shared ${vocab.mkString(" ")}",
        if (tgt) "en" else "xx", "s0")
    }.toDF("doc_id", "text", "lang", "source")
    val sel = TextAnalysis.dsirResampleOf(docs).collect()
    assert(sel.length == TextAnalysis.DsirK)
    val enShare = sel.count(_.getAs[String]("lang") == "en").toDouble / sel.length
    assert(enShare >= 0.8, s"planted-shift selection en share $enShare < 0.8")
  }

  test("en docs carry higher mean importance weight than non-en") {
    val sel = TextAnalysis.dsirResample(spark, dir)
    val byTarget = sel.groupBy(col("lang") === "en")
      .agg(avg("weight").as("w")).collect()
      .map(r => r.getBoolean(0) -> r.getAs[Double]("w")).toMap
    if (byTarget.size == 2) assert(byTarget(true) > byTarget(false))
  }
}
