package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Planted-arithmetic tests for the CCNet-style boilerplate strip:
  * a footer shared by ≥ minDf docs must be removed span-exactly, while
  * spans below the threshold (ordinary cross-doc duplication — the
  * dedup detectors' territory, not boilerplate) stay untouched. */
class BoilerplateSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // source "a": 6 docs, 3 unique tokens + a 9-token footer each.
  // Footer-interior 8-grams (2 of them) have df=6; junction grams are
  // unique per doc. source "b": 2 docs sharing a full 8-gram (df=2).
  private val footer = (1 to 9).map(i => s"f$i").mkString(" ")
  private lazy val corpus = (
    (0 until 6).map(i => (i.toLong, "a", s"u${i}x u${i}y u${i}z $footer")) ++
    Seq((10L, "b", "s1 s2 s3 s4 s5 s6 s7 s8 tail10"),
        (11L, "b", "head11 s1 s2 s3 s4 s5 s6 s7 s8"))
  ).toDF("doc_id", "source", "text")

  private lazy val result =
    TextAnalysis.boilerplateStripOf(corpus, n = 8, minDf = 3).collect()

  test("footer spans are removed exactly, clean source untouched") {
    val bySource = result.map(r => r.getString(0) -> r).toMap
    val a = bySource("a")
    assert(a.getLong(1) == 6)            // n_docs
    assert(a.getLong(2) == 72)           // tokens_total = 6 * 12
    assert(a.getLong(3) == 2)            // the two footer-interior grams
    assert(a.getLong(4) == 54)           // 9 footer tokens * 6 docs
    assert(a.getDouble(5) == 0.75)
    val b = bySource("b")
    assert(b.getLong(3) == 0 && b.getLong(4) == 0)
    assert(b.getDouble(5) == 0.0)
  }

  test("threshold boundary: df == minDf is boilerplate") {
    // exactly 3 docs share the footer -> still flagged at minDf = 3
    val three = corpus.filter($"doc_id" < 3 || $"source" === "b")
    val got = TextAnalysis.boilerplateStripOf(three, n = 8, minDf = 3)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(got("a") == 27)
    assert(got("b") == 0)
  }

  test("deterministic across repartitionings") {
    val again = TextAnalysis.boilerplateStripOf(corpus.repartition(5),
      n = 8, minDf = 3).collect()
    assert(result.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("apply action rebuilds exactly the uncovered token sequence") {
    val cleaned = TextAnalysis.boilerplateApplyOf(corpus, n = 8, minDf = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // source-a docs lose the 9 footer tokens, keeping their 3 unique ones
    (0 until 6).foreach { i =>
      val (n, hash) = cleaned(i.toLong)
      assert(n == 3)
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(s"u${i}x u${i}y u${i}z".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(hash == expect, s"doc $i")
    }
    // source-b docs are untouched: all 9 tokens survive
    assert(cleaned(10L)._1 == 9 && cleaned(11L)._1 == 9)
    // totals reconcile with the report's removal accounting
    val removedTotal = result.map(_.getLong(4)).sum
    val keptTotal = cleaned.values.map(_._1).sum
    val allTokens = result.map(_.getLong(2)).sum
    assert(keptTotal + removedTotal == allTokens)
  }
}
