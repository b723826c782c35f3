package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Pins for the variable-length exact-substring dedup
  * ([[TextAnalysis.dupSpanApplyMaximalOf]]) at the Lee-et-al 50-token
  * threshold: a 49-token cross-document repeat SURVIVES, a 50-token
  * repeat is STRIPPED span-exactly, and chained coverage across
  * different partner documents merges into one maximal run. */
class SpanMaximalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def words(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")
  private def md5Of(tokens: Seq[String]): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tokens.mkString(" ").getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  private val r50 = words("r", 50)
  private val r49 = words("q", 49)
  private lazy val corpus = Seq(
    (0L, (words("a", 10) ++ r50 ++ words("b", 10)).mkString(" ")),
    (1L, (words("c", 10) ++ r50 ++ words("d", 10)).mkString(" ")),
    (2L, (words("e", 10) ++ r49 ++ words("f", 10)).mkString(" ")),
    (3L, (words("g", 10) ++ r49 ++ words("h", 10)).mkString(" ")))
    .toDF("doc_id", "text")

  private lazy val result =
    TextAnalysis.dupSpanApplyMaximalOf(corpus).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("a 50-token cross-document repeat is stripped span-exactly") {
    val (runs0, kept0, md50) = result(0L)
    assert(runs0 == 1L && kept0 == 20L)
    assert(md50 == md5Of(words("a", 10) ++ words("b", 10)))
    val (runs1, kept1, md51) = result(1L)
    assert(runs1 == 1L && kept1 == 20L)
    assert(md51 == md5Of(words("c", 10) ++ words("d", 10)))
  }

  test("a 49-token repeat survives untouched (below the threshold)") {
    val (runs2, kept2, md52) = result(2L)
    assert(runs2 == 0L && kept2 == 69L)
    assert(md52 == md5Of(words("e", 10) ++ r49 ++ words("f", 10)))
    val (runs3, kept3, md53) = result(3L)
    assert(runs3 == 0L && kept3 == 69L)
    assert(md53 == md5Of(words("g", 10) ++ r49 ++ words("h", 10)))
  }

  test("chained coverage across different partners merges into one run") {
    // doc 4 carries a 52-token region whose FIRST 30 tokens repeat in
    // doc 5 and LAST 30 in doc 6 — no single partner holds the whole
    // region, but the gram starts chain into one consecutive island,
    // so doc 4 strips it; docs 5/6 each hold only a 30-token repeat
    // and survive (below the threshold)
    val x = words("x", 52)
    val chained = Seq(
      (4L, (x ++ words("t", 10)).mkString(" ")),
      (5L, (words("u", 10) ++ x.take(30) ++ words("v", 10)).mkString(" ")),
      (6L, (words("w", 10) ++ x.drop(22) ++ words("y", 10)).mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.dupSpanApplyMaximalOf(chained).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(4L) == ((1L, 10L, md5Of(words("t", 10)))), got.toString)
    assert(got(5L)._1 == 0L && got(5L)._2 == 50L)
    assert(got(6L)._1 == 0L && got(6L)._2 == 50L)
  }

  test("a fully-duplicated long document pair vanishes from the output") {
    val dup = Seq(
      (7L, r50.mkString(" ")),
      (8L, r50.mkString(" ")),
      (9L, words("z", 5).mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.dupSpanApplyMaximalOf(dup).collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(9L))
  }

  test("deterministic across repartitionings") {
    val again = TextAnalysis.dupSpanApplyMaximalOf(corpus.repartition(7))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(again == result)
  }
}
