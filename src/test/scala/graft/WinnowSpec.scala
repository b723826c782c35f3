package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Pins the winnowing fingerprint semantics (Schleimer et al., SIGMOD
  * 2003): the detection guarantee for shared substrings of length ≥
  * w + k − 1, exact-duplicate saturation, position-shift robustness,
  * and the df-capped pair join.
  */
class WinnowSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val guarantee = Dedup.WinnowW + Dedup.WinnowK - 1 // 11 chars

  private def docs(texts: (Long, String)*) =
    texts.map { case (id, t) => (id, t) }.toDF("doc_id", "text")

  private def fps(texts: (Long, String)*): Map[Long, Set[Long]] =
    Dedup.winnowFingerprintsOf(docs(texts: _*))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).toSet }

  test(s"shared substring of length >= $guarantee guarantees a shared fingerprint") {
    // normalized texts share the contiguous run " sharedrun " plus the
    // word's 9 chars = well past the 11-char guarantee; everything else
    // is disjoint
    val f = fps(
      1L -> "alpha beta sharedrun gamma delta",
      2L -> "omega psi chi sharedrun upsilon")
    assert((f(1L) intersect f(2L)).nonEmpty)
  }

  test("disjoint texts share no fingerprints") {
    val f = fps(
      1L -> "aaaa bbbb cccc dddd eeee ffff",
      2L -> "gggg hhhh iiii jjjj kkkk llll")
    assert((f(1L) intersect f(2L)).isEmpty)
  }

  test("exact duplicates have identical fingerprint sets") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val f = fps(1L -> t, 2L -> t)
    assert(f(1L) == f(2L) && f(1L).nonEmpty)
  }

  test("a long prefix insertion shifts positions but keeps most fingerprints") {
    val body = "winnowing selects window minima so positions do not matter much here"
    val f = fps(1L -> body, 2L -> ("totally unrelated preamble words " + body))
    val shared = (f(1L) intersect f(2L)).size
    // all of doc 1's body fingerprints except O(w) boundary effects
    // survive the global position shift
    assert(shared >= (f(1L).size * 3) / 4)
  }

  test("fingerprint density: between 1/w and every gram") {
    val t = "some reasonably long text for density accounting of the winnow"
    val f = fps(1L -> t)
    val norm = t // already normalized: lowercase, single spaces, no punct
    val m = norm.length - Dedup.WinnowK + 1
    val windows = m - Dedup.WinnowW + 1
    assert(f(1L).size <= windows)
    assert(f(1L).size >= windows / Dedup.WinnowW)
  }

  test("pair join reports exact dup with overlap 1.0 and symmetric sizes") {
    val t = "identical corpus document planted twice for the pair join"
    val out = Dedup.winnowPairsOf(docs(1L -> t, 2L -> t, 3L -> "other unrelated words entirely here"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == r.getLong(3) && r.getLong(3) == r.getLong(4))
    assert(r.getDouble(5) == 1.0)
  }

  test("registered query: every truncation plant pairs with its base doc") {
    val out = graft.SparkEntry.queries("q_dedup_winnow")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    // truncated copies carry doc_id + 2000000 and share their whole text
    // with the base as a prefix — the guaranteed-positive geometry
    val plantPairs = pairs.filter { case (a, b) => b == a + 2000000L }
    assert(plantPairs.nonEmpty)
    // prefix fps are a subset of base fps, minus the fingerprints the
    // df cap excludes from the SHARED count (but not from sizes) — the
    // generator's 30-word vocabulary makes many fingerprints hot, so
    // the floor is well under 1.0 by design
    out.filter(r => r.getLong(1) == r.getLong(0) + 2000000L).foreach { r =>
      assert(r.getDouble(5) >= 0.5)
    }
  }
}
