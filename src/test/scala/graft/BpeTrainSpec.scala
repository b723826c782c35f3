package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Pins the iterated BPE trainer's merge semantics (Sennrich et al.,
  * ACL 2016): greedy argmax with deterministic tie-breaks, leftmost
  * non-overlapping merge application, early exhaustion, and the
  * round-trip invariant that trained segmentations always rebuild
  * their word.
  */
class BpeTrainSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, "en", t) }
      .toDF("doc_id", "lang", "text")

  test("classic corpus learns merges in weighted-frequency order") {
    // vocab: low ×4, lowest ×2 (each distinct word counted once,
    // weighted by corpus frequency).
    // round 1 pairs: (l,o)=6 (w,e)=2 (e,s)=2 (s,t)=2 (o,w)=6 →
    //   tie (l,o) vs (o,w) at 6 → lexicographic: (l,o)
    // round 2: (lo,w)=6 wins
    // round 3: low,e / e,s / s,t all 2 → lexicographic: (e,s)
    val d = docs("low low low", "low lowest", "lowest")
    val m = TextAnalysis.bpeMergesOf(d, 3)
    assert(m == Seq(
      (1L, "l", "o", "lo", 6L),
      (2L, "lo", "w", "low", 6L),
      (3L, "e", "s", "es", 2L)))
  }

  test("identical-symbol runs merge leftmost non-overlapping") {
    // "aaaa": round 1 merges (a,a) pairwise → [aa,aa], NOT [aaa,a];
    // round 2 merges (aa,aa) → [aaaa]; round 3 finds no pairs → stops
    val m = TextAnalysis.bpeMergesOf(docs("aaaa aaaa"), 5)
    assert(m == Seq(
      (1L, "a", "a", "aa", 6L),
      (2L, "aa", "aa", "aaaa", 2L)))
    // freq round 1: word "aaaa" has pairs (a,a)×3, n_w=2 → 6
  }

  test("odd run leaves the trailing singleton unmerged") {
    // "aaa" → [aa, a]: the round-2 top pair is (aa, a)
    val m = TextAnalysis.bpeMergesOf(docs("aaa"), 2)
    assert(m == Seq(
      (1L, "a", "a", "aa", 2L),
      (2L, "aa", "a", "aaa", 1L)))
  }

  test("non-alphanumeric words are out of training scope") {
    val m = TextAnalysis.bpeMergesOf(docs("héllo héllo wörld ab ab"), 1)
    // only "ab" is trainable; accents fall outside BpeWordPattern
    assert(m == Seq((1L, "a", "b", "ab", 2L)))
  }

  test("training is deterministic across repeated runs") {
    val d = docs("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs")
    assert(TextAnalysis.bpeMergesOf(d, 6) == TextAnalysis.bpeMergesOf(d, 6))
  }

  test("registered queries: train rows and apply invariants at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val merges = TextAnalysis.bpeTrain(spark, dir).collect()
    assert(merges.length == TextAnalysis.BpeTrainRounds)
    // merged symbol is always the concatenation; frequencies are
    // monotone non-increasing is NOT guaranteed (later merges can beat
    // earlier compounds), but every freq is positive
    merges.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0L)
    }
    val stats = TextAnalysis.bpeApply(spark, dir).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val chars = r.getLong(3); val toks = r.getLong(4)
      assert(toks <= chars) // merging never splits below chars
      assert(toks > 0L && r.getDouble(5) >= 1.0)
    }
  }

  test("segmentations rebuild their word exactly (round-trip invariant)") {
    val d = docs("banana bandana banana cabana", "ban can an a")
    val merges = TextAnalysis.bpeMergesOf(d, 4)
    // replay the merge chain the way bpeApply does and check every
    // token list concatenates back to its word
    val vocab = d.select(explode(graft.functions.TextFunctions.tokenize(col("text"))).as("word"))
      .filter(col("word").rlike(TextAnalysis.BpeWordPattern) && length(col("word")) >= 2)
      .distinct()
      .withColumn("seg", concat(lit("|"), array_join(
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
        "||"), lit("|")))
    val fin = merges.foldLeft(vocab) { (df, m) =>
      df.withColumn("seg",
        expr(s"replace(seg, '|${m._2}||${m._3}|', '|${m._2}${m._3}|')"))
    }
    val rows = fin.select(col("word"),
      array_join(split(expr("substring(seg, 2, length(seg) - 2)"), "\\|\\|"), ""))
      .as[(String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, rebuilt) => assert(rebuilt == w) }
  }

  test("domain cap keeps at most K per source, content-hash order") {
    val dir = "/root/testdata/sf0.001"
    val out = TextAnalysis.domainCapSample(spark, dir).collect()
    val bySource = out.groupBy(_.getString(0))
    bySource.foreach { case (_, rows) =>
      assert(rows.length <= TextAnalysis.DomainCapK)
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length))
    }
    // kept set is the md5-min prefix: re-derive independently
    val docsDf = graft.sources.Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), md5(col("text")).as("h"))
    val expect = docsDf.collect().groupBy(_.getString(0)).toSeq.flatMap {
      case (s, rs) =>
        rs.sortBy(r => (r.getString(2), r.getLong(1)))
          .take(TextAnalysis.DomainCapK).map(r => (s, r.getLong(1))).toSeq
    }.toSet
    assert(out.map(r => (r.getString(0), r.getLong(2))).toSet == expect)
  }
}
