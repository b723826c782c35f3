package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The prefix-filtering set-similarity join must be EXACT: it prunes
  * candidates, never results. The reference result is the naive plan —
  * [[Dedup.ngramJaccardOf]] (full posting self-join) filtered to the
  * prefix join's threshold — over the same df-capped representation.
  */
class PrefixJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Docs engineered so the all-pairs space is non-trivial: a planted
    * near-dup pair (one word changed), a planted exact dup, and a block
    * of docs sharing a common boilerplate prefix (globally COMMON
    * shingles — exactly what the rarity-ordered prefix cut should skip)
    * but distinct tails. */
  private lazy val docs = {
    val boiler = "terms of service apply to all users of this site"
    // tails must dominate the boilerplate so each doc's rarity-first
    // prefix (t=0.5 → half the shingles) fills with df=1 tail shingles
    // before any shared boilerplate shingle can slip in
    val tails = (0 until 6).map { i =>
      (0 until 18).map(j => s"tail${i}w$j").mkString(" ")
    }
    val boilerDocs = tails.zipWithIndex.map { case (t, i) =>
      (100L + i, s"$boiler $t")
    }
    val planted = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and often"),
      (3L, "completely unrelated text about catalyst optimizer rules here"))
    (planted ++ boilerDocs).toDF("doc_id", "text")
  }

  test("prefix join == naive all-pairs join at the same threshold") {
    val fast = Dedup.prefixFilterJoinOf(docs).collect().toSeq
    val naive = Dedup.ngramJaccardOf(docs)
      .filter(col("jaccard") >= Dedup.PrefixJoinThreshold)
      .collect().toSeq
    assert(fast == naive)
    // and the planted dup pairs are actually in the answer
    val pairs = fast.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
  }

  test("the prefix cut prunes candidates, not just verifies them") {
    val cand = Dedup.prefixCandidatesOf(docs).count()
    // naive candidate space: every pair sharing ANY shingle — the
    // boilerplate block alone makes all (6 choose 2) of its pairs
    // candidates for the full posting self-join
    val posting = Dedup.shinglesOf(docs).distinct()
    val naiveCand = posting.alias("x")
      .join(posting.alias("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
    assert(cand < naiveCand,
      s"prefix candidates ($cand) should be fewer than shared-shingle pairs ($naiveCand)")
  }

  test("raising the threshold can only shrink the candidate set") {
    val loose = Dedup.prefixCandidatesOf(docs, 0.4).count()
    val tight = Dedup.prefixCandidatesOf(docs, 0.8).count()
    assert(tight <= loose)
  }

  test("positional filter (r10) is lossless and only ever shrinks candidates") {
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val withPos = Dedup.prefixCandidatesOf(docs).collect().map(key).toSet
    val without = Dedup.prefixCandidatesNoPositional(docs).collect().map(key).toSet
    assert(withPos.subsetOf(without),
      s"positional filter ADDED candidates: ${(withPos -- without).toSeq.sorted}")
    // every verified pair must still be a candidate (losslessness at
    // the result level — the oracle's hash-match pins it corpus-wide)
    val results = Dedup.prefixFilterJoinOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(results.subsetOf(withPos))
  }

  test("positional filter lossless across random corpora") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(300 + seed)
      val vocab = (0 until 40).map(i => s"v$i")
      val rdocs = (0 until 25).map { i =>
        (i.toLong, (0 until (8 + rnd.nextInt(10)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val fast = Dedup.prefixFilterJoinOf(rdocs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val naive = Dedup.ngramJaccardOf(rdocs)
        .filter(col("jaccard") >= Dedup.PrefixJoinThreshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fast == naive, s"seed $seed")
    }
  }
}
