package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** RM3 pseudo-relevance feedback on a constructed corpus where the
  * expansion effect is decisive: the target document shares NO term
  * with the original query and can only enter the top-k through the
  * relevance model's expansion terms.
  *
  * Geometry: the probe query is `alpha` alone (doc 0 = "alpha ×3", so
  * its tf-idf top-3 is the single term). `alpha` appears in 21 of 22
  * docs (idf ≈ 0.07 — nearly worthless), `durian` only in the two
  * feedback docs (durian-heavy, so the relevance model picks it up)
  * and the target doc 12. After interpolation the high-idf expansion
  * term dominates scoring and doc 12 displaces the query's own
  * document from the top 3; with λ = 1 (no expansion) doc 0 trivially
  * tops its own ranking and doc 12 cannot appear. */
class Rm3Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = (Seq(
    (0L, "alpha alpha alpha"),
    (10L, "alpha durian durian durian durian durian"),
    (11L, "alpha durian durian durian durian durian"),
    (12L, "durian durian durian durian durian durian")) ++
    (13L to 30L).map(i =>
      (i, s"alpha f${i}a f${i}b f${i}c f${i}d f${i}e")))
    .toDF("doc_id", "text")

  test("expansion retrieves a doc sharing no original query term") {
    val tf = TextAnalysis.bm25Postings(docs)
    val rm3 = TextAnalysis.rm3From(tf, docs).collect()
      .filter(_.getLong(0) == 0L).map(_.getLong(2))
    assert(rm3.contains(12L),
      s"expansion-only doc missing from RM3 top-k: ${rm3.mkString(",")}")
    // without expansion (λ = 1) the target is invisible to the query
    val first = TextAnalysis.rm3From(tf, docs, lambda = 1.0).collect()
      .filter(_.getLong(0) == 0L).map(_.getLong(2))
    assert(!first.contains(12L))
    assert(first.contains(0L)) // self-retrieval under the original terms
  }

  test("lambda = 1 degenerates to the plain bm25 ranking on testdata") {
    val d = graft.sources.Tables.fanOut(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
      .select("doc_id", "text")
    val tf = TextAnalysis.bm25Postings(d)
    val rm3 = TextAnalysis.rm3From(tf, d, lambda = 1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val bm25 = TextAnalysis.bm25RetrieveOf(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rm3 == bm25)
  }

  test("registered query: every probe query returns a full top-k") {
    val out = TextAnalysis.rm3Retrieve(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == TextAnalysis.Bm25NQueries * TextAnalysis.Bm25TopK)
    assert(out.forall(_.getDouble(3) > 0.0))
  }
}
