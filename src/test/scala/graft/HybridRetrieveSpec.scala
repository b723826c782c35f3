package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Constructed-corpus pins for the hybrid lexical+vector retrieval
  * pipeline ([[TextAnalysis.hybridRetrieve]]): a document ranked by
  * BOTH rankers must out-fuse single-ranker documents (the RRF
  * property the sf corpus cannot exercise — its synthetic embeddings
  * are text-independent, so the top lists never overlap there), and
  * self-matches stay excluded on both legs. */
class HybridRetrieveSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** doc 0 is the probe query (Bm25NQueries = 5 > 4 docs; ids 1..3 are
    * corpus-only by construction of the assertions below).
    *  - text: docs 1 and 2 share the query's rare term "zebra"; doc 3
    *    shares nothing rare (only the ubiquitous "the", equal df in all
    *    docs -> scored but low).
    *  - vectors: doc 2 and doc 3 point along the query axis, doc 1 is
    *    orthogonal. So doc 2 is the only doc ranked well by BOTH. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("hybrid_mini").toFile
    d.deleteOnExit()
    val base = d.getAbsolutePath
    def w(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$base/$name.parquet")
    w(Seq(
        (0L, "the zebra grazes", "en", "s0", 16L),
        (1L, "the zebra sleeps here quietly", "en", "s0", 29L),
        (2L, "the zebra runs", "en", "s0", 14L),
        (3L, "the cat sits on the mat", "en", "s0", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"), "documents")
    w(Seq(
        (0L, Seq(1.0f, 0.0f, 0.0f), 0),
        (1L, Seq(0.0f, 1.0f, 0.0f), 0),
        (2L, Seq(0.9f, 0.1f, 0.0f), 0),
        (3L, Seq(0.8f, 0.0f, 0.6f), 0))
      .toDF("vec_id", "embedding", "label"), "embeddings")
    base
  }

  test("a document ranked by both modalities out-fuses single-ranker docs") {
    val rows = TextAnalysis.hybridRetrieve(spark, dir).collect()
      .filter(_.getAs[Long]("query_id") == 0L)
    val byRank = rows.map(r => r.getAs[Int]("rank") ->
      (r.getAs[Long]("doc_id"), r.getAs[Long]("rank_lex"),
        r.getAs[Long]("rank_vec"))).toMap
    // doc 2: in both top lists -> two reciprocal terms -> fused #1
    val (top, lex2, vec2) = byRank(1)
    assert(top == 2L, s"fused top should be the both-modality doc: $byRank")
    assert(lex2 > 0L && vec2 > 0L)
    // every other candidate carries at least one ranker's rank
    rows.foreach { r =>
      assert(r.getAs[Long]("rank_lex") > 0 || r.getAs[Long]("rank_vec") > 0)
    }
  }

  test("self-match is excluded from both legs") {
    val rows = TextAnalysis.hybridRetrieve(spark, dir).collect()
    assert(rows.forall(r =>
      r.getAs[Long]("doc_id") != r.getAs[Long]("query_id")))
  }

  test("rrf is exactly the sum of the two reciprocal ranks") {
    val rows = TextAnalysis.hybridRetrieve(spark, dir).collect()
    rows.foreach { r =>
      val lex = r.getAs[Long]("rank_lex")
      val vec = r.getAs[Long]("rank_vec")
      val expect =
        (if (lex > 0) 1.0 / (TextAnalysis.RrfK + lex) else 0.0) +
          (if (vec > 0) 1.0 / (TextAnalysis.RrfK + vec) else 0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-6)
    }
  }
}
