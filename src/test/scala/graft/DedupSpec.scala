package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, SimSearch}
import java.nio.file.Files

/** Behavioural checks of the dedup/similarity operators on a tiny
  * synthetic documents/embeddings table (written as parquet so the
  * operators' real loaders run). Known-answer cases: identical texts are
  * exact+near duplicates; disjoint texts are not; identical embeddings
  * are the top ANN hit with cosine 1.
  */
class DedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-dedup").toString
    val same = "the quick brown fox jumps over the lazy dog again and again"
    val near = "the quick brown fox jumps over the lazy dog again and often"
    val other = "completely different words about spark catalyst tungsten rows"
    Seq(
      (0L, same, "en", "srcA", same.length.toLong),
      (1L, same, "en", "srcA", same.length.toLong),
      (2L, near, "en", "srcB", near.length.toLong),
      (3L, other, "en", "srcB", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val base = (1 to 16).map(_.toFloat)
    val anti = (1 to 16).map(i => -i.toFloat)
    Seq(
      (0L, base, 0), // query vector
      (20L, base, 0), // identical -> cosine 1
      (21L, base.map(_ * 2f), 0), // colinear -> cosine 1
      (22L, anti, 1)) // opposite signs -> different bucket
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("exactGroups finds the identical pair and keeps the lowest doc_id") {
    val rows = Dedup.exactGroups(spark, dir).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_docs") == 2L)
    assert(rows.head.getAs[Long]("keep_doc") == 0L)
  }

  test("exactStats counts dupes per (lang, source)") {
    val m = Dedup.exactStats(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_dupes")).toMap
    assert(m(("en", "srcA")) == 1L)
    assert(m(("en", "srcB")) == 0L)
  }

  test("minhash LSH: identical texts have estimated jaccard 1.0") {
    val m = Dedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((0L, 1L)) == 1.0)
    assert(!m.contains((0L, 3L)) && !m.contains((1L, 3L)) && !m.contains((2L, 3L)))
  }

  test("edit-distance verify grades every LSH pair against a reference DP") {
    // reference Levenshtein: classic O(nm) two-row DP
    def lev(a: String, b: String): Int = {
      var prev = (0 to b.length).toArray
      for (i <- 1 to a.length) {
        val cur = new Array[Int](b.length + 1)
        cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
      prev(b.length)
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.take(Dedup.EditPrefix)).toMap
    val pairs = Dedup.minhashLsh(spark, dir).count()
    val rows = Dedup.editDistanceVerify(spark, dir).collect()
    // verify stage covers the whole candidate set, nothing more
    assert(rows.length == pairs && rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (docs(r.getAs[Long]("doc_a")), docs(r.getAs[Long]("doc_b")))
      assert(r.getAs[Long]("edit_dist") == lev(a, b).toLong)
      val sim = 1.0 - lev(a, b).toDouble / math.max(a.length, b.length)
      assert(math.abs(r.getAs[Double]("edit_sim") - sim) < 5e-5)
      assert(r.getAs[Boolean]("confirmed") == (sim >= Dedup.EditSimThreshold))
    }
    // the identical pair is confirmed at distance zero
    val m = rows.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(m((0L, 1L)).getAs[Long]("edit_dist") == 0L)
    assert(m((0L, 1L)).getAs[Boolean]("confirmed"))
  }

  test("simhash: identical texts at hamming 0; near texts within 3 bits") {
    val m = Dedup.simhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((0L, 1L)) == 0L)
    assert(m.get((0L, 3L)).isEmpty) // disjoint vocab: far apart
  }

  test("ngram jaccard: identical 1.0, near-dup high, disjoint absent") {
    val m = Dedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((0L, 1L)) == 1.0)
    assert(m((0L, 2L)) > 0.5)
    assert(!m.contains((0L, 3L)))
  }

  test("embedding near-dup ranks the colinear pairs at cosine 1 first") {
    val rows = Dedup.embeddingNearDup(spark, dir).collect()
    val top = rows.filter(_.getAs[Int]("label") == 0).head
    assert(top.getAs[Double]("cos") == 1.0)
  }

  test("ANN brute force: identical embedding is rank-1 with cosine 1") {
    val rows = SimSearch.bruteForceTopK(spark, dir).collect()
      .filter(r => r.getAs[Long]("q_id") == 0L && r.getAs[Long]("rank") == 1L)
    assert(rows.length == 1)
    assert(rows.head.getAs[Double]("cos") == 1.0)
  }

  test("ANN LSH bucket: opposite-sign vector is never a candidate") {
    val rows = SimSearch.lshBucketedTopK(spark, dir).collect()
    assert(rows.forall(_.getAs[Long]("neighbor") != 22L))
    val r1 = rows.filter(r => r.getAs[Long]("q_id") == 0L && r.getAs[Long]("rank") == 1L)
    assert(r1.head.getAs[Double]("cos") == 1.0)
  }
}
