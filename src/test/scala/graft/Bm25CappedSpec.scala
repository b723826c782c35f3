package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Impact-ordered per-term posting caps (`q_text_bm25_capped`): the
  * static index-pruning bound that keeps a hot term from making a
  * query linear in the corpus. Pins:
  *
  *  - the cap binds per TERM: no word keeps more than `cap` postings,
  *    and a hot term (present in every doc) keeps exactly `cap`;
  *  - what is dropped is exactly each term's lowest-impact tail
  *    (every dropped posting's impact ≤ every kept posting's, with the
  *    doc_id tiebreak on equality);
  *  - a non-binding cap changes nothing: capped index rows = the full
  *    index's (doc, word) pairs with the exact stored impacts;
  *  - surviving pairs score EXACTLY: the capped serve score is the sum
  *    of stored impacts — pairs that keep all their query-term postings
  *    score identically under any cap.
  */
class Bm25CappedSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // "the" is the hot term (every doc); each doc also carries a private
  // term so per-doc lists differ
  private lazy val docs = (0L until 12L)
    .map(i => (i, s"the common text plus word$i word$i"))
    .toDF("doc_id", "text")

  test("hot term keeps exactly cap postings; no term exceeds the cap") {
    val capped = TextAnalysis.bm25CappedIndexOf(docs, cap = 4)
    val perTerm = capped.groupBy("word").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perTerm.values.max <= 4)
    assert(perTerm("the") == 4)
    assert(perTerm("word3") == 1)
  }

  test("the dropped postings are exactly the lowest-impact tail per term") {
    val full = TextAnalysis.bm25CappedIndexOf(docs, cap = Int.MaxValue)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(2)))
    val kept = TextAnalysis.bm25CappedIndexOf(docs, cap = 4)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    full.groupBy(_._1).foreach { case (_, posts) =>
      val (k, d) = posts.partition(p => kept((p._1, p._2)))
      // every dropped impact <= every kept impact; on equality the kept
      // one has the lower doc_id
      if (d.nonEmpty && k.nonEmpty) {
        // rank key: (impact desc, doc_id asc) — encoded as (-impact, doc_id)
        val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
        val worstKept = k.map(p => (-p._3, p._2)).max(ord)
        d.foreach { p =>
          assert(ord.gt((-p._3, p._2), worstKept),
            s"dropped $p ranks above a kept posting")
        }
      }
    }
  }

  test("a non-binding cap changes nothing") {
    val full = TextAnalysis.bm25CappedIndexOf(docs, cap = Int.MaxValue)
      .collect().map(_.toSeq).toSet
    val capped = TextAnalysis.bm25CappedIndexOf(docs, cap = 1000)
      .collect().map(_.toSeq).toSet
    assert(full == capped)
    assert(full.nonEmpty)
  }

  test("surviving pairs score exactly the stored-impact sum under any cap") {
    val queries = Seq((100L, "word3 word5")).toDF("query_id", "text")
    // word3/word5 have 1-posting lists — no cap can cut them, so the
    // capped serve must equal the uncapped capped-serve score exactly
    val tight = TextAnalysis.bm25CappedScoreOf(queries,
        TextAnalysis.bm25CappedIndexOf(docs, cap = 1))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val loose = TextAnalysis.bm25CappedScoreOf(queries,
        TextAnalysis.bm25CappedIndexOf(docs, cap = Int.MaxValue))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(tight == loose)
    assert(tight.nonEmpty)
  }
}
