package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Content-defined chunking (`q_dedup_cdc_chunks`): exact tiling,
  * shared-chunk detection, and the LBFS locality guarantee — an
  * INSERTION re-chunks only its own neighborhood while every
  * fixed-size blocking would shift all downstream blocks. */
class CdcChunkSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // aperiodic on purpose (period lcm(97, 13) ≫ n): periodic text makes
  // chunks repeat within a doc, which is fine for the operator but
  // muddies occurrence-vs-distinct counting in these assertions
  private def longText(n: Int): String =
    (1 to n).map(i => s"tok${(i * 7919) % 97}x${i % 13}w").mkString(" ")

  private def chunks(docs: Seq[(Long, String)]): Map[Long, Seq[(Long, Long, String)]] =
    Dedup.cdcChunksOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sortBy(_._1)).toMap

  test("chunks tile the document exactly; stats confirm on every doc") {
    val docs = Seq((1L, longText(300)), (2L, "short text"), (3L, longText(50)))
    val stats = Dedup.cdcChunkStatsOf(docs.toDF("doc_id", "text")).collect()
    assert(stats.length == 3)
    assert(stats.forall(_.getBoolean(4)), "a doc failed the reassembly audit")
    // per-chunk check: starts are 1, then each previous start + clen
    chunks(docs).foreach { case (_, cs) =>
      assert(cs.head._1 == 1L)
      cs.sliding(2).foreach {
        case Seq((s1, l1, _), (s2, _, _)) => assert(s2 == s1 + l1)
        case _ => ()
      }
    }
  }

  test("identical documents share every chunk") {
    val t = longText(200)
    val stats = Dedup.cdcChunkStatsOf(Seq((1L, t), (2L, t)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    stats.values.foreach { case (n, shared) => assert(n == shared && n > 1) }
  }

  test("an insertion re-chunks only its neighborhood (CDC locality)") {
    val words = (1 to 400).map(i => s"tok${(i * 7919) % 97}w")
    val base = words.mkString(" ")
    val edited = (words.take(200) ++ Seq("INSERTEDWORD") ++ words.drop(200)).mkString(" ")
    val cs = chunks(Seq((1L, base), (2L, edited)))
    val baseHashes = cs(1L).map(_._3)
    val editHashes = cs(2L).map(_._3).toSet
    assert(baseHashes.size >= 8, s"too few chunks (${baseHashes.size}) to show locality")
    // every base chunk except the few around the insertion point keeps
    // its hash DESPITE all downstream offsets shifting — the property
    // fixed-size blocking lacks by construction
    val lost = baseHashes.filterNot(editHashes)
    assert(lost.size <= 3,
      s"insertion disturbed ${lost.size} of ${baseHashes.size} chunks")
    // and the disturbed chunks are contiguous around the edit
    val lostIdx = baseHashes.zipWithIndex.filterNot(h => editHashes(h._1)).map(_._2)
    if (lostIdx.nonEmpty)
      assert(lostIdx.max - lostIdx.min == lostIdx.size - 1, "non-local damage")
  }

  test("a truncated prefix shares its fully-contained chunks with the base") {
    val t = longText(300)
    val prefix = t.substring(0, t.length / 2)
    val cs = chunks(Seq((1L, t), (2L, prefix)))
    val prefixHashes = cs(2L).map(_._3).toSet
    val shared = prefixHashes.intersect(cs(1L).map(_._3).toSet)
    // everything but the prefix's truncated tail chunk must match
    assert(shared.size >= prefixHashes.size - 1 && shared.nonEmpty)
  }
}
