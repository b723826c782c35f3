package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.VectorFunctions

/** ScalaCheck invariants of content-defined chunking and the BQ sign
  * packing, for ARBITRARY inputs:
  *
  *  - CDC chunks always TILE their document exactly (no byte lost,
  *    none duplicated) and concatenating the chunk substrings rebuilds
  *    the normalized text — the restore-correctness property a chunk
  *    store lives on;
  *  - chunk boundaries are a pure function of content: re-chunking a
  *    permuted corpus yields identical per-doc chunk sequences
  *    (chunking has no cross-row state to leak);
  *  - sign words pack exactly the >= 0 dimensions for arbitrary float
  *    vectors, bit for bit against a reference Scala fold.
  */
class CdcPropsSpec extends Properties("CdcChunks") {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(6)

  private val word = Gen.chooseNum(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val doc = Gen.chooseNum(3, 40)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  private val corpus = Gen.chooseNum(1, 6).flatMap(Gen.listOfN(_, doc))

  private def chunksOf(texts: Seq[String]) =
    Dedup.cdcChunksOf(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))

  property("chunks tile the document and rebuild the normalized text") =
    forAll(corpus) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val norms = docs
        .select(col("doc_id"),
          array_join(graft.functions.TextFunctions.tokenize(col("text")), " ")
            .as("norm"))
        .filter(length(col("norm")) >= Dedup.CdcK)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val byDoc = chunksOf(texts).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      norms.forall { case (id, norm) =>
        val cs = byDoc.getOrElse(id, Array.empty)
        val tiles = cs.headOption.exists(_._2 == 1L) &&
          cs.sliding(2).forall {
            case Array((_, s1, l1, _), (_, s2, _, _)) => s2 == s1 + l1
            case _ => true
          } && cs.map(_._3).sum == norm.length
        val rebuilt = cs.map { case (_, s, l, _) =>
          norm.substring(s.toInt - 1, (s + l - 1).toInt) }.mkString
        val hashesMatch = cs.forall { case (_, s, l, ch) =>
          ch == org.apache.commons.codec.digest.DigestUtils.md5Hex(
            norm.substring(s.toInt - 1, (s + l - 1).toInt)) }
        tiles && rebuilt == norm && hashesMatch
      } && byDoc.keySet == norms.keySet
    }

  property("chunking is content-pure: corpus order cannot change any doc's chunks") =
    forAll(corpus) { texts =>
      def key(ts: Seq[String]) = chunksOf(ts).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
      // permute by reversing: ids follow the text, so re-key by text index
      val fwd = key(texts)
      val rev = chunksOf(texts.reverse).collect()
        .map(r => (texts.length - 1 - r.getLong(0), r.getLong(1), r.getString(3)))
        .toSet
      fwd == rev
    }

  private val vec = Gen.listOfN(64,
    Gen.chooseNum(-4.0f, 4.0f, 0.0f, -0.0f, 1.5f))

  property("sign words pack exactly the >= 0 dims for arbitrary vectors") =
    forAll(vec) { v =>
      val row = Seq(Tuple1(v)).toDF("embedding")
        .select(VectorFunctions.signWord(col("embedding"), 0, 32).as("lo"),
          VectorFunctions.signWord(col("embedding"), 32, 32).as("hi"))
        .head()
      val ref = (off: Int) => (0 until 32).foldLeft(0L) { (acc, d) =>
        if (v(off + d) >= 0) acc | (1L << d) else acc
      }
      row.getLong(0) == ref(0) && row.getLong(1) == ref(32)
    }
}
