package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters
import org.apache.spark.sql.functions.col
import graft.operators.WordCount

/** ScalaCheck invariants from FIXTURES.md: count conservation, line-
  * permutation invariance, partition invariance, and per-key/global
  * consistency. These hold for ANY corpus, which is exactly why the
  * reference's arbitrary 2000-line partitioning is safe to discard.
  */
class WordCountPropsSpec extends Properties("WordCount") {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  // small alphabet so collisions (interesting counts) are common; include
  // a punctuated and a mixed-case word to route through the full kernel
  private val word = Gen.oneOf("ab", "ab", "cd", "Ef", "g'h", "ij")
  private val line =
    Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  private val corpus = Gen.chooseNum(1, 3).flatMap { nFiles =>
    Gen.listOfN(nFiles, Gen.chooseNum(0, 8).flatMap(Gen.listOfN(_, line)))
      .map(_.zipWithIndex.flatMap { case (ls, i) => ls.map(l => (s"f$i", l)) })
  }

  private def perKey(rows: Seq[(String, String)]): Map[(String, String), Long] =
    WordCount.perKey(rows.toDF("file", "line"), col("file"), col("line"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  // independent oracle for one line's token count (reference semantics)
  private def tokenCount(l: String): Int =
    l.toLowerCase.replaceAll("[\\p{Punct}]", "").split(" ", -1).count(_.nonEmpty)

  property("sum of per-key counts = per-key token count") = forAll(corpus) { rows =>
    val got = perKey(rows).groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val expected = rows.groupBy(_._1).view
      .mapValues(_.map(r => tokenCount(r._2).toLong).sum).toMap
      .filter(_._2 > 0)
    got == expected
  }

  property("invariant under line permutation") = forAll(corpus) { rows =>
    perKey(rows) == perKey(rows.reverse)
  }

  property("invariant under repartitioning") =
    forAll(corpus, Gen.chooseNum(1, 5)) { (rows, p) =>
      val repart = WordCount.perKey(
          rows.toDF("file", "line").repartition(p), col("file"), col("line"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      repart == perKey(rows)
    }

  property("global counts = merge of per-key counts") = forAll(corpus) { rows =>
    val global = WordCount.global(rows.toDF("file", "line"), col("line"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = perKey(rows).groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    global == merged
  }
}
