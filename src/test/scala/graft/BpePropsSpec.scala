package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** ScalaCheck invariants of the iterated BPE trainer, for ARBITRARY
  * alphanumeric corpora: segmentations always rebuild their word
  * (merging is a partition refinement in reverse — it can never lose or
  * reorder characters), merge frequencies are positive and bounded by
  * the corpus pair count, the merge table is duplicate-free, and
  * training is invariant to document order.
  */
class BpePropsSpec extends Properties("BpeTrain") {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(6)

  // tiny alphabet so merges chain deep (the interesting regime: merged
  // symbols meeting their own ancestors)
  private val word = Gen.chooseNum(2, 7)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', '1')).map(_.mkString))
  private val doc = Gen.chooseNum(1, 6)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  private val corpus = Gen.chooseNum(1, 5).flatMap(Gen.listOfN(_, doc))

  private def df(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, "en", t) }
      .toDF("doc_id", "lang", "text")

  property("segmentations rebuild every word after any merge count") =
    forAll(corpus, Gen.chooseNum(1, 6)) { (texts, rounds) =>
      val d = df(texts)
      val merges = TextAnalysis.bpeMergesOf(d, rounds)
      val vocab = d.select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word").rlike(TextAnalysis.BpeWordPattern) &&
          length(col("word")) >= 2)
        .distinct()
        .withColumn("seg", concat(lit("|"), array_join(
          expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
          "||"), lit("|")))
      val fin = merges.foldLeft(vocab) { (acc, m) =>
        acc.withColumn("seg",
          expr(s"replace(seg, '|${m._2}||${m._3}|', '|${m._2}${m._3}|')"))
      }
      fin.select(col("word"),
        array_join(split(expr("substring(seg, 2, length(seg) - 2)"), "\\|\\|"), ""))
        .as[(String, String)].collect()
        .forall { case (w, rebuilt) => rebuilt == w }
    }

  property("merge table is duplicate-free with positive bounded freqs") =
    forAll(corpus) { texts =>
      val merges = TextAnalysis.bpeMergesOf(df(texts), 5)
      val pairs = merges.map(m => (m._2, m._3))
      val totalChars = texts.flatMap(_.split(" ")).map(_.length).sum.toLong
      pairs.distinct.length == pairs.length &&
        merges.forall(m => m._5 > 0 && m._5 <= totalChars) &&
        merges.map(_._1) == (1L to merges.length)
    }

  property("training is document-order invariant") =
    forAll(corpus) { texts =>
      TextAnalysis.bpeMergesOf(df(texts), 4) ==
        TextAnalysis.bpeMergesOf(df(texts.reverse), 4)
    }
}
