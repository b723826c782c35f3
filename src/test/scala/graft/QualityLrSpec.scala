package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Learning pins for the relational logistic-regression trainer. The
  * hash oracle proves both engines train bit-identical weights; these
  * tests prove the trainer LEARNS: perfect held-in separation on a
  * planted vocabulary shift (the regime a domain classifier exists
  * for), graceful near-chance behavior on the shared-vocabulary corpus
  * (whose label carries almost no lexical signal — the DSIR caveat),
  * and determinism across runs.
  */
class QualityLrSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def plantedDocs = {
    import spark.implicits._
    val shared = (0 until 4).map(i => s"shared$i").mkString(" ")
    (0 until 400).map { i =>
      val tgt = i % 2 == 0
      val vocab = if (tgt) (0 until 8).map(j => s"tgt${(i + j) % 20}")
        else (0 until 8).map(j => s"raw${(i + j) % 20}")
      (i.toLong, s"$shared ${vocab.mkString(" ")}",
        if (tgt) "en" else "xx", "s0")
    }.toDF("doc_id", "text", "lang", "source")
  }

  test("two GD steps separate a planted vocabulary shift perfectly") {
    val rows = TextAnalysis.qualityLrTrainOf(plantedDocs).collect()
    val m = rows.map(r => (r.getAs[Int]("label"), r.getAs[Int]("pred")) ->
      r.getAs[Long]("n_docs")).toMap
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val acc = (m.getOrElse((0, 0), 0L) + m.getOrElse((1, 1), 0L)).toDouble / total
    assert(total == 400L)
    assert(acc == 1.0, s"planted accuracy $acc != 1.0 (census: ${m.toSeq.sorted})")
    // and the mean probabilities order with the labels by a real margin
    // (two steps at the corpus-sane rate separate perfectly but stay in
    // σ's near-linear band — higher rates sharpen p at the cost of
    // intercept oscillation on near-zero-signal data, measured)
    val pByLabel = rows.map(r =>
      r.getAs[Int]("label") -> r.getAs[Double]("mean_p")).toMap
    assert(pByLabel(1) - pByLabel(0) > 0.015,
      s"probability gap ${pByLabel(1) - pByLabel(0)} too small")
  }

  test("corpus census is well-formed and deterministic") {
    val a = TextAnalysis.qualityLrTrain(spark, dir).collect()
    val b = TextAnalysis.qualityLrTrain(spark, dir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, dir)
        .filter(size(graft.functions.TextFunctions.tokenize(col("text"))) >= 1)
        .count())
    a.foreach { r =>
      val p = r.getAs[Double]("mean_p")
      // a (label, pred) group's mean probability sits on pred's side of
      // the threshold, since every member does
      if (r.getAs[Int]("pred") == 1) assert(p >= 0.5) else assert(p < 0.5)
    }
  }

  test("apply screen reconciles with the train census under shared weights") {
    val census = TextAnalysis.qualityLrTrain(spark, dir).collect()
    val applied = TextAnalysis.qualityLrApply(spark, dir).collect()
    // both consumers serve the SAME memoized weights: total kept across
    // languages == total pred=1 across labels, and totals agree
    val censusKept = census.filter(_.getAs[Int]("pred") == 1)
      .map(_.getAs[Long]("n_docs")).sum
    val appliedKept = applied.map(_.getAs[Long]("kept")).sum
    assert(appliedKept == censusKept)
    assert(applied.map(_.getAs[Long]("n_docs")).sum ==
      census.map(_.getAs[Long]("n_docs")).sum)
    applied.foreach { r =>
      val frac = r.getAs[Double]("kept_frac")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(r.getAs[Long]("kept") <= r.getAs[Long]("n_docs"))
    }
  }

  test("calibration: planted separable corpus spreads across bins, rates ordered") {
    val docs = plantedDocs
    val weights = TextAnalysis.qualityLrModelOf(docs,
      TextAnalysis.QualityLrRate, TextAnalysis.QualityLrIters)
    val bins = TextAnalysis.qualityLrCalibrationOf(docs, weights).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // a separating model must occupy BOTH sides of the 0.5 threshold
    assert(bins.exists(_._1 < 5) && bins.exists(_._1 >= 5),
      s"no spread: ${bins.toSeq}")
    // perfect separation: below-threshold bins are pure negatives,
    // above-threshold pure positives; counts conserve the corpus
    bins.foreach { case (bin, _, meanP, obs) =>
      assert(meanP >= bin / 10.0 - 1e-9 && meanP <= (bin + 1) / 10.0 + 1e-9 ||
        bin == 9L, s"mean_p $meanP escapes bin $bin")
      if (bin < 5) assert(obs == 0.0, s"bin $bin impure: $obs")
      else assert(obs == 1.0, s"bin $bin impure: $obs")
    }
    assert(bins.map(_._2).sum == 400L)
  }
}
