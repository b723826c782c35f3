package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Algebraic invariants of the DoReMi domain reweighting that the hash
  * oracle doesn't state explicitly: weights form a distribution, the
  * best-fit domain is never upweighted beyond its smoothed natural
  * share, and excess loss orders the boosts (the group-DRO property the
  * update exists to enforce).
  */
class DoremiSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val rows = TextAnalysis.doremiWeights(spark, dir).collect()

  test("alphas are a distribution over all domains") {
    val langs = Tables.documents(spark, dir)
      .select("lang").distinct().count()
    assert(rows.length == langs)
    val s = rows.map(_.getAs[Double]("alpha")).sum
    assert(math.abs(s - 1.0) < 1e-4, s"alphas sum to $s")
    rows.foreach { r =>
      assert(r.getAs[Double]("alpha") >= TextAnalysis.DoremiEps / rows.length)
    }
  }

  test("best-fit domain has zero excess; excess orders the boost") {
    assert(rows.map(_.getAs[Double]("excess")).min == 0.0)
    rows.foreach(r => assert(r.getAs[Double]("excess") >= 0.0))
    // multiplicative weights: higher excess ⇒ higher UNSMOOTHED boost
    // (alpha − ε/n)/p ∝ exp(η·excess). The raw boost alpha/p is NOT
    // monotone — the ε-uniform term contributes ε/(n·p), which favors
    // small domains (observed on this corpus; the smoothing working as
    // designed, not a defect).
    val n = rows.length
    val tot = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    val byExcess = rows.sortBy(_.getAs[Double]("excess")).map { r =>
      val p = r.getAs[Long]("n_docs") / tot
      (r.getAs[Double]("excess"),
        (r.getAs[Double]("alpha") - TextAnalysis.DoremiEps / n) / p)
    }
    byExcess.sliding(2).foreach {
      case Array((e1, b1), (e2, b2)) =>
        if (e2 > e1) assert(b2 > b1 - 1e-6,
          s"excess $e2 > $e1 but unsmoothed boost $b2 <= $b1")
      case _ => ()
    }
  }

  test("realized draw hits the alpha targets at the same-size budget") {
    val mix = TextAnalysis.doremiMix(spark, dir).collect()
    assert(mix.length == rows.length)
    val n = Tables.documents(spark, dir).count().toDouble
    val outTotal = mix.map(_.getAs[Long]("docs_out")).sum.toDouble
    // Σ rate_d·n_d = Σ α_d·N ≈ N: the draw keeps the corpus-size budget
    assert(math.abs(outTotal - n) / n < 0.15, s"budget drift: $outTotal vs $n")
    mix.foreach { r =>
      val a = r.getAs[Double]("alpha")
      val got = r.getAs[Double]("achieved_share")
      assert(math.abs(got - a) < 0.06,
        s"${r.getAs[String]("lang")}: achieved $got vs target $a")
      assert(r.getAs[Long]("docs_out") > 0L)
    }
  }

  test("uniform-loss corpus degenerates to near-natural weights") {
    // one domain ⇒ alpha = 1 regardless of loss
    import spark.implicits._
    val single = Tables.documents(spark, dir).withColumn("lang", lit("xx"))
    val r = TextAnalysis.doremiWeightsOf(single).collect()
    assert(r.length == 1)
    assert(math.abs(r.head.getAs[Double]("alpha") - 1.0) < 1e-6)
  }
}
