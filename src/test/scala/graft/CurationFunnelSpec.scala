package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Funnel-algebra invariants for the composed curation pipeline: each
  * stage only removes (docs and tokens are monotone non-increasing down
  * the funnel), the input census matches the corpus exactly, and every
  * stage retains something at this SF (an empty stage would silently
  * vanish from the census — the invariant documents that the sf0.01
  * corpus exercises all five).
  */
class CurationFunnelSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("funnel stages are monotone and anchored to the corpus") {
    val rows = TextAnalysis.curationFunnel(spark, dir).collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq ==
      Seq("1_input", "2_quality", "3_dedup", "4_decontam", "5_selected"))
    val docs = Tables.documents(spark, dir)
    assert(rows.head._2 == docs.count())
    assert(rows.head._3 == docs
      .select(size(graft.functions.TextFunctions.tokenize(col("text")))
        .cast("long").as("n")).agg(sum("n")).collect()(0).getLong(0))
    rows.sliding(2).foreach { case Array((s1, d1, t1), (s2, d2, t2)) =>
      assert(d2 <= d1, s"$s2 docs grew: $d2 > $d1")
      assert(t2 <= t1, s"$s2 tokens grew: $t2 > $t1")
    }
    rows.foreach { case (s, d, t) =>
      assert(d > 0 && t > 0, s"stage $s empty at sf0.01")
    }
    // the pipeline must actually curate: the selected set is a strict
    // subset of the input on both axes
    assert(rows.last._2 < rows.head._2 && rows.last._3 < rows.head._3)
  }
}
