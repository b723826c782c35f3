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

  /** Hand-derivable verdicts for the INCREMENTAL kernel: four arriving
    * docs, one tripping each stage against constructed artifacts. */
  test("incremental flags: each stage verdict against constructed artifacts") {
    val spark2 = spark
    import spark2.implicits._
    def prose(tag: String) =
      s"the $tag and a the of to in is it was for on are as with his " +
        "they at be this from have or had by word more"
    val batch = Seq(
      (1L, prose("keeper")),            // passes everything
      (3L, prose("duplicate")),         // md5 in the corpus index
      (5L, prose("contaminated")),      // shares a 5-gram with eval
      (7L, "short one"),                // fails quality (under 10 tokens)
      (31L, prose("evaldoc"))           // 31 % EvalMod == 0: eval, not clean
    ).toDF("doc_id", "text")
    val hashes = Seq(prose("duplicate")).toDF("text")
      .select(md5(col("text")).as("h"))
    // an eval gram lifted verbatim from doc 5's text
    val evalGrams = Seq("the contaminated and a the").toDF("eg")
    // flat model: every bucket 0 → every doc's weight is exactly 0.0
    val model = spark.range(TextAnalysis.DsirBuckets)
      .select(col("id").as("bucket"), lit(0L).as("lr_fp"))
    val f = TextAnalysis.curationFlagsOf(batch, hashes, evalGrams, model)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(3), r.getBoolean(4), r.getDouble(5))))
      .toMap
    assert(f(1L) == ((true, true, true, 0.0)))
    assert(f(3L) == ((true, false, true, 0.0)))   // dedup drop
    assert(f(5L) == ((true, true, false, 0.0)))   // decontam drop
    assert(f(7L)._1 == false)                     // quality drop
    assert(f(31L)._3 == false)                    // eval docs never train
    assert(f.keySet == Set(1L, 3L, 5L, 7L, 31L))
  }

  /** The registered incremental census agrees with recomputing the
    * batch-side predicates directly on the arriving slice. */
  test("incremental funnel census is monotone and anchored to the batch") {
    val rows = TextAnalysis.curationFunnelInc(spark, dir).collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"))).sortBy(_._1)
    val batch = Tables.documents(spark, dir).filter(col("doc_id") % 2 === 1)
    assert(rows.head._1 == "1_input" && rows.head._2 == batch.count())
    rows.sliding(2).foreach {
      case Array((s1, d1, t1), (s2, d2, t2)) =>
        assert(d2 <= d1 && t2 <= t1, s"$s2 grew vs $s1")
      case _ => ()
    }
  }
}
