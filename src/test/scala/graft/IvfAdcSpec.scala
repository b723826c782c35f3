package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimSearch
import graft.sources.Tables

/** IVFADC composition tests (Jégou et al. 2011 §V): IVF routing over
  * the PQ/ADC serving chain. The decisive property is structural — with
  * nprobe = K every query probes EVERY inverted list, the candidate set
  * equals the whole corpus, and the routed ranking must equal flat
  * brute-force ADC row for row. Anything the routing composition gets
  * wrong (lost cells, duplicated candidates, a broken LUT join key)
  * breaks the equality. The registered nprobe=2 query is additionally
  * hash-checked against the DuckDB oracle (`q_ann_ivfadc`) and its
  * recall pinned in `q_ann_pq_recall`. */
class IvfAdcSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val e = Tables.fanOut(Tables.embeddings(spark, dir))

  test("nprobe=K (probe all cells) equals flat brute-force ADC exactly") {
    val flat = SimSearch.pqTopKOf(e).collect().map(_.toSeq).toSeq
    val routedAll =
      SimSearch.ivfAdcTopKOf(e, SimSearch.IvfK).collect().map(_.toSeq).toSeq
    assert(flat == routedAll)
  }

  test("nprobe=2 returns 3 ranked neighbors per query, self excluded") {
    val rows = SimSearch.ivfAdcTopK(spark, dir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until SimSearch.NQueries.toLong).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
      assert(!rs.map(_.getLong(2)).contains(q))
    }
  }

  test("residual coding: 3 ranked neighbors per query, self excluded") {
    val rows = SimSearch.ivfAdcResidualTopK(spark, dir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until SimSearch.NQueries.toLong).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
      assert(!rs.map(_.getLong(2)).contains(q))
    }
  }

  test("exact refine beats or matches raw ADC on recall@3 vs exact L2") {
    // IndexRefineFlat's value proposition: re-ranking the ADC shortlist
    // on exact L2 can only improve agreement with the exact top-3 —
    // losses remain only where routing dropped the true neighbor's cell
    // or the shortlist cut it (refine removes ADC-ranking error, the
    // third loss source)
    val emb = e  // bind before the import: functions._ also exports an `e`
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.l2sq
    val q = emb.filter(col("vec_id") < SimSearch.NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("d2"), col("neighbor"))
    val exact3 = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        round(l2sq(col("q_emb"), col("embedding")), 6).as("d2"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select("q_id", "neighbor")
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.select("q_id", "neighbor").join(exact3, Seq("q_id", "neighbor")).count()
    val raw = hits(SimSearch.ivfAdcTopKOf(emb, SimSearch.IvfNProbe))
    val refined = hits(SimSearch.ivfAdcRefineTopKOf(emb, SimSearch.IvfNProbe,
      SimSearch.HnShortlist))
    assert(refined >= raw,
      s"refine lowered recall: refined=$refined raw=$raw")
    // absolute floor: the SEEDED router caps this chain at ~15/30
    // (TrainSignalsSpec pins seeded vs trained routing; the trained
    // router is the miner's path) — refined measures 14/30 here, i.e.
    // refine recovers nearly everything routing lets through
    assert(refined >= 13, s"refined recall collapsed: $refined/30")
  }

  test("residual coding beats or matches plain coding on mean quantization error") {
    // the reason FAISS defaults to residuals: the sub-quantizers model
    // within-cell variance, so the ADC distance to each vector's TRUE
    // self-code is 0 only if coding is lossless — compare mean top-1
    // adc_d2 as a proxy: residual top-1 distances should not be
    // systematically worse than plain top-1 distances
    val plain = SimSearch.ivfAdcTopK(spark, dir)
      .filter(org.apache.spark.sql.functions.col("rank") === 1)
      .agg(org.apache.spark.sql.functions.avg("adc_d2")).head.getDouble(0)
    val res = SimSearch.ivfAdcResidualTopK(spark, dir)
      .filter(org.apache.spark.sql.functions.col("rank") === 1)
      .agg(org.apache.spark.sql.functions.avg("adc_d2")).head.getDouble(0)
    assert(res.isFinite && plain.isFinite && res <= plain * 1.05,
      s"residual mean top-1 adc_d2 $res vs plain $plain")
  }

  test("routed candidates respect the routing: neighbors live in probed cells") {
    // every returned neighbor's rnk=1 cell must be among its query's
    // top-nprobe cells — the defining invariant of IVF routing
    val ranked = SimSearch.ivfRanked(e)
    val assign = ranked.filter(ranked("rnk") === 1)
      .select(ranked("vec_id").as("neighbor"), ranked("cent_id").as("n_cell"))
    val probes = ranked
      .filter(ranked("vec_id") < SimSearch.NQueries && ranked("rnk") <= SimSearch.IvfNProbe)
      .select(ranked("vec_id").as("q_id"), ranked("cent_id").as("p_cell"))
    val bad = SimSearch.ivfAdcTopK(spark, dir)
      .join(assign, "neighbor")
      .join(probes, "q_id")
      .groupBy("q_id", "neighbor", "n_cell")
      .agg(org.apache.spark.sql.functions.max(
        (org.apache.spark.sql.functions.col("p_cell") ===
          org.apache.spark.sql.functions.col("n_cell")).cast("int")).as("in_probe"))
      .filter(org.apache.spark.sql.functions.col("in_probe") === 0)
    assert(bad.count() == 0)
  }
}
