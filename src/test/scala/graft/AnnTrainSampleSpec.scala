package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimSearch

/** Sampled quantizer training (the r10 VERDICT `build:ann_index`
  * directive): Lloyd runs on the `KmTrainPerCent`·K lowest vec_ids by
  * the content-hash uniform instead of the whole corpus. These pins
  * establish, on a planted geometry where the cap genuinely BINDS
  * (N = 3000 > 256·8 = 2048), that
  *
  *  1. the sample-trained quantizer assigns the corpus IDENTICALLY to
  *     the full-trained one (recall parity in the strongest form —
  *     same partition, not just same top-k), and
  *  2. both recover the planted clusters exactly (purity 1), so the
  *     parity is between two CORRECT quantizers, not two broken ones.
  *
  * Below the cap the sample IS the population by construction
  * (`trainIds` is an ORDER BY … LIMIT), which is what keeps every
  * small-SF oracle bit-identical — pinned here too. */
class AnnTrainSampleSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val K = 8
  private val N = 3000

  /** 8 planted clusters at scaled unit corners of a 4-dim cube, tight
    * deterministic jitter (±0.05 per dim via a multiplicative hash) —
    * separation 100, jitter 0.1: no boundary vectors exist, so a
    * correct quantizer's partition is unique. */
  private lazy val planted = {
    def jit(i: Long, d: Int): Double =
      (((i * 2654435761L + d * 40503L) % 1000 + 1000) % 1000) / 10000.0 - 0.05
    val rows = (0 until N).map { i =>
      val c = i % K
      val base = Seq(
        if ((c & 1) != 0) 100.0 else 0.0,
        if ((c & 2) != 0) 100.0 else 0.0,
        if ((c & 4) != 0) 100.0 else 0.0,
        0.0)
      (i.toLong, base.zipWithIndex.map { case (b, d) => b + jit(i.toLong, d) })
    }
    rows.toDF("vec_id", "embedding")
  }

  test("the cap binds on this geometry (sample is a strict subset)") {
    val cap = SimSearch.KmTrainPerCent * K
    assert(cap < N)
    assert(SimSearch.trainIds(planted.select("vec_id"), cap).count() == cap)
  }

  test("sample-trained == full-trained assignment, and purity 1 vs planted") {
    val cap = SimSearch.KmTrainPerCent * K
    val sampled = SimSearch
      .kmeansAssignmentOn(planted,
        SimSearch.trainIds(planted.select("vec_id"), cap), K, SimSearch.KmIters)
      .select("vec_id", "cent_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = SimSearch
      .kmeansAssignmentOn(planted, planted.select("vec_id"), K, SimSearch.KmIters)
      .select("vec_id", "cent_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sampled.size == N && full.size == N)
    // identical partition, label-for-label (seeds are the K lowest
    // vec_ids of the FULL population in both arms, so labels align)
    assert(sampled == full)
    // purity 1: each planted cluster (vec_id % K) maps to exactly one
    // centroid and no centroid serves two planted clusters
    val byPlanted = sampled.groupBy(_._1 % K).map { case (p, m) =>
      p -> m.values.toSet }
    assert(byPlanted.values.forall(_.size == 1))
    assert(byPlanted.values.flatten.toSet.size == K)
  }

  test("at or under the cap the sample IS the population") {
    val small = planted.filter($"vec_id" < 100)
    val ids = SimSearch.trainIds(small.select("vec_id"),
      SimSearch.KmTrainPerCent * K).collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 100L).toSet)
  }
}
