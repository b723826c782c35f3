package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimSearch

/** Product-quantization tests over a corpus PLANTED to be losslessly
  * codable: every vector's subvector in every subspace is one of 16
  * shared patterns, and the 16 seed vectors (lowest vec_ids) cover all
  * 16 patterns in every subspace. Training then recovers the patterns
  * exactly (each codeword is the mean of identical subvectors), so the
  * ADC distance of any pair must EQUAL the true squared L2 distance —
  * the strongest possible check of the train → encode → serve chain. */
class PqSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Subspace pattern p (0..15) for subspace s: a distinctive constant
    * vector — distinct patterns are far apart in every subspace. */
  private def pattern(s: Int, p: Int): Seq[Float] =
    (0 until 8).map(d => (p * 10 + s + d * 0.25f + (if (d % 2 == 0) p else -p)).toFloat)

  /** Vector i chooses pattern (i + s·3) mod 16 in subspace s — the first
    * 16 vectors enumerate all residues in every subspace. */
  private def vec(i: Int): Seq[Float] =
    (0 until 8).flatMap(s => pattern(s, (i + s * 3) % 16))

  private lazy val planted =
    (0 until 64).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  private lazy val result = SimSearch.pqTopKOf(planted).collect()

  private def exactD2(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum

  test("10 queries, 3 ranked neighbors each, self excluded") {
    assert(result.length == 30)
    val byQ = result.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
      assert(!rows.map(_.getLong(2)).contains(q))
    }
  }

  test("ADC distance equals the exact distance on a lossless codebook") {
    result.foreach { r =>
      val (q, n, adc) = (r.getLong(0).toInt, r.getLong(2).toInt, r.getDouble(3))
      val exact = exactD2(vec(q), vec(n))
      assert(math.abs(adc - exact) < 1e-4,
        s"q=$q n=$n adc=$adc exact=$exact")
    }
  }

  test("neighbors are the true nearest under exact distance") {
    // vectors whose pattern residue matches in every subspace are
    // identical; residues repeat mod 16, so i and i+16 coincide — the
    // top neighbors of query q must be exactly {q+16, q+32, q+48}
    // (distance 0), in neighbor-id order
    result.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val expect = Seq(q + 16, q + 32, q + 48)
      assert(rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq == expect,
        s"query $q neighbors")
      assert(rows.forall(_.getDouble(3) == 0.0))
    }
  }

  test("deterministic across repartitionings") {
    val again = SimSearch.pqTopKOf(planted.repartition(7)).collect()
    assert(result.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("recall audit reads 1.0 on the lossless codebook") {
    // ADC == exact distance here, so the exact top-3 and ADC top-3 are
    // the same set for every query — the audit must certify it. Only
    // the flat-ADC method rows: the planted ids (0..63) contain no IVF
    // seed centroids (ids 100+), so the routed arm is degenerate here —
    // IvfAdcSpec covers it on the real corpus.
    val rows = SimSearch.pqRecallOf(planted).collect()
      .filter(_.getString(0) == "pq_adc")
    assert(rows.length == 10)
    assert(rows.forall(_.getLong(2) == 3), rows.map(_.toSeq).mkString(";"))
    assert(rows.forall(_.getDouble(3) == 1.0))
  }
}
