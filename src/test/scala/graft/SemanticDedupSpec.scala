package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimSearch

/** SemDeDup-style semantic dedup on a planted geometry where cluster
  * structure and every drop verdict are derivable by hand: 8 mutually
  * orthogonal base vectors (the deterministic k-means seeds, each its
  * own converged cluster), two near-copies of bases at different
  * perturbation depths, one genuinely-novel vector sharing a cluster,
  * and a chain case that pins the best-witness tie-break. */
class SemanticDedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val Dims = 8
  private def base(i: Int): Array[Float] =
    Array.tabulate(Dims)(d => if (d == i) 1f else 0f)
  private def perturb(v: Array[Float], dir: Int, eps: Float): Array[Float] = {
    val p = v.clone(); p(dir) = p(dir) + eps; p
  }

  // vec_ids 0..7: the orthogonal bases (and the k=8 seed pick).
  // 8  ≈ base(3) (eps 0.1 along dim 0)
  // 9  ≈ base(5) (eps 0.1 along dim 1)
  // 10 = base(6) tilted 45° toward dim 2: exactly equidistant from
  //      base(2) and base(6) (d² = 1 to both, cos = 1/√2 to both), so
  //      BOTH deterministic tie-breaks fire — assignment resolves to
  //      the lower cent_id (cluster 2), and at τ ≤ 0.707 the witness
  //      resolves to the lower keep_id (2). Above τ it is a semantic
  //      NEIGHBOR, not a duplicate — kept.
  // 11 ≈ base(3) (eps 0.2 along dim 0): chain case — τ-close to BOTH
  //      base(3) and vec 8; the witness must be 8 (smaller angle gap:
  //      cos(atan .2 − atan .1) > cos(atan .2))
  private val vectors: Seq[(Long, Array[Float])] =
    (0 to 7).map(i => i.toLong -> base(i)) ++ Seq(
      8L -> perturb(base(3), 0, 0.1f),
      9L -> perturb(base(5), 1, 0.1f),
      10L -> perturb(base(6), 2, 1f),
      11L -> perturb(base(3), 0, 0.2f))

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
  }

  test("the K dial derives from N: KmK floor, then integer ceil(N/cell)") {
    assert(SimSearch.semDerivedK(1) == SimSearch.KmK)
    assert(SimSearch.semDerivedK(8 * SimSearch.SemCellTarget) == SimSearch.KmK)
    assert(SimSearch.semDerivedK(8 * SimSearch.SemCellTarget + 1) == SimSearch.KmK + 1)
    assert(SimSearch.semDerivedK(2000) == 32)   // the sf0.1 corpus
    assert(SimSearch.semDerivedK(20000) == 313) // the sf1 snapshot
    // pair work stays ~linear: Σ n_c² ≈ N·cell at every N
    val perCell = SimSearch.SemCellTarget.toDouble
    Seq(10000L, 100000L, 1000000L).foreach { n =>
      val k = SimSearch.semDerivedK(n)
      assert(n.toDouble / k <= perCell, s"mean cell at N=$n exceeds target")
    }
  }

  test("drops exactly the tau-close higher ids, with best-cos witnesses") {
    val e = vectors.toDF("vec_id", "embedding")
    val out = SimSearch.semanticDedupOf(e, k = 8, iters = 2, tau = 0.9)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val vecs = vectors.toMap
    // hand-derived verdicts: 8 dups base(3), 9 dups base(5), 11 chains
    // to 8; 10 shares base(6)'s cluster but sits below tau — kept
    assert(out.keySet == Set(8L, 9L, 11L))
    assert(out(8L) == (3L, cosine(vecs(8L), vecs(3L))))
    assert(out(9L) == (5L, cosine(vecs(9L), vecs(5L))))
    assert(out(11L) == (8L, cosine(vecs(11L), vecs(8L))))
    // the chain tie-break did real work: both witnesses were tau-close
    assert(cosine(vecs(11L), vecs(3L)) >= 0.9)
    assert(cosine(vecs(11L), vecs(8L)) > cosine(vecs(11L), vecs(3L)))
  }

  test("tau dial: at a looser threshold the neighbor becomes a dup") {
    val e = vectors.toDF("vec_id", "embedding")
    val out = SimSearch.semanticDedupOf(e, k = 8, iters = 2, tau = 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.contains(10L) && out(10L) == 2L) // cos ≈ 0.707 ≥ 0.7; ties → lower id
    assert(Set(8L, 9L, 11L).subsetOf(out.keySet))
  }

  test("hard negatives: close but NOT tau-duplicate, never intersecting the dup set") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val e = graft.sources.Tables.embeddings(spark, dir)
    val negs = SimSearch.hardNegativesOf(e).collect()
    // 3 negatives per query, self excluded
    val byQ = negs.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until SimSearch.NQueries.toLong).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
      assert(!rs.map(_.getLong(2)).contains(q))
    }
    // no emitted (q, neighbor) pair is tau-close (in either orientation)
    val close = SimSearch.semanticClosePairs(
        e, SimSearch.KmK, SimSearch.KmIters, SimSearch.SemTau)
      .select("keep_id", "vec_id").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .toSet
    val emitted = negs.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(emitted.intersect(close).isEmpty)
    // the exclusion is LOAD-BEARING on the planted geometry: vec 8 is
    // base(3)'s tau-duplicate AND its nearest neighbor by cosine, so
    // query 3's hard negatives must skip it (and 11, the deeper copy)
    // while still ranking 3 genuinely-different vectors
    val planted = vectors.toDF("vec_id", "embedding")
    val p3 = SimSearch.hardNegativesOf(planted).collect()
      .filter(_.getLong(0) == 3L).map(_.getLong(2)).toSet
    assert(!p3.contains(8L) && !p3.contains(11L), s"query 3 negatives: $p3")
    assert(p3.size == 3)
  }
}
