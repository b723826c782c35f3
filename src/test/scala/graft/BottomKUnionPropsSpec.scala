package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck pin for the sketch-algebra identity
  * `q_sketch_bottomk_union` rests on: the bottom-k of the UNION of two
  * sets equals the bottom-k of the union of their bottom-k SKETCHES —
  * for any split, any k, with duplicates across the sides (the shared
  * content that makes the coordinated-Jaccard estimator work). This is
  * why per-crawl sketches can persist and compose pairwise without
  * ever re-scanning a corpus.
  */
class BottomKUnionPropsSpec extends Properties("BottomKUnion") {

  private def bottomK(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  private val items = Gen.listOf(Gen.chooseNum(0L, 500L))
  private val ks = Gen.chooseNum(1, 40)

  property("bottom-k of union == bottom-k of merged sketches") =
    forAll(ks, items, items) { (k, a, b) =>
      bottomK(a ++ b, k) == bottomK(bottomK(a, k) ++ bottomK(b, k), k)
    }

  property("coordinated membership: within the union sketch, sketch " +
      "membership equals TRUE membership — the Jaccard estimator's lemma") =
    forAll(ks, items, items) { (k, a, b) =>
      val sa = bottomK(a, k).toSet
      val sb = bottomK(b, k).toSet
      // x in bottomK(A∪B) and x in A ⟹ fewer than k union elements
      // below x ⟹ fewer than k A-elements below x ⟹ x in bottomK(A):
      // so counting u ∩ sa ∩ sb counts TRUE intersection members,
      // never misses one that is genuinely in both sides
      bottomK(a ++ b, k).forall(x =>
        sa.contains(x) == a.contains(x) && sb.contains(x) == b.contains(x))
    }

  property("idempotent, and smaller k is a prefix of larger k") =
    forAll(ks, ks, items) { (k1, k2, a) =>
      val (lo, hi) = (math.min(k1, k2), math.max(k1, k2))
      bottomK(bottomK(a, lo), lo) == bottomK(a, lo) &&
        bottomK(a, hi).take(lo) == bottomK(a, lo)
    }
}
