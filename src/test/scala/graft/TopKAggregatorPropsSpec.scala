package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.{Scored, TopKAggregator}

/** ScalaCheck equivalence of the bounded-insert `reduce` / linear
  * `merge` against the obvious sort-based specification — the proof
  * that the O(1)-common-case hot loop computes exactly the same top-k
  * as re-sorting per row would.
  */
class TopKAggregatorPropsSpec extends Properties("TopKAggregator") {

  private def spec(k: Int)(xs: Seq[Scored]): List[Scored] =
    xs.sortBy(s => (-s.score, s.id)).take(k).toList

  // duplicate scores (and ids) are common on purpose: ties exercise the
  // lteq boundary of the bounded insert
  private val scored = for {
    id <- Gen.chooseNum(0L, 20L)
    score <- Gen.oneOf(Gen.chooseNum(-5, 5).map(_.toDouble),
      Gen.chooseNum(-100.0, 100.0))
  } yield Scored(id, score)
  private val items = Gen.listOf(scored)
  private val ks = Gen.chooseNum(1, 8)

  property("folding reduce equals sort-take") = forAll(ks, items) { (k, xs) =>
    val agg = new TopKAggregator(k)
    xs.foldLeft(agg.zero)(agg.reduce) == spec(k)(xs)
  }

  property("merge of two reduced buffers equals sort-take of the union") =
    forAll(ks, items, items) { (k, xs, ys) =>
      val agg = new TopKAggregator(k)
      val bx = xs.foldLeft(agg.zero)(agg.reduce)
      val by = ys.foldLeft(agg.zero)(agg.reduce)
      agg.merge(bx, by) == spec(k)(xs ++ ys)
    }

  property("any partitioning of the input reduces+merges to the same top-k") =
    forAll(ks, items, Gen.chooseNum(1, 5)) { (k, xs, nParts) =>
      val agg = new TopKAggregator(k)
      val parts = xs.grouped(math.max(1, (xs.size + nParts - 1) / nParts)).toList
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      merged == spec(k)(xs)
    }
}
