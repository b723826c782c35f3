package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.MisraGriesAggregator

/** ScalaCheck pins for the Misra-Gries candidate phase of
  * `q_sketch_heavy_hitters`, under arbitrary partitioning into
  * reduce+merge trees (the topology Spark actually runs):
  *
  *  - SUPERSET GUARANTEE: every item with true frequency > N/m is
  *    present in the merged summary — the property the exact-recount
  *    pass relies on to make the final answer exact;
  *  - LOWER-BOUND / ERROR BOUND: stored counts never exceed truth and
  *    undercount by at most N/m in total.
  */
class MisraGriesPropsSpec extends Properties("MisraGriesAggregator") {

  // small alphabets with heavy repetition so some items genuinely cross
  // the N/m bar while the alphabet exceeds the capacity
  private val item = Gen.frequency(
    (6, Gen.oneOf("hot1", "hot2", "hot3")),
    (4, Gen.chooseNum(0, 40).map(i => s"w$i")))
  private val streams = Gen.listOf(item)
  private val caps = Gen.chooseNum(1, 12)
  private val parts = Gen.chooseNum(1, 6)

  private def summarize(agg: MisraGriesAggregator,
      xs: List[String], nParts: Int): Map[String, Long] = {
    val chunk = math.max(1, (xs.size + nParts - 1) / nParts)
    xs.grouped(chunk).toList
      .map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge)
  }

  property("every item with freq > N/m survives reduce+merge") =
    forAll(caps, parts, streams) { (m, p, xs) =>
      val agg = new MisraGriesAggregator(m)
      val sum = summarize(agg, xs, p)
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong)
      truth.forall { case (k, c) =>
        c * m <= xs.size || sum.contains(k)
      }
    }

  property("counts are lower bounds undercounting by at most N/m") =
    forAll(caps, parts, streams) { (m, p, xs) =>
      val agg = new MisraGriesAggregator(m)
      val sum = summarize(agg, xs, p)
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      sum.forall { case (k, c) =>
        val t = truth.getOrElse(k, 0L)
        c <= t && (t - c) * m <= xs.size
      }
    }

  property("summary never exceeds capacity") =
    forAll(caps, parts, streams) { (m, p, xs) =>
      summarize(new MisraGriesAggregator(m), xs, p).size <= m
    }
}
