package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Temperature mixing on a 2-language corpus whose α=0.5 arithmetic is
  * exact by hand: 8 docs of 'hi' vs 2 of 'lo' gives p = (0.8, 0.2),
  * q ∝ (√8, √2) = (2/3, 1/3), boosts (5/6, 5/3) — the low-resource
  * language upsamples at rate 1.666667 (every doc kept once, the
  * second copy thinned to ~2/3), the high-resource one thins below 1. */
class TemperatureMixSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def mixed() = {
    val docs = ((1 to 8).map(i => ("hi", s"high resource doc $i")) ++
      (1 to 2).map(i => ("lo", s"low resource doc $i")))
      .toDF("lang", "text")
    TextAnalysis.temperatureMixOf(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getLong(6))).toMap
  }

  test("alpha=0.5 shares, boosts, and rates match the closed form") {
    val m = mixed()
    val (nHi, pHi, qHi, boostHi, rateHi, _) = m("hi")
    val (nLo, pLo, qLo, boostLo, rateLo, _) = m("lo")
    assert((nHi, nLo) == (8L, 2L))
    assert(pHi == 0.8 && pLo == 0.2)
    assert(qHi == 0.666667 && qLo == 0.333333) // √8/(√8+√2), √2/(√8+√2)
    assert(boostHi == 0.833333 && boostLo == 1.666667)
    assert(rateHi == boostHi && rateLo == boostLo) // B = N: rate IS boost
  }

  test("replicate-and-thin bounds: floor(rate)·n <= out <= ceil(rate)·n") {
    val m = mixed()
    val (nHi, _, _, _, rateHi, outHi) = m("hi")
    val (nLo, _, _, _, rateLo, outLo) = m("lo")
    assert(outHi >= math.floor(rateHi).toLong * nHi &&
      outHi <= math.ceil(rateHi).toLong * nHi)
    // every low-resource doc keeps its guaranteed full copy
    assert(outLo >= nLo && outLo <= 2 * nLo)
    // the draw is deterministic: same corpus, same answer, every run
    assert(mixed() == m)
  }
}
