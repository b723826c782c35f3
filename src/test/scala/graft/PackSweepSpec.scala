package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Context-length sweep invariants on the pinned sf0.001 corpus:
  * fragmentation and pack count fall monotonically as capacity grows,
  * the token census is capacity-invariant, and the 4096 arm agrees
  * with the registered packer's pack count exactly. */
class PackSweepSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  // sf0.01: at sf0.001 the 40 (lang, shard) streams are so short that
  // every capacity holds each stream whole and the dial has nothing to
  // separate
  private val dir = "/root/testdata/sf0.01"

  test("straddle rate and pack count fall with capacity; census invariant") {
    val rows = TextAnalysis.packSweep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == TextAnalysis.PackSweepCaps.sorted)
    assert(rows.map(_._2).distinct.length == 1) // n_docs constant
    assert(rows.map(_._3).distinct.length == 1) // tokens constant
    rows.sliding(2).foreach { case Array(lo, hi) =>
      // monotone, floored at one pack per non-empty (lang, shard) stream
      assert(hi._4 <= lo._4, s"n_packs must not rise: ${lo._1}->${hi._1}")
      assert(hi._5 <= lo._5, s"straddled must not rise: ${lo._1}->${hi._1}")
    }
    assert(rows.last._4 < rows.head._4) // the dial separates end-to-end
    // at least some fragmentation at the shortest context
    assert(rows.head._5 > 0L)
  }

  test("the 4096 arm equals the registered packer's pack count") {
    val sweep4096 = TextAnalysis.packSweep(spark, dir).collect()
      .find(_.getLong(0) == TextAnalysis.PackCapacity).get.getLong(3)
    val packs = TextAnalysis.packSequences(spark, dir).count()
    assert(sweep4096 == packs)
  }

  test("straddle identity: a doc straddles iff start and end bins differ") {
    // constructed stream, hand-computable: docs 0 and 8 share shard 0
    // (doc_id % 8), each 300 tokens — doc 8 spans tokens [300, 599] of
    // its stream and straddles the 512 boundary, but fits whole at
    // every larger capacity; the other shards hold one doc each and
    // never straddle
    import spark.implicits._
    val docs = (0 until 16)
      .map(k => (k.toLong, "t " * 300, "xx", "s", 600L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = java.nio.file.Files.createTempDirectory("graft-packsweep").toString
    docs.write.parquet(s"$d/documents.parquet")
    val straddled = TextAnalysis.packSweep(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(straddled(512L) == 8L) // every shard's SECOND doc crosses 512
    assert(straddled(1024L) == 0L) // 600-token streams fit whole
    assert(straddled(8192L) == 0L)
  }
}
