package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The simhash width dial (SCALE.md caveat 1): the banded plan must stay
  * pigeonhole-complete at every supported width, and exact duplicates
  * must pair at hamming 0 regardless of width.
  */
class SimhashWidthSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  private def docs = graft.sources.Tables.documents(spark, Sf)

  test("128-bit banded pairs == brute-force hamming<=3 (pigeonhole at the wider width)") {
    val banded = Dedup.simhashPairsOf(docs, bits = 128).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force over the signature frame: every doc pair, popcount XOR
    val sigs = Dedup.simhashBandsOf(docs, bits = 128)
      .filter(col("band") === 0)
      .select("doc_id", "sh_0", "sh_1", "sh_2", "sh_3")
    val a = sigs.toDF("doc_a", "a0", "a1", "a2", "a3")
    val b = sigs.toDF("doc_b", "b0", "b1", "b2", "b3")
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (0 until 4).map(j => bit_count(col(s"a$j").bitwiseXOR(col(s"b$j"))))
          .reduce(_ + _).cast("long").as("hamming"))
      .filter(col("hamming") <= Dedup.HammingMax)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(banded == brute)
  }

  test("planted exact duplicates pair at hamming 0 at both 64 and 128 bits") {
    val d = docs.limit(20)
    val planted = d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000L))
    Seq(64, 128).foreach { bits =>
      val pairs = Dedup.simhashPairsOf(planted, bits).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val ids = d.select("doc_id").as[Long].collect()
      ids.foreach { id =>
        assert(pairs.exists(p => p._1 == id && p._2 == id + 1000L && p._3 == 0L),
          s"exact copy of doc $id must pair at hamming 0 (bits=$bits)")
      }
    }
  }

  test("unsupported widths are rejected") {
    intercept[IllegalArgumentException](Dedup.simhashPairsOf(docs, bits = 48))
    intercept[IllegalArgumentException](Dedup.simhashPairsOf(docs, bits = 256))
    // 96 is a 32-multiple but its 24-bit bands would straddle word
    // boundaries — the dial is exactly {32, 64, 128}
    intercept[IllegalArgumentException](Dedup.simhashPairsOf(docs, bits = 96))
  }
}
