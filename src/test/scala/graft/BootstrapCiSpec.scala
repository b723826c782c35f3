package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiling

/** Poisson-bootstrap CI invariants: a degenerate (constant-length)
  * language has a ZERO-width interval pinned at the exact fixed-point
  * mean regardless of the random weights; a mixed language brackets its
  * point estimate; and the whole output is deterministic (the weights
  * are content-hash draws, not RNG state). */
class BootstrapCiSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-boot").toString
    val docs =
      // constant-length language: every replicate mean is exactly 100
      (0 until 30).map(i => (i.toLong, s"aa doc $i", "aa", "src0", 100L)) ++
        // mixed-length language: lengths 50 and 150 around mean 100
        (0 until 30).map(i => (100L + i,
          s"bb doc $i padded ${"x" * i}", "bb", "src0",
          if (i % 2 == 0) 50L else 150L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("constant-length language: zero-width CI at the exact ppm mean") {
    val row = Profiling.bootstrapCi(spark, dir)
      .filter($"lang" === "aa").collect().head
    assert(row.getLong(1) == 30L) // n_docs
    assert(row.getLong(2) == 100000000L) // mean_ppm = 100 * 1e6
    assert(row.getLong(3) == 100000000L) // ci_lo_ppm
    assert(row.getLong(4) == 100000000L) // ci_hi_ppm
    assert(row.getLong(5) == 0L) // ci_width_ppm
  }

  test("mixed language: interval brackets the point estimate, width > 0") {
    val row = Profiling.bootstrapCi(spark, dir)
      .filter($"lang" === "bb").collect().head
    val (mean, lo, hi, width) =
      (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
    assert(lo <= mean && mean <= hi)
    assert(width > 0L)
    // resampling lengths from {50, 150} can never leave that range
    assert(lo >= 50000000L && hi <= 150000000L)
  }

  test("the draw is content-addressed: two runs are row-identical") {
    val a = Profiling.bootstrapCi(spark, dir).collect().toSeq
    val b = Profiling.bootstrapCi(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("diff test: planted regression flags, unshifted languages do not") {
    // sf0.01 (the gate's SF): at sf0.001 the per-lang cur snapshots are
    // ~15 docs and the planted 80-char shift is not separable from
    // noise — which is CORRECT bootstrap behavior, but the both-branch
    // pin needs the sample size the plant was calibrated for
    val out = Profiling.bootstrapDiffCi(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    Profiling.DiffPlantLangs.foreach { l =>
      val (diff, lo, hi, sig) = out(l)
      assert(sig, s"$l must flag the planted shift")
      assert(lo <= diff && diff <= hi)
      assert(diff < 0, s"$l point diff must show the +chars regression")
    }
    (out.keySet -- Profiling.DiffPlantLangs).foreach { l =>
      val (_, lo, hi, sig) = out(l)
      assert(!sig, s"$l must not flag noise")
      assert(lo <= 0L && hi >= 0L)
    }
  }
}
