package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Profiling}
import java.nio.file.Files

/** Fixed points of the keep-best dedup action and the PSI drift
  * report: keep-best retains exactly one doc per near-dup component and
  * it is the LONGEST one (min-id only on ties); the drift report's PSI
  * terms are zero when the two snapshots are identical distributions
  * and positive mass appears where they diverge.
  */
class KeepBestDriftSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("keep-best keeps the longest doc of a near-dup component") {
    val d = Files.createTempDirectory("graft-keepbest").toString
    val short = "the quick brown fox jumps over the lazy dog again and again"
    val long = short + " indeed" // 9 of 10 shingles shared -> J = 0.9
    val other = "completely different text about catalyst tungsten and codegen internals"
    Seq(
      (0L, short, "en", "a", short.length.toLong),
      (1L, long, "en", "a", long.length.toLong),   // near-dup of 0, longer
      (2L, other, "en", "b", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Dedup.clearMemos()
    val kept = Dedup.dedupedCorpusBest(spark, d).collect().map(_.getLong(0)).toSeq
    // min-id keep would retain 0; keep-best must retain the longer 1
    assert(kept == Seq(1L, 2L))
    Dedup.clearMemos()
  }

  test("identical snapshots give zero PSI; diverging ones give positive terms") {
    val d = Files.createTempDirectory("graft-drift").toString
    // even/odd doc_ids (the snapshot split) with IDENTICAL length
    // distributions -> every psi_term must be exactly 0
    (0 until 40).map(i => (i.toLong, "t", "en", "s", (50 + 100 * (i / 10 % 2)).toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val even = Profiling.driftReport(spark, d).collect()
    assert(even.length == Profiling.DriftBuckets)
    even.foreach(r => assert(r.getDouble(5) == 0.0, s"bucket ${r.getLong(0)}"))

    val d2 = Files.createTempDirectory("graft-drift2").toString
    // ref (even ids) all short, cur (odd ids) all long -> strong drift
    (0 until 40).map(i => (i.toLong, "t", "en", "s",
        if (i % 2 == 0) 50L else 950L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val rows = Profiling.driftReport(spark, d2).collect()
    val psi = rows.map(_.getDouble(5)).sum
    assert(psi > 0.25, s"expected investigate-grade drift, got $psi")
    // bucket 0 holds all ref mass, bucket 9 all cur mass; both terms positive
    assert(rows.find(_.getLong(0) == 0L).get.getDouble(5) > 0)
    assert(rows.find(_.getLong(0) == 9L).get.getDouble(5) > 0)
  }
}
