package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, SimSearch}
import java.nio.file.Files

/** The banded dedup/ANN operators must produce identical results for
  * identical DATA regardless of the input's file/partition layout — the
  * reference's 2000-line split generalized: at cluster scale the split
  * count is an execution detail, never a semantic one. The multi-file
  * copy also changes what `Tables.fanOut` does (7 input splits ≥ the 4
  * test cores ⇒ no repartition), so both fan-out paths are exercised.
  */
class DedupInvarianceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val base = "/root/testdata/sf0.001"

  private lazy val multi: String = {
    val d = Files.createTempDirectory("graft-multi-layout").toString
    for (t <- Seq("documents", "embeddings")) {
      spark.read.parquet(s"$base/$t.parquet")
        .repartition(7)
        .write.mode("overwrite").parquet(s"$d/$t.parquet")
    }
    d
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq

  for ((name, op) <- Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "minhashLsh" -> (Dedup.minhashLsh _),
      "simhashPairs" -> (Dedup.simhashPairs _),
      "ngramJaccard" -> (Dedup.ngramJaccard _),
      "embeddingNearDup" -> ((s: org.apache.spark.sql.SparkSession, d: String) => Dedup.embeddingNearDup(s, d)),
      "lshBucketedTopK" -> (SimSearch.lshBucketedTopK _))) {
    test(s"$name: identical results on single-file and 7-file layouts") {
      assert(rows(op(spark, base)) == rows(op(spark, multi)))
    }
  }
}
