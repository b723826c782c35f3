package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SimSearch
import graft.sources.Tables

/** Behavioral tests for the cluster-share PSI embedding-drift monitor:
  * identical snapshots must read exactly zero, a wholesale spatial
  * shift must light up, and the spine/count bookkeeping must balance. */
class EmbeddingDriftSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select("vec_id", "embedding")

  test("identical snapshots: every psi_term is exactly 0.0") {
    val rows = SimSearch.embeddingDriftOf(emb, emb).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(5) == 0.0))
    assert(rows.forall(r => r.getLong(1) == r.getLong(2))) // n_ref == n_cur
  }

  test("counts cover both snapshots over the trained-centroid spine") {
    val rows = SimSearch.embeddingDriftOf(emb, emb).collect()
    val n = emb.count()
    assert(rows.map(_.getLong(1)).sum == n)
    assert(rows.map(_.getLong(2)).sum == n)
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == ids.length && ids.length <= SimSearch.KmK)
  }

  test("a wholesale spatial shift produces substantial PSI") {
    val shifted = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double") + lit(2.0)).as("embedding"))
    val rows = SimSearch.embeddingDriftOf(emb, shifted).collect()
    val psi = rows.map(_.getDouble(5)).sum
    assert(psi > 0.1, s"total PSI $psi")
    // PSI terms are non-negative by construction: (p-q)ln(p/q) >= 0
    assert(rows.forall(_.getDouble(5) >= 0.0))
  }

  test("deterministic across repartitionings") {
    val a = SimSearch.embeddingDriftOf(emb, emb.repartition(5)).collect()
    val b = SimSearch.embeddingDriftOf(emb.repartition(3), emb).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
