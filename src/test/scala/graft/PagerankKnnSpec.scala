package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Mutual-kNN PageRank pins (r10 VERDICT directive #4):
  *
  *  - DEGREE BOUND: every node of the sparsified graph has degree ≤ m
  *    by construction, on a planted hub geometry where the RAW graph
  *    has a hub of unbounded degree;
  *  - SYMMETRY: the mutual intersection keeps the edge frame symmetric
  *    (PageRank's dangling-mass-free invariant);
  *  - RANK STABILITY under corpus growth: verbatim basket replication
  *    scales every association weight uniformly, so the top-m sets,
  *    the mutual graph, and therefore the emitted ranks are EXACTLY
  *    unchanged — the "raise the dial with the corpus" discipline is
  *    unnecessary here because the cap is per-node, not global.
  */
class PagerankKnnSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** A hub basket corpus: part 0 co-occurs with every part 1..60 (one
    * basket each, support 1), while parts 1..6 form a clique of
    * repeated baskets (support 3) — the raw hub degree is 60, far
    * over the cap, and the repeated clique is the signal the top-m
    * rank must keep. */
  private def baskets(rep: Int): Seq[(Long, Long)] = {
    val hub = (1 to 60).map(i => (i.toLong, Seq(0L, i.toLong)))
    val clique = (0 until 3).map(r =>
      (1000L + r, Seq(1L, 2L, 3L, 4L, 5L, 6L)))
    val base = hub ++ clique
    (0 until rep).flatMap { r =>
      base.map { case (ok, parts) => (ok + 100000L * r, parts) }
    }.flatMap { case (ok, parts) => parts.map(p => (ok, p)) }
  }

  private def li(rep: Int) =
    baskets(rep).toDF("l_orderkey", "l_partkey")

  test("mutual-kNN degree is bounded by m; the edge frame is symmetric") {
    val edges = Graph.knnEdges(li(1), m = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.length }
    assert(deg.values.max <= 8)
    // raw hub degree is 60 — the cap actually bit
    val rawDeg = Graph.copurchaseEdges(li(1))
      .filter($"src" === 0L).count()
    assert(rawDeg == 60L)
    assert(edges.map { case (a, b) => (b, a) }.toSet == edges.toSet)
  }

  test("verbatim corpus growth leaves the kNN graph and ranks unchanged") {
    val e1 = Graph.knnEdges(li(1), m = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e3 = Graph.knnEdges(li(3), m = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e1 == e3)
    val r1 = Graph.pagerankRanks(Graph.knnEdges(li(1), m = 8))
      .select("node", "r").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val r3 = Graph.pagerankRanks(Graph.knnEdges(li(3), m = 8))
      .select("node", "r").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(r1 == r3)
  }
}
