package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Iterative GRAPH analytics expressed relationally — the second graph
  * workload beside connected-components (Dedup.componentsOf): PageRank
  * over the part co-purchase graph. Link analysis over a derived graph
  * is a training-data staple (domain authority for crawl prioritization,
  * citation rank for document weighting); the co-purchase graph stands in
  * because the corpus ships no explicit edges.
  *
  * Everything is joins + aggregations on (node, rank) frames — no driver
  * state, no collect — so the loop runs at any corpus scale with the
  * canonical one-shuffle-per-iteration cost, and a fixed iteration count
  * keeps the cross-engine oracle an unrolled CTE chain (the same
  * fixed-point-vs-fixed-iterations trade [[Dedup.componentsOf]] documents
  * for CC; production runs to convergence with the identical step body).
  */
object Graph {

  /** Power iterations for [[pagerankTop]]. Three exercises the full
    * scatter→gather→damp loop twice past initialization while keeping
    * the DuckDB oracle a readable unrolled chain; the production
    * delta-stopped loop is REGISTERED as [[pagerankConvTop]] (r11
    * VERDICT directive #4). */
  val PrIters = 3

  /** Standard damping factor. */
  val Damping = 0.85

  /** Ranked nodes emitted by [[pagerankTop]]. */
  val PrTopK = 20

  /** Undirected co-purchase edges: parts sharing an order, both
    * directions, deduped. The self-join is keyed by the order — order
    * size is bounded by construction (an order has a handful of lines),
    * so the per-key fan-out is O(size²) with a small constant and the
    * edge build scales linearly in orders. Both directions are kept so
    * the graph is symmetric: every node then has out-degree ≥ 1 and the
    * dangling-mass term of general PageRank vanishes by construction. */
  private[graft] def copurchaseEdges(li: DataFrame): DataFrame = {
    val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("src"))
    val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("dst"))
    a.join(b, "ok").filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
  }

  /** [[copurchaseEdges]] with a SUPPORT FLOOR: keep an edge only when
    * the pair co-occurs in at least `minSupport` orders. Co-occurrence
    * graphs densify superlinearly as the corpus grows (the raw sf0.1
    * co-purchase graph already averages degree ~120 — near-random
    * one-off co-occurrences, not signal), and every neighborhood
    * algorithm downstream pays for that density. A support floor is the
    * standard production fix: it bounds degree by REPEATED association
    * strength rather than corpus size, so the denoised graph stays
    * sparse at 100 TB while the floor itself is one map-side-combined
    * count on the same order-keyed self-join. */
  private[graft] def recurringEdges(li: DataFrame, minSupport: Int): DataFrame = {
    // one row per (order, part) FIRST — TPC-H repeats l_partkey across an
    // order's lines, and counting line-PAIRS would let a single order
    // with a twice-listed part satisfy the floor by itself. Support must
    // mean "co-occurs in ≥ minSupport DISTINCT orders" (the same
    // per-basket distinct [[associationRules]] applies). The distinct is
    // keyed by (order, part) — map-side combined, linear in lines.
    val items = li.select(col("l_orderkey").as("ok"),
      col("l_partkey").as("p")).distinct()
    val a = items.select(col("ok"), col("p").as("src"))
    val b = items.select(col("ok"), col("p").as("dst"))
    a.join(b, "ok").filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .filter(col("w") >= minSupport)
      .select("src", "dst")
  }

  /** PageRank over [[copurchaseEdges]], top [[PrTopK]] by rank.
    *
    * Per iteration: scatter rank/degree along edges (equi-join on the
    * source node), gather by destination (map-side-combined sum), damp.
    * Both the join and the gather key by node id, so AQE reuses one
    * hash partitioning across the whole loop; per-iteration state is
    * the (node, rank) frame — N rows, never materialized on the driver.
    * The rank vector and the degree frame are the same size, so neither
    * side broadcasts: this is the genuinely-large × genuinely-large
    * join shape, left to sort-merge/AQE exactly like the CC loop.
    *
    * Emitted rank is normalized to N×r (1.0 = uniform mass), rounded;
    * the top-k cut orders by the ROUNDED rank with a node tie-break so
    * both engines cut the identical set. Structurally equal nodes
    * (identical neighborhoods) get exactly equal ranks and are resolved
    * by the same tie-break. */
  def pagerankTop(spark: SparkSession, dir: String): DataFrame =
    pagerankRanks(copurchaseEdges(Tables.lineitem(spark, dir)))
      .select(col("node"), col("deg"),
        round(col("r") * col("n"), 4).as("norm_rank"))
      .orderBy(desc("norm_rank"), asc("node"))
      .limit(PrTopK)

  /** Per-node neighbor cap for [[knnEdges]] — the mutual-kNN
    * sparsification dial. 16 keeps every co-purchase hub meaningful at
    * the tested SFs (raw mean degree is ~120 at sf0.01 AND sf0.1) while
    * bounding degree by a CONSTANT at any corpus size. */
  val KnnM = 16

  /** MUTUAL top-m sparsification of the weighted co-purchase graph —
    * the production form of [[copurchaseEdges]] for PageRank (r10
    * VERDICT directive #4). A fixed SUPPORT floor does not bound
    * degree: as a fixed catalog accumulates baskets, every part's
    * neighbor list keeps growing (each neighbor's support grows with
    * the corpus and clears any fixed floor), so the scatter join's
    * cost per node is corpus-dependent. The standard fix from kNN-graph
    * construction: keep edge (u,v) only when v is in u's top-m
    * neighbors by association weight AND u is in v's (mutual kNN —
    * intersection, not union, because a hub can sit in arbitrarily
    * many nodes' top-m and union-kNN leaves ITS degree unbounded).
    * Degree ≤ m by construction at any corpus size, the graph stays
    * symmetric (PageRank's dangling-mass-free invariant), and the
    * weight rank is (w DESC, dst) — totally tie-broken, so both
    * engines cut identical edge sets. Rank stability under corpus
    * growth is suite-pinned: verbatim replication scales every weight
    * uniformly, leaving the top-m sets — and therefore the ranks —
    * exactly unchanged (`PagerankKnnSpec`). */
  private[graft] def knnEdges(li: DataFrame, m: Int = KnnM): DataFrame = {
    val items = li.select(col("l_orderkey").as("ok"),
      col("l_partkey").as("p")).distinct()
    val w = items.select(col("ok"), col("p").as("src"))
      .join(items.select(col("ok"), col("p").as("dst")), "ok")
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(desc("w"), asc("dst"))
    val top = w.withColumn("rnk", row_number().over(rw))
      .filter(col("rnk") <= m).select("src", "dst")
    // mutual = the top-m relation intersected with its own transpose;
    // the equi-join IS the intersection (top is distinct by keys)
    top.join(top.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"))
      .select("src", "dst")
  }

  /** PageRank over the mutual-kNN graph ([[knnEdges]]), top [[PrTopK]]
    * — same emission shape as [[pagerankTop]], which remains the
    * raw-graph audit arm. */
  def pagerankKnnTop(spark: SparkSession, dir: String): DataFrame =
    pagerankRanks(knnEdges(Tables.lineitem(spark, dir)), "pagerankRanksKnn")
      .select(col("node"), col("deg"),
        round(col("r") * col("n"), 4).as("norm_rank"))
      .orderBy(desc("norm_rank"), asc("node"))
      .limit(PrTopK)

  /** Fixed-point scale for [[pagerankConvTop]]: rank mass in units of
    * 10⁻¹² of the total. INTEGER state is what makes a data-dependent
    * stop registrable: the fixed-iteration arms tolerate float ulps
    * because the round count is a constant, but a CONVERGENCE test on
    * drifting doubles could stop Spark at round k and DuckDB at k+1 —
    * with BIGINT arithmetic (floor divisions mirrored exactly) the
    * delta sequence is bit-identical cross-engine, so the stop round
    * itself is part of the hash match. */
  val PrPrec = 1000000000000L

  /** L1 stop for [[pagerankConvTop]]: Σ|r_next − r_cur| < [[PrPrec]]/1000
    * (0.1% of total mass). Reachable by construction: damping contracts
    * the exact-arithmetic delta by ≥ 0.85/round, and the integer-floor
    * noise floor is O(nodes) units — ~10⁵ at the tested graphs, five
    * orders under the threshold. */
  val PrTol = PrPrec / 1000

  /** Oscillation cap for the delta-stopped loop — mirrored in the
    * oracle's recursion gate so a pathological graph stops BOTH engines
    * at the same round instead of hanging one. Never binds on the
    * tested corpora (15 rounds at sf0.01). */
  val PrMaxRounds = 60

  /** DELTA-STOPPED PageRank over the mutual-kNN graph — the production
    * loop [[PrIters]]'s doc promises, registered (`q_graph_pagerank_conv`).
    * Fixed-point integer state ([[PrPrec]]): per round, each node
    * scatters `r div deg` along its edges, gathers by exact BIGINT sum,
    * and damps by the integer form of 0.85 — next = (base·3) div 20 +
    * (17·inflow) div 20 with base = [[PrPrec]] div N — then the loop
    * stops at the first round whose L1 delta drops under [[PrTol]].
    * The emitted `rounds` column pins the stop round cross-engine; the
    * oracle replays the identical integer recursion as a DuckDB
    * recursive CTE whose gate tests the SAME delta (no unrolling —
    * the recursion stops itself, which is the point: fixed-iteration
    * oracles can't grade a data-dependent stop).
    *
    * Scale: the kNN graph bounds degree by [[KnnM]] at any corpus size,
    * so the per-round cost is Θ(nodes·m) and the ROUND COUNT is the
    * only data-dependent factor — damping contracts the delta
    * geometrically, making rounds ~log(1/tol)/log(1/0.85), corpus-
    * independent (measured: 26 rounds at 1×/3×/10× on the disjoint
    * replication axis, SCALE §round-12 delta-stopped PageRank; the
    * verbatim axis is suite-pinned bit-identical). Driver
    * state is one 8-byte delta per round — the 1-row aggregate a
    * convergence test needs anywhere. */
  def pagerankConvTop(spark: SparkSession, dir: String): DataFrame =
    pagerankConvergedRanks(knnEdges(Tables.lineitem(spark, dir)), "pagerankConv")
      .orderBy(desc("fp_rank"), asc("node"))
      .limit(PrTopK)

  /** The converged (node, deg, fp_rank, rounds) frame of
    * [[pagerankConvTop]] — separate from the top-k cut so the suite can
    * pin whole-vector invariants (mass ≈ [[PrPrec]], stop-round delta,
    * fixed-iters ≡ converged ranking on a planted graph). Same
    * materialization discipline as [[pagerankRanks]]: the edge frame is
    * pre-shuffled by `src` once with its layout preserved, each round's
    * |V|-row state is owned and retired when superseded, and the final
    * round is retained one-slot under `retainKey`. */
  private[graft] def pagerankConvergedRanks(edges0: DataFrame,
      retainKey: String): DataFrame = {
    val spark = edges0.sparkSession
    val ckDir = Dedup.confCheckpointDir(spark)
    Dedup.withCheckpointDir(spark, ckDir) {
      val (edges, edgesRdd) = Dedup.materializeOwnedKeyed(
        edges0.repartition(col("src")).sortWithinPartitions("src"),
        ckDir.isDefined)
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      // N is a 1-row census the init division needs on both engines;
      // base mirrors the oracle's (PrPrec // n) * 3 // 20 exactly
      // (Long division truncates toward zero ≡ floor on positives)
      val n = deg.count()
      val base = PrPrec / n
      val floorTerm = base * 3 / 20
      // KEYED init: `deg` rides the edge frame's preserved hash(src)
      // layout (its aggregate plans no exchange), and the keyed cut
      // hands the loop a state frame already partitioned by `node`
      var (cur, curRdd) = Dedup.materializeOwnedKeyed(
        deg.select(col("src").as("node"), col("deg"), lit(base).as("r"))
          .repartition(col("node")),
        ckDir.isDefined)
      // One damped step from an inbound (node, r-as-src, deg) frame.
      def inflowOf(state: DataFrame) = edges.join(state, "src")
        .groupBy(col("dst")).agg(sum(expr("r div deg")).as("inflow"))
      def damped = lit(floorTerm) + expr("(17 * coalesce(inflow, 0L)) div 20")
      var rounds = 0
      var delta = Long.MaxValue
      // TWO-ROUND UNROLL (r13): the loop's wall at tested SFs is driver
      // latency per materialized round (probe: 21 s wall on 47
      // executor-seconds, 224 stages, zero spill — ~8 query stages ×
      // 26 rounds of sub-second work), so each job now computes two
      // damped steps and ONE aggregate returns both L1 deltas. Stop
      // semantics are replicated exactly: if the first step already
      // converged the second step's columns are DISCARDED (its compute
      // is the one wasted half-round) and the state/round count land
      // exactly where the one-step loop would have — the stop round
      // still rides the hash match. The cap branch runs single steps so
      // PrMaxRounds binds at the identical round. All BIGINT
      // fixed-point; layout and evaluation order cannot perturb values.
      while (delta >= PrTol && rounds < PrMaxRounds) {
        if (rounds + 1 >= PrMaxRounds) {
          // last permitted round: one step, the original body
          val inflow = inflowOf(
            cur.select(col("node").as("src"), col("r"), col("deg")))
          val (next, nextRdd) = Dedup.materializeOwnedKeyedLazy(
            cur.select(col("node"), col("deg"), col("r").as("r_prev"))
              .join(inflow, col("node") === col("dst"), "left")
              .select(col("node"), col("deg"), damped.as("r"),
                abs(damped - col("r_prev")).as("dl"))
              .repartition(col("node")),
            ckDir.isDefined)
          delta = next.agg(sum("dl")).head().getLong(0)
          Dedup.retire(spark, curRdd)
          cur = next.select("node", "deg", "r")
          curRdd = nextRdd
          rounds += 1
        } else {
          val inflow1 = inflowOf(
            cur.select(col("node").as("src"), col("r"), col("deg")))
          val mid = cur.select(col("node"), col("deg"), col("r").as("r_prev"))
            .join(inflow1, col("node") === col("dst"), "left")
            .select(col("node"), col("deg"), damped.as("r1"),
              abs(damped - col("r_prev")).as("dl1"))
          val inflow2 = inflowOf(
            mid.select(col("node").as("src"), col("r1").as("r"), col("deg")))
          val roundFrame = mid.join(inflow2, col("node") === col("dst"), "left")
            .select(col("node"), col("deg"), col("r1"), col("dl1"),
              damped.as("r2"),
              abs(damped - col("r1")).as("dl2"))
            .repartition(col("node"))
          // plans/<round> audit hook: a loop query's registered frame is
          // the retained result (an ExistingRDD scan), so the auditable
          // plan is ONE round's dataflow — dumped pre-cut on demand
          if (rounds == 0 && sys.env.contains("SPARK_GRAFT_DUMP_ROUND"))
            System.err.println("[round-plan pagerank_conv]\n" +
              roundFrame.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode))
          val (next, nextRdd) = Dedup.materializeOwnedKeyedLazy(
            roundFrame, ckDir.isDefined)
          val row = next.agg(sum("dl1").as("d1"), sum("dl2").as("d2")).head()
          val (d1, d2) = (row.getLong(0), row.getLong(1))
          Dedup.retire(spark, curRdd)
          if (d1 < PrTol) {
            cur = next.select(col("node"), col("deg"), col("r1").as("r"))
            delta = d1
            rounds += 1
          } else {
            cur = next.select(col("node"), col("deg"), col("r2").as("r"))
            delta = d2
            rounds += 2
          }
          curRdd = nextRdd
        }
      }
      Dedup.retire(spark, edgesRdd)
      Dedup.retainResult(spark, retainKey, curRdd,
        cur.select(col("node"), col("deg"), col("r").as("fp_rank"),
          lit(rounds).as("rounds")))
    }
  }

  /** Support floor for the triangle graph ([[recurringEdges]]). */
  val TriMinSupport = 2

  /** Nodes emitted by [[triangleStats]]. */
  val TriTopK = 15

  /** Per-node triangle counts and local clustering coefficients over the
    * recurring co-purchase graph, top [[TriTopK]] nodes — the third graph
    * workload beside CC and PageRank, and the classic test of whether an
    * engine can do neighborhood joins without going quadratic.
    *
    * Algorithm: degree-ordered orientation (the MR "compact-forward" of
    * Suri & Vassilvitskii, WWW'11). Each undirected edge is kept once,
    * directed from its lower (deg, id) endpoint to its higher, so every
    * triangle {u<v<w} is enumerated exactly once as the wedge u→v→w
    * closed by u→w. Wedges are generated at the LOW-degree endpoint —
    * Σ C(outdeg, 2) with outdeg bounded by the graph's degeneracy, not
    * its max degree — which is what keeps a hub of degree 10⁶ from
    * emitting 10¹² wedges at 100 TB. Both the wedge build and the
    * closing check are plain equi-joins on node ids: shuffle-partitioned,
    * no broadcast needed, no driver state. */
  def triangleStats(spark: SparkSession, dir: String): DataFrame =
    triangleCounts(recurringEdges(Tables.lineitem(spark, dir), TriMinSupport))
      .orderBy(desc("triangles"), asc("node"))
      .limit(TriTopK)

  /** (node, deg, triangles, clustering) for every node on at least one
    * triangle of a symmetric `(src, dst)` edge frame. Separate from the
    * top-k cut so the whole-graph invariants (3 corner credits per
    * triangle, orientation acyclicity) are testable. */
  private[graft] def triangleCounts(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val oriented = orientedEdges(edges, deg)
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val tris = wedges
      .join(oriented.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"))
    // each triangle credits all three corners; local clustering is the
    // closed fraction of the C(deg, 2) potential wedges at the node
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
      .join(deg, "node")
      .select(col("node"), col("deg"), col("triangles"),
        round(col("triangles") * lit(2.0) / (col("deg") * (col("deg") - 1)), 4)
          .as("clustering"))
  }

  /** Each undirected edge once, directed low→high in the (deg, id)
    * total order — strict struct comparison keeps exactly one of the
    * two symmetric rows, degree ties broken by node id. Exposed so
    * [[graft.Scale]] can measure the oriented wedge count, the quantity
    * whose growth decides whether triangle enumeration scales. */
  private[graft] def orientedEdges(edges: DataFrame, deg: DataFrame): DataFrame =
    edges
      .join(deg.select(col("node").as("src"), col("deg").as("deg_u")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("deg_v")), "dst")
      .filter(struct(col("deg_u"), col("src")) < struct(col("deg_v"), col("dst")))
      .select(col("src").as("u"), col("dst").as("v"))

  /** The full (node, deg, n, r) rank frame after [[PrIters]] damped
    * power iterations over a symmetric `(src, dst)` edge frame.
    * Separate from the top-k cut so invariants (mass conservation,
    * degree correlation) are testable on the whole vector.
    *
    * Like every relational loop here (CC, Lloyd), each round's state is
    * MATERIALIZED before the next builds on it — the rank frame is
    * referenced twice per step (scatter join + damped update), so a
    * lazily-stacked plan re-derives it 2^k times: the un-materialized
    * form of this query planned 47 scans of lineitem for 3 iterations.
    * Materialization goes through Dedup's owned-RDD machinery: the edge
    * frame and each round truncate lineage via localCheckpoint (or
    * persist+reliable checkpoint when `spark.graft.checkpointDir` is
    * set — the executor-loss-tolerant mode a cluster run should use),
    * and each superseded round's storage is retired as soon as its
    * successor is materialized, so the loop holds ONE round of state
    * plus the edges at any moment. */
  /** `retainKey` distinguishes the retained-result slot per REGISTERED
    * caller: the raw and kNN arms run CONCURRENTLY under Verify's query
    * pool, and a shared slot would let the second construction free the
    * first's still-being-written blocks (latest-wins eviction —
    * surfaced as CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). */
  private[graft] def pagerankRanks(edges0: DataFrame,
      retainKey: String = "pagerankRanks"): DataFrame = {
    val spark = edges0.sparkSession
    val ckDir = Dedup.confCheckpointDir(spark)
    Dedup.withCheckpointDir(spark, ckDir) {
      // The edge frame is the loop's STATIC side: pre-shuffle it by the
      // join key ONCE and keep that layout across the cut
      // (materializeOwnedKeyed — the plain owned form erases
      // partitioning, so every round re-exchanged AND re-sorted the
      // |E|-row frame; r12 listener evidence: 3× edge exchanges and
      // ~2.4 GB/round of shuffle at 10× sf0.1 for a frame that never
      // changes). With hash(src) + in-partition src order preserved,
      // each round's scatter join exchanges only the |V|-row rank
      // frame, restoring the documented one-edge-sized-shuffle-per-
      // iteration cost (the remaining one is the gather's groupBy(dst),
      // which is the algorithm). The degree aggregate below rides the
      // same layout for free.
      val (edges, edgesRdd) = Dedup.materializeOwnedKeyed(
        edges0.repartition(col("src")).sortWithinPartitions("src"),
        ckDir.isDefined)
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val n = deg.agg(count(lit(1)).cast("double").as("n"))
      // KEYED round state (r13, the same cut-discipline as the conv
      // loop): each round's output is cut behind an explicit
      // repartition(node) so static planning keeps the scatter and damp
      // joins exchange-free. Under AQE this is plan-neutral at sf0.1
      // (32 stages / 111 MB shuffle unchanged — the coalesced cut
      // partitioning never matches the consumers'); kept because it is
      // free there and removes the per-round state re-exchanges in the
      // static-planning (cluster loop) mode.
      val (init, initRdd) = Dedup.materializeOwnedKeyed(
        deg.crossJoin(broadcast(n))
          .select(col("src").as("node"), col("deg"), col("n"),
            (lit(1.0) / col("n")).as("r"))
          .repartition(col("node")), ckDir.isDefined)
      val (result, resultRdd) = (1 to PrIters)
          .foldLeft[(DataFrame, org.apache.spark.rdd.RDD[_])]((init, initRdd)) { case ((cur, curRdd), _) =>
        val inflow = edges
          .join(cur.select(col("node").as("src"), col("r"), col("deg")), "src")
          .groupBy(col("dst")).agg(sum(col("r") / col("deg")).as("inflow"))
        // left join: symmetric edges mean every node HAS inflow, but the
        // general damped step keeps the (1-d)/N floor explicit
        val (next, nextRdd) = Dedup.materializeOwnedKeyed(
          cur.select(col("node"), col("deg"), col("n"))
            .join(inflow, col("node") === col("dst"), "left")
            .select(col("node"), col("deg"), col("n"),
              (lit(1 - Damping) / col("n") +
                lit(Damping) * coalesce(col("inflow"), lit(0.0))).as("r"))
            .repartition(col("node")),
          ckDir.isDefined)
        Dedup.retire(spark, curRdd)
        (next, nextRdd)
      }
      // the final round is self-contained (its RDD holds the rank rows),
      // so the EDGE frame — the big pin, |E| rows vs |V| for the ranks —
      // is released before returning; repeated calls previously
      // accumulated one 2.4M-row block set each at sf0.1, and the
      // storage pressure taxed every later query in a long session.
      // The |V|-row final round itself is retained one-slot (a repeat
      // call retires the previous result's blocks — same bound as the
      // other eagerly-materialized queries).
      Dedup.retire(spark, edgesRdd)
      Dedup.retainResult(spark, retainKey, resultRdd, result)
    }
  }
}
