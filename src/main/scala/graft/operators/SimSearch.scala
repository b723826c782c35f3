package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Two plans for the same question (top-k cosine neighbors):
  *  - [[bruteForceTopK]]: broadcast the query set, scan the corpus once —
  *    the exact baseline. At 100 TB this is the right plan whenever the
  *    query set is small: one narrow pass, no shuffle of the corpus.
  *  - [[lshBucketedTopK]]: sign-LSH coarse quantizer (IVF-style) so each
  *    query only scans its own bucket — the scale path when the query set
  *    is itself large. Buckets are a join key, so Spark co-partitions
  *    corpus and queries and never materializes the cross product.
  *
  * The `row_number <= k` filter is NOT a full per-partition sort at
  * scale: Catalyst's rank-limit pushdown plans it as
  * `WindowGroupLimit(Partial)` → exchange → `WindowGroupLimit(Final)`,
  * a bounded top-k heap per map task before anything shuffles (visible
  * in `.explain()`), so the window never materializes a corpus-sized
  * partition.
  */
object SimSearch {

  val K = 5
  val NQueries = 10  // vec_id < 10 are the designated query vectors
  val BucketBits = 8

  /** Exact top-k: 10 broadcast query vectors against the full corpus. */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val pairs = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor"))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select("q_id", "rank", "neighbor", "cos")
      .orderBy("q_id", "rank")
  }

  /** Multi-probe LSH: each query probes its own bucket plus the 8
    * buckets at Hamming distance 1 (one sign bit flipped) — the standard
    * recall fix for vectors near a quantization boundary, at 9× probe
    * fan-out instead of rebuilding the index with more tables. Probe
    * buckets are pairwise distinct, so no candidate pair appears twice
    * and no distinct pass is needed. */
  def lshMultiProbeTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"),
        signBucket(col("embedding"), BucketBits).as("bucket"))
    val probes = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        explode(array(
          col("bucket") +: (0 until BucketBits).map(i =>
            col("bucket").bitwiseXOR(lit(1L << i))): _*)).as("bucket"))
    val pairs = e.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor"))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("q_id", "rank", "neighbor", "cos")
      .orderBy("q_id", "rank")
  }

  /** Candidate pool per query for [[bqHammingTopK]]'s Hamming stage —
    * the recall dial: larger pools cost more exact rerank distance
    * computations and miss fewer sign-boundary neighbors. */
  val BqCandidates = 32

  /** BINARY QUANTIZATION + Hamming candidate scan + exact rerank — the
    * memory-bound ANN default of modern vector stores: each 64-dim
    * float vector compresses 32× into two 32-bit sign words (one bit
    * per dimension — sign-random-projection codes, Charikar STOC'02,
    * here with axis-aligned hyperplanes, the same family as
    * `q_dedup_simhash`'s token-space fingerprints), candidates are the
    * [[BqCandidates]] smallest Hamming distances per query (popcount of
    * XOR — pure codegen'd integer ops, no floating point in the scan),
    * and only the survivors pay an exact float cosine in the rerank.
    *
    * Scale shape: the signature scan touches 8 bytes/vector instead of
    * 256 — at 100 TB of embeddings that is the difference between a
    * memory-resident scan and a disk-bound one; the scan itself is the
    * broadcast-query pattern of [[bruteForceTopK]] with
    * `WindowGroupLimit` bounding per-task state, the rerank fetch is a
    * second corpus scan row-locally filtered by the broadcast ≤
    * |queries|·[[BqCandidates]] candidate ids (production: an id-keyed
    * point fetch), and exact math touches candidates only. Composes
    * with IVF routing (`q_ann_ivf_routed`) when even the signature scan
    * must be sub-linear. Hamming ties break on vec_id; rerank ranks on
    * 6dp-rounded cosine + neighbor id (the cross-engine rank rule). */
  def bqHammingTopK(spark: SparkSession, dir: String): DataFrame =
    bqHammingTopKOf(Tables.fanOut(Tables.embeddings(spark, dir)))

  def bqHammingTopKOf(e: DataFrame, pool: Int = BqCandidates): DataFrame = {
    val words = e.select(col("vec_id"),
      signWord(col("embedding"), 0, 32).as("w_lo"),
      signWord(col("embedding"), 32, 32).as("w_hi"))
    val q = words.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("w_lo").as("q_lo"),
        col("w_hi").as("q_hi"))
    val wc = Window.partitionBy("q_id").orderBy(asc("ham"), asc("vec_id"))
    val cand = words.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (bit_count(col("w_lo").bitwiseXOR(col("q_lo"))) +
          bit_count(col("w_hi").bitwiseXOR(col("q_hi")))).cast("long").as("ham"))
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= pool)
      .select("q_id", "vec_id", "ham")
    // rerank fetch: corpus scan filtered row-locally by the broadcast
    // candidate ids, then the tiny q_emb broadcast for the exact cosine
    val qe = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor"))
    e.join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(qe), Seq("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"), col("ham"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select("q_id", "rank", "neighbor", "ham", "cos")
      .orderBy("q_id", "rank")
  }

  /** IVF × BQ COMPOSITION — the production billion-vector serving
    * shape (coarse routing, then a 1-bit signature scan, then exact
    * rerank — what [[bqHammingTopKOf]]'s scaladoc promises composes):
    * each query routes to its `nprobe` nearest inverted lists over the
    * SAME coarse quantizer `q_ann_ivf_routed` serves from, the Hamming
    * scan reads ONLY those lists' 8-byte signatures (sub-linear scan ×
    * 32× compression — multiplicative), and the exact cosine touches
    * only the [[BqCandidates]]-bounded survivors. Every stage reuses
    * its standalone kernel verbatim: the routing frame is
    * [[ivfRanked]], the signature words [[signWord]], the candidate
    * bound the same `WindowGroupLimit` shape, the rerank the same
    * broadcast-id fetch. */
  def bqRoutedTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    val ranked = ivfRanked(e)
    val words = e.select(col("vec_id"),
      signWord(col("embedding"), 0, 32).as("w_lo"),
      signWord(col("embedding"), 32, 32).as("w_hi"))
    // the per-list signature store: each vector's words keyed by its
    // rnk=1 inverted list
    val lists = words
      .join(ranked.filter(col("rnk") === 1).select("vec_id", "cent_id"), "vec_id")
    val qProbe = words.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("w_lo").as("q_lo"),
        col("w_hi").as("q_hi"))
      .join(ranked.filter(col("vec_id") < NQueries && col("rnk") <= IvfNProbe)
        .select(col("vec_id").as("q_id"), col("cent_id")), "q_id")
    val wc = Window.partitionBy("q_id").orderBy(asc("ham"), asc("vec_id"))
    val cand = lists.join(broadcast(qProbe), Seq("cent_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (bit_count(col("w_lo").bitwiseXOR(col("q_lo"))) +
          bit_count(col("w_hi").bitwiseXOR(col("q_hi")))).cast("long").as("ham"))
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= BqCandidates)
      .select("q_id", "vec_id", "ham")
    val qe = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor"))
    e.join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(qe), Seq("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"), col("ham"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select("q_id", "rank", "neighbor", "ham", "cos")
      .orderBy("q_id", "rank")
  }

  /** Small candidate pool for [[bqRecall]]'s contrast arm — the other
    * end of the pool dial. */
  val BqPoolSmall = 8

  /** BQ RECALL AUDIT — [[annRecall]]'s pattern applied to the binary-
    * quantized chain: recall@[[K]] of [[bqHammingTopKOf]] against the
    * fold-exact cosine top-[[K]], at BOTH ends of the candidate-pool
    * dial ([[BqPoolSmall]] vs [[BqCandidates]]). Because the rerank
    * ranks candidates by the SAME (cos, neighbor) order as the exact
    * arm, recall is monotone in the pool — the larger pool can never
    * score below the smaller — and `mono_ok` locks that dominance into
    * the correctness gate (the same dial-audit discipline as nprobe and
    * the LSH banding sweep). Measures the 1-bit code's real retrieval
    * cost: what the 32× compression gives up at each pool size, which
    * is the number that calibrates the pool in production. */
  def bqRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    val exact = bruteForceTopK(spark, dir)
      .select(col("q_id"), col("neighbor"), lit(1).as("hit"))
    val approx = Seq(
      s"bq_pool$BqPoolSmall" -> bqHammingTopKOf(e, BqPoolSmall),
      s"bq_pool$BqCandidates" -> bqHammingTopKOf(e, BqCandidates))
      .map { case (m, df) =>
        df.select(lit(m).as("method"), col("q_id"), col("neighbor")) }
      .reduce(_ unionByName _)
    val recalls = approx.join(exact, Seq("q_id", "neighbor"), "left")
      .groupBy("method")
      .agg(coalesce(sum("hit"), lit(0)).cast("long").as("hits"))
    val withBase = recalls.withColumn("base",
      when(col("method") === s"bq_pool$BqCandidates", lit(s"bq_pool$BqPoolSmall")))
    withBase
      .join(recalls.select(col("method").as("base"), col("hits").as("base_hits")),
        Seq("base"), "left")
      .select(col("method"), col("hits"),
        round(col("hits") / lit(1.0 * K * NQueries), 4).as("recall5"),
        coalesce(col("hits") >= col("base_hits"), lit(true)).as("mono_ok"))
      .orderBy("method")
  }

  /** Matryoshka truncation dims audited by [[mrlRecall]] — the dial
    * positions below the corpus's full 64 dims. */
  val MrlDims: Seq[Int] = Seq(8, 16, 32)

  /** MATRYOSHKA (MRL) DIMENSION-DIAL recall audit — Kusupati et al.,
    * NeurIPS 2022: an MRL-trained embedding nests usable
    * representations in its prefixes, so serving can retrieve on the
    * first d dims (d/64 of the scan bytes and FLOPs) and pay a
    * measured recall cost. This is the third dial of the ANN audit
    * family — nprobe (`q_ann_recall`), candidate pool
    * (`q_ann_bq_recall`), now RETAINED DIMENSIONS: recall@[[K]] of the
    * sliced-prefix cosine top-K against the full-dim exact top-K, one
    * row per dial position. The corpus embeddings are synthetic (not
    * MRL-trained), so the measured numbers are the honest pessimistic
    * floor — the PLUMBING (slice, rank, audit) is what transfers.
    * `mono_ok` reports dominance over the previous dial position as
    * DATA (cross-engine-pinned), not as an assertion: unlike the BQ
    * pool (a superset rerank, provably monotone), prefix recall has no
    * monotonicity guarantee — reporting it is the audit's job. */
  def mrlRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    val exact = bruteForceTopK(spark, dir)
      .select(col("q_id"), col("neighbor"), lit(1).as("hit"))
    val arms = MrlDims.map { d =>
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"),
          slice(col("embedding"), 1, d).as("q_emb"))
      val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .select(lit(d.toLong).as("dims"), col("q_id"),
          col("vec_id").as("neighbor"),
          round(cosine(slice(col("embedding"), 1, d), col("q_emb")), 6).as("cos"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= K)
        .select("dims", "q_id", "neighbor")
    }.reduce(_ unionByName _)
    val recalls = arms.join(exact, Seq("q_id", "neighbor"), "left")
      .groupBy("dims")
      .agg(coalesce(sum("hit"), lit(0)).cast("long").as("hits"))
    val prevExpr = MrlDims.sliding(2).collect { case Seq(lo, hi) => (hi, lo) }
      .foldLeft(lit(null).cast("long")) { case (acc, (hi, lo)) =>
        when(col("dims") === hi, lit(lo.toLong)).otherwise(acc) }
    recalls.withColumn("prev", prevExpr)
      .join(recalls.select(col("dims").as("prev"), col("hits").as("prev_hits")),
        Seq("prev"), "left")
      .select(col("dims"), col("hits"),
        round(col("hits") / lit(1.0 * K * NQueries), 4).as("recall5"),
        coalesce(col("hits") >= col("prev_hits"), lit(true)).as("mono_ok"))
      .orderBy("dims")
  }

  /** The same exact top-k as [[bruteForceTopK]], but through the custom
    * typed [[graft.functions.TopKAggregator]] instead of a rank window:
    * one O(k) buffer per query, partial-reduced map-side and merged
    * across partitions — the `Aggregator[IN, BUF, OUT]` answer when the
    * per-group state must stay bounded by construction (a window keeps k
    * ROWS; this keeps k STRUCT entries in one aggregation buffer).
    * Oracle-checked against the identical SQL as the window plan. */
  def topKViaAggregator(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{Scored, TopKAggregator}
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val agg = new TopKAggregator(K).toColumn
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"),
        col("vec_id").as("id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("score"))
      .as[(Long, Long, Double)]
      .map { case (qid, id, score) => (qid, Scored(id, score)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("topk"))
      .flatMap { case (qid, top) =>
        top.zipWithIndex.map { case (s, i) => (qid, (i + 1).toLong, s.id, s.score) }
      }
      .toDF("q_id", "rank", "neighbor", "cos")
      .orderBy("q_id", "rank")
  }

  /** Number of IVF coarse centroids and the id range they are drawn
    * from (vec_id in [100, 100+K): a fixed, training-free seed pick —
    * the deterministic stand-in for a k-means++ seeding pass, which at
    * scale runs as a tiny sampled batch job). */
  val IvfK = 8
  val IvfSeedBase = 100L

  /** IVF coarse ASSIGNMENT — the quantizer-training step the sign-LSH
    * buckets stand in for: every vector goes to its nearest (highest
    * cosine) of [[IvfK]] fixed centroids. One narrow pass over the
    * corpus against a broadcast centroid table, `WindowGroupLimit`
    * bounds the per-vector argmin; the output is per-centroid cluster
    * population with min/max cosine (order-independent aggregates, so
    * parity needs no decimal gymnastics). At 100 TB this produces the
    * partition assignment an IVF index stores; cluster sizes are the
    * balance diagnostic that decides whether to re-seed. */
  /** Per-vector centroid RANKING (vec_id, cent_id, cos, rnk): every
    * vector's [[IvfK]] centroids ordered by cosine — rnk=1 is the IVF
    * assignment (which inverted list the vector lives in), rnk<=nprobe is
    * a query's probe list. One narrow pass against a broadcast centroid
    * table; `WindowGroupLimit` bounds the per-vector ranking. */
  /** Per-vector centroid ranking against ANY (cent_id, cent_emb)
    * quantizer frame — the seed pick ([[ivfRanked]]) and the trained
    * k-means centroids ([[kmeansRoutedTopK]]) share this body, so a
    * routing fix can never silently apply to one quantizer and not the
    * other. */
  private def rankedAgainst(e: DataFrame, cents: DataFrame): DataFrame = {
    val scored = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"),
        round(cosine(col("embedding"), col("cent_emb")), 6).as("cos"))
    val w = Window.partitionBy("vec_id").orderBy(desc("cos"), asc("cent_id"))
    scored.withColumn("rnk", row_number().over(w))
  }

  private[graft] def ivfRanked(e: DataFrame): DataFrame =
    rankedAgainst(e,
      e.filter(col("vec_id") >= IvfSeedBase && col("vec_id") < IvfSeedBase + IvfK)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb")))

  /** Routed top-3 serving over a prebuilt [[rankedAgainst]] frame: each
    * vector lives in its rnk=1 inverted list, each query scans its
    * top-`nprobe` disjoint lists via the cent_id equi-join — shared by
    * both registered routed queries. */
  private def routedTopK(e: DataFrame, ranked: DataFrame, nprobe: Int): DataFrame = {
    val cands = e.join(ranked.filter(col("rnk") === 1).select("vec_id", "cent_id"), "vec_id")
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .join(ranked.filter(col("vec_id") < NQueries && col("rnk") <= nprobe)
        .select(col("vec_id").as("q_id"), col("cent_id")), "q_id")
    val pairs = cands.join(broadcast(q), Seq("cent_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor"))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("q_id", "rank", "neighbor", "cos")
      .orderBy("q_id", "rank")
  }

  /** Per-vector IVF assignment (vec_id, cent_id, cos): each vector's
    * nearest centroid — the shared quantizer under [[ivfAssign]]
    * (cluster diagnostics) and [[ivfRoutedTopK]] (routed search). */
  private def ivfAssignment(e: DataFrame): DataFrame =
    ivfRanked(e).filter(col("rnk") === 1).select("vec_id", "cent_id", "cos")

  def ivfAssign(spark: SparkSession, dir: String): DataFrame =
    ivfAssignment(Tables.fanOut(Tables.embeddings(spark, dir)))
      .groupBy("cent_id")
      .agg(count(lit(1)).as("n_vectors"),
        min("cos").as("min_cos"), max("cos").as("max_cos"))
      .orderBy("cent_id")

  /** nprobe for the registered [[ivfRoutedTopK]] query: probing the two
    * nearest lists is the standard recall/cost dial position one notch up
    * from nprobe=1 — [[annRecall]] proves the recall gain. */
  val IvfNProbe = 2

  /** IVF-ROUTED search: each query scans only the inverted lists of its
    * `nprobe` nearest centroids — the plan an IVF index executes, with
    * the [[ivfRanked]] quantizer standing in for the stored partition
    * map. `nprobe` is THE recall/cost dial of IVF search: each vector
    * lives in exactly one inverted list (rnk=1 assignment), so a query
    * probing its top-`nprobe` centroids scans `nprobe` disjoint lists —
    * candidate sets for increasing nprobe NEST, which is what makes
    * recall provably monotone in nprobe ([[annRecall]] locks this in).
    * Candidates join probes on cent_id, so the corpus is never
    * cross-joined; at 100 TB the assignment is the persisted index and
    * this is `nprobe` bucket-local scans per query. */
  def ivfRoutedTopK(spark: SparkSession, dir: String): DataFrame =
    ivfRoutedTopK(spark, dir, IvfNProbe)

  def ivfRoutedTopK(spark: SparkSession, dir: String, nprobe: Int): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    routedTopK(e, ivfRanked(e), nprobe)
  }

  /** Recall@3 of every approximate plan against the exact answer — the
    * number that makes the LSH/IVF approximations AUDITABLE instead of
    * asserted. For each method, hits = |approx top-3 ∩ exact top-3|
    * summed over the [[NQueries]] queries; recall3 = hits / (3 × queries).
    * Because every method ranks by the same (cos desc, neighbor) order,
    * recall is monotone in the candidate set: multiprobe (9 buckets) can
    * never score below single-probe (1 bucket), and IVF nprobe=2 (two
    * disjoint inverted lists) can never score below nprobe=1. `mono_ok`
    * states each method's dominance over its smaller-candidate-set
    * baseline (true where no baseline applies) — the oracle computes the
    * same comparison, so the relationship is locked into the correctness
    * gate, not just asserted in prose. The exact side reuses
    * [[bruteForceTopK]]'s top-3; at scale this runs on a sampled query
    * set, which is exactly how production ANN recall is measured. */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = bruteForceTopK(spark, dir)
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("neighbor"), lit(1).as("hit"))
    val approx = Seq(
      "ivf_nprobe1" -> ivfRoutedTopK(spark, dir, 1),
      "ivf_nprobe2" -> ivfRoutedTopK(spark, dir, 2),
      "lsh_bucket" -> lshBucketedTopK(spark, dir),
      "multiprobe" -> lshMultiProbeTopK(spark, dir))
      .map { case (m, df) => df.select(lit(m).as("method"), col("q_id"), col("neighbor")) }
      .reduce(_ unionByName _)
    val recalls = approx.join(exact, Seq("q_id", "neighbor"), "left")
      .groupBy("method")
      .agg(coalesce(sum("hit"), lit(0)).cast("long").as("hits"))
    // each method's smaller-candidate-set baseline (4-row frame: the
    // self-join is driver-free and broadcast by size)
    val withBase = recalls.withColumn("base",
      when(col("method") === "ivf_nprobe2", lit("ivf_nprobe1"))
        .when(col("method") === "multiprobe", lit("lsh_bucket")))
    withBase
      .join(recalls.select(col("method").as("base"), col("hits").as("base_hits")),
        Seq("base"), "left")
      .select(col("method"), col("hits"),
        round(col("hits") / lit(3.0 * NQueries), 4).as("recall3"),
        coalesce(col("hits") >= col("base_hits"), lit(true)).as("mono_ok"))
      .orderBy("method")
  }

  /** IVF/LSH-style ANN: both sides keyed by an 8-bit sign bucket over the
    * leading dimensions; each query scans only its bucket (single-probe).
    * Returns top-3 per query — approximate by construction, identical to
    * the oracle because the bucketing is deterministic. */
  def lshBucketedTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("embedding"),
        signBucket(col("embedding"), BucketBits).as("bucket"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("bucket"))
    val pairs = e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("bucket"), col("vec_id").as("neighbor"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor"))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("q_id", "bucket", "rank", "neighbor", "cos")
      .orderBy("q_id", "rank")
  }

  /** Lloyd iterations for [[kmeansTrain]]. Two is enough to exercise the
    * full train loop (assign → re-center → re-assign → re-center) while
    * keeping the cross-engine oracle an unrolled CTE chain. */
  val KmIters = 2
  val KmK = 8

  /** Relational k-means TRAINING — the quantizer-training batch job the
    * IVF seed pick ([[IvfSeedBase]]) stands in for. [[KmIters]] Lloyd
    * iterations over the embedding corpus, expressed entirely as
    * joins/aggregations so it runs at corpus scale with no driver-side
    * state:
    *
    *  - vectors live in long form (vec_id, d, v) — one `posexplode`;
    *  - the centroid frame (cent_id, d, c) is K×dims rows, broadcast
    *    into each assignment join, so the corpus never shuffles: the
    *    per-iteration cost is the canonical O(N·K·dims) with map-side
    *    partial aggregation on both the distance and re-center groupBys;
    *  - assignment is argmin over squared L2 with a (d2, cent_id)
    *    tie-break, planned as `WindowGroupLimit` (bounded heap, no
    *    corpus-sized sort).
    *
    * Seeding is deterministic — the [[KmK]] lowest vec_ids, renumbered
    * 0..K-1 — so the oracle replays training exactly (k-means++ at scale
    * is a tiny sampled pre-job feeding the same loop). A cluster that
    * loses all members simply drops out of the centroid frame (classic
    * Lloyd empty-cluster case; both engines mirror it). Output is the
    * per-cluster report after the final re-center: population and mean
    * distance-to-centroid — the numbers that decide whether the
    * quantizer is balanced enough to ship. Math in double, report
    * rounded, all orderings totally tie-broken. */
  def kmeansTrain(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    kmeansReport(kmRankedCached(spark, dir, e).filter(col("rnk") === 1))
  }

  /** FAISS-style cap on k-means training points: a quantizer trains on
    * at most [[KmTrainPerCent]]·K vectors (FAISS's
    * `cp.max_points_per_centroid = 256` default). Lloyd's cost is
    * iterations × O(trainset·K·dims); with the cap it stops growing
    * with the corpus — the r10 VERDICT directive on `build:ann_index`,
    * whose coarse-quantizer and PQ training legs were the only
    * corpus-sized TRAIN loops left (encode/serve passes are
    * corpus-sized by nature). Statistical footing: k-means centroids
    * are cluster means, and means estimated from 256 points per
    * centroid are within noise of the full-corpus means for serving
    * purposes (`AnnTrainSampleSpec` pins recall parity on planted
    * geometries). */
  val KmTrainPerCent = 256

  /** The deterministic training sample: the `cap` lowest vec_ids by
    * the house content-hash uniform (md5 of `vec_id#kmtrain`, ties by
    * vec_id) — the `q_sample_weighted` draw discipline, so the sample
    * is reproducible, engine-independent, and mirrored verbatim in
    * every oracle's `ts` CTE. When the population is at or under the
    * cap the sample IS the population and training is bit-identical to
    * the uncapped loop — which is what keeps every small-SF oracle
    * result unchanged. (On the derived-K paths the cap provably never
    * binds — K ≥ N/[[SemCellTarget]] makes the cap ≥ 4N — so those
    * callers pass `capped = false` and skip this frame entirely: the
    * materialized "sample" would be a full global md5 sort plus an
    * N-row broadcast of the entire id set, identical in result and
    * strictly worse in cost.) */
  private[graft] def trainIds(ids: DataFrame, cap: Int): DataFrame =
    ids.orderBy(
      conv(substring(md5(concat(col("vec_id").cast("string"),
        lit("#kmtrain"))), 1, 8), 16, 10).cast("long"),
      col("vec_id"))
    .limit(cap)

  /** Embeddings in long (vec_id, d, v) form, double math. */
  private def kmeansLongForm(e: DataFrame): DataFrame =
    e.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").as("d"), col("col").cast("double").as("v"))

  /** Full per-vector centroid ranking (vec_id, cent_id, d2, rnk) by
    * squared L2 against a broadcast centroid frame, (d2, cent_id)
    * tie-break — rnk=1 is the assignment ([[kmeansAssign]]), rnk<=nprobe
    * is a query's probe list when the trained quantizer serves as the
    * router ([[hardNegativesRoutedOf]]). */
  private def kmeansRankedL2(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val d2 = vecs.join(broadcast(cents), "d")
      .groupBy("vec_id", "cent_id")
      .agg(sum(pow(col("v") - col("c"), 2)).as("d2"))
    val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cent_id"))
    d2.withColumn("rnk", row_number().over(w))
  }

  /** One assignment pass: argmin squared-L2 against a broadcast centroid
    * frame, (d2, cent_id) tie-break, planned as WindowGroupLimit. */
  private def kmeansAssign(vecs: DataFrame, cents: DataFrame): DataFrame =
    kmeansRankedL2(vecs, cents).filter(col("rnk") === 1)
      .select("vec_id", "cent_id", "d2")

  /** The trained centroid frame (cent_id, d, c) after `iters` Lloyd
    * iterations — exactly `iters` re-centers past the seed pick. This IS
    * the persisted quantizer: [[kmeansCentroids]] folds it to array
    * form and [[kmeansRoutedTopK]] routes against it, so serving and
    * the oracle's unrolled chain agree on WHICH centroid generation is
    * the index. (Deriving centroids from the final assignment instead
    * would silently add a half-iteration — caught by the sf0.001 oracle
    * where training had not yet converged.) */
  private def kmeansTrainedCents(e: DataFrame, k: Int, iters: Int,
      capped: Boolean = true): DataFrame =
    // Lloyd runs on the capped deterministic sample ([[trainIds]] —
    // no-op whenever N ≤ 256·k). `capped = false` is for callers that
    // KNOW the cap cannot bind (the derived-K paths: K ≥ N/SemCellTarget
    // makes cap ≥ 4N): there the sample is provably the population, and
    // materializing it anyway would be a full global md5 sort plus an
    // N-row broadcast of every vec_id — pure overhead at tested SFs and
    // a driver-memory/broadcast-limit failure at the 100 TB posture.
    // The equivalence is SET-level (sample ≡ population as id sets);
    // dropping the sample join changes the physical plan, and recenter's
    // double avg() is order-sensitive, so bit-identity of the centroids
    // is not guaranteed by the argument alone — cross-engine agreement
    // at the flag flip is re-verified by the oracle at every tested SF.
    kmeansTrainedCentsOn(e,
      if (capped) Some(trainIds(e.select("vec_id"), KmTrainPerCent * k))
      else None, k, iters)

  /** The training loop with an EXPLICIT train-id set:
    * [[kmeansTrainedCents]] passes the capped sample (or `None` = train
    * on the full population, the derived-K fast path);
    * `AnnTrainSampleSpec` passes the full id set to pin sample-vs-full
    * parity on planted geometries. The SEED pick stays the k lowest
    * vec_ids of the FULL population, so the seed artifact is
    * sample-independent and the init join reads full `vecs`. */
  private[graft] def kmeansTrainedCentsOn(e: DataFrame, train: Option[DataFrame],
      k: Int, iters: Int): DataFrame = {
    val vecs = kmeansLongForm(e)
    // train filter BEFORE the explode (r13): filtering the long form
    // paid the corpus×dims explode just to broadcast-drop most of it;
    // joining the narrow id sample against `e` first explodes only the
    // sampled vectors — identical row set, dims× fewer rows built
    val tvecs = train.fold(vecs)(t =>
      kmeansLongForm(e.join(broadcast(t.select("vec_id")), "vec_id")))
    val seeds = e.select("vec_id").orderBy("vec_id").limit(k)
      .select(col("vec_id"),
        (row_number().over(Window.orderBy("vec_id")) - 1).cast("long").as("cent_id"))
    def recenter(assigned: DataFrame): DataFrame =
      tvecs.join(assigned.select("vec_id", "cent_id"), "vec_id")
        .groupBy("cent_id", "d").agg(avg("v").as("c"))
    val init = vecs.join(broadcast(seeds), "vec_id")
      .select(col("cent_id"), col("d"), col("v").as("c"))
    (1 to iters).foldLeft(init)((cents, _) => recenter(kmeansAssign(tvecs, cents)))
  }

  /** Full-corpus assignment against a quantizer trained on an explicit
    * id set — the spec-side contrast arm for the sampling parity pin. */
  private[graft] def kmeansAssignmentOn(e: DataFrame, train: DataFrame,
      k: Int, iters: Int): DataFrame =
    kmeansAssign(kmeansLongForm(e), kmeansTrainedCentsOn(e, Some(train), k, iters))

  /** Final per-vector assignment (vec_id, cent_id, d2) after `iters`
    * Lloyd iterations — the train loop shared by [[kmeansTrainOf]]'s
    * report and the suite's SSE-monotonicity check. `capped = false`
    * for derived-K callers where the train cap provably never binds
    * (see [[kmeansTrainedCents]]). */
  private[graft] def kmeansAssignment(e: DataFrame, k: Int, iters: Int,
      capped: Boolean = true): DataFrame =
    kmeansAssign(kmeansLongForm(e), kmeansTrainedCents(e, k, iters, capped))

  /** Fixed-point geometry for the DELTA-STOPPED Lloyd
    * ([[kmeansConvTop]]): coordinates map to BIGINT units of 10⁻⁶ after
    * a +[[KmFpOff]] shift that clears every embedding coordinate
    * positive (|v| < 2 at every SF; machine-checked per run), so sums
    * stay positive and Spark's truncating `div` ≡ DuckDB's `//` on the
    * recenter division. INTEGER state is what makes the data-dependent
    * stop registrable — the same discipline as
    * [[graft.operators.Graph.PrPrec]]: float centroids could stop the
    * two engines one round apart; BIGINT distances, assignments,
    * recenters and deltas are bit-identical, so the stop round itself
    * rides the hash match. */
  val KmFpOff = 2.0
  val KmFpScale = 1000000L

  /** L1 stop: Σ|c_next − c_cur| < [[KmConvTol]] fixed-point units over
    * the K×dims state — i.e. average per-coordinate movement under
    * 10⁻⁶. Reachable by construction: Lloyd with deterministic
    * tie-breaks reaches an exact integer fixed point (assignments
    * stabilize ⇒ identical members ⇒ identical floor-division
    * centroids ⇒ delta 0); the tolerance only shortcuts the tail. */
  val KmConvTol = 512L

  /** Oscillation cap, mirrored in the oracle's recursion gate so a
    * pathological integer 2-cycle stops BOTH engines at the same
    * round instead of hanging one. */
  val KmConvMaxRounds = 60

  /** DELTA-STOPPED Lloyd — the converged production form
    * `q_ann_kmeans`'s doc promises (2 unrolled iterations are the
    * cross-engine-oracle-friendly audit arm; a real quantizer trains to
    * convergence), registered as `q_ann_kmeans_conv` on the
    * [[graft.operators.Graph.pagerankConvTop]] precedent: per round,
    * assign the capped deterministic train sample ([[trainIds]] —
    * corpus-FLAT by the 256·K cap) to the current centroids by exact
    * BIGINT squared-L2 with (d2, cent_id) tie-break, recenter by
    * integer floor division, and stop at the first round whose L1
    * centroid delta drops under [[KmConvTol]]. The emitted `rounds`
    * column pins the stop round cross-engine; the oracle replays the
    * identical integer recursion as a DuckDB recursive CTE gated on the
    * same delta. Output per surviving cluster: train-set population,
    * the centroid coordinate sum (pinning every coordinate into the
    * hash), and the round count.
    *
    * Scale: the train cap bounds the per-round join at 256·K vectors
    * regardless of corpus size — training is corpus-flat, exactly the
    * property `build:ann_train` measures on the unrolled form — and
    * driver state is one 8-byte delta per round. */
  def kmeansConvTop(spark: SparkSession, dir: String): DataFrame =
    kmeansConvReportOf(Tables.fanOut(Tables.embeddings(spark, dir)), "kmeansConv")

  /** The loop over an explicit embedding frame — suite/scale hook.
    * Same materialization discipline as the PageRank loops: the train
    * long-form is the owned static side, each round's K×dims state is
    * lazily materialized with the delta aggregate as the materializing
    * action (one job per round), superseded rounds retired, the bounded
    * report retained one-slot. */
  private[graft] def kmeansConvReportOf(e: DataFrame,
      retainKey: String): DataFrame = {
    val spark = e.sparkSession
    val ckDir = Dedup.confCheckpointDir(spark)
    Dedup.withCheckpointDir(spark, ckDir) {
      def fpLongForm(df: DataFrame) =
        df.select(col("vec_id"), posexplode(col("embedding")))
          .select(col("vec_id"), col("pos").as("d"),
            floor((col("col").cast("double") + lit(KmFpOff)) *
              lit(KmFpScale.toDouble)).cast("long").as("vs"))
      val train = trainIds(e.select("vec_id"), KmTrainPerCent * KmK)
      // r13: the train filter lands BEFORE the explode (the r12 shape
      // exploded the full corpus ×dims and then broadcast-filtered it —
      // dims× more rows into the join for the identical sample). A
      // WIDE (one array row per vector, row-local HOF argmin) form was
      // built and measured in r14 and REJECTED: interpreted
      // zip_with/aggregate lambdas ran the assign at 230+ exec-seconds
      // vs ~20 for the codegen'd long-form aggregates — the guide §4
      // lesson that interpreted per-element lambdas lose to codegen'd
      // relational operators even at bounded volume. All state is
      // BIGINT fixed-point; layout cannot perturb results.
      val (tvecs, tvecsRdd) = Dedup.materializeOwnedKeyed(
        fpLongForm(e.join(broadcast(train.select("vec_id")), "vec_id"))
          .repartition(col("vec_id")), ckDir.isDefined)
      // fixed-point precondition, machine-checked (the BloomAbsentShift
      // lesson): the offset must clear every coordinate positive
      val minVs = tvecs.agg(min("vs")).head().getLong(0)
      require(minVs >= 0L,
        s"KmFpOff=$KmFpOff does not clear the embedding domain " +
          s"(min fixed-point coordinate $minVs) — raise the offset")
      val seeds = e.select("vec_id").orderBy("vec_id").limit(KmK)
        .select(col("vec_id"),
          (row_number().over(Window.orderBy("vec_id")) - 1).cast("long")
            .as("cent_id"))
      val (init, initRdd) = Dedup.materializeOwned(
        fpLongForm(e.join(broadcast(seeds.select("vec_id")), "vec_id"))
          .join(broadcast(seeds), "vec_id")
          .select(col("cent_id"), col("d"), col("vs").as("c")),
        ckDir.isDefined)
      // argmin FOLDED into an aggregate (r14, VERDICT #4): the r13
      // shape ranked (d2, cent_id) with a row_number window — an extra
      // in-partition sort + window pass per round. The argmin is ONE
      // `min` over the PACKED long `d2·K + cent_id`: cent_id < K makes
      // the packing order-isomorphic to the (d2, cent_id) lexicographic
      // tie-break, and a LONG buffer keeps the aggregate in codegen'd
      // HashAggregate (a min over struct(d2, cent_id) was tried first
      // and planned as SortAggregate + two extra sorts — struct buffers
      // are not hash-aggregable). Overflow headroom is construction-
      // bounded: d2 ≤ dims·(4·10⁶)² ≈ 1.0e15, ×K=8 ≈ 8.2e15 ≪ 2⁶³
      // (coordinates are offset-positive and < 4·10⁶ fixed-point units
      // by the minVs check + |v| < 2 domain).
      def assignTo(cents: DataFrame) = {
        tvecs.join(broadcast(cents.select("cent_id", "d", "c")), "d")
          .groupBy("vec_id", "cent_id")
          .agg(sum((col("vs") - col("c")) * (col("vs") - col("c"))).as("d2"))
          .groupBy("vec_id")
          .agg(min(col("d2") * lit(KmK) + col("cent_id")).as("m"))
          .select(col("vec_id"), (col("m") % lit(KmK)).as("cent_id"))
      }
      var cur = init
      var curRdd = initRdd
      var rounds = 0
      var delta = Long.MaxValue
      // NOTE (r13): the pagerank-conv two-round unroll was tried here
      // and REVERTED — a Lloyd step's assign chain is compute-heavy and
      // the unrolled mid-state is re-derived per reference (probe: exec
      // 18→30 s, wall up), so one materialized job per round is the
      // right shape for this loop.
      while (delta >= KmConvTol && rounds < KmConvMaxRounds) {
        // recenter + delta as ONE aggregate (r14, the pagerank-conv
        // fused-step shape): the prev state's K×dims rows UNION into
        // the member-coordinate stream (cnt 0, carrying c_prev), so the
        // round's single exchange — the recenter gather — also carries
        // the delta's join-back, and the r13 broadcast(cur) build job
        // per round is gone. The wide assign carries each member's
        // coordinate array along, so the member coordinates come from a
        // row-local posexplode — the r13 tvecs re-join per round is
        // gone too. Semantics are exact: sum(vs) ignores the self rows'
        // null vs, sum(cnt) counts members only (≡ the old count(1)
        // over the inner join), c_prev is max over the single non-null
        // state row, and the n_members > 0 filter is the old inner
        // join's emptied-cluster exit (assignments only target cents
        // present in `cur`, so no contribution group lacks a state
        // row). All BIGINT fixed-point.
        val members = tvecs.join(assignTo(cur), "vec_id")
          .select(col("cent_id"), col("d"), col("vs"), lit(1L).as("cnt"),
            lit(null).cast("long").as("c_prev"))
        val prevRows = cur.select(col("cent_id"), col("d"),
          lit(null).cast("long").as("vs"), lit(0L).as("cnt"),
          col("c").as("c_prev"))
        val roundFrame = members.unionByName(prevRows)
          .groupBy("cent_id", "d")
          .agg(sum("vs").as("sv"), sum("cnt").as("n_members"),
            max("c_prev").as("c_prev"))
          .filter(col("n_members") > 0)
          .select(col("cent_id"), col("d"), expr("sv div n_members").as("c"),
            abs(expr("sv div n_members") - col("c_prev")).as("dl"))
        // plans/<round> audit hook (the pagerank-conv convention): dump
        // one round's pre-cut dataflow on demand
        if (rounds == 0 && sys.env.contains("SPARK_GRAFT_DUMP_ROUND"))
          System.err.println("[round-plan kmeans_conv]\n" +
            roundFrame.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
        val (next, nextRdd) = Dedup.materializeOwnedLazy(
          roundFrame, ckDir.isDefined)
        delta = next.agg(sum("dl")).head().getLong(0)
        Dedup.retire(spark, curRdd)
        cur = next
        curRdd = nextRdd
        rounds += 1
      }
      val report = assignTo(cur)
        .groupBy("cent_id").agg(count(lit(1)).as("n_members"))
        .join(cur.groupBy("cent_id").agg(sum("c").as("c_sum")), Seq("cent_id"))
        .select(col("cent_id"), col("n_members"), col("c_sum"),
          lit(rounds.toLong).as("rounds"))
        .orderBy("cent_id")
      val (res, resRdd) = Dedup.materializeOwned(report, ckDir.isDefined)
      Dedup.retire(spark, tvecsRdd)
      Dedup.retire(spark, curRdd)
      Dedup.retainResult(spark, retainKey, resRdd, res)
    }
  }

  // ---- THE PERSISTED ANN INDEX (memoized per session × corpus dir) ----
  //
  // A production vector deployment trains its quantizers ONCE per corpus
  // snapshot and serves every query from the persisted artifacts; the
  // registered (spark, dir) queries model exactly that: the index
  // frames below — trained coarse centroids, the full per-vector L2
  // centroid ranking, the PQ codebook, the corpus PQ codes, and the
  // OPQ-rotated corpus with its own codebook and codes —
  // materialize once per (session, dir) through Dedup's memo machinery
  // (clearMemos-released, checkpoint-dir aware, build cost charged to
  // the bench's `build:ann_index` row) and every consumer reads the
  // cached blocks. The `Of`-variants stay fully self-contained (tests
  // and the Scale harness call them on constructed/replicated frames).
  // Content is deterministic for a fixed dir, so the cache can never go
  // stale — the same contract as the minhash pair memo.

  private def kmCentsCached(spark: SparkSession, dir: String, e: DataFrame): DataFrame =
    Dedup.memoizedFrame(spark, s"ann_kmcents#$dir")(
      kmeansTrainedCents(e, KmK, KmIters))

  private def kmRankedCached(spark: SparkSession, dir: String, e: DataFrame): DataFrame =
    Dedup.memoizedFrame(spark, s"ann_kmranked#$dir")(
      annEncodeStore(spark, dir, e)._1)

  private def pqBookCached(spark: SparkSession, dir: String, e: DataFrame): DataFrame =
    Dedup.memoizedFrame(spark, s"ann_book#$dir")(pqCodebook(e))

  private def pqCodesCached(spark: SparkSession, dir: String, e: DataFrame): DataFrame =
    Dedup.memoizedFrame(spark, s"ann_codes#$dir")(
      annEncodeStore(spark, dir, e)._2)

  /** The PERSISTED encode artifacts of the primary IVF-PQ index for the
    * registered corpus — the r12 VERDICT #1 upgrade: the full
    * per-vector centroid ranking and the corpus PQ codes no longer
    * re-derive from the corpus on every consumer build; they live in a
    * fingerprint-keyed on-disk store ([[ensureEncodedRoots]], the
    * `ensureBloomSigs` discipline) written once per corpus CONTENT and
    * loaded thereafter. The registered corpus is one root; a grown
    * corpus is a root MANIFEST, and only roots absent from the store
    * are encoded — the add path is O(batch) against the frozen
    * artifacts, measured on SCALE's §annencinc grown-by-batch axis. */
  private def annEncodeStore(spark: SparkSession, dir: String,
      e: DataFrame): (DataFrame, DataFrame) = {
    val cents = kmCentsCached(spark, dir, e)
    val book = pqBookCached(spark, dir, e)
    ensureEncodedRoots(spark, Seq(
      ScaleTechniques.layoutPath(dir, "embeddings.parquet", "annenc") -> e),
      cents, book)
  }

  /** Incremental PER-ROOT encode store against FROZEN (cents, book):
    * each (path, vectors) root owns a write-once parquet artifact of
    * its vectors' centroid ranking (`ranked`: vec_id, cent_id, d2, rnk)
    * and PQ codes (`codes`: vec_id, sub, code_id); a root whose
    * artifact exists LOADS, a root without one ENCODES — so growing a
    * corpus by a batch pays encode for the batch root only, never the
    * base (the `q_ann_index_merge` frozen-artifact add discipline
    * applied to the build itself). The caller keys each path by content
    * (the registered root goes through `layoutPath`'s corpus
    * fingerprint; a changed corpus can never serve stale encodings) and
    * guarantees the artifacts were trained on the manifest's snapshot.
    * Build-if-absent runs through the write-once layout machinery
    * (`_SUCCESS` guard, atomic publish, `clearMemos` sweep — each cold
    * bench pass still pays its build honestly). */
  private[graft] def ensureEncodedRoots(spark: SparkSession,
      roots: Seq[(String, DataFrame)], cents: DataFrame,
      book: DataFrame): (DataFrame, DataFrame) = {
    val parts = roots.map { case (path, vecs) =>
      ScaleTechniques.ensureLayout(path) { tmp =>
        kmeansRankedL2(kmeansLongForm(vecs), cents)
          .write.mode("overwrite").parquet(s"$tmp/ranked")
        pqAssign(pqLongForm(vecs), book)
          .select("vec_id", "sub", "code_id")
          .write.mode("overwrite").parquet(s"$tmp/codes")
        // two subdir writes leave no root _SUCCESS: publish one marker
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(tmp, "_SUCCESS"))
        ()
      }
      (spark.read.parquet(s"$path/ranked"),
        spark.read.parquet(s"$path/codes"))
    }
    (parts.map(_._1).reduce(_ unionByName _),
      parts.map(_._2).reduce(_ unionByName _))
  }

  /** Frozen snapshot artifacts for SCALE's grown-by-batch encode axis:
    * the same (capped-train) quantizer and codebook the registered
    * store encodes against, over an explicit base frame. */
  private[graft] def encodeScaleArtifacts(e: DataFrame): (DataFrame, DataFrame) =
    (kmeansTrainedCents(e, KmK, KmIters), pqCodebook(e))

  /** Bench hook, TRAIN legs only: the quantizer centroids and the PQ
    * codebook — the artifacts whose cost is CORPUS-FLAT since the r11
    * sampled-training cap (256 points/centroid, FAISS discipline). The
    * r11 VERDICT directive #5 split: `build:ann_index`'s single row
    * mixed these with the corpus-sized encode passes, so the bench
    * could not show that training had actually gone flat. */
  private[graft] def buildAnnTrain(spark: SparkSession, dir: String): Unit = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    kmCentsCached(spark, dir, e)
    pqBookCached(spark, dir, e)
    ()
  }

  /** Bench hook, ENCODE legs: every corpus-sized index pass — the full
    * per-vector centroid ranking, the corpus PQ codes, the OPQ chain
    * (the rotation IS a corpus projection; its codebook's own sampled
    * train leg rides here because it trains on the rotated frame), the
    * derived-K SemDeDup assignment, the k-center cell geometry, and the
    * delta-merge snapshot index. Encoding N NEW vectors costs Θ(N)
    * anywhere; since r13 the primary IVF-PQ legs (ranking + codes) go
    * through the persisted per-root store ([[ensureEncodedRoots]]), so
    * only rows absent from the fingerprinted artifact are encoded —
    * a cold pass pays the full encode once, a grown corpus pays its
    * batch (SCALE §annencinc), and an unchanged corpus loads. */
  private[graft] def buildAnnEncode(spark: SparkSession, dir: String): Unit = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    // Four INDEPENDENT encode chains (primary IVF-PQ store; OPQ
    // rotate→train→encode; derived-K SemDeDup assignment → k-center
    // cell geometry; merge-snapshot index) submitted from a small pool
    // so each chain's stage tails back-fill the cores the others leave
    // idle (guide §2.6: actions are only sequential because the driver
    // calls them sequentially — a cluster build of independent index
    // artifacts overlaps them the same way). Each chain's INTERNAL
    // order is preserved: dependent artifacts stay sequential inside
    // their thread, and the memo layer is already concurrent-safe
    // (Verify's 4-thread pool exercises it every run).
    // shared-memo pre-build (ADVICE r13): chains consult the trained
    // cents/book memos; under the optimistic build-then-putIfAbsent memo
    // two chains could run the SAME training job concurrently with the
    // loser's materialization discarded — inflating the timed row. In
    // the bench buildAnnTrain has already populated both (memo hit,
    // ~free); standalone callers now pay the train once, up front.
    kmCentsCached(spark, dir, e)
    pqBookCached(spark, dir, e)
    val chains: Seq[(String, () => Unit)] = Seq(
      "ivfpq_store" -> (() => {
        kmRankedCached(spark, dir, e); pqCodesCached(spark, dir, e); () }),
      "opq" -> (() => { opqCodesCached(spark, dir, e); () }),
      // the pruned k-center arms' quantizer-cell geometry (centroid,
      // radius, members) — derived from semAssignment's cells
      "sem_kcenter" -> (() => {
        semAssignment(spark, dir, e); kcenterGeoCached(spark, dir, e); () }),
      // the delta-merge query's persisted snapshot index (frozen
      // quantizer/codebook + the snapshot's inverted-list frames)
      "merge_snap" -> (() => {
        mergeSnapCodesCached(spark, dir, e)
        mergeSnapAssignCached(spark, dir, e); () }))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(chains.size)
    try {
      val t0 = System.nanoTime()
      chains.map { case (label, body) =>
        label -> pool.submit(new java.util.concurrent.Callable[Double] {
          override def call(): Double = {
            val s = System.nanoTime()
            body()
            (System.nanoTime() - s) / 1e9
          }
        })
      }.foreach { case (label, fut) =>
        val secs = fut.get()
        System.err.println(f"[ann_encode] chain $label%-12s $secs%7.2fs " +
          f"(wall so far ${(System.nanoTime() - t0) / 1e9}%7.2fs)")
      }
    } finally pool.shutdown()
  }

  /** Force-build every index frame (train + encode) — the non-bench
    * callers' one-stop hook. */
  private[graft] def buildAnnIndex(spark: SparkSession, dir: String): Unit = {
    buildAnnTrain(spark, dir)
    buildAnnEncode(spark, dir)
  }


  /** The trained quantizer collected to a driver-held dense form
    * (cent_id → 0-based-dimension centroid vector): the broadcastable
    * artifact a SERVING or streaming-monitor job holds — K×dims rows,
    * bounded by construction, the "persist the index" step of any IVF
    * deployment. Consumed by
    * [[graft.streaming.EmbeddingsStream]]'s stream-side assignment. */
  private[graft] def trainedQuantizerArrays(ref: DataFrame): Seq[(Long, Seq[Double])] =
    kmeansTrainedCents(ref, KmK, KmIters).collect()
      .groupBy(_.getLong(0))
      .map { case (cid, rs) =>
        cid -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }
      .toSeq.sortBy(_._1)

  /** [[kmeansTrain]] over any (vec_id, embedding) frame. */
  def kmeansTrainOf(e: DataFrame, k: Int = KmK, iters: Int = KmIters): DataFrame =
    kmeansReport(kmeansAssignment(e, k, iters))

  /** The per-cluster report over any (vec_id, cent_id, d2) assignment —
    * shared by the in-flight and cached-index paths. */
  private def kmeansReport(assignment: DataFrame): DataFrame =
    assignment
      .groupBy("cent_id")
      .agg(count(lit(1)).as("n_vectors"),
        round(avg(sqrt(col("d2"))), 4).as("mean_dist"))
      .orderBy("cent_id")

  /** Total within-cluster SSE after `iters` iterations — Lloyd's
    * convergence quantity (provably non-increasing per iteration). */
  private[graft] def kmeansSse(e: DataFrame, k: Int, iters: Int): Double =
    kmeansAssignment(e, k, iters).agg(sum("d2")).head().getDouble(0)

  /** Symmetric INT8 quantization audit — the storage-compression step a
    * vector index runs before persisting (4× smaller than float32, and
    * the precision SIMD distance kernels consume). Per vector: scale =
    * max|v| / 127, code = round(v/scale), reconstruction v' = code·scale.
    * The report is per label: the normalized reconstruction error
    * (mean over dims of err²/scale² — dimensionless, ≈1/12 for uniform
    * rounding error, so the number is readable and stable to round) and
    * the structural guarantee that every code fits int8. One narrow
    * pass in long form, two bounded groupBys (per-vector then
    * per-label); nothing shuffles at corpus width. Cross-engine parity:
    * both engines round doubles half-away-from-zero, and every input to
    * `round` is the same pair of doubles in both. */
  def quantizeInt8Report(spark: SparkSession, dir: String): DataFrame = {
    // label rides the posexplode projection — NOT a join back onto a
    // second embeddings scan, which would shuffle the N×dims long form
    // just to recover a column the source row already had
    val vl = Tables.fanOut(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("label"), posexplode(col("embedding")))
      .select(col("vec_id"), col("label"), col("col").cast("double").as("v"))
    val scaled = vl.groupBy("vec_id", "label")
      .agg((max(abs(col("v"))) / 127.0).as("scale"))
    val codes = vl.join(scaled, Seq("vec_id", "label"))
      .select(col("vec_id"), col("label"), col("scale"),
        when(col("scale") > 0, round(col("v") / col("scale"))).otherwise(0.0).as("q"),
        col("v"))
      .withColumn("err", col("v") - col("q") * col("scale"))
    val perVec = codes.groupBy("vec_id", "label", "scale")
      .agg(avg(col("err") * col("err")).as("mse"), max(abs(col("q"))).as("max_code"))
    perVec.groupBy("label")
      .agg(count(lit(1)).as("n_vectors"),
        round(avg(when(col("scale") > 0, col("mse") / (col("scale") * col("scale")))
          .otherwise(0.0)), 4).as("nmse"),
        (max(col("max_code")) <= 127.0).as("codes_in_range"))
      .orderBy("label")
  }

  /** Trained centroids folded back to array form (cent_id, cent_emb):
    * the persisted quantizer an IVF index stores. `sort_array` over the
    * collected (d, c) structs makes the dimension order deterministic
    * regardless of aggregation order. */
  private[graft] def kmeansCentroids(e: DataFrame, k: Int = KmK,
                                     iters: Int = KmIters): DataFrame =
    kmeansCentroidsFrom(kmeansTrainedCents(e, k, iters))

  private def kmeansCentroidsFrom(centsLong: DataFrame): DataFrame =
    centsLong
      .groupBy("cent_id")
      .agg(transform(array_sort(collect_list(struct(col("d"), col("c")))),
        x => x.getField("c")).as("cent_emb"))

  /** IVF-routed search over the TRAINED quantizer — [[ivfRoutedTopK]]'s
    * plan with [[kmeansTrainOf]]'s centroids in place of the fixed seed
    * pick, closing the loop from quantizer training to query serving
    * (train once as a batch job, persist `cent_emb`, route every query
    * against it). Same shape and scale posture: centroids broadcast,
    * assignment is one narrow corpus pass, a query scans only its
    * `nprobe` disjoint inverted lists. Trained centroids are cluster
    * MEANS, not corpus members, so no `vec_id != cent_id` special case
    * exists and every corpus vector is a candidate. */
  def kmeansRoutedTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    routedTopK(e,
      rankedAgainst(e, kmeansCentroidsFrom(kmCentsCached(spark, dir, e))),
      IvfNProbe)
  }

  /** Fixed-point scale for the PCA scatter matrix: embedding values are
    * quantized to `round(v·10⁶)` BIGINTs so every scatter entry is an
    * EXACT integer sum — immune to partition-order float drift. Bound:
    * |vi| ≤ 10⁶ (unit-ish floats), so an entry is ≤ N·10¹² and stays
    * inside both Long and the 2⁵³ double-exact range for N ≲ 8·10³
    * corpus rows per... per scatter cell N ≤ 9·10⁶ before Long risk and
    * N ≤ 9·10³ before the double CAST of a cell could round — at larger
    * N drop the scale a digit per 100×. */
  val PcaScale = 1000000L
  val PcaIters = 2

  /** Relational PCA by POWER ITERATION — the dimensionality-reduction
    * step a vector index runs before IVF/PQ (FAISS's PCA-then-quantize
    * pipeline), expressed entirely as joins/aggregations like
    * [[kmeansTrainOf]]:
    *
    *  - the D×D scatter matrix S = Σ v·vᵀ (uncentered second moment —
    *    these embeddings are zero-mean by construction, and uncentered
    *    scatter keeps every entry an exact integer) is built from the
    *    long form by a vec_id self-join: O(N·D²) — the canonical
    *    covariance cost, sampled at 100 TB exactly as production PCA
    *    training samples;
    *  - [[PcaIters]] unrolled power steps w ← normalize(S·w) from the
    *    binary-exact seed w₀ = 1/8 per dimension; each mat-vec is a
    *    join against the D²-row scatter frame, each fold over doubles
    *    runs in EXPLICIT dimension order (`array_sort(collect_list)`
    *    then a sequential `aggregate`), so both engines add the same
    *    values in the same order and the loadings are bit-identical —
    *    the same determinism discipline as [[graft.functions
    *    .VectorFunctions.dot]], lifted from array order to frame order;
    *  - the eigenvalue estimate λ = ‖S·w‖ over the final normalized w,
    *    reported as the scale-free explained fraction λ / trace(S).
    *
    * Output: one row per dimension (d, loading, eigval_frac) — the
    * projection direction serving code dots against, plus the quantity
    * that decides how many components a real reduction keeps. */
  def pcaPower(spark: SparkSession, dir: String): DataFrame =
    pcaPowerOf(Tables.fanOut(Tables.embeddings(spark, dir)))

  def pcaPowerOf(e: DataFrame, iters: Int = PcaIters): DataFrame = {
    val vl = e.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").as("d"),
        // round() is HALF_UP = away-from-zero on ties, matching DuckDB
        round(col("col").cast("double") * PcaScale, 0).cast("long").as("vi"))
    val scatter = vl.select(col("vec_id"), col("d").as("d1"), col("vi").as("v1"))
      .join(vl.select(col("vec_id"), col("d").as("d2"), col("vi").as("v2")), "vec_id")
      .groupBy("d1", "d2").agg(sum(col("v1") * col("v2")).as("s"))

    // deterministic sequential fold of `term` in `ord` order — the
    // frame-level analog of VectorFunctions.dot's array fold
    def foldOrdered(ord: Column, term: Column): Column =
      aggregate(array_sort(collect_list(struct(ord.as("o"), term.as("t")))),
        lit(0.0), (acc, e) => acc + e.getField("t"))

    def matVec(w: DataFrame): DataFrame =
      scatter.join(w.select(col("d").as("d2"), col("x")), "d2")
        .groupBy(col("d1").as("d"))
        .agg(foldOrdered(col("d2"), col("s").cast("double") * col("x")).as("x"))
    def norm2(w: DataFrame): DataFrame =
      w.agg(sqrt(foldOrdered(col("d"), col("x") * col("x"))).as("nrm"))
    def normalized(w: DataFrame): DataFrame =
      w.crossJoin(broadcast(norm2(w))).select(col("d"), (col("x") / col("nrm")).as("x"))

    val w0 = scatter.select(col("d1").as("d")).distinct()
      .select(col("d"), lit(0.125).as("x")) // 1/8: binary-exact seed
    val w = (1 to iters).foldLeft(w0)((cur, _) => normalized(matVec(cur)))
    val lambda = norm2(matVec(w)).select(col("nrm").as("lambda"))
    val trace = scatter.filter(col("d1") === col("d2"))
      .agg(sum("s").as("tr")) // exact integer total energy
    w.crossJoin(broadcast(lambda)).crossJoin(broadcast(trace))
      .select(col("d"), round(col("x"), 6).as("loading"),
        round(col("lambda") / col("tr"), 6).as("eigval_frac"))
      .orderBy("d")
  }

  /** Constant offset added to every dimension of the planted drifted
    * slice in [[embeddingDrift]]'s "new" snapshot — large enough to move
    * a vector's nearest trained centroid, so the monitor has real
    * spatial drift to catch (the synthetic snapshots would otherwise
    * split evenly — the zero-case trap again). */
  val DriftShift = 0.3

  /** EMBEDDING-DRIFT monitor — population-stability (PSI) over the
    * cluster shares of the TRAINED quantizer, the embedding-space analog
    * of `Profiling.driftReport`'s value-histogram PSI and the standard
    * "did the new crawl move in embedding space" production monitor:
    * train k-means on the reference snapshot (even vec_ids — the same
    * Lloyd loop the IVF serving path uses), assign BOTH snapshots to
    * those frozen centroids, and compare per-cluster shares with the
    * library's smoothed PSI arithmetic. The new snapshot (odd vec_ids)
    * carries a planted [[DriftShift]] offset on vec_id%10<3, so the
    * report must show mass leaving some clusters and arriving in others.
    *
    * Scale posture: training and both assignment passes are the audited
    * `q_ann_kmeans` shape (broadcast K×dims centroid frame, one narrow
    * corpus pass each, WindowGroupLimit argmins); everything after the
    * per-cluster counts is K-sized. The spine is the TRAINED centroid
    * set, so emptied clusters stay defined (smoothing keeps ln finite),
    * exactly as the histogram monitor handles emptied buckets. */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    val ref = e.filter(col("vec_id") % 2 === 0)
    val cur = e.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"),
        when(col("vec_id") % 10 < 3,
            transform(col("embedding"), x => x.cast("double") + lit(DriftShift)))
          .otherwise(transform(col("embedding"), x => x.cast("double")))
          .as("embedding"))
    embeddingDriftOf(ref, cur)
  }

  /** [[embeddingDrift]] over any (vec_id, embedding) reference/new
    * snapshot pair; the quantizer is trained on `ref` ONLY (frozen
    * index — assignment drift is the signal, not re-training). */
  def embeddingDriftOf(ref: DataFrame, cur: DataFrame): DataFrame = {
    // train ONCE and materialize the K×dims frame (512 rows): three
    // consumers (two assignment passes + the spine) would otherwise
    // each replay the full Lloyd subtree — this is the "persist the
    // trained quantizer" step a production monitor does anyway, scoped
    // to this plan (not a cross-query memo)
    val cents = kmeansTrainedCents(ref, KmK, KmIters).localCheckpoint()
    def counts(df: DataFrame, as: String) =
      kmeansAssign(kmeansLongForm(df), cents)
        .groupBy("cent_id").agg(count(lit(1)).as(as))
    val full = cents.select("cent_id").distinct()
      .join(counts(ref, "n_ref"), Seq("cent_id"), "left")
      .join(counts(cur, "n_cur"), Seq("cent_id"), "left")
      .select(col("cent_id"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = full.agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"),
      count(lit(1)).as("k_live"))
    full.crossJoin(broadcast(tot))
      .withColumn("p_ref", (col("n_ref") + 0.5) / (col("t_ref") + col("k_live") * 0.5))
      .withColumn("p_cur", (col("n_cur") + 0.5) / (col("t_cur") + col("k_live") * 0.5))
      .select(col("cent_id"), col("n_ref"), col("n_cur"),
        round(col("p_ref"), 6).as("p_ref"),
        round(col("p_cur"), 6).as("p_cur"),
        round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 6)
          .as("psi_term"))
      .orderBy("cent_id")
  }

  /** Product-quantization geometry: [[PqM]] subspaces of dims/M
    * dimensions, [[PqK]] codewords per subspace — 64 float dims compress
    * to 8 bytes/vector (one code per subspace), the 32× compression that
    * makes a 100 TB corpus's index RAM-resident. One Lloyd refine past
    * the deterministic seed pick keeps the cross-engine oracle one
    * unrolled CTE generation (the iteration count is the training dial,
    * exactly as in [[KmIters]]). */
  val PqM = 8
  val PqK = 16
  val PqIters = 1

  /** PRODUCT QUANTIZATION with asymmetric distance computation (ADC) —
    * Jégou et al. 2011, the compressed-domain serving path FAISS pairs
    * with IVF routing ([[ivfRoutedTopK]]) and PCA rotation
    * ([[pcaPowerOf]]):
    *
    *  - TRAIN: an independent [[PqK]]-codeword k-means per subspace —
    *    the same deterministic seed-then-Lloyd loop as
    *    [[kmeansTrainedCents]], with `sub` riding every key, so all M
    *    sub-quantizers train in ONE set of joins/aggregations (no
    *    per-subspace driver loop);
    *  - ENCODE: argmin codeword per (vector, subspace) — the corpus's
    *    only full-width pass; what persists is N×[[PqM]] small codes;
    *  - SERVE: per query, a [[PqM]]×[[PqK]] lookup table of exact
    *    subspace distances to every codeword (query side stays
    *    UN-quantized — the "asymmetric" in ADC), broadcast; a
    *    candidate's approximate distance is then M table lookups summed
    *    via one equi-join + groupBy, never touching candidate floats.
    *
    * At 100 TB the ADC scan runs per inverted list (IVF routes, PQ
    * scores) — here it scans the whole corpus, which IS brute-force ADC,
    * the honest flat-index baseline. Ranking follows the library's
    * cross-engine discipline: rank on the 6dp-ROUNDED distance with a
    * unique neighbor tie-break, so a last-ulp float divergence between
    * engines can never flip an emitted row. */
  def pqTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    pqServe(e, pqBookCached(spark, dir, e), pqCodesCached(spark, dir, e))
  }

  /** Long form with the subspace key: (vec_id, sub, d, v). */
  private def pqLongForm(e: DataFrame): DataFrame = {
    val width = lit(64 / PqM)
    kmeansLongForm(e).withColumn("sub", (col("d") / width).cast("int"))
  }

  /** Trained per-subspace codebook (sub, code_id, d, c): seeds are the
    * [[PqK]] lowest vec_ids' subvectors (one seed pick shared by every
    * subspace), then [[PqIters]] Lloyd refines. Empty codewords drop
    * out, mirroring [[kmeansTrainedCents]]. */
  private def pqCodebook(e: DataFrame): DataFrame =
    pqCodebookOf(pqLongForm(e), pqSeeds(e), e.select("vec_id"))

  private def pqSeeds(e: DataFrame): DataFrame =
    e.select("vec_id").orderBy("vec_id").limit(PqK)
      .select(col("vec_id"),
        (row_number().over(Window.orderBy("vec_id")) - 1).cast("long").as("code_id"))

  /** The codebook training loop over ANY (vec_id, sub, d, v) long form —
    * shared by the plain-vector chain ([[pqCodebook]]) and the residual
    * chain ([[ivfAdcResidualTopKOf]]), so a training fix can never
    * silently apply to one coding and not the other. */
  private def pqCodebookOf(vecs: DataFrame, seeds: DataFrame,
      ids: DataFrame): DataFrame = {
    // Lloyd refines run on the capped deterministic sample (shared by
    // all M subspaces, FAISS-style — see [[KmTrainPerCent]]); the seed
    // init and the downstream ENCODE pass stay corpus-wide. `ids` is
    // the population's NARROW one-row-per-vector id frame — sampling
    // from the exploded long form would pay a corpus×dims distinct
    // just to recover it.
    val tvecs = vecs.join(
      broadcast(trainIds(ids.select("vec_id"), KmTrainPerCent * PqK)),
      "vec_id")
    val init = vecs.join(broadcast(seeds), "vec_id")
      .select(col("sub"), col("code_id"), col("d"), col("v").as("c"))
    (1 to PqIters).foldLeft(init) { (cents, _) =>
      tvecs.join(pqAssign(tvecs, cents).select("vec_id", "sub", "code_id"),
          Seq("vec_id", "sub"))
        .groupBy("sub", "code_id", "d").agg(avg("v").as("c"))
    }
  }

  /** Per-(vector, subspace) argmin codeword against a broadcast
    * codebook — (d2, code_id) tie-break, WindowGroupLimit-planned. */
  private def pqAssign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val d2 = vecs.join(broadcast(cents), Seq("sub", "d"))
      .groupBy("vec_id", "sub", "code_id")
      .agg(sum(pow(col("v") - col("c"), 2)).as("d2"))
    val w = Window.partitionBy("vec_id", "sub").orderBy(col("d2"), col("code_id"))
    d2.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select("vec_id", "sub", "code_id", "d2")
  }

  /** Per-query ADC lookup table (q_id, sub, code_id, sub_d2): exact
    * subspace distance from every (un-quantized) query subvector to
    * every codeword — Nq×[[PqM]]×[[PqK]] rows, broadcast to the code
    * scan. Shared by the flat ADC serving path ([[pqTopKOf]]) and the
    * IVF-routed composition ([[ivfAdcTopKOf]]). */
  private def pqLut(e: DataFrame, book: DataFrame): DataFrame =
    pqLongForm(e.filter(col("vec_id") < NQueries))
      .withColumnRenamed("vec_id", "q_id").withColumnRenamed("v", "qv")
      .join(broadcast(book), Seq("sub", "d"))
      .groupBy("q_id", "sub", "code_id")
      .agg(sum(pow(col("qv") - col("c"), 2)).as("sub_d2"))

  /** ADC scoring shared tail: sum the M table lookups per candidate to
    * the 6dp-rounded compressed-domain distance — (q_id, neighbor,
    * adc_d2), the frame a consumer filters or anti-joins BEFORE the
    * top-k cut (the routed hard-negative miner needs exactly this:
    * excluding a duplicate must promote the next-best candidate).
    * `pairs` must carry (q_id, vec_id, sub_d2). */
  private def adcScores(pairs: DataFrame): DataFrame =
    pairs
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id").as("neighbor"))
      .agg(round(sum("sub_d2"), 6).as("adc_d2"))

  /** ADC ranking shared tail: [[adcScores]] ranked on the rounded
    * distance with the unique neighbor tie-break, top-3 per query. */
  private def adcRanked(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("adc_d2"), col("neighbor"))
    adcScores(pairs).withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("q_id", "rank", "neighbor", "adc_d2")
      .orderBy("q_id", "rank")
  }

  def pqTopKOf(e: DataFrame): DataFrame = {
    val book = pqCodebook(e)
    pqServe(e, book, pqAssign(pqLongForm(e), book).select("vec_id", "sub", "code_id"))
  }

  /** Flat ADC serving over prebuilt index frames — shared by the
    * in-flight ([[pqTopKOf]]) and cached-index ([[pqTopK]]) paths. */
  private def pqServe(e: DataFrame, book: DataFrame, codes: DataFrame): DataFrame =
    adcRanked(codes.join(broadcast(pqLut(e, book)), Seq("sub", "code_id")))

  /** IVFADC — the production FAISS index shape (Jégou et al. 2011 §V):
    * IVF routing ([[ivfRanked]]'s coarse quantizer) composed with
    * compressed-domain ADC scoring ([[pqCodebook]]/[[pqLut]]). Each
    * query is routed to its `nprobe` nearest coarse cells and scores
    * ONLY those cells' PQ codes via the broadcast lookup table — the
    * corpus-wide ADC scan of [[pqTopKOf]] shrinks to nprobe inverted
    * lists per query, which is what makes a RAM-resident 100 TB index
    * servable. Codes here quantize the raw vectors (the paper's
    * plain-code variant; residual coding is the same plan with
    * `v - cent` fed to the sub-quantizers). Every vector lives in
    * exactly one cell (rnk=1 assignment), so candidate sets nest in
    * nprobe and recall is monotone — [[pqRecallOf]] pins the measured
    * recall of this exact composition against fold-exact L2. */
  def ivfAdcTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    adcRanked(ivfAdcRoutedPairsWith(e, IvfNProbe,
      pqBookCached(spark, dir, e), pqCodesCached(spark, dir, e)))
  }

  def ivfAdcTopKOf(e: DataFrame, nprobe: Int): DataFrame =
    adcRanked(ivfAdcRoutedPairs(e, nprobe))

  /** The routing half of an IVF+PQ index over ANY coarse ranking frame
    * (vec_id, cent_id, rnk) and prebuilt PQ codes: per-cell codes
    * equi-joined against the broadcast Nq×nprobe probe list — routed
    * (q_id, vec_id, sub, code_id) rows, cell-local by construction.
    * The seeded-quantizer serving path ([[ivfAdcRoutedPairs]]) and the
    * trained-quantizer routed miner ([[hardNegativesRoutedOf]]) share
    * this body, so a routing fix can never silently apply to one index
    * and not the other. */
  private def routedPqCodes(ranked: DataFrame, nprobe: Int,
      codes: DataFrame): DataFrame = {
    val assign = ranked.filter(col("rnk") === 1).select("vec_id", "cent_id")
    // the persisted index: per-cell PQ codes (cent_id rides each code row)
    val cellCodes = codes.join(assign, "vec_id")
    val probes = ranked
      .filter(col("vec_id") < NQueries && col("rnk") <= nprobe)
      .select(col("vec_id").as("q_id"), col("cent_id"))
    // route: codes join the Nq×nprobe probe list on cent_id — the only
    // corpus-sized stage, an equi-join against a broadcast-bounded side
    cellCodes.join(broadcast(probes), Seq("cent_id"))
  }

  /** The IVFADC serving chain up to (but not including) the top-k cut:
    * routed (q_id, vec_id, sub_d2) lookup rows. */
  private[graft] def ivfAdcRoutedPairs(e: DataFrame, nprobe: Int): DataFrame = {
    val book = pqCodebook(e)
    ivfAdcRoutedPairsWith(e, nprobe, book,
      pqAssign(pqLongForm(e), book).select("vec_id", "sub", "code_id"))
  }

  private def ivfAdcRoutedPairsWith(e: DataFrame, nprobe: Int,
      book: DataFrame, codes: DataFrame): DataFrame =
    routedPqCodes(ivfRanked(e), nprobe, codes)
      .join(broadcast(pqLut(e, book)), Seq("q_id", "sub", "code_id"))

  /** IVFADC + EXACT REFINE — FAISS's IndexRefineFlat composed over the
    * routed chain: the ADC top-[[HnShortlist]] shortlist per query
    * re-ranks on fold-exact squared L2 before the top-3 cut. The
    * shortlist is an id list, so the exact stage is [[HnShortlist]]
    * scorings per query via one equi-join against the corpus — a
    * constant per-query refine cost that buys back the PQ quantization
    * error on the final ranking (the same k_factor trade the routed
    * hard-negative miner uses; this registers it as a first-class
    * serving query). */
  def ivfAdcRefineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    refineExactL2(e, adcScores(ivfAdcRoutedPairsWith(e, IvfNProbe,
      pqBookCached(spark, dir, e), pqCodesCached(spark, dir, e))), HnShortlist)
  }

  def ivfAdcRefineTopKOf(e: DataFrame, nprobe: Int, shortlist: Int): DataFrame =
    refineExactL2(e, adcScores(ivfAdcRoutedPairs(e, nprobe)), shortlist)

  /** The exact-L2 refine tail over any (q_id, neighbor, adc_d2) scored
    * frame — shortlist cut, id-join exact scoring, final top-3. */
  private def refineExactL2(e: DataFrame, scored: DataFrame,
      shortlist: Int): DataFrame = {
    val ws = Window.partitionBy("q_id").orderBy(col("adc_d2"), col("neighbor"))
    val short = scored.withColumn("srnk", row_number().over(ws))
      .filter(col("srnk") <= shortlist)
      .select("q_id", "neighbor")
    val qv = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = short
      .join(e.select(col("vec_id").as("neighbor"), col("embedding").as("n_emb")),
        "neighbor")
      .join(broadcast(qv), "q_id")
      .select(col("q_id"), col("neighbor"),
        round(l2sq(col("q_emb"), col("n_emb")), 6).as("d2"))
    val w = Window.partitionBy("q_id").orderBy(col("d2"), col("neighbor"))
    exact.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("q_id", "rank", "neighbor", "d2")
      .orderBy("q_id", "rank")
  }

  /** RESIDUAL-coding IVFADC — the FAISS default variant of
    * [[ivfAdcTopKOf]] (Jégou et al. 2011 §V): the PQ codebook trains on
    * and encodes the RESIDUALS v − c(cell) rather than raw vectors, so
    * the sub-quantizers spend their 16 codewords on the within-cell
    * variance the coarse quantizer leaves behind — the compression-
    * quality reason production indexes default to residual coding. The
    * cost is a per-(query, probed cell) lookup table (the query's
    * residual differs per cell): Nq×nprobe×[[PqM]]×[[PqK]] rows, still
    * broadcast-bounded by construction. Training, encoding and routing
    * reuse the shared chains verbatim ([[pqCodebookOf]], [[pqAssign]],
    * [[ivfRanked]]); candidates score via one equi-join on
    * (q_id, cent_id, sub, code_id). */
  def ivfAdcResidualTopK(spark: SparkSession, dir: String): DataFrame =
    ivfAdcResidualTopKOf(Tables.fanOut(Tables.embeddings(spark, dir)), IvfNProbe)

  def ivfAdcResidualTopKOf(e: DataFrame, nprobe: Int): DataFrame = {
    val width = lit(64 / PqM)
    val ranked = ivfRanked(e)
    val assign = ranked.filter(col("rnk") === 1).select("vec_id", "cent_id")
    // coarse centroids in long form (cent_id, d, c), d 0-based like
    // kmeansLongForm — the frame both residual subtractions join
    val centsLong = e
      .filter(col("vec_id") >= IvfSeedBase && col("vec_id") < IvfSeedBase + IvfK)
      .select(col("vec_id").as("cent_id"), posexplode(col("embedding")))
      .select(col("cent_id"), col("pos").as("d"), col("col").cast("double").as("c"))
    // residual long form (vec_id, cent_id, sub, d, v): v − c of the
    // vector's OWN cell
    val rvecs = kmeansLongForm(e)
      .join(assign, "vec_id")
      .join(broadcast(centsLong), Seq("cent_id", "d"))
      .select(col("vec_id"), (col("d") / width).cast("int").as("sub"),
        col("d"), (col("v") - col("c")).as("v"))
    val book = pqCodebookOf(rvecs, pqSeeds(e), e.select("vec_id"))
    val codes = pqAssign(rvecs, book).select("vec_id", "sub", "code_id")
      .join(assign, "vec_id")
    val probes = ranked
      .filter(col("vec_id") < NQueries && col("rnk") <= nprobe)
      .select(col("vec_id").as("q_id"), col("cent_id"))
    // query residual per PROBED cell (not per own cell): the LUT is
    // keyed (q_id, cent_id, sub, code_id)
    val qres = kmeansLongForm(e.filter(col("vec_id") < NQueries))
      .withColumnRenamed("vec_id", "q_id")
      .join(broadcast(probes), "q_id")
      .join(broadcast(centsLong), Seq("cent_id", "d"))
      .select(col("q_id"), col("cent_id"), (col("d") / width).cast("int").as("sub"),
        col("d"), (col("v") - col("c")).as("qv"))
    val lut = qres.join(broadcast(book), Seq("sub", "d"))
      .groupBy("q_id", "cent_id", "sub", "code_id")
      .agg(sum(pow(col("qv") - col("c"), 2)).as("sub_d2"))
    val routed = codes.join(broadcast(probes), Seq("cent_id"))
      .join(broadcast(lut), Seq("q_id", "cent_id", "sub", "code_id"))
    adcRanked(routed)
  }

  // ---- IVF-PQ INDEX MAINTENANCE: the add path ----
  //
  // A production vector store ingests continuously; rebuilding the
  // index per batch is the corpus-sized cost the delta-merge removes
  // (the `q_text_bm25_index_merge` discipline applied to
  // `build:ann_index`). The FROZEN artifacts are trained ONCE on the
  // snapshot — the coarse quantizer cells and the PQ codebook — and an
  // arriving batch folds in at O(batch): assign each new vector to the
  // frozen quantizer, encode it with the frozen codebooks, append the
  // (code, cell) rows to the inverted lists. Because assignment and
  // encoding are PER-VECTOR functions of the frozen artifacts, the
  // merged index is row-for-row identical to re-encoding snapshot ∪
  // batch at the same artifacts — which is exactly what the DuckDB
  // oracle recomputes, so the hash match IS the merged ≡ rebuilt
  // equivalence, cross-engine. (FAISS's IndexIVFPQ `add` does the
  // same: quantizers are immutable after `train`; only the inverted
  // lists grow. Codebook drift over a growing corpus is a re-TRAIN
  // decision — a new snapshot — not an ingest-path concern.)

  /** The frozen coarse cells of the merge index: the [[IvfK]] lowest
    * SNAPSHOT ids at/above [[IvfSeedBase]] (cent_id = the seed's own
    * vec_id, the [[ivfRanked]] convention). Picked from the snapshot
    * only, so an arriving batch can never shift a cell. */
  private def mergeCoarseCentsOf(snap: DataFrame): DataFrame =
    snap.filter(col("vec_id") >= IvfSeedBase)
      .orderBy("vec_id").limit(IvfK)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))

  // the persisted snapshot-index frames, memoized per (session, dir)
  // through the same lifecycle as the other ANN artifacts (swept by
  // clearMemos, build cost charged to the bench's `build:ann_index`
  // row); `snap` is the even-id half — the standing snapshot/batch
  // split of the incremental family
  private def mergeSnap(e: DataFrame): DataFrame =
    e.filter(col("vec_id") % 2 === 0)

  private def mergeCentsCached(spark: SparkSession, dir: String,
      e: DataFrame): DataFrame =
    Dedup.memoizedFrame(spark, s"ann_merge_cents#$dir")(
      mergeCoarseCentsOf(mergeSnap(e)))

  private def mergeBookCached(spark: SparkSession, dir: String,
      e: DataFrame): DataFrame =
    Dedup.memoizedFrame(spark, s"ann_merge_book#$dir") {
      val snap = mergeSnap(e)
      pqCodebookOf(pqLongForm(snap), pqSeeds(snap), snap.select("vec_id"))
    }

  private def mergeSnapCodesCached(spark: SparkSession, dir: String,
      e: DataFrame): DataFrame = {
    val book = mergeBookCached(spark, dir, e)
    Dedup.memoizedFrame(spark, s"ann_merge_codes#$dir")(
      pqAssign(pqLongForm(mergeSnap(e)), book)
        .select("vec_id", "sub", "code_id"))
  }

  private def mergeSnapAssignCached(spark: SparkSession, dir: String,
      e: DataFrame): DataFrame = {
    val cents = mergeCentsCached(spark, dir, e)
    Dedup.memoizedFrame(spark, s"ann_merge_assign#$dir")(
      rankedAgainst(mergeSnap(e), cents)
        .filter(col("rnk") === 1).select("vec_id", "cent_id"))
  }

  /** The DELTA-MERGE: batch rows assigned to the frozen quantizer and
    * encoded with the frozen codebooks — both batch-sized passes
    * against broadcast artifacts (8 cells; [[PqM]]×[[PqK]] codewords) —
    * appended to the snapshot's inverted-list frames. Returns
    * (mergedAssign, mergedCodes). */
  private[graft] def mergedIndexOf(snapAssign: DataFrame, snapCodes: DataFrame,
      batch: DataFrame, cents: DataFrame, book: DataFrame)
      : (DataFrame, DataFrame) = {
    val batchAssign = rankedAgainst(batch, cents)
      .filter(col("rnk") === 1).select("vec_id", "cent_id")
    val batchCodes = pqAssign(pqLongForm(batch), book)
      .select("vec_id", "sub", "code_id")
    (snapAssign.unionByName(batchAssign), snapCodes.unionByName(batchCodes))
  }

  /** The routed ADC serve over explicit merged-index frames — shared by
    * the registered cached-index query, the self-contained `Of` form
    * and the rebuild arm of the equivalence spec. Queries (vec_id <
    * [[NQueries]], un-quantized as in every serving path) route to
    * their [[IvfNProbe]] nearest FROZEN cells and score only those
    * cells' codes via the broadcast LUT. */
  private def mergedServe(e: DataFrame, assign: DataFrame, codes: DataFrame,
      cents: DataFrame, book: DataFrame): DataFrame = {
    val probes = rankedAgainst(e.filter(col("vec_id") < NQueries), cents)
      .filter(col("rnk") <= IvfNProbe)
      .select(col("vec_id").as("q_id"), col("cent_id"))
    val routed = codes.join(assign, "vec_id")
      .join(broadcast(probes), Seq("cent_id"))
    adcRanked(routed.join(broadcast(pqLut(e, book)), Seq("q_id", "sub", "code_id")))
  }

  /** Registered form: the odd-id batch folds into the even-id
    * snapshot's persisted index, and the standard query set serves from
    * the MERGED index. The oracle re-derives the serve from a full
    * re-encode of the whole corpus at the SAME frozen artifacts
    * (codebook trained on the even half only), so the hash match pins
    * the add path's assignment, encoding and list maintenance exactly.
    * Cost shape: the snapshot index is a persisted artifact (memoized,
    * `build:ann_index`); the query pays batch-encode + routed serve —
    * O(batch + probed lists), never O(corpus). SCALE.md §annmerge
    * measures the merged serve flat while the rebuild arm grows with
    * the snapshot. */
  def annIndexMergeServe(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    val cents = mergeCentsCached(spark, dir, e)
    val book = mergeBookCached(spark, dir, e)
    val (assign, codes) = mergedIndexOf(
      mergeSnapAssignCached(spark, dir, e),
      mergeSnapCodesCached(spark, dir, e),
      e.filter(col("vec_id") % 2 === 1), cents, book)
    mergedServe(e, assign, codes, cents, book)
  }

  /** Self-contained merge arm over explicit (snapshot, batch) frames —
    * the suite/scale hook. `full` supplies the query vectors. */
  private[graft] def annIndexMergeServeOf(full: DataFrame, snap: DataFrame,
      batch: DataFrame): DataFrame = {
    val cents = mergeCoarseCentsOf(snap)
    val book = pqCodebookOf(pqLongForm(snap), pqSeeds(snap), snap.select("vec_id"))
    val snapAssign = rankedAgainst(snap, cents)
      .filter(col("rnk") === 1).select("vec_id", "cent_id")
    val snapCodes = pqAssign(pqLongForm(snap), book)
      .select("vec_id", "sub", "code_id")
    val (assign, codes) = mergedIndexOf(snapAssign, snapCodes, batch, cents, book)
    mergedServe(full, assign, codes, cents, book)
  }

  /** The rebuild-at-frozen-artifacts arm: snapshot ∪ batch re-assigned
    * and re-encoded wholesale at the SAME snapshot-trained artifacts —
    * what the merge must equal row-for-row (spec-pinned), and the
    * corpus-sized cost it avoids (scale-measured). */
  private[graft] def annIndexRebuildServeOf(full: DataFrame, snap: DataFrame,
      union: DataFrame): DataFrame = {
    val cents = mergeCoarseCentsOf(snap)
    val book = pqCodebookOf(pqLongForm(snap), pqSeeds(snap), snap.select("vec_id"))
    val assign = rankedAgainst(union, cents)
      .filter(col("rnk") === 1).select("vec_id", "cent_id")
    val codes = pqAssign(pqLongForm(union), book)
      .select("vec_id", "sub", "code_id")
    mergedServe(full, assign, codes, cents, book)
  }

  /** Per-cell list counts of a merged index — the list-count
    * maintenance a real IVF `add` keeps (merged count = stored + batch
    * per cell, additive); spec-pinned against a full recount. */
  private[graft] def mergedListCounts(assign: DataFrame): DataFrame =
    assign.groupBy("cent_id").agg(count(lit(1)).as("n_vectors"))

  /** INDEX RETRACTION — FAISS `remove_ids` semantics, closing the
    * maintenance algebra [[mergedIndexOf]]'s add path opened: an
    * erasure-request id list anti-joins BOTH inverted-list frames
    * (assignment rows and PQ codes) as the broadcast small side —
    * O(index scan) with the ids pruning in the scan stage (a real
    * store flips per-list deletion bitmaps; the algebra is the same),
    * artifacts (quantizer, codebooks) untouched, list counts
    * decrement. A forgotten vector can never be RETURNED again —
    * `AnnForgetSpec` pins retracted-serve ≡ rebuilt-at-frozen-
    * artifacts-on-kept-corpus row-for-row, which is the compliance
    * guarantee as a hash match. */
  private[graft] def annIndexForgetOf(assign: DataFrame, codes: DataFrame,
      forgetIds: DataFrame): (DataFrame, DataFrame) =
    (assign.join(broadcast(forgetIds), Seq("vec_id"), "left_anti"),
      codes.join(broadcast(forgetIds), Seq("vec_id"), "left_anti"))

  /** Registered form: the full-corpus index (snapshot + delta at the
    * frozen even-half artifacts — exactly `q_ann_index_merge`'s merged
    * index) retracts the deterministic erasure list (vec_id ≡
    * ForgetRem mod ForgetMod, hitting both halves) and the standard
    * query set serves from the retracted lists. The oracle re-derives
    * the serve from a full re-encode at the SAME frozen artifacts with
    * the forgotten rows excluded from the lists, so the hash match IS
    * retracted ≡ rebuilt. Query vector 3 is itself forgotten —
    * querying WITH an erased vector stays legal, it just cannot be
    * found (`AnnForgetSpec` pins no forgotten id ever surfaces as a
    * neighbor). */
  def annIndexForgetServe(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    val cents = mergeCentsCached(spark, dir, e)
    val book = mergeBookCached(spark, dir, e)
    val (assign, codes) = mergedIndexOf(
      mergeSnapAssignCached(spark, dir, e),
      mergeSnapCodesCached(spark, dir, e),
      e.filter(col("vec_id") % 2 === 1), cents, book)
    val forget = e.filter(col("vec_id") % graft.operators.CorpusMerge.ForgetMod
        === graft.operators.CorpusMerge.ForgetRem)
      .select("vec_id")
    val (fa, fc) = annIndexForgetOf(assign, codes, forget)
    mergedServe(e, fa, fc, cents, book)
  }

  /** Self-contained forget arm over explicit frames — the suite hook
    * mirroring [[annIndexMergeServeOf]]. */
  private[graft] def annIndexForgetServeOf(full: DataFrame, snap: DataFrame,
      batch: DataFrame, forgetIds: DataFrame): DataFrame = {
    val cents = mergeCoarseCentsOf(snap)
    val book = pqCodebookOf(pqLongForm(snap), pqSeeds(snap), snap.select("vec_id"))
    val snapAssign = rankedAgainst(snap, cents)
      .filter(col("rnk") === 1).select("vec_id", "cent_id")
    val snapCodes = pqAssign(pqLongForm(snap), book)
      .select("vec_id", "sub", "code_id")
    val (assign, codes) = mergedIndexOf(snapAssign, snapCodes, batch, cents, book)
    val (fa, fc) = annIndexForgetOf(assign, codes, forgetIds)
    mergedServe(full, fa, fc, cents, book)
  }

  /** Scale-harness hooks: the snapshot's frozen artifacts and index
    * frames as EXPLICIT values so the harness can pin them (the
    * persisted-index stand-in) and time the merge arm without charging
    * it the snapshot build. */
  private[graft] def annMergeScaleFrames(snap: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val cents = mergeCoarseCentsOf(snap)
    val book = pqCodebookOf(pqLongForm(snap), pqSeeds(snap), snap.select("vec_id"))
    val snapAssign = rankedAgainst(snap, cents)
      .filter(col("rnk") === 1).select("vec_id", "cent_id")
    val snapCodes = pqAssign(pqLongForm(snap), book)
      .select("vec_id", "sub", "code_id")
    (cents, book, snapAssign, snapCodes)
  }

  private[graft] def annMergeServeWith(full: DataFrame, cents: DataFrame,
      book: DataFrame, snapAssign: DataFrame, snapCodes: DataFrame,
      batch: DataFrame): DataFrame = {
    val (assign, codes) = mergedIndexOf(snapAssign, snapCodes, batch, cents, book)
    mergedServe(full, assign, codes, cents, book)
  }

  /** The scale harness's forget arm over pinned artifacts: merge the
    * batch, retract the erasure list, serve — what the registered
    * query pays once the snapshot index is a persisted artifact. */
  private[graft] def annForgetServeWith(full: DataFrame, cents: DataFrame,
      book: DataFrame, snapAssign: DataFrame, snapCodes: DataFrame,
      batch: DataFrame, forgetIds: DataFrame): DataFrame = {
    val (assign, codes) = mergedIndexOf(snapAssign, snapCodes, batch, cents, book)
    val (fa, fc) = annIndexForgetOf(assign, codes, forgetIds)
    mergedServe(full, fa, fc, cents, book)
  }

  /** The frozen merge-index artifacts COLLECTED to driver-held dense
    * form — what a streaming ingest job broadcasts
    * ([[graft.streaming.AnnIngestStream]]): the coarse cells as raw
    * FLOAT vectors (cent_id → embedding, so the stream evaluates the
    * identical float→double cosine fold as [[rankedAgainst]]) and the
    * PQ codebook as (sub, code_id, ordered (dim, centroid) pairs).
    * Bounded by construction: [[IvfK]]×dims + [[PqM]]×[[PqK]]×(64/M)
    * rows — the "persist the index" step, like
    * [[trainedQuantizerArrays]]. */
  private[graft] def frozenMergeArtifacts(snap: DataFrame)
      : (Seq[(Long, Seq[Float])], Seq[(Int, Long, Seq[(Int, Double)])]) = {
    val cents = mergeCoarseCentsOf(snap).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq)
      .toSeq.sortBy(_._1)
    val book = pqCodebookOf(pqLongForm(snap), pqSeeds(snap), snap.select("vec_id")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .groupBy(r => (r._1, r._2))
      .map { case ((sub, code), rs) =>
        (sub, code, rs.sortBy(_._3).map(r => (r._3, r._4)).toSeq) }
      .toSeq.sortBy(r => (r._1, r._2))
    (cents, book)
  }

  /** PQ RECALL AUDIT — [[annRecall]]'s pattern applied to the
    * compressed-domain path: per query, how many of the exact squared-L2
    * top-3 the ADC top-3 recovers. This is the number that decides the
    * PQ geometry (M, K, iters) before a rollout: ADC error is bounded by
    * quantization distortion, so recall measured on a sample IS the
    * production acceptance test. Exact side ranks on the 6dp-rounded
    * fold-exact L2 with a neighbor tie-break (the library's cross-engine
    * ranking discipline); the ADC side is [[pqTopKOf]] verbatim, so the
    * audit measures the shipped plan, not a re-derivation. */
  def pqRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    val book = pqBookCached(spark, dir, e)
    val codes = pqCodesCached(spark, dir, e)
    val rot = opqRotCached(spark, dir, e)
    pqRecallFrames(e,
      pqServe(e, book, codes),
      adcRanked(ivfAdcRoutedPairsWith(e, IvfNProbe, book, codes)),
      ivfAdcResidualTopKOf(e, IvfNProbe),
      pqServe(rot, opqBookCached(spark, dir, e), opqCodesCached(spark, dir, e)))
  }

  def pqRecallOf(e: DataFrame): DataFrame =
    pqRecallFrames(e, pqTopKOf(e), ivfAdcTopKOf(e, IvfNProbe),
      ivfAdcResidualTopKOf(e, IvfNProbe), opqTopKOf(e))

  private def pqRecallFrames(e: DataFrame, flatAdc: DataFrame,
      routedAdc: DataFrame, residualAdc: DataFrame,
      opqAdc: DataFrame): DataFrame = {
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exactScored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        round(l2sq(col("q_emb"), col("embedding")), 6).as("d2"))
    val w = Window.partitionBy("q_id").orderBy(col("d2"), col("neighbor"))
    val exact3 = exactScored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3).select("q_id", "neighbor")
    // both compressed-domain serving paths, audited against the same
    // exact top-3: flat ADC (whole-corpus scan) and the IVF-routed
    // composition at the registered nprobe — the routed path's recall
    // can only lose candidates to routing, so pq_adc bounds it above
    def recallOf(method: String, approx: DataFrame): DataFrame = {
      val hits = exact3.join(approx.select("q_id", "neighbor"), Seq("q_id", "neighbor"))
        .groupBy("q_id").agg(count(lit(1)).as("hits"))
      q.select("q_id").join(hits, Seq("q_id"), "left")
        .select(lit(method).as("method"), col("q_id"),
          coalesce(col("hits"), lit(0L)).as("hits"),
          round(coalesce(col("hits"), lit(0L)) / 3.0, 4).as("recall"))
    }
    recallOf("pq_adc", flatAdc)
      .unionByName(recallOf(s"ivfadc_np$IvfNProbe", routedAdc))
      .unionByName(recallOf(s"ivfadc_res_np$IvfNProbe", residualAdc))
      .unionByName(recallOf("opq_adc", opqAdc))
      .orderBy("method", "q_id")
  }

  /** OPQ — Optimized Product Quantization (Ge et al., CVPR 2013;
    * FAISS's `OPQMatrix` pre-transform): apply a data-dependent
    * ORTHOGONAL rotation before PQ training so variance spreads across
    * the [[PqM]] subspaces instead of concentrating in a few. PQ
    * quantizes each subspace independently, so a dominant principal
    * direction trapped inside one subspace burns that subspace's
    * [[PqK]] codewords on it while the other M−1 codebooks never see
    * it; rotating the space first is the standard accuracy step
    * between plain PQ and IVFADC in production indexes.
    *
    * Full OPQ alternates PQ training with an SVD rotation update —
    * driver-side linear algebra this library deliberately avoids. The
    * rotation here is the single-reflection parametric variant the
    * relational engine can express EXACTLY: a Householder reflection
    * R = I − 2uuᵀ/uᵀu with u = w − ‖w‖·𝟙/√D, which maps the top
    * principal direction w ([[pcaPowerOf]]'s already-trained, 6dp-
    * rounded, cross-engine bit-stable loadings) onto the balanced
    * diagonal (1,…,1)/√D — the dominant eigendirection then
    * contributes equally to every subspace. A Householder matrix is
    * exactly orthogonal for ANY u ≠ 0 (the uᵀu division normalizes),
    * so pairwise L2 distances are preserved and the exact-L2 recall
    * reference needs no restatement in rotated space.
    *
    * Scale posture: training the rotation is [[pcaPowerOf]] (one
    * sampled scatter build); APPLYING it is one narrow corpus pass —
    * per vector, a D-length fold for s = uᵀv and a `zip_with` for
    * v − (2s/uᵀu)·u, both inside whole-stage codegen against a
    * broadcast 1-row (u_arr, uu) frame. No shuffle, no long-form
    * explosion: the rotation rides the same projection that reads the
    * vector. Every fold runs in array-index order (the
    * [[graft.functions.VectorFunctions.dot]] determinism discipline),
    * and rotated values round to 6dp so the downstream PQ chain sees
    * bit-identical inputs in both engines. */
  private[graft] def opqRotationRow(e: DataFrame): DataFrame = {
    val warr = pcaPowerOf(e)
      .agg(transform(array_sort(collect_list(struct(col("d"), col("loading")))),
        x => x.getField("loading")).as("w_arr"))
    val u = warr
      .select(col("w_arr"),
        sqrt(aggregate(col("w_arr"), lit(0.0), (a, x) => a + x * x)).as("nw"),
        size(col("w_arr")).cast("double").as("dims"))
      .select(transform(col("w_arr"),
        x => x - col("nw") / sqrt(col("dims"))).as("u_arr"))
    u.select(col("u_arr"),
      aggregate(col("u_arr"), lit(0.0), (a, x) => a + x * x).as("uu"))
  }

  /** The rotated corpus (vec_id, embedding): v′ = v − (2·uᵀv/uᵀu)·u,
    * every element 6dp-rounded. Queries and corpus rotate through the
    * same frame, so serving stays self-consistent. */
  private[graft] def opqRotatedOf(e: DataFrame): DataFrame =
    e.crossJoin(broadcast(opqRotationRow(e)))
      .withColumn("s", aggregate(
        zip_with(col("embedding"), col("u_arr"), (x, u) => x.cast("double") * u),
        lit(0.0), (a, x) => a + x))
      // uᵀu → 0 exactly when the top PC already IS the balanced diagonal
      // (u = w − ‖w‖·𝟙/√D vanishes); the correct rotation is then the
      // identity, not the 0/0 reflection — guard with f = 0
      .withColumn("f",
        when(col("uu") > lit(1e-12), lit(2.0) * col("s") / col("uu"))
          .otherwise(lit(0.0)))
      .select(col("vec_id"),
        zip_with(col("embedding"), col("u_arr"),
          (x, u) => round(x.cast("double") - u * col("f"), 6))
          .as("embedding"))

  /** OPQ end-to-end: rotate, then the plain-PQ chain VERBATIM
    * ([[pqTopKOf]] — training, encoding, and ADC serving all see only
    * the rotated frame, which is exactly what "PQ with a pre-rotation"
    * means; no OPQ-specific serving code can drift from the PQ path). */
  def opqTopKOf(e: DataFrame): DataFrame = pqTopKOf(opqRotatedOf(e))

  private def opqRotCached(spark: SparkSession, dir: String, e: DataFrame): DataFrame =
    Dedup.memoizedFrame(spark, s"ann_opqrot#$dir")(opqRotatedOf(e))

  private def opqBookCached(spark: SparkSession, dir: String, e: DataFrame): DataFrame =
    Dedup.memoizedFrame(spark, s"ann_opqbook#$dir")(
      pqCodebook(opqRotCached(spark, dir, e)))

  private def opqCodesCached(spark: SparkSession, dir: String, e: DataFrame): DataFrame =
    Dedup.memoizedFrame(spark, s"ann_opqcodes#$dir")(
      pqAssign(pqLongForm(opqRotCached(spark, dir, e)),
        opqBookCached(spark, dir, e)).select("vec_id", "sub", "code_id"))

  /** Cached-index OPQ serving: the rotated corpus, its codebook, and
    * its codes come from the persisted index frames; only the 10-query
    * LUT computes at serve time. */
  def opqTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    val rot = opqRotCached(spark, dir, e)
    pqServe(rot, opqBookCached(spark, dir, e), opqCodesCached(spark, dir, e))
  }

  /** Cosine threshold for [[semanticDedup]]: calibrated to this
    * synthetic corpus (within-cluster cosine tops out near 0.55; real
    * text embeddings run SemDeDup at 0.95+) — the threshold is the
    * policy dial, the PLAN is what transfers. */
  val SemTau = 0.40

  /** Mean cluster population the SemDeDup clustering targets — the
    * denominator of the K∝N dial. With K = ⌈N / SemCellTarget⌉ the
    * within-cluster pair volume Σ n_c² ≈ N·SemCellTarget stays LINEAR
    * in the corpus (the paper runs K ≈ 0.01%·N on LAION for the same
    * reason); a FIXED K makes it N²/K — measured 4.8× wall at 10× data
    * before this dial was wired (SCALE.md §semantic). */
  val SemCellTarget = 64L

  /** The SemDeDup cluster count for an N-vector corpus: K∝N with a
    * [[KmK]] floor, in INTEGER arithmetic (ceil-div) so the DuckDB
    * oracle recomputes the identical K from `count(*)` — no float
    * boundary can desync the clustering across engines. */
  def semDerivedK(n: Long): Int =
    math.max(KmK.toLong, (n + SemCellTarget - 1) / SemCellTarget).toInt

  /** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): where MinHash/SimHash catch lexical near-copies,
    * this catches semantically redundant pairs that share almost no
    * surface text — cluster the embedding space with the trained
    * k-means quantizer ([[kmeansTrainedCents]], the same frame the IVF
    * serving path routes against), then compare vectors ONLY within
    * their cluster and drop every vector with a τ-close LOWER-id
    * cluster-mate ([[SemTau]]).
    *
    * Survivor policy is the library's standard greedy pairwise rule —
    * drop the higher id of each τ-close pair, exactly
    * [[graft.operators.Dedup.dedupedCorpus]]'s near-dup convention
    * (chains resolve per-pair, not per-component; the text path ships
    * the cluster-correct and quality-policy variants, which compose
    * here unchanged). The paper's keep-farthest-from-centroid
    * tie-break is one `orderBy` swap away. Each dropped vector reports its best
    * witness — highest cosine, then lowest id — so the output doubles
    * as an audit trail of WHY each drop happened.
    *
    * Scale: the all-pairs comparison is confined to clusters — cost is
    * Σ n_c², and K is the dial that bounds it. K is DERIVED from the
    * corpus size ([[semDerivedK]]: K = max([[KmK]],
    * ⌈N/[[SemCellTarget]]⌉), the paper's K∝N regime — n_c stays
    * ~[[SemCellTarget]] regardless of corpus size, so pair work is
    * LINEAR in N), and the oracle recomputes the same K from
    * `count(*)` so both engines cluster identically. When the derived
    * K lands on [[KmK]] (small corpora) the persisted serving index's
    * quantizer is reused verbatim; otherwise the derived assignment is
    * its own memoized index artifact ([[semAssignment]], built with
    * the rest of the index in `build:ann_index`). Assignment is the
    * trained quantizer: one broadcast-join pass over the corpus. The
    * pair join is keyed on cent_id (co-partitioned, no cross product),
    * and the witness window partitions by the dropped vector —
    * `WindowGroupLimit` bounds it before the shuffle. */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    semanticDedupFromPairs(
      semanticClosePairsWith(e, semAssignment(spark, dir, e), SemTau))
  }

  /** The SemDeDup cluster assignment at the DERIVED K — the one
    * definition of "which cluster confines the pair search" shared by
    * [[semanticDedup]] and the hard-negative miners' exclusion sets.
    * Reuses the persisted [[KmK]]-cell serving quantizer when the
    * derived K coincides (no second training); otherwise trains and
    * memoizes the derived-K assignment as its own per-(session, dir)
    * index artifact. */
  /** Corpus count memoized per (session, dir) through the same frame
    * memo as the index artifacts: [[semAssignment]] derives K from it
    * on EVERY registered query construction, and without the memo each
    * build paid a corpus-count action even when the derived-K
    * assignment itself was already memoized — reading the 1-row cached
    * frame costs a row fetch, not a scan. */
  private def corpusCountCached(spark: SparkSession, dir: String,
      e: DataFrame): Long =
    Dedup.memoizedFrame(spark, s"ann_count#$dir")(
      e.agg(count(lit(1)).as("n"))).head().getLong(0)

  private[graft] def semAssignment(spark: SparkSession, dir: String,
      e: DataFrame): DataFrame = {
    val k = semDerivedK(corpusCountCached(spark, dir, e))
    if (k == KmK)
      kmRankedCached(spark, dir, e).filter(col("rnk") === 1)
        .select("vec_id", "cent_id")
    else Dedup.memoizedFrame(spark, s"ann_semassign#$dir")(
      // capped = false: K = ⌈N/SemCellTarget⌉ here, so the 256·K train
      // cap is ≥ 4N and the sample would be the whole population — skip
      // the global-sort + N-row-broadcast sampling join entirely
      kmeansAssignment(e, k, KmIters, capped = false).select("vec_id", "cent_id"))
  }

  /** [[semanticDedup]] over any (vec_id, embedding) frame, with the
    * cluster count / train length / threshold as explicit dials. */
  def semanticDedupOf(e: DataFrame, k: Int = KmK, iters: Int = KmIters,
      tau: Double = SemTau): DataFrame =
    semanticDedupFromPairs(semanticClosePairs(e, k, iters, tau))

  private def semanticDedupFromPairs(close: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(desc("cos"), asc("keep_id"))
    close.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("vec_id"), col("cent_id"), col("keep_id").as("dup_of"), col("cos"))
      .orderBy("vec_id")
  }

  /** The τ-close within-cluster pair frame (cent_id, vec_id, keep_id,
    * cos), keep_id < vec_id — [[semanticDedupOf]]'s candidate set,
    * shared with [[hardNegativesOf]] so "what counts as a semantic
    * duplicate" has exactly one definition. */
  private[graft] def semanticClosePairs(e: DataFrame, k: Int, iters: Int,
      tau: Double): DataFrame =
    semanticClosePairsWith(e, kmeansAssignment(e, k, iters), tau)

  /** [[semanticClosePairs]] over a PREBUILT assignment frame — the
    * cached-index path shares the quantizer with routing/serving. */
  private def semanticClosePairsWith(e: DataFrame, assignment: DataFrame,
      tau: Double): DataFrame = {
    val members = e.join(assignment.select("vec_id", "cent_id"), "vec_id")
    val a = members.select(col("cent_id"), col("vec_id").as("keep_id"),
      col("embedding").as("keep_emb"))
    val b = members.select(col("cent_id"), col("vec_id"), col("embedding"))
    a.join(b, "cent_id")
      .filter(col("keep_id") < col("vec_id"))
      .select(col("cent_id"), col("vec_id"), col("keep_id"),
        round(cosine(col("keep_emb"), col("embedding")), 6).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** HARD-NEGATIVE MINING for contrastive retriever training (the
    * DPR/ANCE recipe): per query vector, the top-3 corpus vectors by
    * cosine that are NOT the query's semantic duplicates. Duplicates
    * are [[semanticClosePairs]] — the SemDeDup τ-set, verbatim — since
    * serving a positive as a negative is the classic false-negative
    * poisoning of a contrastive loss; what survives is "near, but
    * genuinely different", exactly the gradient-rich band retriever
    * training wants. One brute-force scan scores candidates (the
    * honest baseline; IVF routing is the documented scale dial, as for
    * every ANN query here), the dup set is cluster-confined (Σ n_c²,
    * K-bounded), and the exclusion is one anti-join on the thin
    * symmetrized pair set. */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    hardNegativesFromPairs(e,
      semanticClosePairsWith(e, semAssignment(spark, dir, e), SemTau))
  }

  /** Eval-set selector for [[semanticDecontaminate]]: every 50th
    * vec_id BELOW [[EvalIdCap]] — a FIXED-cardinality benchmark
    * stand-in (10 vectors at every shipped SF, since all test dirs
    * hold ≥ 500 vectors). The cap is what keeps the scale claim
    * honest: a benchmark is a constant-size artifact, so the eval side
    * must not grow with the corpus — without the cap the %-only
    * selector made the broadcast AND the screen O(|corpus|²/50). */
  val EvalIdCap = 500L

  /** SEMANTIC DECONTAMINATION — the embedding-space sibling of the
    * n-gram screen (`TextAnalysis.decontaminate`): flag corpus vectors
    * τ-close to any EVAL-set vector, catching paraphrased contamination
    * that shares no 8-gram with the benchmark (the reason modern
    * decontamination runs both screens). The eval set (every 50th
    * vector below [[EvalIdCap]] — the deterministic FIXED-cardinality
    * stand-in for a benchmark table) is SMALL by construction, so the
    * scale shape is one broadcast of the eval side and a single narrow
    * corpus scan — no shuffle at all, in contrast to the gram screen's
    * membership join; each flagged vector reports its worst (max-cos,
    * then min-id) eval witness, the audit row a removal decision
    * cites. */
  def semanticDecontaminate(spark: SparkSession, dir: String): DataFrame =
    semanticDecontaminateOf(Tables.fanOut(Tables.embeddings(spark, dir)))

  def semanticDecontaminateOf(e: DataFrame): DataFrame = {
    val isEval = col("vec_id") % 50 === 0 && col("vec_id") < EvalIdCap
    val eval = e.filter(isEval)
      .select(col("vec_id").as("eval_id"), col("embedding").as("eval_emb"))
    val w = Window.partitionBy("vec_id").orderBy(desc("cos"), asc("eval_id"))
    e.filter(!isEval)
      .crossJoin(broadcast(eval))
      .select(col("vec_id"), col("eval_id"),
        round(cosine(col("embedding"), col("eval_emb")), 6).as("cos"))
      .filter(col("cos") >= SemTau)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select("vec_id", "eval_id", "cos")
      .orderBy("vec_id")
  }

  def hardNegativesOf(e: DataFrame): DataFrame =
    hardNegativesFromPairs(e,
      semanticClosePairs(e, semDerivedK(e.count()), KmIters, SemTau))

  private def hardNegativesFromPairs(e: DataFrame, close: DataFrame): DataFrame = {
    val dups = close.select(col("keep_id").as("q_id"), col("vec_id").as("neighbor"))
      .unionByName(close.select(col("vec_id").as("q_id"), col("keep_id").as("neighbor")))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos"))
    val negs = scored.join(dups, Seq("q_id", "neighbor"), "left_anti")
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor"))
    negs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("q_id", "rank", "neighbor", "cos")
      .orderBy("q_id", "rank")
  }

  /** ADC shortlist size for the routed miner's exact re-rank: 10× the
    * final k (FAISS IndexRefineFlat's k_factor ballpark). Measured on
    * the planted geometry: top-3 overlap with the brute-force arm is
    * 26/30 (sf0.001) and 22/30 (sf0.01) here, vs 13/16 at 3×k and a
    * 28/26 routing-only ceiling — the dial trades a constant per-query
    * refine cost for shortlist recall, and 10× sits at the knee. */
  val HnShortlist = 30

  /** Per-query inner-product ADC lookup table (q_id, sub, code_id,
    * sub_ip) — [[pqLut]]'s sibling for METRIC_INNER_PRODUCT: the exact
    * dot of every (un-quantized) query subvector with every codeword,
    * so Σ_m sub_ip approximates dot(q, x) from the candidate's codes
    * alone. Nq×[[PqM]]×[[PqK]] rows, broadcast to the routed scan. */
  private def pqIpLut(e: DataFrame, book: DataFrame): DataFrame =
    pqLongForm(e.filter(col("vec_id") < NQueries))
      .withColumnRenamed("vec_id", "q_id").withColumnRenamed("v", "qv")
      .join(broadcast(book), Seq("sub", "d"))
      .groupBy("q_id", "sub", "code_id")
      .agg(sum(col("qv") * col("c")).as("sub_ip"))

  /** INDEX-SERVED hard-negative mining — [[hardNegativesOf]]'s recipe
    * at its production workload shape (the ANCE insight: mining runs
    * once per TRAINING QUERY, millions of them, so negatives must come
    * from the ANN index, not a corpus scan). Composition, verbatim
    * from the shipped chains:
    *
    *  1. ROUTE — each query scores only its nprobe nearest coarse
    *     cells' PQ codes ([[routedPqCodes]], the `q_ann_ivfadc`
    *     routing join: probe list keyed on cent_id, broadcast). The
    *     router is the TRAINED k-means quantizer — the exact frame
    *     that defines the SemDeDup dup clusters, so one persisted
    *     index serves both the exclusion set and the candidate lists;
    *     the suite pins the trained router at ~3× the seeded router's
    *     recall, which is what makes the mined set usable.
    *  2. SCORE — compressed-domain approximated COSINE: inner-product
    *     ADC ([[pqIpLut]]) over the candidate's codes, divided by the
    *     exact norms the index stores per vector (the FAISS
    *     METRIC_INNER_PRODUCT recipe; one stored float per vector is
    *     what makes cosine servable from codes). The miner's metric
    *     must match the trainer's (cosine) — scoring routed codes
    *     with L2 ADC ranks a different quantity and the mined
    *     negatives stop being the near-but-different band.
    *  3. EXCLUDE — the SemDeDup τ-pair set ([[semanticClosePairs]],
    *     the one definition of "semantic duplicate" in this library)
    *     anti-joins out BEFORE every cut, so an excluded positive
    *     promotes the next-best candidate.
    *  4. REFINE — the top-[[HnShortlist]] ADC survivors per query
    *     re-rank on exact cosine (IndexRefineFlat): per query that is
    *     a constant number of exact scorings against the shortlist
    *     ids, an equi-join on vec_id — NOT a corpus scan.
    *
    * Scale shape vs the brute-force arm: the corpus-sized stage is one
    * equi-join of the persisted PQ codes against a broadcast probe
    * list — per query the work is nprobe inverted lists plus
    * [[HnShortlist]] exact scorings, not |corpus|, and nothing
    * requires the query side to broadcast against raw vectors.
    * Candidate quality is pinned in the suite: top-3 overlap vs the
    * brute-force arm on the planted geometry (the
    * `q_ann_kmeans_routed` recall-pinning pattern). */
  def hardNegativesRouted(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    hardNegativesRoutedWith(e, kmRankedCached(spark, dir, e),
      semanticClosePairsWith(e, semAssignment(spark, dir, e), SemTau),
      pqBookCached(spark, dir, e), pqCodesCached(spark, dir, e),
      IvfNProbe, HnShortlist)
  }

  /** Scale-harness diagnostic: the number of (query, candidate) pairs
    * each mining arm SCORES — the quantity whose growth separates the
    * brute-force recipe (Nq × corpus, always) from the routed one
    * (Σ probed-cell sizes; with K ∝ N, per-query work is flat). */
  private[graft] def minedCandidateVolumes(e: DataFrame, nprobe: Int): (Long, Long) = {
    val n = e.count()
    val ranked = kmeansRankedL2(kmeansLongForm(e), kmeansTrainedCents(e, KmK, KmIters))
    val assign = ranked.filter(col("rnk") === 1).select("vec_id", "cent_id")
    val probes = ranked
      .filter(col("vec_id") < NQueries && col("rnk") <= nprobe)
      .select(col("vec_id").as("q_id"), col("cent_id"))
    val routed = assign.join(probes, "cent_id")
      .filter(col("vec_id") =!= col("q_id")).count()
    (NQueries * (n - 1), routed)
  }

  def hardNegativesRoutedOf(e: DataFrame, nprobe: Int,
      shortlist: Int = HnShortlist): DataFrame = {
    val book = pqCodebook(e)
    hardNegativesRoutedWith(e,
      kmeansRankedL2(kmeansLongForm(e), kmeansTrainedCents(e, KmK, KmIters)),
      semanticClosePairs(e, semDerivedK(e.count()), KmIters, SemTau),
      book, pqAssign(pqLongForm(e), book).select("vec_id", "sub", "code_id"),
      nprobe, shortlist)
  }

  /** The routed miner over PREBUILT index frames — the cached-index
    * path ([[hardNegativesRouted]]) and the self-contained
    * [[hardNegativesRoutedOf]] share this body. `ranked` (the
    * [[KmK]]-cell serving quantizer) does the ROUTING; `close` (the
    * derived-K SemDeDup τ-pair set) is the exclusion — two different
    * index artifacts on purpose: nlist is a serving parameter, the dup
    * definition is the K∝N dial. */
  private def hardNegativesRoutedWith(e: DataFrame, ranked: DataFrame,
      close: DataFrame, book: DataFrame, codes: DataFrame,
      nprobe: Int, shortlist: Int): DataFrame = {
    val dups = close.select(col("keep_id").as("q_id"), col("vec_id").as("neighbor"))
      .unionByName(close.select(col("vec_id").as("q_id"), col("keep_id").as("neighbor")))
    // the index-side norms: stored exactly, one float per vector
    val nrms = e.select(col("vec_id"), norm(col("embedding")).as("nrm"))
    val qn = nrms.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("nrm").as("q_nrm"))
    val routed = routedPqCodes(ranked, nprobe, codes)
    val ip = routed.join(broadcast(pqIpLut(e, book)), Seq("q_id", "sub", "code_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id").as("neighbor"))
      .agg(sum("sub_ip").as("ip"))
    val acos = ip
      .join(nrms.withColumnRenamed("vec_id", "neighbor").withColumnRenamed("nrm", "n_nrm"),
        "neighbor")
      .join(broadcast(qn), "q_id")
      .select(col("q_id"), col("neighbor"),
        round(col("ip") / (col("q_nrm") * col("n_nrm")), 6).as("acos"))
    val negs = acos.join(dups, Seq("q_id", "neighbor"), "left_anti")
    val ws = Window.partitionBy("q_id").orderBy(desc("acos"), asc("neighbor"))
    val short = negs.withColumn("srnk", row_number().over(ws))
      .filter(col("srnk") <= shortlist)
      .select("q_id", "neighbor")
    // refine: exact cosine over the Nq×shortlist id list only
    val qv = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val exact = short
      .join(e.select(col("vec_id").as("neighbor"), col("embedding").as("n_emb")), "neighbor")
      .join(broadcast(qv), "q_id")
      .select(col("q_id"), col("neighbor"),
        round(cosine(col("q_emb"), col("n_emb")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor"))
    exact.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("q_id", "rank", "neighbor", "cos")
      .orderBy("q_id", "rank")
  }

  /** HARDEST-NEGATIVE TRIPLET MINING (Schroff et al., FaceNet 2015 —
    * the metric-learning data op): per anchor (the [[NQueries]] probe
    * vectors), positive = nearest SAME-label vector, negative = nearest
    * DIFFERENT-label vector (the "nearest miss"), and the triplet
    * margin cos_pos − cos_neg — negative margins are exactly the
    * violating triplets a triplet loss trains on. Complements
    * [[hardNegatives]]: that op excludes SEMANTIC duplicates under the
    * unsupervised τ-pair set; this one uses the label column as
    * supervision, the contrastive-training labeled regime.
    *
    * Scale: one broadcast of the anchor set over a single narrow corpus
    * scan (the [[bruteForceTopK]] shape — the honest baseline; IVF
    * routing is the documented scale dial for corpus-sized anchor
    * sets), then two `WindowGroupLimit`-bounded argmaxes per anchor.
    * Cosines 6dp-rounded with vec_id tiebreaks; the margin subtracts
    * two identical-by-construction doubles, so both engines emit the
    * same triplets and margins. */
  def tripletMine(spark: SparkSession, dir: String): DataFrame =
    tripletMineOf(Tables.fanOut(Tables.embeddings(spark, dir)))

  /** [[tripletMine]] over any (vec_id, embedding, label) frame. */
  def tripletMineOf(e: DataFrame): DataFrame = {
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("vec_id"))
    def top1(df: DataFrame, id: String, c: String) =
      df.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
        .select(col("q_id"), col("vec_id").as(id), col("cos").as(c))
    top1(scored.filter(col("label") === col("q_label")), "positive", "cos_pos")
      .join(top1(scored.filter(col("label") =!= col("q_label")),
        "negative", "cos_neg"), "q_id")
      .select(col("q_id"), col("positive"), col("cos_pos"),
        col("negative"), col("cos_neg"),
        round(col("cos_pos") - col("cos_neg"), 6).as("margin"))
      .orderBy("q_id")
  }

  /** Centers selected by [[kcenterSelect]]. */
  val KCenterK = 8

  /** K-CENTER GREEDY coreset selection (Gonzalez 1985 farthest-first —
    * the 2-approximation for metric k-center, and the coreset recipe
    * of Sener & Savarese, ICLR 2018): seed with the smallest vec_id,
    * then repeatedly pick the point FARTHEST from the selected set.
    * This is the diversity-sampling primitive of training-data work —
    * the selected K points cover the embedding space with the smallest
    * achievable radius (within 2×), where uniform sampling oversamples
    * dense clusters.
    *
    * Relational shape: the per-point nearest-selected-center distance
    * is INCREMENTAL state — (vec_id, embedding, min_d2), materialized
    * per round (CC/PageRank discipline) and updated by one broadcast of
    * the single new center + a row-local `least` — NO shuffle in the
    * update at all; the only shuffle-shaped op per round is the 1-row
    * TakeOrdered argmax. Total cost: K narrow corpus passes, driver
    * state = K rows. Distances are 6dp-rounded fold-exact squared L2
    * (the cross-engine ranking discipline), ties broken by vec_id, so
    * both engines select the identical center sequence.
    *
    * Output (round, vec_id, radius): radius is the chosen point's
    * distance² to the previously-selected set — the coverage-radius
    * sequence, non-increasing by construction (suite-pinned); the seed
    * row carries 0.0 by convention.
    *
    * DIAL: this sequential form pays K−1 driver round-trips — the
    * latency axis, fine at small K (the registered K=8) and exact.
    * At PRODUCTION K (hundreds-plus coreset centers) the DEFAULT is
    * [[kcenterSelectBatch]]: ⌈K/T⌉ passes at T=16 with the β=1/4
    * separation filter — SCALE.md §kcenterprod measures K=128 at 8
    * batch passes vs 127 sequential round-trips on the same corpus. */
  def kcenterSelect(spark: SparkSession, dir: String): DataFrame =
    kcenterSelectOf(Tables.fanOut(Tables.embeddings(spark, dir)), KCenterK)

  /** Plan-audit hook: one PRUNED round's dataflow — the cell-guarded
    * min-distance update followed by the active-cell stats refresh
    * (the registered query is a driver-assembled loop; the global
    * argmax itself is a driver-side fold over the collected per-cell
    * stats, so no corpus-scan argmax appears in the plan at all). */
  private[graft] def kcenterRoundPlan(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    val assign = semAssignment(spark, dir, e).withColumnRenamed("cent_id", "cell")
    val seedEmb = e.select("vec_id", "embedding").orderBy("vec_id").limit(1)
      .collect()(0).getSeq[Float](1)
    val state = e.select("vec_id", "embedding")
      .join(assign, Seq("vec_id"), "left")
      .select(col("vec_id"), col("embedding"),
        coalesce(col("cell"), lit(-1L)).as("cell"),
        round(l2sq(col("embedding"), typedLit(seedEmb)), 6).as("min_d2"))
    // a representative round: cells 0/1 active, the rest triangle-skipped
    val active = Seq(0L, 1L)
    val upd = least(col("min_d2"),
      round(l2sq(col("embedding"), typedLit(seedEmb)), 6))
    state
      .withColumn("min_d2",
        when(col("cell").isin(active: _*), upd).otherwise(col("min_d2")))
      .filter(col("cell").isin(active: _*))
      .groupBy("cell")
      .agg(max(col("min_d2")).as("mx"),
        max_by(struct(col("vec_id"), col("embedding")),
          struct(col("min_d2"), (-col("vec_id")).as("nv"))).as("arg"))
  }

  /** Candidates collected per pass of [[kcenterSelectBatch]] — T=16
    * since round 10: with [[KCenterBatchPasses]] passes the registered
    * batch arm is the PRODUCTION serving default at K ≥ 32 (up to
    * 1 + T·passes = 33 centers from 2 corpus passes), per the round-9
    * directive; the sequential arm stays the exact small-K form. */
  val KCenterBatchT = 16

  /** Passes of [[kcenterSelectBatch]] — total driver round-trips, the
    * axis the batch variant saves (vs K round-trips for sequential
    * Gonzalez). */
  val KCenterBatchPasses = 2

  /** BATCH farthest-first k-center — [[kcenterSelect]]'s over-sampled
    * form, the standard fix for Gonzalez's K sequential driver
    * round-trips at production K (thousands of coreset centers): each
    * pass collects the [[KCenterBatchT]] farthest candidates in ONE
    * job, then admits them greedily ON THE DRIVER — candidate i is
    * admitted iff its (6dp-rounded) squared distance to the selected
    * set AND to every center admitted earlier in the same pass is
    * ≥ r_pass/4, where r_pass is the pass's farthest distance (the
    * β = 1/4 separation rule of over-sampling k-center/k-means||;
    * β exact in binary, so both engines compare identical doubles).
    * Round-trips drop K → K/T while each pass stays one narrow
    * corpus job; the spatial filter is what blind top-T lacks — T
    * co-located frontier points would all be "farthest" yet cover
    * nothing new (Bahmani et al. 2012 oversample-then-filter shape).
    *
    * Output (round, vec_id, radius): round 0 is the seed; each
    * admitted center reports its effective distance² to everything
    * selected before it. The admitted count per pass is
    * data-dependent (≤ T) — the honest batch contract; callers wanting
    * exactly K run ⌈K/T⌉+ passes and cut. Ordered by (round, vec_id)
    * — within a pass admission order is by frontier rank, not radius,
    * so vec_id is the deterministic tiebreak. */
  def kcenterSelectBatch(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    kcenterSelectBatchOf(e, KCenterBatchT, KCenterBatchPasses,
      assign = Some(semAssignment(spark, dir, e).withColumnRenamed("cent_id", "cell")),
      geo = Some(kcenterGeoCached(spark, dir, e)))
  }

  private[graft] def kcenterSelectBatchOf(e0: DataFrame, t: Int,
      passes: Int, assign: Option[DataFrame] = None,
      geo: Option[DataFrame] = None,
      telemetry: Option[scala.collection.mutable.ArrayBuffer[KcenterRoundPrune]] = None)
      : DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    val seedRow = e0.agg(min("vec_id")).collect()(0)
    if (seedRow.isNullAt(0))
      return Seq.empty[(Long, Long, Double)].toDF("round", "vec_id", "radius")
    // driver-side twins of the column kernels: same left-fold order,
    // same HALF_UP 6dp rounding, so admission compares the exact
    // doubles the oracle recomputes
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def l2d(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1
      }
      acc
    }
    // optional triangle-bound prune through the quantizer cells — the
    // same conservative test as [[kcenterSelectPrunedOf]], applied per
    // admitted center against the cell maxes collected BEFORE the
    // pass's update (stored min_d2 only shrinks inside a pass, so the
    // pre-pass max keeps the test conservative for later centers too)
    val pruning = assign.isDefined && geo.isDefined
    val geoMap: Map[Long, (Array[Double], Double, Long)] =
      if (pruning) geo.get.collect().map(r => r.getLong(0) ->
        ((r.getSeq[Double](1).toArray, r.getDouble(2), r.getLong(3)))).toMap
      else Map.empty
    def l2dd(a: Array[Double], b: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }
    val ckDir = Dedup.confCheckpointDir(spark)
    Dedup.withCheckpointDir(spark, ckDir) {
      def mat(df: DataFrame) = Dedup.materializeOwned(df, ckDir.isDefined)
      val e = e0.select("vec_id", "embedding")
      val seedId = seedRow.getLong(0)
      val seedEmb = e.filter(col("vec_id") === seedId)
        .select(col("embedding").as("c_emb"))
      val withCell =
        if (pruning)
          e.join(assign.get, Seq("vec_id"), "left")
            .select(col("vec_id"), col("embedding"),
              coalesce(col("cell"), lit(-1L)).as("cell"))
        else e.withColumn("cell", lit(-1L))
      var (state, stateRdd) = mat(
        withCell.crossJoin(broadcast(seedEmb))
          .select(col("vec_id"), col("embedding"), col("cell"),
            round(l2sq(col("embedding"), col("c_emb")), 6).as("min_d2")))
      val sel = scala.collection.mutable.ArrayBuffer((0L, seedId, 0.0))
      (1 to passes).foreach { p =>
        val cellMax: Map[Long, Double] =
          if (pruning)
            state.groupBy("cell").agg(max("min_d2").as("mx")).collect()
              .map(r => r.getLong(0) -> r.getDouble(1)).toMap
          else Map.empty
        val cands = state.orderBy(desc("min_d2"), asc("vec_id"))
          .limit(t).select("vec_id", "embedding", "min_d2").collect()
        if (cands.nonEmpty) {
          val thr = cands.head.getDouble(2) / 4
          val admitted =
            scala.collection.mutable.ArrayBuffer[(Long, Seq[Float], Double)]()
          cands.foreach { c =>
            val emb = c.getSeq[Float](1)
            val eff = admitted.foldLeft(c.getDouble(2)) { (m, a) =>
              math.min(m, round6(l2d(emb, a._2))) }
            if (eff >= thr) admitted += ((c.getLong(0), emb, eff))
          }
          sel ++= admitted.map(a => (p.toLong, a._1, a._3))
          // the LAST pass's admissions are final — nobody reads the
          // post-update state, so don't pay a corpus pass producing it
          if (p < passes) {
          val (next, nextRdd) = mat(admitted.foldLeft(state) { (s, a) =>
            val upd = least(col("min_d2"),
              round(l2sq(col("embedding"), typedLit(a._2)), 6))
            if (!pruning) s.withColumn("min_d2", upd)
            else {
              val active = cellMax.keys.filter { cell =>
                geoMap.get(cell) match {
                  case Some((cent, r, _)) =>
                    val lb = math.max(0.0, math.sqrt(l2dd(cent, a._2)) - r)
                    lb * lb < cellMax(cell) + KcPruneEps
                  case None => true
                }
              }.toSeq.sorted
              telemetry.foreach { buf =>
                val act = active.toSet
                val (ra, rs) = cellMax.keys.foldLeft((0L, 0L)) {
                  case ((x, y), cell) =>
                    val n = geoMap.get(cell).map(_._3).getOrElse(0L)
                    if (act(cell)) (x + n, y) else (x, y + n)
                }
                buf += KcenterRoundPrune(p.toLong, active.size,
                  cellMax.size - active.size, ra, rs)
              }
              if (active.size == cellMax.size) s.withColumn("min_d2", upd)
              else s.withColumn("min_d2",
                when(col("cell").isin(active: _*), upd).otherwise(col("min_d2")))
            }
          })
          Dedup.retire(spark, stateRdd)
          state = next; stateRdd = nextRdd
          }
        }
      }
      Dedup.retire(spark, stateRdd)
      sel.toSeq.toDF("round", "vec_id", "radius").orderBy("round", "vec_id")
    }
  }

  private[graft] def kcenterSelectOf(e0: DataFrame, k: Int): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    // empty input: no centers to select — an empty selection frame, not
    // an opaque NPE out of the null min() aggregate
    val seedRow = e0.agg(min("vec_id")).collect()(0)
    if (seedRow.isNullAt(0))
      return Seq.empty[(Long, Long, Double)].toDF("round", "vec_id", "radius")
    val ckDir = Dedup.confCheckpointDir(spark)
    Dedup.withCheckpointDir(spark, ckDir) {
      def mat(df: DataFrame) = Dedup.materializeOwned(df, ckDir.isDefined)
      val e = e0.select("vec_id", "embedding")
      val seedId = seedRow.getLong(0)
      def centerEmb(id: Long) = e.filter(col("vec_id") === id)
        .select(col("embedding").as("c_emb"))
      var (state, stateRdd) = mat(
        e.crossJoin(broadcast(centerEmb(seedId)))
          .select(col("vec_id"), col("embedding"),
            round(l2sq(col("embedding"), col("c_emb")), 6).as("min_d2")))
      val sel = scala.collection.mutable.ArrayBuffer((1L, seedId, 0.0))
      (2 to k).foreach { i =>
        val r = state.orderBy(desc("min_d2"), asc("vec_id")).limit(1).collect()(0)
        sel += ((i.toLong, r.getLong(0), r.getDouble(2)))
        val (next, nextRdd) = mat(
          state.crossJoin(broadcast(centerEmb(r.getLong(0))))
            .select(col("vec_id"), col("embedding"),
              least(col("min_d2"),
                round(l2sq(col("embedding"), col("c_emb")), 6)).as("min_d2")))
        Dedup.retire(spark, stateRdd)
        state = next; stateRdd = nextRdd
      }
      Dedup.retire(spark, stateRdd)
      sel.toSeq.toDF("round", "vec_id", "radius").orderBy("round")
    }
  }

  // ---- IVF-cell-pruned farthest-first (the round-9 perf-weak fix) ----
  //
  // Both k-center arms above pay a full-corpus min-distance pass per
  // round/pass — linear-in-N each time, the round-9 scale-killer (9.9×
  // wall at 10× data). The FAISS-style fix: route the update through
  // the operator's own trained coarse quantizer. For a cell with
  // centroid μ and member radius R (max distance of any member to μ),
  // the triangle inequality lower-bounds every member's distance to a
  // new center c: d(x, c) ≥ d(μ, c) − R. If that bound squared already
  // exceeds the cell's LARGEST stored min-distance, no member's
  // min_d2 can improve — the whole cell skips the round: no distance
  // arithmetic, no stats refresh, and (because per-cell argmax state
  // lives on the driver) no participation in the argmax either. The
  // prune is exactness-preserving: a 1e-6 margin dominates the 6dp
  // HALF_UP rounding grid (a stored min_d2 understates the true value
  // by at most 5e-7, a rounded candidate distance likewise), so the
  // pruned arm selects the bit-identical center sequence as exact
  // Gonzalez — suite-pinned across random geometries and oracle-pinned
  // by the SAME unrolled CTE chain as the exact arm.

  /** Safety margin dominating the 6dp rounding grid (±5e-7 on each of
    * the two compared quantities) plus double fp noise. */
  private val KcPruneEps = 1e-6

  /** Per-round prune telemetry: how many quantizer cells (and corpus
    * rows) the triangle-inequality bound excused from the update. */
  final case class KcenterRoundPrune(round: Long, cellsActive: Int,
    cellsSkipped: Int, rowsActive: Long, rowsSkipped: Long)

  /** Per-cell geometry of a coarse-quantizer assignment — (cell,
    * cent_emb, radius, n_members) where cent_emb is the MEMBER MEAN
    * (any (μ, R) pair with R ≥ max member distance is a valid prune
    * witness; the member mean gives the tightest R for the cells we
    * actually have) and radius is inflated by [[KcPruneEps]] so
    * float→double noise in the assignment distances can never make it
    * understate. Two bounded passes: one long-form groupBy for the
    * means, one row-local distance + per-cell max. */
  private[graft] def cellGeometryOf(e: DataFrame, assign: DataFrame): DataFrame = {
    val withCell = e.join(assign, "vec_id").select("vec_id", "embedding", "cell")
    val centsLong = withCell
      .select(col("cell"), posexplode(col("embedding")))
      .select(col("cell"), col("pos").as("d"), col("col").cast("double").as("v"))
      .groupBy("cell", "d").agg(avg("v").as("c"))
    val cents = centsLong
      .groupBy("cell")
      .agg(transform(sort_array(collect_list(struct(col("d"), col("c")))),
        s => s.getField("c")).as("cent_emb"))
    withCell.join(cents, "cell")
      .groupBy("cell")
      .agg((max(sqrt(l2sq(col("embedding"), col("cent_emb")))) + lit(KcPruneEps))
          .as("radius"),
        count(lit(1)).as("n_members"))
      .join(cents, "cell")
      .select("cell", "cent_emb", "radius", "n_members")
  }

  /** The registered pruned arm's quantizer geometry, memoized per
    * (session, corpus snapshot) like every other ANN index artifact
    * (built once, charged to Bench's `build:ann_index` row). Cells are
    * [[semAssignment]]'s — K ∝ N at ~[[SemCellTarget]] members/cell, so
    * the prune gets FINER as the corpus grows, which is what keeps the
    * per-round active set bounded at scale. */
  private[graft] def kcenterGeoCached(spark: SparkSession, dir: String,
      e: DataFrame): DataFrame =
    Dedup.memoizedFrame(spark, s"kcenter_geo#$dir")(
      cellGeometryOf(e,
        semAssignment(spark, dir, e).withColumnRenamed("cent_id", "cell")))

  /** PRUNED sequential farthest-first — [[kcenterSelectOf]]'s exact
    * output (bit-identical center sequence, see the block comment) at a
    * fraction of the per-round work:
    *
    *  - per-cell argmax state (max min_d2 + its row) lives on the
    *    DRIVER, refreshed only for cells a round actually updated — the
    *    global argmax is a driver-side fold over ≤K cell entries, so
    *    the per-round `TakeOrdered` corpus scan of the exact arm is
    *    gone entirely;
    *  - the min-distance update guards each cell behind the triangle
    *    bound: skipped cells flow through the plan untouched (the
    *    `when` short-circuits before any 64-dim fold);
    *  - state is materialized once and re-materialized every
    *    `matEvery` rounds (lineage stays bounded for production K) —
    *    NOT per round: the exact arm's per-round checkpoint write was
    *    the other linear-in-N cost with nothing to amortize it.
    *
    * `assign` maps vec_id → cell (any total assignment works; rows
    * missing from it fall into cell −1, which is never pruned);
    * `geo` is [[cellGeometryOf]] over the same assignment. `telemetry`
    * collects per-round prune counts for the scale harness. */
  private[graft] def kcenterSelectPrunedOf(e0: DataFrame, k: Int,
      assign: DataFrame, geo: DataFrame, matEvery: Int = 4,
      telemetry: Option[scala.collection.mutable.ArrayBuffer[KcenterRoundPrune]] = None)
      : DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    val seedRows = e0.select("vec_id", "embedding").orderBy("vec_id").limit(1).collect()
    if (seedRows.isEmpty)
      return Seq.empty[(Long, Long, Double)].toDF("round", "vec_id", "radius")
    val seedId = seedRows(0).getLong(0)
    val seedEmb = seedRows(0).getSeq[Float](1)
    // driver-held geometry: cell → (centroid, radius); member counts
    // feed telemetry only
    val geoMap = geo.collect().map(r => r.getLong(0) ->
      ((r.getSeq[Double](1).toArray, r.getDouble(2), r.getLong(3)))).toMap
    def l2dd(a: Array[Double], b: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }
    val ckDir = Dedup.confCheckpointDir(spark)
    Dedup.withCheckpointDir(spark, ckDir) {
      def mat(df: DataFrame) = Dedup.materializeOwned(df, ckDir.isDefined)
      var (state, stateRdd) = mat(
        e0.select("vec_id", "embedding")
          .join(assign, Seq("vec_id"), "left")
          .select(col("vec_id"), col("embedding"),
            coalesce(col("cell"), lit(-1L)).as("cell"),
            round(l2sq(col("embedding"), typedLit(seedEmb)), 6).as("min_d2")))
      var layers = 0
      // cell → (max min_d2, argmax vec_id, argmax embedding): the
      // driver-side argmax index. max_by's ordering struct replays the
      // exact arm's (min_d2 DESC, vec_id ASC) tie-break per cell.
      def statsOf(df: DataFrame): Map[Long, (Double, Long, Seq[Float])] =
        df.groupBy("cell")
          .agg(max(col("min_d2")).as("mx"),
            max_by(struct(col("vec_id"), col("embedding")),
              struct(col("min_d2"), (-col("vec_id")).as("nv"))).as("arg"))
          .collect()
          .map { r =>
            val a = r.getStruct(2)
            r.getLong(0) -> ((r.getDouble(1), a.getLong(0), a.getSeq[Float](1)))
          }.toMap
      var stats = statsOf(state)
      val sel = scala.collection.mutable.ArrayBuffer((1L, seedId, 0.0))
      (2 to k).foreach { i =>
        // global argmax from the per-cell index — no corpus scan
        val (_, (mx, vid, cEmb)) = stats.minBy { case (_, (m, v, _)) => (-m, v) }
        sel += ((i.toLong, vid, mx))
        // triangle-bound skip test per cell, conservative by KcPruneEps
        val active = stats.keys.filter { cell =>
          geoMap.get(cell) match {
            case Some((cent, r, _)) =>
              val lb = math.max(0.0, math.sqrt(l2dd(cent, cEmb)) - r)
              lb * lb < stats(cell)._1 + KcPruneEps
            case None => true
          }
        }.toSeq.sorted
        telemetry.foreach { buf =>
          val act = active.toSet
          val (ra, rs) = stats.keys.foldLeft((0L, 0L)) { case ((a, s), cell) =>
            val n = geoMap.get(cell).map(_._3).getOrElse(0L)
            if (act(cell)) (a + n, s) else (a, s + n)
          }
          buf += KcenterRoundPrune(i.toLong, active.size,
            stats.size - active.size, ra, rs)
        }
        val upd = least(col("min_d2"),
          round(l2sq(col("embedding"), typedLit(cEmb)), 6))
        state = state.withColumn("min_d2",
          if (active.size == stats.size) upd
          else when(col("cell").isin(active: _*), upd).otherwise(col("min_d2")))
        layers += 1
        if (layers >= matEvery && i < k) {
          val (next, nextRdd) = mat(state)
          Dedup.retire(spark, stateRdd)
          state = next; stateRdd = nextRdd; layers = 0
        }
        // refresh the argmax index for touched cells only (filter
        // pushes below the chained projections to the materialized scan)
        if (i < k)
          stats = stats ++ statsOf(state.filter(col("cell").isin(active: _*)))
      }
      Dedup.retire(spark, stateRdd)
      sel.toSeq.toDF("round", "vec_id", "radius").orderBy("round")
    }
  }

  /** Registered pruned k-center (the `q_sample_kcenter` serving form
    * since round 10): exact Gonzalez output — same oracle CTE chain —
    * with the per-round pass pruned through the trained quantizer's
    * cells. */
  def kcenterSelectPruned(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    kcenterSelectPrunedOf(e, KCenterK,
      semAssignment(spark, dir, e).withColumnRenamed("cent_id", "cell"),
      kcenterGeoCached(spark, dir, e))
  }

  /** CORESET WEIGHTS — the second half of the Sener–Savarese recipe
    * the selection alone leaves unfinished: training on a k-center
    * coreset weights each selected point by its VORONOI MASS (the
    * number of corpus points it represents), so the coreset's loss
    * estimates the corpus loss. One broadcast of the K selected
    * centers, one narrow corpus pass, argmin by (6dp-rounded d², then
    * center id) so both engines assign identically; per center the
    * output carries the weight and the achieved cell radius (max d² of
    * anything it represents — the empirical coverage the 2-approx
    * guarantee bounds). Weights sum to N by construction
    * (suite-pinned). */
  def kcenterWeights(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    kcenterWeightsOf(e, kcenterSelectPruned(spark, dir))
  }

  /** Sample size for [[coresetLightweight]]. */
  val CoresetM = 32

  /** LIGHTWEIGHT CORESET sampling (Bachem, Lucic & Krause, KDD 2018):
    * the select-free coreset — where k-center pays K passes to place
    * centers, the lightweight construction needs ONE statistic (the
    * corpus mean) and ONE scoring pass: q(x) = ½·1/N + ½·d²(x,μ)/Σd²,
    * sample m points ∝ q, weight each 1/(m·q). The mixture term keeps
    * dense regions represented while the distance term keeps outliers —
    * the paper's guarantee is an (ε, k)-lightweight coreset for k-means
    * at m = O(dk log k/ε²). At 100 TB this is the default coreset: two
    * narrow corpus passes (mean, score), no driver loop, no quantizer.
    *
    * Cross-engine determinism: the mean is assembled from EXACT per-dim
    * fixed-point sums (round(v·1e6) longs — the PCA scatter-matrix
    * discipline), d² is the shared sequential-fold [[l2sq]] kernel
    * fixed-pointed the same way, so q is a double computed from exact
    * integers by one identical expression in both engines; the ∝q draw
    * is realized as A-Res keys ln(u)/q over content-hash uniforms (the
    * `q_sample_weighted` discipline — reproducible across runs, engines
    * and partitionings) with a vec_id tie-break, served by
    * `TakeOrderedAndProject`, never a corpus sort. */
  def coresetLightweight(spark: SparkSession, dir: String): DataFrame =
    coresetLightweightOf(Tables.fanOut(Tables.embeddings(spark, dir)))

  private[graft] def coresetLightweightOf(e0: DataFrame): DataFrame = {
    val spark = e0.sparkSession
    val ckDir = Dedup.confCheckpointDir(spark)
    Dedup.withCheckpointDir(spark, ckDir) {
      // the scoring frame is materialized because both the Σd² total
      // and the final draw read it (lazy sharing would re-run the
      // corpus scan, mean subtree included)
      val (scored, scoredRdd) = Dedup.materializeOwned(
        coresetScoredOf(e0), ckDir.isDefined)
      val (out, outRdd) = Dedup.materializeOwned(
        coresetTailOf(scored), ckDir.isDefined)
      Dedup.retire(spark, scoredRdd)
      Dedup.retainResult(spark, "coresetLightweight", outRdd, out)
    }
  }

  /** Plan-audit hook: the live draw tail over the materialized scoring
    * frame (the registered query returns the retained ExistingRDD). */
  private[graft] def coresetPlanOf(spark: SparkSession, dir: String): DataFrame = {
    val (scored, _) = Dedup.materializeOwned(
      coresetScoredOf(Tables.fanOut(Tables.embeddings(spark, dir))),
      reliable = false)
    coresetTailOf(scored)
  }

  /** The one-pass scoring frame behind [[coresetLightweight]]:
    * (vec_id, d2fx, u) — exact fixed-point d² to the broadcast corpus
    * mean plus the content-hash uniform. */
  private[graft] def coresetScoredOf(e0: DataFrame): DataFrame = {
    val e = e0.select("vec_id", "embedding")
    // exact fixed-point per-dim sums -> the mean as one broadcast row;
    // sfx/(cnt*1e6) is a single division of exact integers, so both
    // engines compute the identical double per dimension
    val mu = e.select(posexplode(col("embedding")))
      .select(col("pos"), round(col("col").cast("double") * 1000000.0, 0)
        .cast("long").as("fx"))
      .groupBy("pos").agg(sum("fx").as("sfx"), count(lit(1)).as("cnt"))
      .agg(sort_array(collect_list(struct(col("pos"), col("sfx"), col("cnt"))))
        .as("a"))
      .select(transform(col("a"), s => s.getField("sfx").cast("double") /
        (s.getField("cnt").cast("double") * lit(1000000.0))).as("mu"))
    val u = (conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    e.crossJoin(broadcast(mu))
      .select(col("vec_id"),
        round(l2sq(col("embedding"), col("mu")) * lit(1000000.0), 0)
          .cast("long").as("d2fx"),
        u.as("u"))
  }

  /** The draw over a (vec_id, d2fx, u) scoring frame: q from the exact
    * totals, A-Res top-[[CoresetM]], 1/(m·q) weights. */
  private[graft] def coresetTailOf(scored: DataFrame): DataFrame = {
    val tot = scored.agg(sum("d2fx").as("sumfx"), count(lit(1)).as("n"))
    // all-identical corpus => Σd² = 0 => pure uniform draw (the
    // mixture's first term alone), never a 0/0
    val q = when(col("sumfx") === 0L, lit(1.0) / col("n").cast("double"))
      .otherwise(lit(0.5) / col("n").cast("double") +
        lit(0.5) * col("d2fx").cast("double") / col("sumfx").cast("double"))
    // A-Res key ln(u)/q: orders as u^(1/q), kept internal (only
    // exact-integer-derived columns cross the oracle hash); the top-m
    // cut is TakeOrderedAndProject, the rank window sees m rows
    scored.crossJoin(broadcast(tot))
      .select(col("vec_id"), col("d2fx"), q.as("q"),
        (log(col("u")) / q).as("key"))
      .orderBy(desc("key"), asc("vec_id"))
      .limit(CoresetM)
      .withColumn("rnk",
        row_number().over(Window.orderBy(desc("key"), asc("vec_id")))
          .cast("long"))
      .select(col("rnk"), col("vec_id"),
        round(lit(1.0) / (lit(CoresetM.toDouble) * col("q")), 6).as("weight"),
        round(col("d2fx").cast("double") / lit(1000000.0), 6).as("d2"))
      .orderBy("rnk")
  }

  /** Cluster count for [[coresetTrain]]. */
  val CoresetTrainK = 4

  /** CORESET TRAINING AUDIT — the claim behind every coreset is that
    * training on it approximates training on the corpus, so this query
    * RUNS that training and scores it on the corpus (the dial-audit
    * discipline — recall@k for ANN, cap sweeps for postings — applied
    * to the coreset family): one weighted Lloyd refinement of
    * [[CoresetTrainK]] k-means centroids over the 32 weighted coreset
    * points (seeds = the draw's first K, weights = the 1/(m·q)
    * importance weights — the exact estimator the Bachem guarantee is
    * stated for), then the FULL corpus assigns to the coreset-trained
    * centroids and reports per-cluster population and SSE. Cost shape:
    * everything between the two broadcast joins is 32-row arithmetic;
    * the corpus appears once in the scoring pass the coreset was drawn
    * from and once in the final assignment — two narrow scans total.
    *
    * Cross-engine: weights and coordinates enter as fixed-point longs
    * (products bounded: |x| ≤ ~1 ⇒ xfx ≤ 1e6, wfx ≤ 2N·1e6/m ⇒ the
    * 32-term Σ wfx·xfx stays ≪ 2^63 up to N ~ 10⁹), centroids are one
    * exact-integer division per dimension, assignment argmins on
    * (6dp-rounded d², cid), SSE sums 6dp fixed-point longs exactly. */
  def coresetTrain(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.fanOut(Tables.embeddings(spark, dir))
    coresetTrainOf(e, coresetLightweight(spark, dir))
  }

  private[graft] def coresetTrainOf(e: DataFrame, coreset: DataFrame): DataFrame = {
    val pts = coreset.join(e.select("vec_id", "embedding"), "vec_id")
      .select(col("rnk"), col("vec_id"), col("embedding"),
        round(col("weight") * lit(1000000.0), 0).cast("long").as("wfx"))
    val seeds = pts.filter(col("rnk") <= CoresetTrainK)
      .select(col("rnk").as("cid"), col("embedding").as("c_emb"))
    // weighted Lloyd step 1: assign the 32 points to the K seed points
    val w1 = Window.partitionBy("vec_id").orderBy(asc("d2"), asc("cid"))
    val a1 = pts.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("embedding"), col("wfx"), col("cid"),
        round(l2sq(col("embedding"), col("c_emb")), 6).as("d2"))
      .withColumn("r", row_number().over(w1)).filter(col("r") === 1)
    // weighted recenter: per-dim Σ wfx·xfx / (Σ wfx · 1e6), exact ints
    val centsLong = a1
      .select(col("cid"), col("wfx"), posexplode(col("embedding")))
      .select(col("cid"), col("wfx"), col("pos"),
        round(col("col").cast("double") * lit(1000000.0), 0)
          .cast("long").as("xfx"))
      .groupBy("cid", "pos")
      .agg(sum(col("wfx") * col("xfx")).as("swx"), sum("wfx").as("sw"))
      .select(col("cid"), col("pos"),
        (col("swx").cast("double") /
          (col("sw").cast("double") * lit(1000000.0))).as("c"))
    val cents = centsLong.groupBy("cid")
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("c_emb"))
    // the audit: the FULL corpus scored against what the coreset taught
    val w2 = Window.partitionBy("vec_id").orderBy(asc("d2"), asc("cid"))
    val corpusAsg = e.select("vec_id", "embedding").crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        round(l2sq(col("embedding"), col("c_emb")), 6).as("d2"))
      .withColumn("r", row_number().over(w2)).filter(col("r") === 1)
    corpusAsg.groupBy("cid")
      .agg(count(lit(1)).as("n_corpus"),
        sum(round(col("d2") * lit(1000000.0), 0).cast("long")).as("sse_fx"))
      .join(a1.groupBy("cid")
        .agg(count(lit(1)).as("n_coreset"), sum("wfx").as("mass_fx")), "cid")
      .select(col("cid"), col("n_coreset"),
        round(col("mass_fx").cast("double") / lit(1000000.0), 4)
          .as("coreset_mass"),
        col("n_corpus"),
        round(col("sse_fx").cast("double") / lit(1000000.0), 4)
          .as("corpus_sse"))
      .orderBy("cid")
  }

  private[graft] def kcenterWeightsOf(e: DataFrame, centers: DataFrame): DataFrame = {
    val c = centers.select("vec_id")
      .join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("vec_id").as("center"), col("embedding").as("c_emb"))
    val w = Window.partitionBy("vec_id").orderBy(asc("d2"), asc("center"))
    e.select("vec_id", "embedding").crossJoin(broadcast(c))
      .select(col("vec_id"), col("center"),
        round(l2sq(col("embedding"), col("c_emb")), 6).as("d2"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .groupBy("center")
      .agg(count(lit(1)).as("weight"), max(col("d2")).as("max_d2"))
      .orderBy("center")
  }
}
