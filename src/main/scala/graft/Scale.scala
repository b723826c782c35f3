package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Dedup, TextAnalysis}
import graft.functions.VectorFunctions._

/** Empirical scale evidence for the dedup/ANN 100 TB posture (SCALE.md):
  * runs the candidate-generating stages on 1×/3×/10× replications of the
  * sf0.1 corpus and prints per-stage row counts and wall times as a
  * markdown table. The claim under test: every stage grows LINEARLY in
  * corpus size (candidates, bucket maxima, CC rounds bounded) — plan
  * shape says so; this measures it.
  *
  * Replication model: replica i PREFIXES every token with a
  * replica-unique tag (`qzi`) — an injective rename of the vocabulary,
  * so each replica's shingle multisets are 1:1 images of the base
  * corpus's (identical within-replica similarity structure) while
  * replicas are shingle-DISJOINT from each other and from the base.
  * That is the realistic growth model: new crawl shards share a dup
  * RATE, not dup partners. (A first attempt INTERLEAVED the tag between
  * tokens; that manufactures hot `(tag, word, tag)` shingles shared by
  * most docs in a replica, inflating similarity and reading as a fake
  * superlinear candidate curve — renaming, not inserting, is the
  * structure-preserving transform.) Embeddings replicate under fresh
  * vec_ids with vectors unchanged (new data lands in the same bucket
  * space).
  *
  *   sbt "runMain graft.Scale /root/testdata/sf0.1 1 3 10"
  */
object Scale {

  // 10^12: must exceed EVERY replicated key's range or "disjoint"
  // replicas silently collide and the linearity baseline mis-reads key
  // merges as superlinear growth. l_orderkey reaches ~6M per SF unit
  // (the old 10^7 stride collided from sf10 up); 10^12 holds to sf>10^5
  // and ~9×10^6 replicas fit below Long.MaxValue.
  private[graft] val ReplicaStride = 1000000000000L

  /** Base docs plus k-1 tagged, shingle-disjoint replicas. */
  private[graft] def replicatedDocs(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val d = graft.sources.Tables.fanOut(graft.sources.Tables.documents(spark, dir))
    (0 until k).map { i =>
      if (i == 0) d
      else d.select(
        (col("doc_id") + lit(i * ReplicaStride)).as("doc_id"),
        // the "z" terminator makes the tag prefix-free for ANY factor:
        // without it, replica 11's "qz11"+t collides with replica 1's
        // rename of a token starting with "1", silently breaking the
        // cross-replica disjointness the whole growth model rests on
        regexp_replace(col("text"), "(\\S+)", s"qz${i}z$$1").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
  }

  /** Base events plus k-1 id-shifted replicas: timestamps, types and
    * values replicate IN PLACE, so the (hour × type) grid is invariant
    * while the log grows k× — the growth model for resample (a busier
    * feed over the same clock, not a longer history). */
  private[graft] def replicatedEvents(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val ev = graft.sources.Tables.fanOut(graft.sources.Tables.events(spark, dir))
    (0 until k).map { i =>
      if (i == 0) ev
      else ev.withColumn("event_id", col("event_id") + lit(i * ReplicaStride))
    }.reduce(_ unionByName _)
  }

  /** Base orders plus k-1 key-shifted replicas: custkeys, statuses,
    * prices and dates replicate in place, so the dimension side and the
    * per-replica violation geometry stay comparable while the fact
    * grows k×. */
  private[graft] def replicatedOrders(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val o = graft.sources.Tables.fanOut(graft.sources.Tables.orders(spark, dir))
    (0 until k).map { i =>
      if (i == 0) o
      else o.withColumn("o_orderkey", col("o_orderkey") + lit(i * ReplicaStride))
    }.reduce(_ unionByName _)
  }

  private[graft] def replicatedEmbeddings(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val e = graft.sources.Tables.fanOut(graft.sources.Tables.embeddings(spark, dir))
    (0 until k).map { i =>
      if (i == 0) e
      else e.select((col("vec_id") + lit(i * ReplicaStride)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.1")
    // optional `--sections=dedup,signals,graph,prefix` limits the run to
    // named sections (each prints an independent table), so adding a new
    // stage doesn't force a full re-measure of the others
    val knownSections = Set("dedup", "signals", "graph", "prefix", "semantic",
      "boiler", "training", "spaninc", "dsir", "bloom", "bpe", "winnow",
      "kcenter", "sketch", "curationinc", "bm25merge", "ccinc", "media",
      "kcenterprod", "annmerge", "bm25cap", "videomedia",
      "resample", "snapdiff", "bq", "compaction", "cdc", "cdcinc",
      "kcprune", "kcweights", "phashgrain", "coreset", "rm3", "forget",
      "govern", "bloomfiles", "prefixshared", "pagerank", "auditprobe",
      "annencinc", "forgetsparse")
    val sections = args.collectFirst { case a if a.startsWith("--sections=") =>
      a.stripPrefix("--sections=").split(",").map(_.trim).toSet }
      .getOrElse(knownSections)
    // fail LOUDLY on a typo'd section — it would otherwise run zero
    // stages, print nothing, and exit 0 after spinning up the JVM
    require((sections -- knownSections).isEmpty,
      s"unknown --sections: ${(sections -- knownSections).toSeq.sorted.mkString(", ")} " +
        s"(known: ${knownSections.toSeq.sorted.mkString(", ")})")
    val plain = args.filterNot(_.startsWith("--"))
    val factors = if (plain.length > 1) plain.drop(1).toSeq.map(_.toInt) else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timedCount(df: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = df.count()
      (n, (System.nanoTime() - t0) / 1e9)
    }

    val rows = factors.filter(_ => sections("dedup")).map { k =>
      System.err.println(s"[scale] factor $k ...")
      val docs = replicatedDocs(spark, baseDir, k)
      val nDocs = docs.count()

      val (posting, tPosting) = timedCount(Dedup.shinglesOf(docs))
      // band-bucket occupancy: the join fan-in dial — a superlinear max
      // here is the LSH failure mode
      val bandStats = Dedup.bandIndexOf(docs)
        .groupBy("band", "band_sig").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("keys"), max("n").as("max_bucket")).head()
      val (bandKeys, maxBucket) = (bandStats.getLong(0), bandStats.getLong(1))
      val (cands, tCands) = timedCount(Dedup.minhashCandidatesOf(docs))
      val t0p = System.nanoTime()
      val pairs = Dedup.minhashPairsOf(docs)
      val pairsMat = { val r = pairs.rdd; r.localCheckpoint(); r.count(); r }
      val nPairs = pairsMat.count()
      val tPairs = (System.nanoTime() - t0p) / 1e9
      val pairsDf = spark.createDataFrame(pairsMat, pairs.schema)

      val t0c = System.nanoTime()
      val cc = Dedup.componentsOfManaged(pairsDf.select("doc_a", "doc_b"))
      val ccNodes = cc.labels.count()
      val tCc = (System.nanoTime() - t0c) / 1e9
      val ccRounds = cc.rounds
      cc.release()
      pairsMat.unpersist(blocking = false)

      // simhash: bucket occupancy and candidate volume are the scale
      // signals; the hamming<=3 OUTPUT count is data-dependent (on this
      // synthetic ~40-word vocabulary it swings with each replica's hash
      // draw — see SCALE.md caveat) so it is reported but not graded
      val shBucketMax = Dedup.simhashBandsOf(docs)
        .groupBy("band", "band_val").agg(count(lit(1)).as("n"))
        .agg(max("n")).head().getLong(0)
      val (simhash, tSimhash) = timedCount(Dedup.simhashPairsOf(docs))
      val (jacc, tJacc) = timedCount(Dedup.ngramJaccardOf(docs))

      // ANN over the replicated embeddings: exact brute-force (10
      // broadcast queries × corpus) and single-probe bucketed top-3
      val e = replicatedEmbeddings(spark, baseDir, k)
      val nVecs = e.count()
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("neighbor"))
      val (_, tBrute) = timedCount(
        e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("neighbor"),
            round(cosine(col("q_emb"), col("embedding")), 6).as("cos"))
          .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3))
      val eb = e.select(col("vec_id"), col("embedding"),
        signBucket(col("embedding"), 8).as("bucket"))
      val vecBucketMax = eb.groupBy("bucket").agg(count(lit(1)).as("n"))
        .agg(max("n")).head().getLong(0)
      val qb = eb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("bucket"))
      val (_, tBucket) = timedCount(
        eb.join(broadcast(qb), Seq("bucket")).filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("neighbor"),
            round(cosine(col("q_emb"), col("embedding")), 6).as("cos"))
          .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3))

      Seq(
        s"| ${k}x | $nDocs | $posting | $bandKeys | $maxBucket | $cands | $nPairs | " +
          s"$ccNodes | $ccRounds | $shBucketMax | $simhash | $jacc | $nVecs | $vecBucketMax |",
        s"| ${k}x times | — | ${f"$tPosting%.1f"}s | — | — | ${f"$tCands%.1f"}s | " +
          s"${f"$tPairs%.1f"}s | ${f"$tCc%.1f"}s | — | — | ${f"$tSimhash%.1f"}s | " +
          s"${f"$tJacc%.1f"}s | ${f"$tBrute%.1f"}s brute | ${f"$tBucket%.1f"}s bucketed |")
    }

    if (sections("dedup")) {
      println("| factor | docs | shingle posting | band keys | max band bucket | " +
        "candidates | pairs>=0.5 | cc nodes | cc rounds | max simhash bucket | " +
        "simhash pairs | jaccard pairs | vectors | max vec bucket |")
      println("|---|---|---|---|---|---|---|---|---|---|---|---|---|---|")
      rows.flatten.foreach(println)
    }

    // round-5 training-signal stages: duplicate-span coverage (the
    // membership join's output volume is the quantity that would blow up
    // on hot grams) and relational k-means (fixed K and dims, so the
    // per-iteration O(N·K·dims) cost must scale with N alone)
    import graft.operators.{SimSearch, TextAnalysis}
    val rows2 = factors.filter(_ => sections("signals")).map { k =>
      System.err.println(s"[scale] factor $k (training signals) ...")
      val docs = replicatedDocs(spark, baseDir, k)
      val grams = TextAnalysis.spanGramsOf(docs)
      val nGrams = grams.count()
      val shared = TextAnalysis.sharedSpanGramsOf(grams)
      val nShared = shared.count()
      // join output BEFORE the distinct: occurrences of shared grams × SpanN
      val (joinRows, _) = timedCount(grams.join(shared, "g"))
      val t0s = System.nanoTime()
      val flagged = TextAnalysis.dupSpanCoverageOf(docs)
        .filter(col("dup_positions") > 0).count()
      val tSpan = (System.nanoTime() - t0s) / 1e9
      val e = replicatedEmbeddings(spark, baseDir, k)
      val nVecs = e.count()
      val t0k = System.nanoTime()
      val sse = SimSearch.kmeansSse(e, SimSearch.KmK, SimSearch.KmIters)
      val tKm = (System.nanoTime() - t0k) / 1e9
      s"| ${k}x | $nGrams | $nShared | $joinRows | $flagged | ${f"$tSpan%.1f"}s | " +
        s"$nVecs | ${f"$sse%.0f"} | ${f"$tKm%.1f"}s |"
    }
    if (sections("signals")) {
      println()
      println("| factor | span grams | shared grams | join rows | flagged docs | " +
        "span time | vectors | kmeans sse | kmeans time |")
      println("|---|---|---|---|---|---|---|---|---|")
      rows2.foreach(println)
    }

    // graph stages: k disjoint copies of the co-purchase graph (order and
    // part keys shifted per replica), so every count must grow EXACTLY k×
    // and any superlinearity is algorithmic. Oriented wedges are the
    // triangle-enumeration cost driver; PageRank runs its full 3-iteration
    // loop on the RAW (dense) graph so the per-iteration join cost is
    // stressed at 10× the edge volume.
    import graft.operators.Graph
    val rows3 = factors.filter(_ => sections("graph")).map { k =>
      System.err.println(s"[scale] factor $k (graph) ...")
      val li = replicatedLineitemKeys(spark, baseDir, k)
      val (rawEdges, tRaw) = timedCount(Graph.copurchaseEdges(li))
      val t0e = System.nanoTime()
      val rec = Graph.recurringEdges(li, Graph.TriMinSupport)
      val nRec = rec.count()
      val tRec = (System.nanoTime() - t0e) / 1e9
      val deg = rec.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      val oriented = Graph.orientedEdges(rec, deg)
      val (wedges, _) = timedCount(
        oriented.as("e1").join(oriented.as("e2"), col("e1.v") === col("e2.u")))
      val t0t = System.nanoTime()
      val tri = Graph.triangleCounts(rec)
        .agg(coalesce(sum("triangles"), lit(0L))).head().getLong(0) / 3
      val tTri = (System.nanoTime() - t0t) / 1e9
      val t0r = System.nanoTime()
      val prNodes = Graph.pagerankRanks(Graph.copurchaseEdges(li)).count()
      val tPr = (System.nanoTime() - t0r) / 1e9
      s"| ${k}x | $rawEdges | ${f"$tRaw%.1f"}s | $nRec | ${f"$tRec%.1f"}s | " +
        s"$wedges | $tri | ${f"$tTri%.1f"}s | $prNodes | ${f"$tPr%.1f"}s |"
    }
    if (sections("graph")) {
      println()
      println("| factor | raw edges | edge time | recurring edges | rec time | " +
        "oriented wedges | triangles | tri time | pr nodes | pr time (3 iters) |")
      println("|---|---|---|---|---|---|---|---|---|---|")
      rows3.foreach(println)
    }

    // prefix-filter join: candidates vs the naive shared-shingle pair
    // volume is the MEASURED pruning ratio, and both must grow linearly
    // (replicas are shingle-disjoint, so cross-replica pairs are
    // impossible by construction — any superlinear growth is algorithmic)
    val rows4 = factors.filter(_ => sections("prefix")).map { k =>
      System.err.println(s"[scale] factor $k (prefix join) ...")
      val docs = replicatedDocs(spark, baseDir, k)
      val posting = Dedup.shinglesOf(docs).distinct()
      val (naive, tNaive) = timedCount(
        posting.alias("x")
          .join(posting.alias("y"),
            col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id"), col("y.doc_id")).distinct())
      // r9 candidate shape (prefix + length filters) vs the r10 shape
      // (+ PPJoin positional filter) — the measured verify-stage ceiling
      val (pCandsOld, _) = timedCount(Dedup.prefixCandidatesNoPositional(docs))
      val (pCands, tCand) = timedCount(Dedup.prefixCandidatesOf(docs))
      val t0 = System.nanoTime()
      val nPairs = Dedup.prefixFilterJoinOf(docs).count()
      val tJoin = (System.nanoTime() - t0) / 1e9
      s"| ${k}x | $naive | ${f"$tNaive%.1f"}s | $pCandsOld | $pCands | " +
        s"${f"$tCand%.1f"}s | " +
        s"${f"${100.0 * (naive - pCands) / naive}%.1f"}% | $nPairs | ${f"$tJoin%.1f"}s |"
    }
    if (sections("prefix")) {
      println()
      println("| factor | shared-shingle pairs | naive time | candidates (r9, no positional) | " +
        "candidates (+positional) | cand time | pruned vs naive | pairs>=0.5 | join time |")
      println("|---|---|---|---|---|---|---|---|---|")
      rows4.foreach(println)
    }

    // semantic dedup: the claim under test is the SemDeDup scale dial —
    // with K FIXED the within-cluster pair volume (Σ n_c·(n_c−1)/2, the
    // exact cosine-join cost) grows ~quadratically in corpus size; with
    // K ∝ N it stays ~linear. Pair volume is computed from cluster
    // sizes (no pair materialization), so the deliberately-bad fixed-K
    // configuration is measured without paying its cosine pass; the
    // full dedup (train + pairs + witnesses) runs at the SHIPPED
    // setting — semDerivedK(N), the dial q_dedup_semantic itself uses.
    val rows5 = factors.filter(_ => sections("semantic")).map { k =>
      System.err.println(s"[scale] factor $k (semantic dedup) ...")
      val e = replicatedEmbeddings(spark, baseDir, k)
      val nVecs = e.count()
      val kDerived = SimSearch.semDerivedK(nVecs)
      def pairVolume(kk: Int): (Long, Long) = {
        val sizes = SimSearch.kmeansAssignment(e, kk, SimSearch.KmIters)
          .groupBy("cent_id").agg(count(lit(1)).as("n"))
        val r = sizes.agg(max("n"),
          sum(col("n") * (col("n") - lit(1)) / lit(2)).cast("long")).head()
        (r.getLong(0), r.getLong(1))
      }
      val (maxFixed, pairsFixed) = pairVolume(SimSearch.KmK)
      val (maxScaled, pairsScaled) = pairVolume(kDerived)
      val t0 = System.nanoTime()
      val drops = SimSearch.semanticDedupOf(e, kDerived,
        SimSearch.KmIters).count()
      val tSem = (System.nanoTime() - t0) / 1e9
      s"| ${k}x | $nVecs | ${SimSearch.KmK} | $maxFixed | $pairsFixed | " +
        s"$kDerived | $maxScaled | $pairsScaled | $drops | ${f"$tSem%.1f"}s |"
    }
    if (sections("semantic")) {
      println()
      println("| factor | vectors | K fixed | max cluster | pair volume | " +
        "K scaled | max cluster | pair volume | drops | dedup time |")
      println("|---|---|---|---|---|---|---|---|---|---|")
      rows5.foreach(println)
    }

    // Boilerplate strip: the claim under test is that the BOILER SET is
    // corpus-INDEPENDENT — site templates don't multiply with content —
    // so the membership join's build side stays broadcastable at any
    // scale while grams/coverage grow linearly. Replicas share the same
    // per-source footers (the crawl view plants them AFTER replication,
    // as a real recrawl re-serves the same template), and replica
    // content grams are qz-prefixed disjoint, so organic df cannot
    // creep toward the threshold.
    val rows6 = factors.filter(_ => sections("boiler")).map { k =>
      System.err.println(s"[scale] factor $k (boilerplate) ...")
      val crawl = graft.operators.TextAnalysis.crawlViewOf(
        replicatedDocs(spark, baseDir, k))
      val nDocs = crawl.count()
      val grams = graft.operators.TextAnalysis.spanGramsOf(crawl)
      val (nGrams, _) = timedCount(grams)
      val nBoiler = grams.groupBy("g")
        .agg(countDistinct("doc_id").as("df"))
        .filter(col("df") >= graft.operators.TextAnalysis.BoilerMinDf)
        .count()
      val t0 = System.nanoTime()
      val rep = graft.operators.TextAnalysis.boilerplateStripOf(crawl).collect()
      val tRep = (System.nanoTime() - t0) / 1e9
      val removed = rep.map(_.getLong(4)).sum
      s"| ${k}x | $nDocs | $nGrams | $nBoiler | $removed | ${f"$tRep%.1f"}s |"
    }
    if (sections("boiler")) {
      println()
      println("| factor | docs | gram occurrences | boiler grams | " +
        "tokens removed | report time |")
      println("|---|---|---|---|---|---|")
      rows6.foreach(println)
    }

    // Training ops: hard-negative mining (brute-force vs routed) and
    // semantic decontamination. The mining claim under test: the
    // brute-force arm SCORES Nq × corpus pairs — linear here only
    // because Nq is pinned at 10, and in production Nq IS corpus-sized
    // (one per training query), which is the quadratic the routed arm
    // kills: it scores Σ probed-cell sizes (nprobe/K of the corpus at
    // fixed K; flat per query once K ∝ N). The candidate columns make
    // the gap visible; wall times corroborate. Decontamination: the
    // fixed-cardinality eval set (EvalIdCap) must keep the screen one
    // linear corpus scan.
    val rows7 = factors.filter(_ => sections("training")).map { k =>
      System.err.println(s"[scale] factor $k (training ops) ...")
      val e = replicatedEmbeddings(spark, baseDir, k)
      val nVecs = e.count()
      val (bruteCands, routedCands) =
        SimSearch.minedCandidateVolumes(e, SimSearch.IvfNProbe)
      val t0b = System.nanoTime()
      val nBrute = SimSearch.hardNegativesOf(e).count()
      val tBrute = (System.nanoTime() - t0b) / 1e9
      val t0r = System.nanoTime()
      val nRouted = SimSearch.hardNegativesRoutedOf(e, SimSearch.IvfNProbe).count()
      val tRouted = (System.nanoTime() - t0r) / 1e9
      val t0d = System.nanoTime()
      val nFlags = SimSearch.semanticDecontaminateOf(e).count()
      val tDecon = (System.nanoTime() - t0d) / 1e9
      s"| ${k}x | $nVecs | $bruteCands | ${f"$tBrute%.1f"}s | $routedCands | " +
        s"${f"$tRouted%.1f"}s | ${nBrute}/${nRouted} | $nFlags | ${f"$tDecon%.1f"}s |"
    }
    if (sections("training")) {
      println()
      println("| factor | vectors | brute cands | brute time | routed cands | " +
        "routed time | negs b/r | decon flags | decon time |")
      println("|---|---|---|---|---|---|---|---|---|")
      rows7.foreach(println)
    }

    // Incremental span screen: a FIXED arriving batch (the base odd
    // docs) screened against the gram-df index of a GROWING corpus
    // (even docs × k, replicas gram-disjoint). The claim under test:
    // screen cost is O(batch) — flat as the index 10×es (the corpus
    // appears only as the equi-join side) — while the batch
    // recompute (dupSpanApply over corpus+batch) pays the corpus-wide
    // gram-df shuffle every run and grows linearly. The screen output
    // must be IDENTICAL at every factor (replicas are gram-disjoint
    // from the base batch), so n_out/removed doubling as a
    // correctness invariant.
    val rows8 = factors.filter(_ => sections("spaninc")).map { k =>
      System.err.println(s"[scale] factor $k (incremental span screen) ...")
      val corpus = replicatedDocs(spark, baseDir, k).filter(col("doc_id") % 2 === 0)
      val batch = graft.sources.Tables.fanOut(
          graft.sources.Tables.documents(spark, baseDir))
        .filter(col("doc_id") % 2 === 1)
      val t0i = System.nanoTime()
      val idx = graft.operators.TextAnalysis.spanGramIndexOf(corpus)
      val idxMat = { val r = idx.rdd; r.localCheckpoint(); r.count(); r }
      val nIdx = idxMat.count()
      val tIdx = (System.nanoTime() - t0i) / 1e9
      val idxDf = spark.createDataFrame(idxMat, idx.schema)
      val t0s = System.nanoTime()
      val screened = graft.operators.TextAnalysis.spanScreenOf(batch, idxDf).collect()
      val tScreen = (System.nanoTime() - t0s) / 1e9
      val nOut = screened.length
      val keptToks = screened.map(_.getLong(1)).sum
      val t0f = System.nanoTime()
      val nFull = graft.operators.TextAnalysis
        .boilerplateApplyOf(corpus.unionByName(batch),
          graft.operators.TextAnalysis.SpanN, 2).count()
      val tFull = (System.nanoTime() - t0f) / 1e9
      s"| ${k}x | $nIdx | ${f"$tIdx%.1f"}s | $nOut | $keptToks | " +
        s"${f"$tScreen%.1f"}s | $nFull | ${f"$tFull%.1f"}s |"
    }
    if (sections("spaninc")) {
      println()
      println("| factor | index grams | index build | screened docs | kept tokens | " +
        "screen time | full-recompute docs | full-recompute time |")
      println("|---|---|---|---|---|---|---|---|")
      rows8.foreach(println)
    }

    // Incremental connected components: a FIXED arriving batch (the
    // base odd docs' pairs) merged into label state from a GROWING old
    // graph (even docs × k; replicas are shingle-disjoint, so replica
    // components are never touched and the update set stays
    // batch-sized). Claim: the MERGE KERNEL is O(batch + touched) —
    // flat as the graph 10×es — while state build and full recompute
    // grow with the graph. Pairs and old labels are materialized before
    // the kernel is timed (they are the persisted-state analogs).
    val rowsCc = factors.filter(_ => sections("ccinc")).map { k =>
      System.err.println(s"[scale] factor $k (incremental CC) ...")
      import graft.operators.Dedup
      val docs = replicatedDocs(spark, baseDir, k)
      val t0p = System.nanoTime()
      val pairsDf = Dedup.minhashPairsOf(docs).select("doc_a", "doc_b")
      val (pairs, pairsRdd) = Dedup.materializeOwned(pairsDf, reliable = false)
      val nPairs = pairs.count()
      val tPairs = (System.nanoTime() - t0p) / 1e9
      val t0s = System.nanoTime()
      val oldLabDf = Dedup.componentsOf(
        pairs.filter(col("doc_a") % 2 === 0 && col("doc_b") % 2 === 0))
      val (oldLab, oldLabRdd) = Dedup.materializeOwned(oldLabDf, reliable = false)
      val nState = oldLab.count()
      val tState = (System.nanoTime() - t0s) / 1e9
      val deltaPairs = pairs.filter(
        (col("doc_a") % 2 === 1 && col("doc_a") < ReplicaStride) ||
          (col("doc_b") % 2 === 1 && col("doc_b") < ReplicaStride))
      val t0m = System.nanoTime()
      val upd = Dedup.ccIncrementalFrom(oldLab, deltaPairs).collect()
      val tMerge = (System.nanoTime() - t0m) / 1e9
      val t0f = System.nanoTime()
      val nFull = Dedup.componentsOf(pairs).count()
      val tFull = (System.nanoTime() - t0f) / 1e9
      Dedup.retire(spark, pairsRdd)
      Dedup.retire(spark, oldLabRdd)
      s"| ${k}x | $nPairs | ${f"$tPairs%.1f"}s | $nState | ${f"$tState%.1f"}s | " +
        s"${upd.length} | ${f"$tMerge%.1f"}s | $nFull | ${f"$tFull%.1f"}s |"
    }
    if (sections("ccinc")) {
      println()
      println("| factor | pairs | pair build | state labels | state build | " +
        "update rows | merge time | full labels | full CC time |")
      println("|---|---|---|---|---|---|---|---|---|")
      rowsCc.foreach(println)
    }

    // Incremental media screen: a FIXED arriving batch (the base
    // catalog's planted audio re-masters) fingerprinted and probed
    // against the banded index of a GROWING catalog (id-spine replicas —
    // distinct ids draw independent envelopes through the xor-shift, so
    // replicas populate new band buckets instead of colliding). Claim:
    // the SCREEN is O(batch) — decode cost fixed, probe one equi-join
    // whose index side grows but whose output stays batch-bounded —
    // while the index build (the per-snapshot artifact, charged to
    // Bench's build:media_index) grows with the catalog.
    val rowsMedia = factors.filter(_ => sections("media")).map { k =>
      System.err.println(s"[scale] factor $k (media screen) ...")
      import graft.multimodal.Multimodal
      import spark.implicits._
      val spine = replicatedDocs(spark, baseDir, k).select(col("doc_id")).as[Long]
      val t0i = System.nanoTime()
      val idxDf = Multimodal.imageHashIndexOf(
        Multimodal.audioFingerprint(
          Multimodal.audioSliceOfIds(spine, emitBase = true, emitEdits = false))
          .toDF().withColumnRenamed("fp", "dhash"))
      val (idx, idxRdd) = Dedup.materializeOwned(idxDf, reliable = false)
      val nIdx = idx.count()
      val tIdx = (System.nanoTime() - t0i) / 1e9
      val batch = Multimodal.audioSliceOfIds(
        graft.sources.Tables.fanOut(
          graft.sources.Tables.documents(spark, baseDir).select(col("doc_id")))
          .as[Long],
        emitBase = false, emitEdits = true)
      val t0s = System.nanoTime()
      val nScreen = Multimodal.imageNearDupScreen(
        Multimodal.audioFingerprint(batch).toDF()
          .withColumnRenamed("fp", "dhash"), idx).count()
      val tScreen = (System.nanoTime() - t0s) / 1e9
      Dedup.retire(spark, idxRdd)
      s"| ${k}x | $nIdx | ${f"$tIdx%.1f"}s | $nScreen | ${f"$tScreen%.1f"}s |"
    }
    if (sections("media")) {
      println()
      println("| factor | index rows | index build (decode) | screen hits | " +
        "screen time (fixed batch) |")
      println("|---|---|---|---|---|")
      rowsMedia.foreach(println)
    }

    // Incremental VIDEO media screen — the audio table's contract on
    // the third modality: fixed arriving batch (the base re-edits,
    // demuxed per run), growing catalog served from the pinned banded
    // index. Claim: screen O(batch) while the index build (charged to
    // build:media_index) grows with the catalog.
    val rowsVideo = factors.filter(_ => sections("videomedia")).map { k =>
      System.err.println(s"[scale] factor $k (video screen) ...")
      import graft.multimodal.Multimodal
      import spark.implicits._
      val spine = replicatedDocs(spark, baseDir, k).select(col("doc_id")).as[Long]
      val t0i = System.nanoTime()
      val idxDf = Multimodal.imageHashIndexOf(
        Multimodal.videoFingerprint(
          Multimodal.videoSliceOfIds(spine, emitBase = true, emitEdits = false))
          .toDF().withColumnRenamed("fp", "dhash"))
      val (idx, idxRdd) = Dedup.materializeOwned(idxDf, reliable = false)
      val nIdx = idx.count()
      val tIdx = (System.nanoTime() - t0i) / 1e9
      val batch = Multimodal.videoSliceOfIds(
        graft.sources.Tables.fanOut(
          graft.sources.Tables.documents(spark, baseDir).select(col("doc_id")))
          .as[Long],
        emitBase = false, emitEdits = true)
      val t0s = System.nanoTime()
      val nScreen = Multimodal.imageNearDupScreen(
        Multimodal.videoFingerprint(batch).toDF()
          .withColumnRenamed("fp", "dhash"), idx).count()
      val tScreen = (System.nanoTime() - t0s) / 1e9
      Dedup.retire(spark, idxRdd)
      s"| ${k}x | $nIdx | ${f"$tIdx%.1f"}s | $nScreen | ${f"$tScreen%.1f"}s |"
    }
    if (sections("videomedia")) {
      println()
      println("| factor | index rows | index build (demux) | screen hits | " +
        "screen time (fixed batch) |")
      println("|---|---|---|---|---|")
      rowsVideo.foreach(println)
    }

    // ANN index delta-merge: a FIXED arriving batch (the base odd
    // vectors) folds into the PINNED snapshot index of a GROWING
    // even-id corpus. Claim: merge + routed serve pays batch
    // assign/encode plus the probed inverted lists — while the rebuild
    // arm re-encodes the whole corpus through the PQ assignment every
    // run. (The serve leg itself grows with list length at fixed
    // nlist=8 — the K∝N dial documented at q_dedup_semantic is the
    // production bound on that axis.)
    val rowsAnnMerge = factors.filter(_ => sections("annmerge")).map { k =>
      System.err.println(s"[scale] factor $k (ann index merge) ...")
      import graft.operators.SimSearch
      val snap = replicatedEmbeddings(spark, baseDir, k)
        .filter(col("vec_id") % 2 === 0)
      val base = replicatedEmbeddings(spark, baseDir, 1)
      val batch = base.filter(col("vec_id") % 2 === 1)
      val full = base // supplies the fixed query vectors (vec_id < 10)
      def pin(df: DataFrame): (DataFrame, Long) = {
        val r = df.rdd; r.localCheckpoint(); val n = r.count()
        (spark.createDataFrame(r, df.schema), n)
      }
      val t0i = System.nanoTime()
      val (cents0, book0, assign0, codes0) = SimSearch.annMergeScaleFrames(snap)
      val (cents, _) = pin(cents0)
      val (book, _) = pin(book0)
      val (assign, _) = pin(assign0)
      val (codes, nCodes) = pin(codes0)
      val tIdx = (System.nanoTime() - t0i) / 1e9
      val t0m = System.nanoTime()
      val served = SimSearch.annMergeServeWith(full, cents, book,
        assign, codes, batch).count()
      val tMerge = (System.nanoTime() - t0m) / 1e9
      val t0f = System.nanoTime()
      val rebuilt = SimSearch.annIndexRebuildServeOf(full, snap,
        snap.unionByName(batch)).count()
      val tFull = (System.nanoTime() - t0f) / 1e9
      s"| ${k}x | $nCodes | ${f"$tIdx%.1f"}s | $served | ${f"$tMerge%.1f"}s | " +
        s"$rebuilt | ${f"$tFull%.1f"}s |"
    }
    if (sections("annmerge")) {
      println()
      println("| factor | snapshot code rows | snapshot build | served rows | " +
        "merge+serve time | rebuild rows | rebuild+serve time |")
      println("|---|---|---|---|---|---|---|")
      rowsAnnMerge.foreach(println)
    }

    // Capped-postings serve: FIXED probe queries against the pinned
    // index of a GROWING corpus. Claim: the capped serve join carries
    // ≤ cap·|query terms| postings at every factor — bounded — while
    // the uncapped serve join grows with posting length (the
    // q_pipeline_retrieval 3.9× finding this dial exists to bound).
    // VERBATIM replication (same text, shifted ids) — the cap test
    // needs posting LISTS to grow with the corpus; the token-renamed
    // replicas keep per-term df flat by design and would hide exactly
    // the growth this dial bounds
    def replicatedDocsVerbatim(k: Int): DataFrame = {
      val d = graft.sources.Tables.fanOut(
        graft.sources.Tables.documents(spark, baseDir))
      (0 until k).map { i =>
        if (i == 0) d
        else d.withColumn("doc_id", col("doc_id") + lit(i * ReplicaStride))
      }.reduce(_ unionByName _)
    }
    val rowsBm25Cap = factors.filter(_ => sections("bm25cap")).map { k =>
      System.err.println(s"[scale] factor $k (bm25 posting caps) ...")
      val corpus = replicatedDocsVerbatim(k).filter(col("doc_id") % 2 === 0)
      val queries = graft.sources.Tables.fanOut(
          graft.sources.Tables.documents(spark, baseDir))
        .filter(col("doc_id") % 2 === 1 && col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("text"))
      def pin(df: DataFrame): (DataFrame, Long) = {
        val r = df.rdd; r.localCheckpoint(); val n = r.count()
        (spark.createDataFrame(r, df.schema), n)
      }
      val t0i = System.nanoTime()
      val (capIdx, nCap) = pin(TextAnalysis.bm25CappedIndexOf(corpus))
      val (fullIdx, nFull) = pin(TextAnalysis.bm25IndexOf(corpus))
      val tIdx = (System.nanoTime() - t0i) / 1e9
      val t0c = System.nanoTime()
      val capRows = TextAnalysis.bm25CappedScoreOf(queries, capIdx).count()
      val tCap = (System.nanoTime() - t0c) / 1e9
      val t0u = System.nanoTime()
      val fullRows = TextAnalysis.bm25ScoreOf(queries, fullIdx).count()
      val tUncap = (System.nanoTime() - t0u) / 1e9
      s"| ${k}x | $nFull | $nCap | ${f"$tIdx%.1f"}s | $capRows | " +
        s"${f"$tCap%.1f"}s | $fullRows | ${f"$tUncap%.1f"}s |"
    }
    if (sections("bm25cap")) {
      println()
      println("| factor | full index rows | capped index rows | index builds | " +
        "capped served | capped serve time | uncapped served | uncapped serve time |")
      println("|---|---|---|---|---|---|---|---|")
      rowsBm25Cap.foreach(println)
    }

    // Prefix join on a SHARED-SHINGLE axis (r10 VERDICT directive #1):
    // the §prefix replication is shingle-disjoint by construction, so
    // its candidate volume is forced linear and structurally CANNOT
    // exhibit the superlinear regime the exact AllPairs family has on
    // organically-overlapping corpora. VERBATIM replication is the
    // adversarial axis: replicas share ALL shingles, so the TRUE pair
    // set itself grows Θ(k²) (k² organic images of every base pair,
    // plus C(k,2) exact-duplicate pairs per doc) — superlinear OUTPUT
    // is a property of the problem, not the algorithm. The honest
    // efficiency metric is therefore candidates-per-true-pair (the
    // verify overhead the prefix+positional cut admits), tabled beside
    // the production-form contrast: the MinHash-LSH screen at the same
    // threshold, whose banded candidates track the same true-pair
    // volume with tunable recall instead of exactness.
    val rowsPrefixShared = factors.filter(_ => sections("prefixshared")).map { k =>
      System.err.println(s"[scale] factor $k (prefix shared-shingle) ...")
      val docs = replicatedDocsVerbatim(k)
      val nDocs = docs.count()
      val (cands, tCand) = timedCount(Dedup.prefixCandidatesOf(docs))
      val t0 = System.nanoTime()
      val nPairs = Dedup.prefixFilterJoinOf(docs).count()
      val tJoin = (System.nanoTime() - t0) / 1e9
      val (lsh, tLsh) = timedCount(
        Dedup.minhashPairsOf(docs, Dedup.PrefixJoinThreshold))
      s"| ${k}x | $nDocs | $nPairs | $cands | " +
        s"${f"${cands.toDouble / math.max(nPairs, 1)}%.1f"} | " +
        s"${f"$tCand%.1f"}s | ${f"$tJoin%.1f"}s | $lsh | ${f"$tLsh%.1f"}s |"
    }
    if (sections("prefixshared")) {
      println()
      println("| factor | docs | true pairs>=0.5 | exact candidates | " +
        "cand/pair | cand time | exact join time | lsh screen pairs | lsh time |")
      println("|---|---|---|---|---|---|---|---|---|")
      rowsPrefixShared.foreach(println)
    }

    // PageRank edge growth (r10 VERDICT directive #4), two axes:
    //
    // DISJOINT (the sf1 bench axis — order AND part keys shift, the
    // graph becomes k independent copies): nodes and edges grow k×,
    // degree stays flat — PageRank cost is Θ(edges)·iters and should
    // scale ~linearly; the kNN arm pays the extra weight-window +
    // transpose join once per edge build.
    //
    // VERBATIM (same baskets k× — "more corpus, same catalog, more
    // evidence"): the distinct pair set is INVARIANT but every pair's
    // support scales k×, so any FIXED support floor degrades (at k ≥
    // floor every one-off pair passes and the floor stops pruning) —
    // measured in the raw-floor column — while the mutual top-m cut is
    // support-scale-invariant: the kNN graph is IDENTICAL at every
    // factor (the suite pins rank equality; here we pin the edge
    // count).
    import graft.operators.Graph
    def liDisjoint(k: Int): DataFrame = {
      val li = graft.sources.Tables.lineitem(spark, baseDir)
        .select("l_orderkey", "l_partkey")
      (0 until k).map { i =>
        if (i == 0) li
        else li.select((col("l_orderkey") + lit(i * ReplicaStride)).as("l_orderkey"),
          (col("l_partkey") + lit(i * ReplicaStride)).as("l_partkey"))
      }.reduce(_ unionByName _)
    }
    def liVerbatim(k: Int): DataFrame = {
      val li = graft.sources.Tables.lineitem(spark, baseDir)
        .select("l_orderkey", "l_partkey")
      (0 until k).map { i =>
        if (i == 0) li
        else li.withColumn("l_orderkey", col("l_orderkey") + lit(i * ReplicaStride))
      }.reduce(_ unionByName _)
    }
    val rowsPr = factors.filter(_ => sections("pagerank")).map { k =>
      System.err.println(s"[scale] factor $k (pagerank) ...")
      val liD = liDisjoint(k)
      val (rawEdges, _) = timedCount(Graph.copurchaseEdges(liD))
      val rawNodes = Graph.copurchaseEdges(liD).select("src").distinct().count()
      val t0 = System.nanoTime()
      val rawRows = Graph.pagerankRanks(Graph.copurchaseEdges(liD)).count()
      val tRaw = (System.nanoTime() - t0) / 1e9
      val (knnE, tKnnBuild) = timedCount(Graph.knnEdges(liD))
      val t1 = System.nanoTime()
      Graph.pagerankRanks(Graph.knnEdges(liD), "scaleKnn").count()
      val tKnn = (System.nanoTime() - t1) / 1e9
      // the delta-stopped production arm: rounds-to-converge is the
      // claim under test — damping contracts the delta geometrically,
      // so the round count should be ~flat while per-round cost tracks
      // the (bounded-degree) edge count
      val t2 = System.nanoTime()
      val convRounds = Graph.pagerankConvergedRanks(
        Graph.knnEdges(liD), "scaleConv").select("rounds").head().getInt(0)
      val tConv = (System.nanoTime() - t2) / 1e9
      s"| ${k}x | $rawNodes | $rawEdges | ${rawEdges / math.max(rawNodes, 1)} | " +
        s"$rawRows | ${f"$tRaw%.1f"}s | $knnE | ${f"$tKnnBuild%.1f"}s | ${f"$tKnn%.1f"}s | " +
        s"$convRounds | ${f"$tConv%.1f"}s |"
    }
    if (sections("pagerank")) {
      println()
      println("| factor | nodes | raw edges | mean deg | rank rows | " +
        "raw pagerank time | knn edges | knn build time | knn pagerank time | " +
        "conv rounds | conv time |")
      println("|---|---|---|---|---|---|---|---|---|---|---|")
      rowsPr.foreach(println)
    }
    val rowsPrV = factors.filter(_ => sections("pagerank")).map { k =>
      System.err.println(s"[scale] factor $k (pagerank verbatim) ...")
      val liV = liVerbatim(k)
      val items = liV.select(col("l_orderkey").as("ok"),
        col("l_partkey").as("p")).distinct()
      val w = items.select(col("ok"), col("p").as("src"))
        .join(items.select(col("ok"), col("p").as("dst")), "ok")
        .filter(col("src") =!= col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      val r = w.agg(count(lit(1)),
        sum(when(col("w") >= 2, 1L).otherwise(0L))).head()
      val (distinctPairs, floor2) = (r.getLong(0), r.getLong(1))
      val knnE = Graph.knnEdges(liV).count()
      s"| ${k}x | $distinctPairs | $floor2 | $knnE |"
    }
    if (sections("pagerank")) {
      println()
      println("| factor | distinct pairs (verbatim axis) | pairs >= fixed floor 2 | mutual-knn edges |")
      println("|---|---|---|---|")
      rowsPrV.foreach(println)
    }

    // Ground-truth AUDIT arms under the fixed-probe cost model (r10
    // VERDICT directive #6): both recall audits grade exactness against
    // a CONSTANT-size probe set (256 probe docs for the LSH screen,
    // the 10 designated query vectors for the ADC chains), so the
    // exact arm is O(probes × corpus) and the audits should track the
    // corpus ~linearly instead of compounding.
    val rowsAudit = factors.filter(_ => sections("auditprobe")).map { k =>
      System.err.println(s"[scale] factor $k (audit probes) ...")
      val docs = replicatedDocs(spark, baseDir, k)
      val nd = docs.count()
      val t0 = System.nanoTime()
      val nDecile = Dedup.lshRecallAuditOf(docs).count()
      val tLsh = (System.nanoTime() - t0) / 1e9
      val e = replicatedEmbeddings(spark, baseDir, k)
      val nv = e.count()
      val t1 = System.nanoTime()
      val nPq = SimSearch.pqRecallOf(e).count()
      val tPq = (System.nanoTime() - t1) / 1e9
      s"| ${k}x | $nd | ${Dedup.RecallProbeDocs} | $nDecile | ${f"$tLsh%.1f"}s | " +
        s"$nv | ${SimSearch.NQueries} | $nPq | ${f"$tPq%.1f"}s |"
    }
    if (sections("auditprobe")) {
      println()
      println("| factor | docs | lsh probes | decile rows | lsh recall time | " +
        "vectors | pq queries | pq rows | pq recall time |")
      println("|---|---|---|---|---|---|---|---|---|")
      rowsAudit.foreach(println)
    }

    // GAP-FILL/RESAMPLE: the log grows k× with timestamps and types
    // replicated IN PLACE, so the (hour × type) grid is invariant —
    // the claim: output rows CONSTANT while the cost is the single
    // map-side-combined corpus collapse (everything downstream is
    // grid-sized).
    val rowsResample = factors.filter(_ => sections("resample")).map { k =>
      System.err.println(s"[scale] factor $k (resample) ...")
      val ev = replicatedEvents(spark, baseDir, k)
      val nEv = ev.count()
      val (n, t) = timedCount(graft.operators.EventsOps.resampleHourlyOf(ev))
      s"| ${k}x | $nEv | $n | ${f"$t%.1f"}s |"
    }
    if (sections("resample")) {
      println()
      println("| factor | log rows | grid rows out | resample time |")
      println("|---|---|---|---|")
      rowsResample.foreach(println)
    }

    // SNAPSHOT DIFF: both snapshots grow k× (the registered identity
    // form — replayed merge + full-outer compare); the touched set
    // grows with the mod-rule batch. Claim: the co-partitioned compare
    // is linear with a flat per-row cost and the output is |Δ|-sized,
    // never corpus-sized.
    val rowsDiff = factors.filter(_ => sections("snapdiff")).map { k =>
      System.err.println(s"[scale] factor $k (snapshot diff) ...")
      import graft.operators.CorpusMerge
      val (snap, snapRdd) = Dedup.materializeOwned(
        replicatedDocs(spark, baseDir, k)
          .select(col("doc_id"), col("text"), col("lang"), col("source")),
        reliable = false)
      val n = snap.count()
      val merged = CorpusMerge.mergeUpsert(snap,
        CorpusMerge.changeBatchOf(spark, snap), "doc_id",
        Seq("text", "lang", "source"))
      val (nd, td) = timedCount(CorpusMerge.snapshotDiffOf(snap, merged))
      Dedup.retire(spark, snapRdd)
      s"| ${k}x | $n | $nd | ${f"$td%.1f"}s |"
    }
    if (sections("snapdiff")) {
      println()
      println("| factor | snapshot rows | diff rows out | merge+diff time |")
      println("|---|---|---|---|")
      rowsDiff.foreach(println)
    }

    // BINARY QUANTIZATION: the corpus grows k× (fresh vec_ids, vectors
    // unchanged), the query set stays the 10 base vectors. Claim: the
    // signature scan is the only corpus-sized stage — candidates stay
    // |queries|×BqCandidates and the rerank fixed, so output is
    // constant and time scan-bound.
    val rowsBq = factors.filter(_ => sections("bq")).map { k =>
      System.err.println(s"[scale] factor $k (bq hamming) ...")
      import graft.operators.SimSearch
      val e = replicatedEmbeddings(spark, baseDir, k)
      val nv = e.count()
      val (n, t) = timedCount(SimSearch.bqHammingTopKOf(e))
      s"| ${k}x | $nv | $n | ${f"$t%.1f"}s |"
    }
    if (sections("bq")) {
      println()
      println("| factor | vectors | reranked rows out | bq search time |")
      println("|---|---|---|---|")
      rowsBq.foreach(println)
    }

    // COMPACTION: the corpus grows k×, the layout contract does not
    // (64 fragments → 8 bins at every factor). Claim: cost is the one
    // shuffle+write of the data being compacted — the OPTIMIZE
    // contract — and the output file count is a property of the
    // layout, not the volume. Fragmented fixture written untimed.
    val rowsCompact = factors.filter(_ => sections("compaction")).map { k =>
      System.err.println(s"[scale] factor $k (compaction) ...")
      import graft.operators.Layout
      val tmp = System.getProperty("java.io.tmpdir")
      val fragRoot = s"$tmp/graft_scale_frag_$k"
      val outRoot = s"$tmp/graft_scale_compacted_$k"
      val docs = replicatedDocs(spark, baseDir, k)
      Layout.writeFragmented(docs, fragRoot)
      val t0 = System.nanoTime()
      val audit = Layout.compactionRunOf(spark, fragRoot, outRoot)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val t = (System.nanoTime() - t0) / 1e9
      def rmTree(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
        f.delete(); ()
      }
      rmTree(new java.io.File(fragRoot)); rmTree(new java.io.File(outRoot))
      s"| ${k}x | ${audit("fragmented")._2} | ${audit("fragmented")._1} | " +
        s"${audit("compacted")._1} | ${f"$t%.1f"}s |"
    }
    if (sections("compaction")) {
      println()
      println("| factor | rows | files before | files after | compact+audit time |")
      println("|---|---|---|---|---|")
      rowsCompact.foreach(println)
    }

    // CONTENT-DEFINED CHUNKING: corpus grows k× (shingle-disjoint
    // replicas — each replica's chunk hashes are fresh, so the df frame
    // grows linearly too). Claim: the whole census is scan-shaped —
    // chunking inside one codegen lambda, O(chunks) rows after, the df
    // group-by posting-list shaped — so time grows ~linearly with no
    // quadratic pair stage anywhere.
    val rowsCdc = factors.filter(_ => sections("cdc")).map { k =>
      System.err.println(s"[scale] factor $k (cdc chunking) ...")
      val docs = replicatedDocs(spark, baseDir, k)
      val nd = docs.count()
      val (n, t) = timedCount(Dedup.cdcChunkStatsOf(docs))
      s"| ${k}x | $nd | $n | ${f"$t%.1f"}s |"
    }
    if (sections("cdc")) {
      println()
      println("| factor | docs | census rows out | chunk census time |")
      println("|---|---|---|---|")
      rowsCdc.foreach(println)
    }

    // INCREMENTAL CDC screen: a FIXED re-delivered batch probed against
    // a GROWING chunk store (replicated docs — replicas chunk to fresh
    // hash spaces, so the key set grows linearly). Claim: the screen is
    // O(batch) — only the batch is chunked, the probe is one equi-join
    // whose output stays batch-bounded — while the store's key-set
    // build (the per-snapshot artifact) grows with the store.
    val rowsCdcInc = factors.filter(_ => sections("cdcinc")).map { k =>
      System.err.println(s"[scale] factor $k (cdc incremental screen) ...")
      val t0i = System.nanoTime()
      val (idx, idxRdd) = Dedup.materializeOwned(
        Dedup.cdcChunkIndexOf(replicatedDocs(spark, baseDir, k)),
        reliable = false)
      val nIdx = idx.count()
      val tIdx = (System.nanoTime() - t0i) / 1e9
      val batch = graft.sources.Tables.fanOut(
          graft.sources.Tables.documents(spark, baseDir))
        .select((col("doc_id") + Dedup.CdcRedeliverShift).as("doc_id"),
          concat(lit("redelivered copy "), col("text")).as("text"))
      val (n, t) = timedCount(Dedup.cdcScreenOf(batch, idx))
      Dedup.retire(spark, idxRdd)
      s"| ${k}x | $nIdx | ${f"$tIdx%.1f"}s | $n | ${f"$t%.1f"}s |"
    }
    if (sections("cdcinc")) {
      println()
      println("| factor | store chunk keys | key-set build | screened docs | screen time |")
      println("|---|---|---|---|---|")
      rowsCdcInc.foreach(println)
    }

    // Batch k-center at PRODUCTION K: fixed corpus, K in the hundreds.
    // The claim the round-8 verdict asked to pin: driver round-trips
    // are the latency axis — sequential Gonzalez pays K−1 argmax
    // round-trips; the batch variant pays ⌈K/T⌉ passes at T=16, each
    // one narrow corpus job.
    val rowsKcProd = (if (sections("kcenterprod")) Seq(32, 128)
      else Seq.empty[Int]).map { bigK =>
      System.err.println(s"[scale] K=$bigK (kcenter production) ...")
      import graft.operators.{Dedup, SimSearch}
      val e = replicatedEmbeddings(spark, baseDir, 1)
      val t0 = System.nanoTime()
      val seq = SimSearch.kcenterSelectOf(e, bigK).collect()
      val tSeq = (System.nanoTime() - t0) / 1e9
      // pruned sequential at the same K (r10): identical sequence,
      // driver-served argmax, triangle-bound update, matEvery=16
      val kq = SimSearch.semDerivedK(e.count())
      val (assign, assignRdd) = Dedup.materializeOwned(
        SimSearch.kmeansAssignment(e, kq, SimSearch.KmIters)
          .select(col("vec_id"), col("cent_id").as("cell")), reliable = false)
      val (geo, geoRdd) = Dedup.materializeOwned(
        SimSearch.cellGeometryOf(e, assign), reliable = false)
      val tel = scala.collection.mutable.ArrayBuffer
        .empty[SimSearch.KcenterRoundPrune]
      val t0p = System.nanoTime()
      val selP = SimSearch.kcenterSelectPrunedOf(e, bigK, assign, geo,
        telemetry = Some(tel)).collect()
      val tP = (System.nanoTime() - t0p) / 1e9
      val sameP = selP.map(_.toString).toSeq == seq.map(_.toString).toSeq
      val rowFrac = 100.0 * tel.map(_.rowsSkipped).sum /
        math.max(1L, tel.map(r => r.rowsSkipped + r.rowsActive).sum)
      Dedup.retire(spark, assignRdd)
      Dedup.retire(spark, geoRdd)
      val t = 16
      val passes = math.ceil((bigK - 1).toDouble / t).toInt
      val t0b = System.nanoTime()
      val selB = SimSearch.kcenterSelectBatchOf(e, t, passes).collect()
      val tB = (System.nanoTime() - t0b) / 1e9
      s"| $bigK | ${seq.length} | ${bigK - 1} | ${f"$tSeq%.1f"}s | " +
        s"${f"$tP%.1f"}s | $sameP | ${f"$rowFrac%.0f"}% | " +
        s"${selB.length} | $passes | ${f"$tB%.1f"}s |"
    }
    if (sections("kcenterprod")) {
      println()
      println("| K | seq centers | seq round-trips | seq time | " +
        "pruned time | pruned ≡ seq | rows skipped | " +
        "batch centers | batch passes (T=16) | batch time |")
      println("|---|---|---|---|---|---|---|---|---|---|")
      rowsKcProd.foreach(println)
    }

    // Incremental curation screen: a FIXED arriving batch (the base odd
    // docs) flagged against the artifacts persisted from a GROWING
    // corpus (even docs × k). Claim: the SCREEN is O(batch) — flat as
    // the corpus 10×es — because the corpus enters only as the hash-
    // index equi-join side, the eval-gram set, and the 256-row dense
    // model. Artifact build is the corpus-side snapshot job, reported
    // separately (paid per index refresh, not per arrival).
    val rows15 = factors.filter(_ => sections("curationinc")).map { k =>
      System.err.println(s"[scale] factor $k (incremental curation) ...")
      val corpus = replicatedDocs(spark, baseDir, k).filter(col("doc_id") % 2 === 0)
      val batch = graft.sources.Tables.fanOut(
          graft.sources.Tables.documents(spark, baseDir))
        .filter(col("doc_id") % 2 === 1)
      def pin(df: DataFrame): (DataFrame, Long) = {
        val r = df.rdd; r.localCheckpoint(); val n = r.count()
        (spark.createDataFrame(r, df.schema), n)
      }
      val t0i = System.nanoTime()
      val (hashes, nHash) = pin(TextAnalysis.corpusHashIndexOf(corpus))
      val (evalG, nEval) = pin(TextAnalysis.evalGramSetOf(
        corpus.filter(col("doc_id") % TextAnalysis.EvalMod === 0)))
      val tokd = corpus.select(col("doc_id"),
        (col("lang") === "en").as("is_target"),
        graft.functions.TextFunctions.tokenize(col("text")).as("toks"))
      val (model, _) = pin(TextAnalysis.dsirModelOf(
        TextAnalysis.dsirBucketsFromToks(tokd)))
      val tIdx = (System.nanoTime() - t0i) / 1e9
      val t0s = System.nanoTime()
      val flags = TextAnalysis.curationFlagsOf(batch, hashes, evalG, model)
        .collect()
      val tScreen = (System.nanoTime() - t0s) / 1e9
      val selected = flags.count(r => !r.isNullAt(1) && r.getBoolean(1) &&
        r.getBoolean(3) && r.getBoolean(4) &&
        r.getDouble(5) >= TextAnalysis.CurationMinWeight)
      s"| ${k}x | $nHash | $nEval | ${f"$tIdx%.1f"}s | ${flags.length} | " +
        s"$selected | ${f"$tScreen%.1f"}s |"
    }
    if (sections("curationinc")) {
      println()
      println("| factor | corpus hashes | eval grams | artifact build | " +
        "batch flagged | selected | screen time |")
      println("|---|---|---|---|---|---|---|")
      rows15.foreach(println)
    }

    // BM25 index delta-merge: a FIXED arriving batch (base odd docs)
    // folds into the postings snapshot of a GROWING corpus (even docs
    // × k, pinned as the persisted index). Claim: merge + serve is
    // O(batch + touched words) — the corpus enters the merge only as
    // the pinned postings and the word-keyed df upsert — while the
    // full rebuild re-pays the corpus tokenize/aggregate every run.
    val rows16 = factors.filter(_ => sections("bm25merge")).map { k =>
      System.err.println(s"[scale] factor $k (bm25 index merge) ...")
      val corpus = replicatedDocs(spark, baseDir, k).filter(col("doc_id") % 2 === 0)
      val batch = graft.sources.Tables.fanOut(
          graft.sources.Tables.documents(spark, baseDir))
        .filter(col("doc_id") % 2 === 1)
      val queries = batch.filter(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("text"))
      val t0i = System.nanoTime()
      val snap = TextAnalysis.bm25Postings(corpus)
      val snapMat = { val r = snap.rdd; r.localCheckpoint(); r.count(); r }
      val nPost = snapMat.count()
      val tSnap = (System.nanoTime() - t0i) / 1e9
      val snapDf = spark.createDataFrame(snapMat, snap.schema)
      val t0m = System.nanoTime()
      val served = TextAnalysis.bm25ScoreOf(queries,
        TextAnalysis.bm25MergedIndexOf(snapDf, batch)).count()
      val tMerge = (System.nanoTime() - t0m) / 1e9
      val t0f = System.nanoTime()
      val full = TextAnalysis.bm25ScoreOf(queries,
        TextAnalysis.bm25IndexOf(corpus.unionByName(batch))).count()
      val tFull = (System.nanoTime() - t0f) / 1e9
      s"| ${k}x | $nPost | ${f"$tSnap%.1f"}s | $served | ${f"$tMerge%.1f"}s | " +
        s"$full | ${f"$tFull%.1f"}s |"
    }
    if (sections("bm25merge")) {
      println()
      println("| factor | snapshot postings | snapshot build | served rows | " +
        "merge+serve time | rebuild rows | rebuild+serve time |")
      println("|---|---|---|---|---|---|---|")
      rows16.foreach(println)
    }

    // DSIR: docs replicate token-renamed (vocabulary grows with the
    // corpus — the realistic model for the HASHED feature space, whose
    // whole point is absorbing unbounded vocabulary into fixed buckets).
    // The claim under test: model size is bucket-bounded (the broadcast
    // never grows), the only corpus-sized work is the (doc,bucket)
    // count — so selection time grows ~linearly and the en-enrichment
    // property holds at every factor.
    val rows9 = factors.filter(_ => sections("dsir")).map { k =>
      System.err.println(s"[scale] factor $k (dsir) ...")
      val d = replicatedDocs(spark, baseDir, k)
      val nDocs = d.count()
      val t0 = System.nanoTime()
      val sel = graft.operators.TextAnalysis.dsirResampleOf(d)
      val nSel = sel.count()
      val t = (System.nanoTime() - t0) / 1e9
      val nEn = sel.filter(col("lang") === "en").count()
      val baseEnPct = 100.0 * d.filter(col("lang") === "en").count() / nDocs
      s"| ${k}x | $nDocs | $nSel | $nEn | ${f"$baseEnPct%.0f"}%% | ${f"$t%.1f"}s |"
    }
    if (sections("dsir")) {
      println()
      println("| factor | docs | selected | selected en | base en share | select time |")
      println("|---|---|---|---|---|---|")
      rows9.foreach(println)
    }

    // Bloom runtime-filter join: orders AND lineitem replicate with
    // matched key strides (dim selectivity constant at every factor).
    // Two arms: FIXED M = BloomBits shows the honest saturation curve
    // (set bits approach M as dim NDV grows → false-positive rows grow),
    // SCALED M = BloomBits·k shows the standard sizing rule (M ∝ NDV)
    // holding the prune rate flat. "kept" counts fact rows surviving the
    // row-local probe — the rows that would enter the join exchange.
    val rows10 = factors.filter(_ => sections("bloom")).map { k =>
      System.err.println(s"[scale] factor $k (bloom join) ...")
      import graft.operators.ScaleTechniques
      val li = graft.sources.Tables.fanOut(graft.sources.Tables.lineitem(spark, baseDir))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val ord = graft.sources.Tables.fanOut(graft.sources.Tables.orders(spark, baseDir))
        .filter(col("o_totalprice") > SparkEntry.BloomDimPrice)
        .select("o_orderkey", "o_orderpriority")
      def rep(df: DataFrame, key: String) = (0 until k).map { i =>
        if (i == 0) df
        else df.withColumn(key, col(key) + lit(i * ReplicaStride))
      }.reduce(_ unionByName _)
      val fact = rep(li, "l_orderkey")
      val dim = rep(ord, "o_orderkey")
      val nFact = fact.count(); val nDim = dim.count()
      def keptWith(bits: Int): Long =
        fact.crossJoin(broadcast(ScaleTechniques.bloomBuild(
            dim.select("o_orderkey"), bits)))
          .filter(ScaleTechniques.bloomMightContain(col("l_orderkey"), bits))
          .count()
      val keptFixed = keptWith(ScaleTechniques.BloomBits)
      val keptScaled = keptWith(ScaleTechniques.BloomBits * k)
      def joinTime(bloom: Boolean): Double = {
        val t0 = System.nanoTime()
        val j =
          if (bloom) ScaleTechniques.bloomPrunedJoin(fact, dim,
            "l_orderkey", "o_orderkey", ScaleTechniques.BloomBits * k)
          else fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        j.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
          .count()
        (System.nanoTime() - t0) / 1e9
      }
      val tBloom = joinTime(bloom = true)
      val tPlain = joinTime(bloom = false)
      s"| ${k}x | $nFact | $nDim | $keptFixed | $keptScaled | " +
        s"${f"$tBloom%.1f"}s | ${f"$tPlain%.1f"}s |"
    }
    if (sections("bloom")) {
      println()
      println("| factor | fact rows | dim keys | kept (fixed M) | kept (M ∝ NDV) | " +
        "bloom join time | plain join time |")
      println("|---|---|---|---|---|---|---|")
      rows10.foreach(println)
    }

    // Iterated BPE training: replicate docs UNTAGGED (plain copies with
    // doc_id strides) — unlike the dedup sections, the trainer's scale
    // story is that the WORD VOCABULARY saturates while the corpus
    // grows, so a k× corpus multiplies every word frequency by k and
    // leaves the vocabulary (and so every post-round-0 cost) constant.
    // Two claims under test: train time grows far sub-linearly (only
    // the round-0 vocabulary count touches the corpus), and the learned
    // merge table is IDENTICAL at every factor with frequencies exactly
    // k× — uniform replication cannot change an argmax.
    // 1× reference trained ONCE, untimed (and warming the JVM), so each
    // factor's timed number is exactly one training run
    lazy val bpeBase = graft.operators.TextAnalysis.bpeMergesOf(
      graft.sources.Tables.fanOut(graft.sources.Tables.documents(spark, baseDir)),
      graft.operators.TextAnalysis.BpeTrainRounds)
    val rows11 = factors.filter(_ => sections("bpe")).map { k =>
      System.err.println(s"[scale] factor $k (bpe train) ...")
      import graft.operators.TextAnalysis
      val base1 = bpeBase
      val d = {
        val base = graft.sources.Tables.fanOut(
          graft.sources.Tables.documents(spark, baseDir))
        (0 until k).map { i =>
          if (i == 0) base
          else base.withColumn("doc_id", col("doc_id") + lit(i * ReplicaStride))
        }.reduce(_ unionByName _)
      }
      val nDocs = d.count()
      val nVocab = TextAnalysis.bpeVocab(d).count()
      val t0 = System.nanoTime()
      val merges = TextAnalysis.bpeMergesOf(d, TextAnalysis.BpeTrainRounds)
      val t = (System.nanoTime() - t0) / 1e9
      val sameMerges = merges.map(m => (m._1, m._2, m._3, m._4)) ==
        base1.map(m => (m._1, m._2, m._3, m._4))
      val freqK = merges.map(_._5).zip(base1.map(_._5))
        .forall { case (fk, f1) => fk == f1 * k }
      s"| ${k}x | $nDocs | $nVocab | ${merges.length} | " +
        s"${sameMerges && freqK} | ${f"$t%.1f"}s |"
    }
    if (sections("bpe")) {
      println()
      println("| factor | docs | vocab | rounds | merges ≡ 1× (freq ×k) | train time |")
      println("|---|---|---|---|---|---|")
      rows11.foreach(println)
    }

    // Winnowing fingerprints: qz-tagged replicas (shingle-disjoint, so
    // replica fingerprints never collide) — the honest linear model.
    // Claims under test: fingerprint count and pair count grow linearly
    // (within-replica geometry repeats k times, cross-replica pairs are
    // impossible by construction), and wall time tracks the corpus-
    // shaped fingerprint pass, not a quadratic join.
    val rows12 = factors.filter(_ => sections("winnow")).map { k =>
      System.err.println(s"[scale] factor $k (winnow) ...")
      import graft.operators.Dedup
      // constant plant of 400 (full, truncated-copy) pairs whose tokens
      // carry a PER-DOC tag, so their fingerprints have df exactly 2 at
      // every corpus size — distinctive shared content, the thing the
      // report exists to find. (An untagged plant goes dark as the
      // corpus grows: with the generator's 30-word vocabulary every raw
      // 8-gram crosses the df cap — correct behavior, the cap's whole
      // job is to refuse corpus-common content as dup evidence.)
      val tagged = graft.sources.Tables.documents(spark, baseDir)
        .filter(col("doc_id") < 400)
        .select(col("doc_id"), expr(
          "regexp_replace(text, '(\\\\S+)', concat('d', cast(doc_id as string), 'z', '$1'))")
          .as("text"))
      val plantFull = tagged
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      val plantTrunc = tagged.select((col("doc_id") + 3000000L).as("doc_id"),
        col("text").substr(lit(1),
          greatest((length(col("text")) / 3).cast("int"), lit(60))).as("text"))
      val d = replicatedDocs(spark, baseDir, k)
        .select("doc_id", "text")
        .unionByName(plantFull).unionByName(plantTrunc)
      val nDocs = d.count()
      val t0 = System.nanoTime()
      val nFps = Dedup.winnowFingerprintsOf(d).count()
      val tF = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nPairs = Dedup.winnowPairsOf(d).count()
      val tP = (System.nanoTime() - t1) / 1e9
      s"| ${k}x | $nDocs | $nFps | ${f"$tF%.1f"}s | $nPairs | ${f"$tP%.1f"}s |"
    }
    if (sections("winnow")) {
      println()
      println("| factor | docs | fingerprints | fp time | report pairs | pairs time |")
      println("|---|---|---|---|---|---|")
      rows12.foreach(println)
    }

    // k-center greedy: replicated embeddings (disjoint ids, same
    // geometry repeated k times). Claims: K narrow passes ⇒ ~linear
    // wall time, and the selection radii stay well-formed (the
    // replicated geometry contains exact copies of every point, so the
    // radius sequence is data-dependent — the pinned invariant is the
    // non-increasing property, not identity).
    val rows13 = factors.filter(_ => sections("kcenter")).map { k =>
      System.err.println(s"[scale] factor $k (kcenter) ...")
      import graft.operators.SimSearch
      val e = replicatedEmbeddings(spark, baseDir, k)
      val n = e.count()
      val t0 = System.nanoTime()
      val sel = SimSearch.kcenterSelectOf(e, SimSearch.KCenterK).collect()
      val t = (System.nanoTime() - t0) / 1e9
      val radii = sel.sortBy(_.getLong(0)).drop(1).map(_.getDouble(2))
      val mono = radii.sliding(2).forall(p => p.length < 2 || p(1) <= p(0))
      // the batch variant: same center budget from 2 passes instead of
      // K−1 — the saved axis is DRIVER ROUND-TRIPS, not corpus passes
      val t0b = System.nanoTime()
      val selB = SimSearch.kcenterSelectBatchOf(e,
        SimSearch.KCenterBatchT, SimSearch.KCenterBatchPasses).collect()
      val tB = (System.nanoTime() - t0b) / 1e9
      s"| ${k}x | $n | ${sel.length} | $mono | ${f"$t%.1f"}s | " +
        s"${selB.length} | ${SimSearch.KCenterBatchPasses} | ${f"$tB%.1f"}s |"
    }
    if (sections("kcenter")) {
      println()
      println("| factor | vectors | centers | radii non-increasing | select time | " +
        "batch centers | batch passes | batch time |")
      println("|---|---|---|---|---|---|---|---|")
      rows13.foreach(println)
    }

    // PRUNED k-center (the round-10 fix for the round-9 perf-weak
    // grade): same replicated geometry, quantizer derived exactly as
    // the registered arm derives it (kmeansAssignment at
    // semDerivedK(n), built UNTIMED — it is a build:ann_index
    // artifact). Claims: (1) the center sequence is bit-identical to
    // exact Gonzalez at every factor; (2) wall growth is well under
    // the exact arm's ~linear; (3) the triangle bound skips a measured,
    // growing fraction of cells/rows (K ∝ N keeps cells at ~64
    // members, so cell radii stay fixed while inter-point distances
    // to a new center don't shrink — more cells clear the bound as
    // the corpus grows).
    def kcPruneRow(tag: String, e: DataFrame): String = {
      import graft.operators.{Dedup, SimSearch}
      val n = e.count()
      val tb0 = System.nanoTime()
      val kq = SimSearch.semDerivedK(n)
      val (assign, assignRdd) = Dedup.materializeOwned(
        SimSearch.kmeansAssignment(e, kq, SimSearch.KmIters)
          .select(col("vec_id"), col("cent_id").as("cell")), reliable = false)
      val (geo, geoRdd) = Dedup.materializeOwned(
        SimSearch.cellGeometryOf(e, assign), reliable = false)
      val tBuild = (System.nanoTime() - tb0) / 1e9
      val t0 = System.nanoTime()
      val exact = SimSearch.kcenterSelectOf(e, SimSearch.KCenterK).collect()
      val tExact = (System.nanoTime() - t0) / 1e9
      val tel = scala.collection.mutable.ArrayBuffer
        .empty[SimSearch.KcenterRoundPrune]
      val t1 = System.nanoTime()
      val pruned = SimSearch.kcenterSelectPrunedOf(e, SimSearch.KCenterK,
        assign, geo, telemetry = Some(tel)).collect()
      val tPruned = (System.nanoTime() - t1) / 1e9
      val same = exact.map(_.toString).toSeq == pruned.map(_.toString).toSeq
      val cellFrac = 100.0 * tel.map(_.cellsSkipped.toLong).sum /
        math.max(1L, tel.map(r => (r.cellsSkipped + r.cellsActive).toLong).sum)
      val rowFrac = 100.0 * tel.map(_.rowsSkipped).sum /
        math.max(1L, tel.map(r => r.rowsSkipped + r.rowsActive).sum)
      Dedup.retire(spark, assignRdd)
      Dedup.retire(spark, geoRdd)
      f"| $tag | $n | $kq | $same | $tExact%.1fs | $tPruned%.1fs | " +
        f"$cellFrac%.0f%% | $rowFrac%.0f%% | $tBuild%.1fs |"
    }
    val rowsKcPrune = factors.filter(_ => sections("kcprune")).map { k =>
      System.err.println(s"[scale] factor $k (kcprune) ...")
      kcPruneRow(s"${k}x", replicatedEmbeddings(spark, baseDir, k))
    }
    // The skip fraction is GEOMETRY-DEPENDENT: the testdata embeddings
    // are uniform on the 64-dim unit sphere (sampled pair distances
    // concentrate at sqrt(2); trained cell radii ~0.99 against centroid
    // separations ~0.45) — the known worst case for ANY triangle-
    // inequality prune, so the table above honestly measures ~0% and
    // the pruned arm's win there is structural (driver-served argmax,
    // one materialization instead of a checkpoint per round). The table
    // below runs the SAME operator on clustered geometry — 20 separated
    // Gaussian clusters, sigma 0.05, the shape IVF pruning exists for —
    // where the bound must bite and the skip fraction must GROW with
    // the corpus (K proportional to N keeps cells tight while inter-
    // cluster distances stay fixed).
    val rowsKcPruneCl = factors.filter(_ => sections("kcprune")).map { k =>
      System.err.println(s"[scale] factor $k (kcprune clustered) ...")
      import spark.implicits._
      val n = 2000 * k
      val rnd = new scala.util.Random(42)
      val cents = Array.fill(20, 16)(rnd.nextGaussian())
      val pts = (0 until n).map { i =>
        val c = cents(i % 20)
        (i.toLong,
          Array.tabulate(16)(d => (c(d) + 0.05 * rnd.nextGaussian()).toFloat))
      }
      val e = graft.sources.Tables.fanOut(pts.toDF("vec_id", "embedding"))
      kcPruneRow(s"${k}x", e)
    }
    if (sections("kcprune")) {
      println()
      println("| factor | vectors | cells | sequence identical | exact time | " +
        "pruned time | cells skipped | rows skipped | quantizer build (untimed axis) |")
      println("|---|---|---|---|---|---|---|---|---|")
      rowsKcPrune.foreach(println)
      println()
      println("| factor (clustered) | vectors | cells | sequence identical | exact time | " +
        "pruned time | cells skipped | rows skipped | quantizer build (untimed axis) |")
      println("|---|---|---|---|---|---|---|---|---|")
      rowsKcPruneCl.foreach(println)
    }

    // CORESET WEIGHTS: the corpus grows k×, the selected center set is
    // the fixed production K (selected once from the base corpus,
    // untimed — the selection has its own kcprune table). Claim: the
    // weights pass is ONE narrow broadcast scan, O(N·K) flops, K-row
    // output — time ~linear in N, output constant, Σ weight ≡ N.
    val rowsKcw = factors.filter(_ => sections("kcweights")).map { k =>
      System.err.println(s"[scale] factor $k (kcenter weights) ...")
      import graft.operators.SimSearch
      val centers = SimSearch.kcenterSelectPruned(spark, baseDir)
      val e = replicatedEmbeddings(spark, baseDir, k)
      val nv = e.count()
      val t0 = System.nanoTime()
      val w = SimSearch.kcenterWeightsOf(e, centers).collect()
      val t = (System.nanoTime() - t0) / 1e9
      val sumW = w.map(_.getLong(1)).sum
      s"| ${k}x | $nv | ${w.length} | $sumW | ${sumW == nv} | ${f"$t%.1f"}s |"
    }
    if (sections("kcweights")) {
      println()
      println("| factor | vectors | weight rows (K) | sum(weight) | sum==N | " +
        "weights pass time |")
      println("|---|---|---|---|---|---|")
      rowsKcw.foreach(println)
    }

    // PHASH PAIRS GRAIN: the catalog hash frame grows k× with the SAME
    // saturated 64-bit hash space (fresh media_ids, dhash values
    // unchanged — exactly the degeneracy sf1 measured: a procedural
    // catalog collapses to a few hundred distinct hashes at any scale).
    // Decode is untimed (charged to build:media_index). Claim: the
    // hash-GROUP output is scale-stable while the id-grain equivalent
    // (Σ n_pairs, reported from the same run) grows ~quadratically —
    // the r10 re-grain moved the quadratic blowup out of the output.
    val rowsPhashGrain = factors.filter(_ => sections("phashgrain")).map { k =>
      System.err.println(s"[scale] factor $k (phash grain) ...")
      import graft.multimodal.Multimodal
      val base = Multimodal.dHash(
        Multimodal.plantedMediaRecords(spark, baseDir)).toDF()
        .select("media_id", "ok", "dhash")
      val grown = (0 until k).map { i =>
        if (i == 0) base
        else base.select((col("media_id") + lit(i * ReplicaStride)).as("media_id"),
          col("ok"), col("dhash"))
      }.reduce(_ unionByName _)
      val (hashes, hashesRdd) = Dedup.materializeOwned(grown, reliable = false)
      val nImgs = hashes.count()
      val t0 = System.nanoTime()
      val rows = Multimodal.phashGroupPairsOf(hashes)
        .agg(count(lit(1)).as("rows"), sum(col("n_pairs")).as("id_pairs"))
        .collect()(0)
      val t = (System.nanoTime() - t0) / 1e9
      Dedup.retire(spark, hashesRdd)
      s"| ${k}x | $nImgs | ${rows.getLong(0)} | ${rows.getLong(1)} | ${f"$t%.1f"}s |"
    }
    if (sections("phashgrain")) {
      println()
      println("| factor | catalog images | group rows out | id-grain pairs " +
        "(Σ n_pairs) | pairing time |")
      println("|---|---|---|---|---|")
      rowsPhashGrain.foreach(println)
    }

    // LIGHTWEIGHT CORESET: the corpus grows k×, the draw stays m=32.
    // Claim: two narrow corpus passes (fixed-point mean, scoring) and
    // a TakeOrdered top-m — output constant, time ~linear, no driver
    // loop at any scale (the contrast axis to §kcprune's K passes).
    val rowsCoreset = factors.filter(_ => sections("coreset")).map { k =>
      System.err.println(s"[scale] factor $k (lightweight coreset) ...")
      import graft.operators.SimSearch
      val e = replicatedEmbeddings(spark, baseDir, k)
      val nv = e.count()
      val t0 = System.nanoTime()
      val (cs, csRdd) = Dedup.materializeOwned(
        SimSearch.coresetTailOf(SimSearch.coresetScoredOf(e)),
        reliable = false)
      val nCs = cs.count()
      val t = (System.nanoTime() - t0) / 1e9
      // the training audit: 32-row Lloyd + ONE corpus assignment pass
      val t1 = System.nanoTime()
      val nTr = SimSearch.coresetTrainOf(e, cs).count()
      val tTr = (System.nanoTime() - t1) / 1e9
      Dedup.retire(spark, csRdd)
      s"| ${k}x | $nv | $nCs | ${f"$t%.1f"}s | $nTr | ${f"$tTr%.1f"}s |"
    }
    if (sections("coreset")) {
      println()
      println("| factor | vectors | coreset rows out | mean+score+draw time | " +
        "clusters | train+corpus-assign time |")
      println("|---|---|---|---|---|---|")
      rowsCoreset.foreach(println)
    }

    // RM3 expansion serve: replicas carry per-replica token tags, so
    // the base-replica probe queries match only base-replica postings —
    // the claim is the bm25 serving posture held through BOTH passes:
    // feedback, relevance model and interpolation are queries×terms-
    // bounded, the corpus enters only via the two word-keyed postings
    // joins, so output stays constant while the postings build grows.
    val rowsRm3 = factors.filter(_ => sections("rm3")).map { k =>
      System.err.println(s"[scale] factor $k (rm3 expansion) ...")
      val docs = replicatedDocs(spark, baseDir, k).select("doc_id", "text")
      val nd = docs.count()
      // rm3RetrieveOf materializes EAGERLY — start the clock before the
      // call, not before the count of the retained result
      val t0 = System.nanoTime()
      val n = TextAnalysis.rm3RetrieveOf(docs).count()
      val t = (System.nanoTime() - t0) / 1e9
      s"| ${k}x | $nd | $n | ${f"$t%.1f"}s |"
    }
    if (sections("rm3")) {
      println()
      println("| factor | docs | rm3 rows out | build+expand+serve time |")
      println("|---|---|---|---|")
      rowsRm3.foreach(println)
    }

    // RIGHT-TO-BE-FORGOTTEN retraction: corpus AND erasure list grow k×
    // (erasure requests scale with users — id % ForgetMod). Claim: the
    // bm25 retraction is one anti-join + keyed decrements riding the
    // index components' existing shuffles (≈ the §bm25merge serve), and
    // the ANN retraction is an anti-join on the (pinned-artifact)
    // inverted lists before the same routed serve (≈ the §annmerge
    // merge arm) — retraction never costs more than the add path.
    val rowsForget = factors.filter(_ => sections("forget")).map { k =>
      System.err.println(s"[scale] factor $k (forget retraction) ...")
      import graft.operators.{CorpusMerge, SimSearch}
      val docs = replicatedDocs(spark, baseDir, k).select("doc_id", "text")
      val nd = docs.count()
      val forgetD = docs.select("doc_id")
        .filter(col("doc_id") % CorpusMerge.ForgetMod === CorpusMerge.ForgetRem)
      val queries = graft.sources.Tables.documents(spark, baseDir)
        .filter(col("doc_id") % 2 === 1 && col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("text"))
      val t0 = System.nanoTime()
      val nB = TextAnalysis.bm25ScoreOf(queries,
        TextAnalysis.bm25ForgetIndexOf(TextAnalysis.bm25Postings(docs),
          forgetD)).count()
      val tB = (System.nanoTime() - t0) / 1e9
      val e = replicatedEmbeddings(spark, baseDir, k)
      val snap = e.filter(col("vec_id") % 2 === 0)
      val batch = e.filter(col("vec_id") % 2 === 1)
      val forgetV = e.filter(
          col("vec_id") % CorpusMerge.ForgetMod === CorpusMerge.ForgetRem)
        .select("vec_id")
      // snapshot artifacts pinned untimed (the persisted index stand-in,
      // exactly the §annmerge discipline)
      val (cents, book, snapAssign, snapCodes) =
        SimSearch.annMergeScaleFrames(snap)
      val (ca, caRdd) = Dedup.materializeOwned(snapAssign, reliable = false)
      val (cc, ccRdd) = Dedup.materializeOwned(snapCodes, reliable = false)
      val t1 = System.nanoTime()
      val nA = SimSearch.annForgetServeWith(
        e, cents, book, ca, cc, batch, forgetV).count()
      val tA = (System.nanoTime() - t1) / 1e9
      Dedup.retire(spark, caRdd); Dedup.retire(spark, ccRdd)
      s"| ${k}x | $nd | ${forgetD.count()} | $nB | ${f"$tB%.1f"}s | " +
        s"$nA | ${f"$tA%.1f"}s |"
    }
    if (sections("forget")) {
      println()
      println("| factor | docs | erased ids | bm25 serve rows | bm25 retract+serve | " +
        "ann serve rows | ann retract+serve |")
      println("|---|---|---|---|---|---|---|")
      rowsForget.foreach(println)
    }

    // Round-10 governance ops: the constraint suite is ONE fact scan +
    // one broadcast dim probe + a 1-row aggregate (the only keyed
    // exchange is the uniqueness NDV); the bootstrap is a B=40
    // row-local hash fanout into one (lang, b)-keyed map-side-combined
    // pass. Both outputs are census-sized at every factor — the claim
    // is ~linear wall growth with constant output.
    val rowsGovern = factors.filter(_ => sections("govern")).map { k =>
      System.err.println(s"[scale] factor $k (governance) ...")
      import graft.operators.Profiling
      val orders = replicatedOrders(spark, baseDir, k)
      val nOrd = orders.count()
      val cust = graft.sources.Tables.customer(spark, baseDir)
        .select(col("c_custkey"))
      val t0 = System.nanoTime()
      val viol = Profiling
        .constraintReportOf(Profiling.plantedOrders(orders), cust)
        .agg(sum("n_violations")).collect().head.getLong(0)
      val tCon = (System.nanoTime() - t0) / 1e9
      val docs = replicatedDocs(spark, baseDir, k)
      val nd = docs.count()
      val t1 = System.nanoTime()
      val nCi = Profiling.bootstrapCiOf(docs).count()
      val tCi = (System.nanoTime() - t1) / 1e9
      s"| ${k}x | $nOrd | $viol | ${f"$tCon%.1f"}s | $nd | $nCi | ${f"$tCi%.1f"}s |"
    }
    if (sections("govern")) {
      println()
      println("| factor | orders | violations | constraint-suite time | " +
        "docs | ci rows | bootstrap time |")
      println("|---|---|---|---|---|---|---|")
      rowsGovern.foreach(println)
    }

    // Round-10 file-level Bloom index: per-file filters SIZED to the
    // file's key count (8 bits/key), so the measured false-positive
    // rate must stay FLAT while files grow 10× denser — the invariance
    // a fixed-m filter cannot deliver (vacuous small, saturated large).
    // Probes grow with the corpus (replica ids also hit the mod), the
    // per-probe pruning fraction is the flat claim.
    val rowsBloomF = factors.filter(_ => sections("bloomfiles")).map { k =>
      System.err.println(s"[scale] factor $k (bloom file index) ...")
      import graft.operators.Layout
      val docs = replicatedDocs(spark, baseDir, k)
      val nd = docs.count()
      val root = new java.io.File(
        java.nio.file.Files.createTempDirectory("graft_bloomscale").toFile,
        "docs").getAbsolutePath
      Layout.writeFragmented(docs, root)
      val t0 = System.nanoTime()
      // retention slot keyed by the replicated root: two factors' runs
      // must not evict each other's retained cuts (ADVICE r13)
      val out = Layout.bloomRunOf(spark, root, s"bloomRun#$root").collect()
      val t = (System.nanoTime() - t0) / 1e9
      val probes = out.length
      val cand = out.map(_.getLong(3)).sum
      val fp = out.map(_.getLong(5)).sum
      val fpPpm = fp * 1000000L / (probes.toLong * out.head.getLong(2))
      s"| ${k}x | $nd | $probes | $cand | $fp | $fpPpm | ${f"$t%.1f"}s |"
    }
    if (sections("bloomfiles")) {
      println()
      println("| factor | docs | probes | candidate files | fp files | " +
        "fp ppm (of probe×file checks) | build+serve time |")
      println("|---|---|---|---|---|---|---|")
      rowsBloomF.foreach(println)
    }

    // r13 directive #1: the grown-by-batch encode axis. For each corpus
    // size k: train frozen artifacts on the base (capped — flat), ENCODE
    // the base into its per-root store (corpus-linear, the contrast
    // arm), then add a FIXED-size batch as a second root and time the
    // incremental call — the base root fingerprint-hits and loads, so
    // the add must cost O(batch) regardless of k.
    val rowsAnnEnc = factors.filter(_ => sections("annencinc")).map { k =>
      System.err.println(s"[scale] factor $k (incremental ann encode) ...")
      import graft.operators.SimSearch
      val base = replicatedEmbeddings(spark, baseDir, k)
      val nBase = base.count()
      val batch = graft.sources.Tables.fanOut(
        graft.sources.Tables.embeddings(spark, baseDir))
        .select((col("vec_id") + lit(500L * ReplicaStride)).as("vec_id"),
          col("embedding"), col("label"))
      val nBatch = batch.count()
      val (centsRaw, bookRaw) = SimSearch.encodeScaleArtifacts(base)
      // pin the frozen artifacts so neither timed call re-trains them
      val (cents, centsRdd) = Dedup.materializeOwned(centsRaw, reliable = false)
      val (book, bookRdd) = Dedup.materializeOwned(bookRaw, reliable = false)
      val scratch = java.nio.file.Files
        .createTempDirectory("graft_annenc_scale").toString
      val t0 = System.nanoTime()
      SimSearch.ensureEncodedRoots(spark,
        Seq(s"$scratch/base" -> base), cents, book)
      val tBase = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      SimSearch.ensureEncodedRoots(spark,
        Seq(s"$scratch/base" -> base, s"$scratch/batch" -> batch),
        cents, book)
      val tInc = (System.nanoTime() - t1) / 1e9
      val encodedBatch = spark.read.parquet(s"$scratch/batch/ranked").count()
      Dedup.retire(spark, centsRdd)
      Dedup.retire(spark, bookRdd)
      s"| ${k}x | $nBase | ${f"$tBase%.1f"}s | $nBatch | $encodedBatch | " +
        s"${f"$tInc%.1f"}s |"
    }
    if (sections("annencinc")) {
      println()
      println("| factor | base vectors | base encode time | batch vectors | " +
        "batch ranked rows | incremental add time |")
      println("|---|---|---|---|---|---|")
      rowsAnnEnc.foreach(println)
    }

    // r13 directive #4: the forget family's SPARSE-erasure payoff. The
    // registered rules (id ≡ 3 mod 7) touch EVERY block/file, so the
    // committed bench numbers measure the worst-case full-relayout
    // regime; this axis erases a CLUSTERED slice (the standard zone box
    // — z-adjacent, a few blocks) and a ~0.01% id list (a few Bloom
    // candidate files) beside the dense rule on the same replicated
    // layouts, reporting blocks/files touched and wall for both arms.
    val rowsForgetSparse = factors.filter(_ => sections("forgetsparse")).map { k =>
      System.err.println(s"[scale] factor $k (sparse forget) ...")
      import graft.operators.Layout
      val ev = replicatedEvents(spark, baseDir, k)
        .select("event_id", "user_id", "value")
      val nEv = ev.count()
      val scratch = java.nio.file.Files
        .createTempDirectory("graft_fsparse").toString
      val a = pmod(col("user_id"), lit(1L << Layout.ZBits)).cast("long")
      val b = least(floor(col("value") / 2.0),
        lit((1 << Layout.ZBits) - 1).cast("double")).cast("long")
      val baseRoot = s"$scratch/zorder"
      ev.withColumn("blk",
          shiftright(Layout.zValue(a, b), Layout.ZPrefixShift))
        .repartition(Layout.ZoneBlocks, col("blk"))
        .write.mode("overwrite").partitionBy("blk").parquet(baseRoot)
      val sparsePred = col("user_id").between(Layout.ZoneBoxULo, Layout.ZoneBoxUHi) &&
        col("value").between(Layout.ZoneBoxVLo, Layout.ZoneBoxVHi)
      val densePred = col("event_id") % graft.operators.CorpusMerge.ForgetMod ===
        graft.operators.CorpusMerge.ForgetRem
      val nSparse = ev.filter(sparsePred).count()
      val t0 = System.nanoTime()
      val touchedS = Layout.zorderForgetPatch(spark, baseRoot, ev, sparsePred,
        s"$scratch/patch_sparse")
      val tS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val touchedD = Layout.zorderForgetPatch(spark, baseRoot, ev, densePred,
        s"$scratch/patch_dense")
      val tD = (System.nanoTime() - t1) / 1e9

      // Bloom file index: a ~0.01% erasure list against the registered
      // mod-7 rule over the same fragmented layout. Kernel wall includes
      // the patched SERVE (probe generation is the workload definition);
      // the sparse-vs-dense gap is the maintenance component.
      val docs = replicatedDocs(spark, baseDir, k)
      val docsRoot = s"$scratch/docs"
      Layout.writeFragmented(docs, docsRoot)
      val sparseIds = docs.filter(col("doc_id") % 9973 === 1).select("doc_id")
      val nSparseIds = sparseIds.count()
      val t2 = System.nanoTime()
      Layout.bloomForgetRun(spark, docsRoot, sparseIds,
        s"$scratch/bloom_sparse").collect()
      val tBs = (System.nanoTime() - t2) / 1e9
      val denseIds = docs.filter(col("doc_id") % graft.operators.CorpusMerge.ForgetMod ===
        graft.operators.CorpusMerge.ForgetRem).select("doc_id")
      val t3 = System.nanoTime()
      Layout.bloomForgetRun(spark, docsRoot, denseIds,
        s"$scratch/bloom_dense").collect()
      val tBd = (System.nanoTime() - t3) / 1e9
      def touchedFiles(p: String) = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p, "touched.txt")), "UTF-8")
        .split("\n").count(_.nonEmpty)
      s"| ${k}x | $nEv | $nSparse | ${touchedS.length}/${Layout.ZoneBlocks} | " +
        s"${f"$tS%.1f"}s | ${touchedD.length}/${Layout.ZoneBlocks} | ${f"$tD%.1f"}s | " +
        s"$nSparseIds | ${touchedFiles(s"$scratch/bloom_sparse")} | ${f"$tBs%.1f"}s | " +
        s"${touchedFiles(s"$scratch/bloom_dense")} | ${f"$tBd%.1f"}s |"
    }
    if (sections("forgetsparse")) {
      println()
      println("| factor | events | sparse rows | z blocks touched | z sparse wall | " +
        "z dense blocks | z dense wall | bloom sparse ids | bloom files touched | " +
        "bloom sparse wall | bloom dense files | bloom dense wall |")
      println("|---|---|---|---|---|---|---|---|---|---|---|---|")
      rowsForgetSparse.foreach(println)
    }

    // round-7 sketch/retrieval ops. Replicated docs carry per-replica
    // token tags, so: BM25's probe queries (replica-0 doc_ids < 5) match
    // ONLY replica-0 postings — serving cost must stay flat while the
    // postings build grows k×; heavy-hitters' planted fractions are
    // scale-invariant while the organic bigram vocabulary grows k× (the
    // MG sketch prunes harder, the plant must always survive); bottom-k
    // keeps k=32 per language while group sizes grow k× (the estimator
    // must track the growth from 32 retained hashes).
    val rows14 = factors.filter(_ => sections("sketch")).map { k =>
      System.err.println(s"[scale] factor $k (sketch/retrieval) ...")
      val docs = replicatedDocs(spark, baseDir, k).select("doc_id", "text")
      val docsLang = replicatedDocs(spark, baseDir, k)
      val t0 = System.nanoTime()
      val bmRows = TextAnalysis.bm25RetrieveOf(docs).count()
      val tBm = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val hh = TextAnalysis.heavyHittersOf(docs).collect()
      val tHh = (System.nanoTime() - t1) / 1e9
      val nTotal = if (hh.isEmpty) 0L else hh.head.getLong(2)
      val t2 = System.nanoTime()
      val bk = TextAnalysis.bottomKSampleOf(docsLang).collect()
      val tBk = (System.nanoTime() - t2) / 1e9
      // worst-case estimator relative error across languages
      val maxErr = bk.map(r =>
        math.abs(r.getDouble(4) - r.getLong(1)) / r.getLong(1)).max
      val t3 = System.nanoTime()
      val rrfRows = TextAnalysis.rrfFuseOf(docs).count()
      val tRrf = (System.nanoTime() - t3) / 1e9
      s"| ${k}x | $bmRows | ${f"$tBm%.1f"}s | ${hh.length} | $nTotal | " +
        s"${f"$tHh%.1f"}s | ${bk.length} | ${f"$maxErr%.2f"} | ${f"$tBk%.1f"}s | " +
        s"$rrfRows | ${f"$tRrf%.1f"}s |"
    }
    if (sections("sketch")) {
      println()
      println("| factor | bm25 rows | bm25 time | heavy hitters | stream total | " +
        "hh time | langs | bottomk max rel err | bk time | rrf rows | rrf time |")
      println("|---|---|---|---|---|---|---|---|---|---|---|")
      rows14.foreach(println)
    }
    spark.stop()
  }

  /** (l_orderkey, l_partkey) pairs for k disjoint copies of the
    * co-purchase graph — both keys shifted by a replica stride, so
    * replicas share no orders and no parts. */
  private[graft] def replicatedLineitemKeys(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val li = graft.sources.Tables.fanOut(graft.sources.Tables.lineitem(spark, dir))
      .select("l_orderkey", "l_partkey")
    (0 until k).map { i =>
      if (i == 0) li
      else li.select(
        (col("l_orderkey") + lit(i * ReplicaStride)).as("l_orderkey"),
        (col("l_partkey") + lit(i * ReplicaStride)).as("l_partkey"))
    }.reduce(_ unionByName _)
  }
}
