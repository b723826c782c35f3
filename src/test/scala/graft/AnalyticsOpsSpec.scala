package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{EventsOps, Graph, Profiling, TextAnalysis}
import graft.sources.Tables

/** Invariants for the profiling / anomaly / graph / collocation operators
  * that the DuckDB hash oracle can't express: algebraic identities
  * (PageRank mass conservation, profile row accounting) and internal
  * consistency of the scored outputs.
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("columnProfile accounts for every row of every column") {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val prof = Profiling.columnProfile(spark, dir).collect()
    assert(prof.length == 5)
    prof.foreach { r =>
      assert(r.getAs[Long]("n_rows") == nDocs, r.getAs[String]("col_name"))
      assert(r.getAs[Long]("n_null") + r.getAs[Long]("n_distinct") > 0)
    }
    val byCol = prof.map(r => r.getAs[String]("col_name") -> r).toMap
    // doc_id is the primary key: NDV == row count, no nulls
    assert(byCol("doc_id").getAs[Long]("n_distinct") == nDocs)
    assert(byCol("doc_id").getAs[Long]("n_null") == 0L)
    // lang is a low-cardinality enum
    assert(byCol("lang").getAs[Long]("n_distinct") < 20)
  }

  test("histogram buckets partition the rows and bound their values") {
    val hist = Profiling.totalpriceHistogram(spark, dir).collect()
    val nOrders = Tables.orders(spark, dir).count()
    assert(hist.map(_.getAs[Long]("n")).sum == nOrders)
    hist.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Double]("lo") >= b * Profiling.HistWidth - 0.005)
      assert(r.getAs[Double]("hi") < (b + 1) * Profiling.HistWidth + 0.005)
      assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi"))
    }
  }

  test("anomaly grid covers all (day, type) cells and flags agree with z") {
    val scored = EventsOps.anomalousDays(spark, dir).collect()
    val cells = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("d"), col("event_type")).distinct().count()
    assert(scored.length == cells)
    scored.foreach { r =>
      val z = r.getAs[Double]("z")
      val degenerate = r.getAs[Double]("mad") == 0.0 &&
        r.getAs[Long]("n").toDouble != r.getAs[Double]("med")
      // flag = z-threshold, OR the MAD=0 fallback (degenerate scale:
      // any deviation from the median is the signal)
      assert(r.getAs[Boolean]("is_anomaly") ==
        (math.abs(z) > EventsOps.AnomalyZ || degenerate))
      // MAD-standardization is centered: z must be 0 when n == med
      if (r.getAs[Long]("n").toDouble == r.getAs[Double]("med"))
        assert(z == 0.0)
    }
  }

  test("pagerank conserves unit mass and degree matches the edge frame") {
    val edges = Graph.copurchaseEdges(Tables.lineitem(spark, dir))
    // symmetry: (a,b) present iff (b,a) present
    val asym = edges
      .join(edges.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_anti")
    assert(asym.count() == 0)
    val ranks = Graph.pagerankRanks(edges)
    val total = ranks.agg(sum("r")).head.getDouble(0)
    // damped PR over a symmetric graph (no dangling mass) sums to 1
    assert(math.abs(total - 1.0) < 1e-9, s"mass = $total")
    // deg column is the true out-degree
    val badDeg = ranks.join(
      edges.groupBy("src").agg(count(lit(1)).as("true_deg")),
      col("node") === col("src"))
      .filter(col("deg") =!= col("true_deg"))
    assert(badDeg.count() == 0)
  }

  test("skew profile ranks the true hottest keys with exact shares") {
    val rows = Profiling.keySkewProfile(spark, dir).collect()
    assert(rows.length == Profiling.SkewTopK)
    assert(rows.map(_.getAs[Long]("rank")).toSeq ==
      (1L to Profiling.SkewTopK.toLong))
    // descending frequency, unique-tiebroken
    val cnts = rows.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts == cnts.sorted.reverse)
    // cross-check the report against directly computed frequencies
    val li = Tables.lineitem(spark, dir)
    val trueCounts = li.groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nRows = li.count().toDouble
    rows.foreach { r =>
      val k = r.getAs[Long]("l_partkey")
      assert(r.getAs[Long]("cnt") == trueCounts(k))
      assert(r.getAs[Long]("n_keys") == trueCounts.size.toLong)
      assert(math.abs(r.getAs[Double]("share") - trueCounts(k) / nRows) < 1e-6)
    }
    // the rank-1 key really is the global max
    assert(rows.head.getAs[Long]("cnt") == trueCounts.values.max)
  }

  test("triangle counts match a planted graph and an id-ordered recount") {
    import spark.implicits._
    // planted: triangles {1,2,3} {1,2,4} {1,3,4} {2,3,4} {4,5,6}
    val und = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (4, 5), (4, 6), (5, 6))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getAs[Int]("node") -> r).toMap
    val expected = Map(1 -> 3L, 2 -> 3L, 3 -> 3L, 4 -> 4L, 5 -> 1L, 6 -> 1L)
    assert(got.keySet == expected.keySet)
    expected.foreach { case (n, t) =>
      assert(got(n).getAs[Long]("triangles") == t, s"node $n")
    }
    // node 4: deg 5, 4 triangles -> clustering 2*4/(5*4) = 0.4
    assert(got(4).getAs[Long]("deg") == 5L)
    assert(got(4).getAs[Double]("clustering") == 0.4)

    // independent recount on the real graph: orient by plain node id
    // instead of (deg, id) — different enumeration order, same triangles
    val real = Graph.recurringEdges(
      Tables.lineitem(spark, dir), Graph.TriMinSupport)
    val o = real.filter(col("src") < col("dst"))
    val idOrdered = o.as("e1")
      .join(o.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
      .join(o.select(col("src").as("a"), col("dst").as("c")), Seq("a", "c"))
      .count()
    val degOrdered = Graph.triangleCounts(real)
      .agg(sum("triangles")).head.getLong(0)
    assert(degOrdered == 3 * idOrdered, s"deg-ordered $degOrdered vs id $idOrdered")
  }

  test("curriculum stages partition each language into near-equal cuts") {
    val rows = TextAnalysis.curriculumStages(spark, dir).collect()
    val docs = Tables.documents(spark, dir)
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      // stages cover every document exactly once
      assert(rs.map(_.getAs[Long]("docs")).sum == perLang(lang))
      // ntile balance: stage sizes differ by at most one
      val sizes = rs.map(_.getAs[Long]("docs"))
      assert(sizes.max - sizes.min <= 1, s"$lang: ${sizes.toSeq}")
      // stages are ordered by length: envelopes must not overlap
      val sorted = rs.sortBy(_.getAs[Long]("stage"))
      sorted.sliding(2).foreach {
        case Array(lo, hi) =>
          assert(lo.getAs[Long]("max_chars") <= hi.getAs[Long]("min_chars"))
        case _ => ()
      }
      // the last stage's cume_dist reaches exactly 1
      assert(sorted.last.getAs[Double]("max_cume_dist") == 1.0)
    }
  }

  test("pagerank reliable-checkpoint mode matches the localCheckpoint mode") {
    import graft.operators.Dedup
    val local = Graph.pagerankTop(spark, dir).collect().toSeq
    val ck = java.nio.file.Files.createTempDirectory("graft-pr-ck").toString
    spark.conf.set(Dedup.CheckpointDirConf, ck)
    try {
      val reliable = Graph.pagerankTop(spark, dir).collect().toSeq
      assert(local == reliable)
      // retired rounds must not leave checkpoint files behind (only the
      // surviving final round + edges may remain until GC)
      val leftover = java.nio.file.Files.walk(java.nio.file.Paths.get(ck))
        .filter((p: java.nio.file.Path) => java.nio.file.Files.isRegularFile(p))
        .count()
      assert(leftover <= 2 * 64, s"checkpoint files left: $leftover")
    } finally {
      spark.conf.unset(Dedup.CheckpointDirConf)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ck))
    }
  }

  test("equi-depth quartiles hold near-equal mass and ordered bounds") {
    val rows = Profiling.eqdepthHistogram(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("quartile")).toSeq == Seq(0L, 1L, 2L, 3L))
    val ns = rows.map(_.getAs[Long]("n"))
    val total = ns.sum
    // equal-mass property: every bucket within a few rows of total/4
    // (ties on boundary values account for the slack)
    ns.foreach(n => assert(math.abs(n - total / 4.0) <= total * 0.05, ns.toSeq))
    // buckets tile the domain in order
    val his = rows.map(_.getAs[Double]("hi"))
    val los = rows.map(_.getAs[Double]("lo"))
    his.zip(los.tail).foreach { case (hi, nextLo) => assert(hi <= nextLo) }
  }

  test("bpe step counts weighted adjacent char pairs") {
    import spark.implicits._
    val rows = TextAnalysis.bpeMergeStep(spark, dir).collect()
    assert(rows.length == TextAnalysis.BpeTopK)
    assert(rows.forall(_.getAs[String]("pair").length == 2))
    val freqs = rows.map(_.getAs[Long]("freq"))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    // cross-check the top pair's frequency against a direct token scan
    val top = rows.head.getAs[String]("pair")
    val direct = Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFunctions.tokenize(col("text"))).as("word"))
      .filter(length(col("word")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"))
      .filter(col("pair") === top)
      .count()
    assert(direct == rows.head.getAs[Long]("freq"))
  }

  test("collocations respect the frequency floor and rank by pmi") {
    val rows = TextAnalysis.collocationsTop(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_ab") >= TextAnalysis.CollocMinCount))
    val pmis = rows.map(_.getAs[Double]("pmi"))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
    // spot-check the PMI arithmetic on the top row
    val docs = Tables.documents(spark, dir)
      .select(graft.functions.TextFunctions.tokenize(col("text")).as("toks"))
    val nTok = docs.agg(sum(size(col("toks")))).head.getLong(0).toDouble
    val nBig = docs.agg(sum(greatest(size(col("toks")) - 1, lit(0))))
      .head.getLong(0).toDouble
    val top = rows.head
    val expect = math.log(
      top.getAs[Long]("n_ab").toDouble * nTok * nTok /
        (nBig * top.getAs[Long]("n_a") * top.getAs[Long]("n_b")))
    assert(math.abs(top.getAs[Double]("pmi") - expect) < 1e-3)
  }

  test("lm score matches the hand-computed add-one bigram likelihood") {
    // corpus: "a b a b" and "x y" → cab = {(a,b):2, (b,a):1, (x,y):1},
    // ca = {a:2, b:1, x:1}, V = |{a,b,x,y}| = 4
    import spark.implicits._
    val docs = Seq((1L, "en", "a b a b"), (2L, "en", "x y"))
      .toDF("doc_id", "lang", "text")
    val rows = TextAnalysis.lmScoreOf(docs).collect()
    assert(rows.length == 2)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    val d1 = (2 * math.log(3.0 / 6) + math.log(2.0 / 5)) / 3
    val d2 = math.log(2.0 / 5)
    assert(byId(1L).getAs[Long]("n_bigrams") == 3L)
    assert(math.abs(byId(1L).getAs[Double]("avg_ll") - d1) < 1e-3)
    assert(byId(2L).getAs[Long]("n_bigrams") == 1L)
    assert(math.abs(byId(2L).getAs[Double]("avg_ll") - d2) < 1e-3)
    // a doc made of corpus-frequent bigrams scores above an outlier doc
    assert(byId(1L).getAs[Double]("avg_ll") > byId(2L).getAs[Double]("avg_ll") - 1e-9)
  }

  test("decayed features: closed-form weights, shift-invariant ratios") {
    import spark.implicits._
    val hl = EventsOps.DecayHalfLifeUs
    // user 1: events at T and T-hl (weights 1, 0.5); user 2: at T only
    val ev = Seq((1L, 1000L * hl, 10.0), (1L, 999L * hl, 4.0),
      (2L, 1000L * hl, 7.0)).toDF("user_id", "ts_us", "value")
    val got = EventsOps.decayedUserFeaturesOf(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 2)
    assert(got(1L).getDouble(2) == 1.5)        // 1 + 2^-1
    assert(got(1L).getDouble(3) == 12.0)       // 10 + 0.5*4
    assert(got(2L).getDouble(2) == 1.0 && got(2L).getDouble(3) == 7.0)
    // distributivity: same answer under any repartitioning
    val again = EventsOps.decayedUserFeaturesOf(ev.repartition(3)).collect()
      .map(_.toSeq).toSet
    assert(again == got.values.map(_.toSeq).toSet)
  }
}
