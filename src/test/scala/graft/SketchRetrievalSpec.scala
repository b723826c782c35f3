package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Known-answer tests for the round-7 additions: BM25 retrieval,
  * Misra-Gries-candidates + exact-recount heavy hitters, and bottom-k
  * sampling. The registered queries are hash-checked against DuckDB;
  * these pin SEMANTICS on constructed inputs: self-retrieval with an
  * exact duplicate, an exactly-sized plant over a unique-bigram corpus,
  * and sample membership recomputed independently from `md5`.
  */
class SketchRetrievalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("bm25: each probe self-retrieves; an exact duplicate ranks right behind") {
    // five probe docs with unique signature terms (plus shared filler so
    // idf has a floor to discriminate against), and doc 5 = copy of doc 0
    val docs = (0L until 5L).map { i =>
      val sig = ('z' - i).toChar.toString * 3 // "zzz", "yyy", ...
      (i, s"$sig $sig $sig common filler words here")
    } :+ (5L, "zzz zzz zzz common filler words here")
    val got = TextAnalysis.bm25RetrieveOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // query i's signature term only occurs in doc i (and the dup for i=0)
    (0L until 5L).foreach { q => assert(got((q, 1L)) === q, s"query $q") }
    // the duplicate has identical text -> identical rounded score -> the
    // doc_id tiebreak puts it at rank 2 for query 0
    assert(got((0L, 2L)) === 5L)
  }

  test("bm25 delta-merge: merged index is row-identical to a full rebuild") {
    val dir = "/root/testdata/sf0.001"
    val d = graft.sources.Tables.fanOut(
      graft.sources.Tables.documents(spark, dir))
    val merged = TextAnalysis.bm25MergedIndexOf(
        TextAnalysis.bm25Postings(d.filter(col("doc_id") % 2 === 0)),
        d.filter(col("doc_id") % 2 === 1))
      .collect().map(_.toString).toSet
    val rebuilt = TextAnalysis.bm25IndexOf(d)
      .collect().map(_.toString).toSet
    // EXACT equality, df/dl/n/avgdl included: the incremental folds
    // (coalesce-add df, appended dl, integer-sum avgdl) must reproduce
    // the rebuild bit-for-bit, or serving drifts as the index ages
    assert(merged == rebuilt)
    assert(merged.nonEmpty)
  }

  test("rrf fusion: consensus rank-1 gets 2/(k+1); the duplicate fuses at rank 2") {
    val docs = (0L until 5L).map { i =>
      val sig = ('z' - i).toChar.toString * 3
      (i, s"$sig $sig $sig common filler words here")
    } :+ (5L, "zzz zzz zzz common filler words here")
    val got = TextAnalysis.rrfFuseOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    val k = TextAnalysis.RrfK
    def rrf(ra: Int, rb: Int): Double =
      BigDecimal(1.0 / (ra + k) + 1.0 / (rb + k))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // both rankers put doc i first for query i (unique signature term,
    // identical doc lengths), so the fused winner is the consensus doc
    (0L until 5L).foreach { q =>
      assert(got((q, 1L))._1 === q, s"query $q rank-1")
      assert(got((q, 1L))._2 === rrf(1, 1), s"query $q rrf")
    }
    // the exact duplicate of doc 0 ties doc 0 in BOTH rankers and loses
    // both tiebreaks on doc_id -> rank 2 twice -> fused rank 2
    assert(got((0L, 2L)) === ((5L, rrf(2, 2), 2L, 2L)))
  }

  test("heavy hitters: exactly the plant survives on a unique-bigram corpus") {
    // every organic bigram globally unique -> organic max freq 1, far
    // below N/HhK; expected counts are exactly the plant sizes
    val docs = (0L until 40L).map { i =>
      (i, ('a' to 'h').map(c => s"t$i$c").mkString(" "))
    }
    val rows = TextAnalysis.heavyHittersOf(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nOrg = 40 * 7
    val plant = TextAnalysis.HhPlantRates
      .map { case (item, r) => item -> math.ceil(r * nOrg).toLong }
    val nTotal = nOrg + plant.map(_._2).sum
    assert(rows.toSeq === plant.sortBy { case (i, c) => (-c, i) }
      .map { case (item, c) => (item, c, nTotal) })
  }

  test("heavy hitters: empty corpus yields zero rows, not a phantom plant") {
    // sequence(1, 0) is DESCENDING in Spark - an unguarded plant would
    // emit 2 rows per hot item on an empty corpus
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.heavyHittersOf(empty).collect().isEmpty)
  }

  test("misra-gries udaf: hot items survive a 2000-singleton flood at capacity 16") {
    // capacity far below the distinct-key space: the partial/merge path
    // must prune yet keep everything above N/m
    val hot = Seq.fill(600)("hot_a") ++ Seq.fill(400)("hot_b")
    val flood = (0 until 2000).map(i => s"noise_$i")
    val stream = scala.util.Random.shuffle(hot ++ flood)
    val mg = udaf(new graft.functions.MisraGriesAggregator(16))
    val cands = stream.toDF("item").repartition(7)
      .agg(mg(col("item")).as("cands"))
      .select(explode(col("cands")).as("item"))
      .as[String].collect().toSet
    // N = 3000, N/m = 187.5: both hot items are guaranteed candidates
    assert(cands.contains("hot_a") && cands.contains("hot_b"))
    assert(cands.size <= 16)
  }

  test("lsh sweep: nested band splits give monotone candidates and recall") {
    // (4,8) bands are unions of (8,4) bands are unions of (16,2) bands,
    // so an all-rows-agree match at a coarse config implies a match at
    // every finer one: candidate sets NEST, and caught-truth with them
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = graft.operators.Dedup.lshBandSweepOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(_._1).toSeq === Seq(4L, 8L, 16L))
    assert(rows.map(r => r._1 * r._2).forall(_ === 32L))
    val cands = rows.map(_._3)
    val caught = rows.map(_._6)
    assert(cands(0) <= cands(1) && cands(1) <= cands(2), cands.toSeq)
    assert(caught(0) <= caught(1) && caught(1) <= caught(2), caught.toSeq)
    // n_true is config-independent and recall_bp is the exact int div
    assert(rows.map(_._5).distinct.length === 1)
    rows.foreach { r =>
      assert(r._7 === (if (r._5 > 0) r._6 * 10000 / r._5 else 0L)) }
    assert(rows.last._5 > 0, "ground truth empty - sweep is vacuous")
  }

  test("source dup matrix: unordered pairing, exact bp sums, cross flag") {
    val pairs = Seq(
      (1L, 2L, 0.9532), // s1 x s2 (cross)
      (2L, 1L, 0.9531), // s2 x s1 -> same unordered cell as above
      (1L, 3L, 0.75),   // s1 x s1 (diagonal)
      (4L, 5L, 0.5))    // s2 x s3 (cross)
      .toDF("doc_a", "doc_b", "est_jaccard")
    val docs = Seq((1L, "s1"), (2L, "s2"), (3L, "s1"), (4L, "s2"), (5L, "s3"))
      .toDF("doc_id", "source")
    val got = graft.operators.Dedup.sourceDupMatrixOf(pairs, docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      ("s1", "s1", false, 1L, 7500L),
      ("s1", "s2", true, 2L, 9532L + 9531L),
      ("s2", "s3", true, 1L, 5000L)))
  }

  test("bottom-k union: complete-sample case collapses to exact Jaccard; " +
      "sketched case matches an independent recompute") {
    def hl(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(13), 16)
    }
    def rnd(v: Double, dp: Int): Double =
      BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    def expected(n: Int): (Long, Long, Long, Double, Double, Long) = {
      // replay: crawls by id-modulus, per-side bottom-k, union sketch,
      // coordinated Jaccard — pure in-memory arithmetic
      val k = TextAnalysis.BkuK
      val texts = (0 until n).map(i => i.toLong -> s"doc text number $i")
      def side(p: Long => Boolean) =
        texts.filter(t => p(t._1)).map(t => hl(t._2)).distinct.sorted
      val a = side(_ % 2 == 0); val b = side(_ % 3 == 0)
      val sa = a.take(k); val sb = b.take(k)
      val u = (sa ++ sb).distinct.sorted.take(k)
      val nShared = u.count(x => sa.contains(x) && sb.contains(x))
      val inter = a.toSet.intersect(b.toSet).size.toLong
      val estU = rnd((u.size - 1).toDouble /
        (u.last.toDouble / 4503599627370496.0), 4)
      val jacc = rnd(nShared.toDouble / u.size, 4)
      (a.size.toLong, b.size.toLong, u.size.toLong, estU, jacc, inter)
    }
    def run(n: Int) = {
      val docs = (0 until n).map(i => (i.toLong, s"doc text number $i"))
        .toDF("doc_id", "text")
      val r = TextAnalysis.bottomKUnionOf(docs).collect()(0)
      (r.getLong(3), r.getLong(6), r.getLong(12), r.getDouble(7),
        r.getDouble(9), r.getDouble(10))
    }
    // complete-sample regime (60 < k docs/side): the coordinated Jaccard
    // estimator IS the exact Jaccard
    val (a60, b60, _, _, j60, i60) = expected(60)
    val (exactA, exactB, exactI, _, jaccEst, jaccExact) = run(60)
    assert((exactA, exactB, exactI) === ((a60, b60, i60)))
    assert(jaccEst === jaccExact)
    assert(jaccEst === j60)
    // sketched regime (1000 docs, ~500/334 per side): every reported
    // number must equal the independent replay
    val (a1k, b1k, _, estU1k, jacc1k, i1k) = expected(1000)
    val r1k = (0 until 1000).map(i => (i.toLong, s"doc text number $i"))
      .toDF("doc_id", "text")
    val row = TextAnalysis.bottomKUnionOf(r1k).collect()(0)
    assert(row.getLong(3) === a1k)
    assert(row.getLong(6) === b1k)
    assert(row.getLong(12) === i1k)
    assert(row.getDouble(7) === estU1k)
    assert(row.getDouble(9) === jacc1k)
  }

  test("bottom-k: membership, kth hash and estimator recomputed from md5") {
    val docs = ((0L until 40L).map((_, "aa")) ++
      (100L until 110L).map((_, "bb"))).toDF("doc_id", "lang")
    def h(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(13), 16) / 4503599627370496.0
    }
    def expected(ids: Seq[Long]) = {
      val bottom = ids.sortBy(i => (h(i), i)).take(TextAnalysis.BkK)
      (bottom.size.toLong, h(bottom.last), bottom.sum)
    }
    val got = TextAnalysis.bottomKSampleOf(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    def rnd(v: Double, dp: Int): Double = // Spark round() is HALF_UP
      BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (na, ha, sa) = expected(0L until 40L)
    val (nb, hb, sb) = expected(100L until 110L)
    assert(got("aa") === ((40L, na, rnd(ha, 6), rnd((na - 1) / ha, 4), sa)))
    assert(got("bb") === ((10L, nb, rnd(hb, 6), rnd((nb - 1) / hb, 4), sb)))
  }
}
