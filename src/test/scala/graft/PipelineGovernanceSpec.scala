package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{EventsOps, Relational, TextAnalysis}

/** Invariants of the governance/admission operators: the quality audit
  * counts exactly the planted violations on the otherwise-clean corpus,
  * the funnel is monotone, and the weighted sample is a deterministic
  * function of content — independent of partitioning.
  */
class PipelineGovernanceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("quality audit finds exactly the planted violations") {
    val rows = Relational.qualityAudit(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nLineitem = graft.sources.Tables.lineitem(spark, dir).count() +
      Relational.AuditPlanted.size
    assert(rows("lineitem.l_orderkey -> orders.o_orderkey") == (1L, nLineitem))
    assert(rows("lineitem.l_quantity > 0") == (1L, nLineitem))
    assert(rows("lineitem.l_returnflag NOT NULL") == (1L, nLineitem))
    // generator keys are unique; n_checked for uniqueness = key count
    val (dup, keys) = rows("orders.o_orderkey UNIQUE")
    assert(dup == 0L && keys == graft.sources.Tables.orders(spark, dir).count())
  }

  test("association rules: algebraic invariants of support/confidence/lift") {
    val rows = Relational.associationRules(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ab, a, b) = (r.getAs[Long]("supp_ab"), r.getAs[Long]("supp_a"),
        r.getAs[Long]("supp_b"))
      assert(ab >= Relational.RuleMinSupport)
      // pair support can never exceed either item's support
      assert(ab <= math.min(a, b))
      val conf = r.getAs[Double]("confidence")
      assert(conf > 0 && conf <= 1.0)
      assert(math.abs(conf - (ab.toDouble / a)) < 5e-5)
    }
    // lift is direction-symmetric: when both directions survive the
    // top-k cut they must carry the identical lift
    val byPair = rows.groupBy(r => {
      val (x, y) = (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent"))
      (math.min(x, y), math.max(x, y))
    })
    byPair.values.filter(_.length == 2).foreach { pair =>
      assert(pair(0).getAs[Double]("lift") == pair(1).getAs[Double]("lift"))
    }
  }

  test("hll merge: union of daily sketches tracks the one-shot sketch") {
    import graft.sources.Tables
    val ev = Tables.events(spark, dir)
    val daily = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(Relational.HllLgK)).as("sk"))
    val merged = daily.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("m"))
    val oneShot = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(Relational.HllLgK))).as("o"))
    merged.join(oneShot, "event_type").collect().foreach { r =>
      val (m, o) = (r.getAs[Long]("m").toDouble, r.getAs[Long]("o").toDouble)
      // same registers, same data: merge may promote the target type but
      // the estimates must agree to well under the sketch's own sigma
      assert(math.abs(m - o) / o < 0.01, s"${r.getString(0)}: $m vs $o")
    }
    // and the registered query's envelope holds
    val rows = Relational.hllMergeUsers(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("within_tol")))
  }

  test("funnel user counts are monotonically non-increasing") {
    val steps = EventsOps.funnelConversion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(steps.map(_._2).toSeq == EventsOps.FunnelSteps)
    assert(steps.head._3 > 0)
    steps.sliding(2).foreach {
      case Array(a, b) => assert(b._3 <= a._3)
      case _ =>
    }
  }

  test("weighted sample is invariant to input partitioning") {
    def run(parts: Int) = {
      val docs = graft.sources.Tables.documents(spark, dir).repartition(parts)
      // same expression chain as the registered query, on the
      // repartitioned frame
      val u = (conv(substring(md5(col("text")), 1, 8), 16, 10).cast("double") + 0.5) /
        lit(4294967296.0)
      val key = log(u) / col("n_chars")
      val byLang = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(desc("key"), asc("doc_id"))
      docs.select(col("doc_id"), col("lang"), col("n_chars"), key.as("key"))
        .withColumn("rnk", row_number().over(byLang))
        .filter(col("rnk") <= TextAnalysis.WeightedK)
        .select("lang", "rnk", "doc_id")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    }
    val a = run(1)
    val b = run(7)
    assert(a == b)
    assert(a.nonEmpty)
    // exactly K rows per language (corpus >> K at every SF)
    a.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.size == TextAnalysis.WeightedK)
    }
  }

  test("transitions and SCD2 intervals conserve the event count") {
    // each user with n events contributes exactly n-1 consecutive pairs,
    // to both the transition matrix and the closed state intervals
    val ev = graft.sources.Tables.events(spark, dir)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    val transitions = EventsOps.typeTransitions(spark, dir)
      .agg(sum("n")).head().getLong(0)
    val intervals = EventsOps.stateIntervals(spark, dir)
      .agg(sum("n_intervals")).head().getLong(0)
    assert(transitions == expected)
    assert(intervals == expected)
  }

  test("exact quantiles bracket correctly: median <= p90, groups complete") {
    val rows = Relational.exactPercentiles(spark, dir).collect()
    assert(rows.length == 3) // A / N / R
    rows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2))
      assert(r.getLong(3) > 0)
    }
  }

  test("leakage-safe split: no near-dup pair straddles train/test") {
    import graft.operators.Dedup
    val comps = Dedup.nearDupComponents(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def split(docId: Long): String = {
      val grp = comps.getOrElse(docId, docId).toString
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(grp.getBytes("UTF-8")).take(4)
        .foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      if (md % 100 < Dedup.TrainBuckets) "train" else "test"
    }
    val pairs = Dedup.minhashLsh(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a,$b) straddles the split")
    }
    // and the census adds up to the corpus
    val census = Dedup.leakageSafeSplit(spark, dir).collect()
    assert(census.map(_.getLong(2)).sum ==
      graft.sources.Tables.documents(spark, dir).count())
    assert(census.map(_.getString(0)).distinct.sorted.toSeq == Seq("test", "train"))
  }

  test("token-budget selection never exceeds the budget, per language") {
    val rows = TextAnalysis.tokenBudgetSample(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= TextAnalysis.BudgetTokens, r.getString(0))
      assert(r.getLong(1) > 0)
    }
  }

  test("weighted sampling favors heavier documents") {
    // the sampled set's mean n_chars should exceed the corpus mean —
    // the point of size-weighting (probabilistic but deterministic
    // here: fixed corpus + content-hash uniforms)
    val docs = graft.sources.Tables.documents(spark, dir)
    val corpusMean = docs.agg(avg("n_chars")).head().getDouble(0)
    val sampleMean = TextAnalysis.weightedSample(spark, dir)
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean)
  }
}
