package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Dataset PROFILING — the `ANALYZE TABLE`-grade statistics pass every
  * engine runs before planning and every data-governance pipeline runs
  * before ingest: per-column null counts, exact NDV, value bounds, and
  * width. The reference engine has no profiling surface (its only
  * "schema" is the word/count pair, SURVEY.md §1.2); this is part of the
  * extension surface the brief mandates for a 100 TB corpus, where
  * knowing a column's NDV and null fraction decides join strategies and
  * catches ingest regressions (a lang column whose NDV jumps from 6 to
  * 600 is a parser bug, not new languages).
  */
object Profiling {

  /** Per-column profile of `documents` in ONE logical pass.
    *
    * Shape: the table is UNPIVOTED via `stack` — a Generate (map-side
    * row expansion, factor = #columns, no shuffle) — into narrow
    * (col_name, val) rows, so the whole profile is a single groupBy
    * with ONE distinct aggregate instead of five separate
    * `countDistinct(c)` aggregates over the wide table (which Catalyst
    * plans as an Expand with one replica per distinct agg — same ×5 row
    * blowup but with full-width rows and a 5-way grouped shuffle).
    * Spark plans the single-distinct form as two back-to-back
    * hash aggregates: partial per (col_name, val) map-side, so the
    * shuffle carries at most one row per distinct value — NOT one per
    * input row — and the final 5-key merge sees only pre-aggregated
    * partials from each task (the 5-key space is not a skew hazard for
    * exactly that reason).
    *
    * At 100 TB the one-line swap is `approx_count_distinct` (HLL, no
    * per-value shuffle rows at all); the exact form is registered
    * because the oracle can replay it bit-for-bit. Values cross as
    * strings so one frame can carry every column's min/max (binary
    * collation in both engines); numeric columns profile their decimal
    * rendering, which preserves null/NDV exactly and bounds loosely —
    * the governance signals this pass exists for.
    */
  def columnProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(expr(
        """stack(5,
          |  'doc_id',  cast(doc_id as string),
          |  'lang',    lang,
          |  'n_chars', cast(n_chars as string),
          |  'source',  source,
          |  'text',    text) as (col_name, val)""".stripMargin))
      .groupBy("col_name")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("val").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("val")).as("n_distinct"),
        min(col("val")).as("min_val"),
        max(col("val")).as("max_val"),
        round(avg(length(col("val"))), 2).as("avg_len"))
      .orderBy("col_name")

  /** Histogram bucket width for [[totalpriceHistogram]], in price units.
    * Fixed (not derived from min/max) so the profile is a single scan
    * and bucket identities are stable across corpus snapshots — the
    * property that lets day-over-day histograms diff cleanly. */
  val HistWidth = 25000.0

  /** Equi-width HISTOGRAM over `orders.o_totalprice` — the distribution
    * profile behind CBO selectivity estimates and drift monitors.
    * Bucket = floor(v / width): a pure per-row projection, so the whole
    * histogram is one map-side-combined groupBy over ~tens of bucket
    * keys; at any corpus size the shuffle carries #tasks × #buckets
    * pre-aggregated rows. Per-bucket bounds come along for free and
    * make the output self-describing. Sums run in DECIMAL so the
    * reported total is partition-order independent. */
  def totalpriceHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") / HistWidth).cast("long").as("bucket"),
        col("o_totalprice"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        round(min("o_totalprice"), 2).as("lo"),
        round(max("o_totalprice"), 2).as("hi"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2)
          .as("total"))
      .orderBy("bucket")

  /** EQUI-DEPTH histogram (quartiles) over `o_totalprice` — the histogram
    * CBOs actually keep: equal-mass buckets adapt to skew that fixed-width
    * buckets smear. Two passes: exact interpolated quartile boundaries
    * (one `percentile` aggregate → a 1-row broadcast), then a bucket
    * assignment that is a pure per-row comparison chain feeding a 4-key
    * map-side-combined groupBy. At 100 TB the boundary pass swaps to
    * `approx_percentile` (same plan shape, sketch merge instead of sort);
    * the exact form is registered because the oracle can replay it.
    *
    * Boundary determinism: an input value can only EQUAL a boundary when
    * the interpolation weight is 0 and the boundary IS a data value —
    * exact in both engines — so bucket membership never hinges on a
    * floating last-ulp. */
  def eqdepthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val bounds = orders.agg(
      percentile(col("o_totalprice"), lit(0.25)).as("q1"),
      percentile(col("o_totalprice"), lit(0.5)).as("q2"),
      percentile(col("o_totalprice"), lit(0.75)).as("q3"))
    orders.crossJoin(broadcast(bounds))
      .select(
        when(col("o_totalprice") <= col("q1"), 0L)
          .when(col("o_totalprice") <= col("q2"), 1L)
          .when(col("o_totalprice") <= col("q3"), 2L)
          .otherwise(3L).as("quartile"),
        col("o_totalprice"))
      .groupBy("quartile")
      .agg(
        count(lit(1)).as("n"),
        round(min("o_totalprice"), 2).as("lo"),
        round(max("o_totalprice"), 2).as("hi"))
      .orderBy("quartile")
  }

  /** Hot keys reported by [[keySkewProfile]]. */
  val SkewTopK = 10

  /** JOIN-KEY skew profile — the diagnostic a 100 TB job runs BEFORE
    * deciding whether a join needs salting ([[ScaleTechniques]]) or can
    * rely on AQE's skew split: per-key frequencies of `l_partkey`, the
    * [[SkewTopK]] hottest keys with their share and their multiple of
    * the mean, plus the key-space summary (distinct keys, mean rows per
    * key) carried on every row so the report is one self-contained
    * frame.
    *
    * Plan shape: the per-key count is one map-side-combined groupBy;
    * the summary is a second tiny agg over the key frame (n_keys rows,
    * not corpus rows) broadcast into the result; the hot-key cut is
    * `TakeOrderedAndProject` (never a global sort), and ranking happens
    * AFTER the cut on the k-row frame, so no corpus-sized window
    * exists. Every stage is sized by the key space or by k. */
  def keySkewProfile(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.fanOut(Tables.lineitem(spark, dir))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    val summary = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    val top = counts.orderBy(desc("cnt"), asc("l_partkey")).limit(SkewTopK)
    val w = Window.orderBy(desc("cnt"), asc("l_partkey"))
    top.crossJoin(broadcast(summary))
      .select(
        row_number().over(w).cast("long").as("rank"),
        col("l_partkey"), col("cnt"), col("n_keys"),
        round(col("cnt") / col("n_rows"), 6).as("share"),
        round(col("cnt") * col("n_keys") / col("n_rows"), 4).as("x_mean"))
      .orderBy("rank")
  }

  /** Bucket count of the drift report — fixed, so the smoothing
    * denominator and the bucket spine are corpus-independent. */
  val DriftBuckets = 10

  /** Population-stability drift report between two corpus snapshots —
    * the monitor a training pipeline runs when a new crawl lands:
    * bucket a feature (n_chars, width 100, capped at [[DriftBuckets]]
    * deciles), compare the reference and current distributions, and
    * report each bucket's PSI contribution
    * (p_cur − p_ref)·ln(p_cur/p_ref). The conventional reading: total
    * PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 investigate.
    *
    * Snapshots here are the deterministic doc_id parity split (the
    * driver's corpus has no ingest timestamps); production passes two
    * real snapshot frames. Proportions carry 0.5-per-bucket additive
    * smoothing over the FULL fixed spine (empty buckets included via a
    * `spark.range` left join), so PSI is defined when a bucket empties
    * on one side — the exact situation the monitor exists to catch.
    *
    * One corpus pass (map-side-combined conditional counts), then
    * arithmetic over [[DriftBuckets]] rows with the totals broadcast —
    * nothing downstream of the first aggregate scales with the corpus. */
  def driftReport(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.fanOut(Tables.documents(spark, dir))
      .select(
        when(col("doc_id") % 2 === 0, lit("ref")).otherwise(lit("cur")).as("snap"),
        least(expr("n_chars div 100"), lit(DriftBuckets - 1L)).as("bucket"))
    val counts = d.groupBy("bucket").agg(
      sum(when(col("snap") === "ref", 1L).otherwise(0L)).as("n_ref"),
      sum(when(col("snap") === "cur", 1L).otherwise(0L)).as("n_cur"))
    val spine = spark.range(DriftBuckets).select(col("id").as("bucket"))
    val full = spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = full.agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"))
    val sm = lit(0.5 * DriftBuckets)
    full.crossJoin(broadcast(tot))
      .withColumn("p_ref", (col("n_ref") + 0.5) / (col("t_ref") + sm))
      .withColumn("p_cur", (col("n_cur") + 0.5) / (col("t_cur") + sm))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        round(col("p_ref"), 6).as("p_ref"),
        round(col("p_cur"), 6).as("p_cur"),
        round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 6)
          .as("psi_term"))
      .orderBy("bucket")
  }

  /** Two-sample KOLMOGOROV–SMIRNOV drift statistic over the same
    * ref/cur split as [[driftReport]], on the RAW `n_chars` values —
    * the unbinned lens beside PSI: KS is the sup of |F_ref − F_cur|
    * over the empirical CDFs, so it catches shape drift that PSI's
    * fixed bins smear out, and it carries a distribution-free
    * significance threshold (reject at α=0.05 when
    * KS > 1.358·√((n+m)/(n·m)), Smirnov's asymptotic critical value).
    *
    * Shape: ONE corpus pass (a map-side-combined groupBy on the value)
    * collapses the data to its distinct-value spine; the cumulative
    * sums run as a single global-ordered window over THAT spine —
    * bounded by value cardinality (like [[DriftBuckets]]), never by
    * corpus size, which is what makes an intentionally single-partition
    * window acceptable here. The sup row is a 1-row TakeOrdered with a
    * value tie-break; `reject_05` compares the 6dp-rounded statistic to
    * the 6dp-rounded critical value so both engines decide identically. */
  def ksDrift(spark: SparkSession, dir: String): DataFrame =
    ksDriftOf(Tables.fanOut(Tables.documents(spark, dir))
      .select(
        when(col("doc_id") % 2 === 0, lit("ref")).otherwise(lit("cur")).as("snap"),
        col("n_chars").as("v")))

  /** [[ksDrift]] over ANY (snap ∈ {ref,cur}, v) sample frame. */
  private[graft] def ksDriftOf(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = d.groupBy("v").agg(
      sum(when(col("snap") === "ref", 1L).otherwise(0L)).as("n_ref"),
      sum(when(col("snap") === "cur", 1L).otherwise(0L)).as("n_cur"))
    val tot = counts.agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"))
    val w = Window.orderBy("v")
    counts
      .withColumn("c_ref", sum("n_ref").over(w))
      .withColumn("c_cur", sum("n_cur").over(w))
      .crossJoin(broadcast(tot))
      .select(col("v").as("at_value"), col("t_ref"), col("t_cur"),
        round(abs(col("c_ref") / col("t_ref") - col("c_cur") / col("t_cur")), 6)
          .as("ks_stat"),
        round(lit(1.358) * sqrt((col("t_ref") + col("t_cur")) /
          (col("t_ref") * col("t_cur"))), 6).as("crit_05"))
      .withColumn("reject_05", col("ks_stat") > col("crit_05"))
      .orderBy(desc("ks_stat"), asc("at_value"))
      .limit(1)
  }
}
