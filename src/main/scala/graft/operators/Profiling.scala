package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Deterministic violation plants for [[constraintSuite]] — the
    * synthetic tables are clean by construction, so a suite run over
    * them raw would prove only that six zeros print. Each modulus
    * corrupts a disjoint slice of `orders` with exactly the defect its
    * constraint exists to catch, expressed identically in both engines,
    * so every constraint row carries a measured NONZERO violation count
    * and the pass/fail logic is exercised on both branches. */
  val PlantNullMod = 1009L // o_custkey nulled        → completeness
  val PlantDupMod  = 997L  // row re-inserted          → uniqueness
  val PlantStatMod = 991L  // o_orderstatus = 'X'      → set membership
  val PlantNegMod  = 983L  // o_totalprice negated     → non-negativity
  val PlantDateMod = 977L  // o_orderdate year → 1970  → freshness range
  val PlantRefMod  = 971L  // o_custkey + 10^9         → referential integrity

  /** Data-quality CONSTRAINT SUITE (Deequ-style; Schelter et al.,
    * VLDB'18 "Automating Large-Scale Data Quality Verification") over
    * `orders` — the declarative checks a production ingest gate runs
    * before data is allowed downstream: completeness, key uniqueness,
    * set membership, non-negativity, freshness range, and referential
    * integrity against the `customer` dimension. One row per
    * constraint: rows checked, violations, satisfied fraction in
    * fixed-point ppm (integer division — both engines agree
    * bit-for-bit), and the pass verdict.
    *
    * Shape: ONE scan of the fact computes every check. The RI probe is
    * a broadcast LEFT join against the distinct customer-key dimension
    * (a `c_present` marker column, never a row-dropping anti-join, so
    * the same joined frame serves all six constraints); the six
    * violation counters fold in a single 1-row hash aggregate
    * (map-side-combined — the shuffle carries one partial row per
    * task), and `stack` unpivots that row into the constraint report.
    * The only non-distributive term is the uniqueness NDV
    * (`countDistinct(o_orderkey)`, one extra keyed exchange); at 100 TB
    * the one-line swap is `approx_count_distinct` exactly as in
    * [[columnProfile]] — the exact form is registered because the
    * oracle replays it bit-for-bit. Violations are PLANTED
    * deterministically (see [[PlantNullMod]]..[[PlantRefMod]]) so both
    * verdict branches are live. */
  def constraintSuite(spark: SparkSession, dir: String): DataFrame =
    constraintReportOf(
      plantedOrders(Tables.fanOut(Tables.orders(spark, dir))),
      Tables.customer(spark, dir).select(col("c_custkey")))

  /** The deterministic defect plant over any orders-shaped frame
    * (row-local in both engines; CASE order matters — the null plant
    * wins over the dangling-ref plant on a shared key). */
  private[graft] def plantedOrders(o0: DataFrame): DataFrame =
    o0.select(
      col("o_orderkey"),
      when(col("o_orderkey") % PlantNullMod === 0, lit(null).cast("long"))
        .when(col("o_orderkey") % PlantRefMod === 0,
          col("o_custkey") + 1000000000L)
        .otherwise(col("o_custkey")).as("o_custkey"),
      when(col("o_orderkey") % PlantStatMod === 0, lit("X"))
        .otherwise(col("o_orderstatus")).as("o_orderstatus"),
      when(col("o_orderkey") % PlantNegMod === 0, -col("o_totalprice"))
        .otherwise(col("o_totalprice")).as("o_totalprice"),
      when(col("o_orderkey") % PlantDateMod === 0,
        to_timestamp(lit("1970-01-06 00:00:00")))
        .otherwise(col("o_orderdate")).as("o_orderdate"))
      .unionByName( // the duplicate plant: a second copy of the mod slice
        o0.filter(col("o_orderkey") % PlantDupMod === 0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderdate")))

  /** The five ROW-LOCAL checks as (check_name, target, violation
    * predicate) — the SHARED kernel of the batch report and the
    * streaming ingest gate ([[graft.streaming.GovernStream]]): the
    * predicates are the same Column objects in both, so the parity pin
    * is structural, not coincidental. Row-local means decidable per
    * row GIVEN the broadcast `c_present` dimension marker; the
    * uniqueness NDV check is the one corpus-scoped constraint and
    * stays batch-only (a streaming uniqueness check is watermarked
    * dropDuplicates, a different state contract). */
  private[graft] val RowChecks: Seq[(String, String, Column)] = Seq(
    ("completeness", "o_custkey", col("o_custkey").isNull),
    ("set_membership", "o_orderstatus",
      !col("o_orderstatus").isin("O", "F", "P")),
    ("non_negative", "o_totalprice", col("o_totalprice") <= 0),
    ("freshness", "o_orderdate",
      col("o_orderdate") < to_timestamp(lit("1992-01-01 00:00:00")) ||
        col("o_orderdate") >= to_timestamp(lit("1999-01-01 00:00:00"))),
    ("ref_integrity", "o_custkey",
      col("o_custkey").isNotNull && col("c_present").isNull))

  /** The broadcast dimension marker both consumers of [[RowChecks]]
    * join before evaluating the RI predicate. */
  private[graft] def withCustPresent(orders: DataFrame,
      custCol: DataFrame): DataFrame = {
    val custKeys = custCol.select(col("c_custkey")).distinct()
      .withColumn("c_present", lit(1))
    orders.join(broadcast(custKeys),
      col("o_custkey") === col("c_custkey"), "left")
  }

  /** The six-constraint report over any orders-shaped frame and
    * customer-key dimension — the kernel [[constraintSuite]] registers
    * (on the planted fact) and the suite pins on both verdict branches
    * (clean input → all pass; planted → exact violation counts). */
  private[graft] def constraintReportOf(orders: DataFrame,
      custCol: DataFrame): DataFrame = {
    val sums = Seq(
      count(lit(1)).as("n_rows"),
      countDistinct(col("o_orderkey")).as("key_ndv")) ++
      RowChecks.zipWithIndex.map { case ((_, _, pred), i) =>
        sum(when(pred, 1L).otherwise(0L)).as(s"v$i")
      }
    val one = withCustPresent(orders, custCol)
      .agg(sums.head, sums.tail: _*)
      .withColumnRenamed("v0", "v_null")
      .withColumnRenamed("v1", "v_status")
      .withColumnRenamed("v2", "v_neg")
      .withColumnRenamed("v3", "v_date")
      .withColumnRenamed("v4", "v_ref")
    one.select(expr(
      """stack(6,
        |  'completeness',    'o_custkey',     n_rows, v_null,
        |  'uniqueness',      'o_orderkey',    n_rows, n_rows - key_ndv,
        |  'set_membership',  'o_orderstatus', n_rows, v_status,
        |  'non_negative',    'o_totalprice',  n_rows, v_neg,
        |  'freshness',       'o_orderdate',   n_rows, v_date,
        |  'ref_integrity',   'o_custkey',     n_rows, v_ref)
        |  as (check_name, target, n_checked, n_violations)""".stripMargin))
      .select(col("check_name"), col("target"), col("n_checked"),
        col("n_violations"),
        expr("((n_checked - n_violations) * 1000000) div n_checked")
          .as("satisfied_ppm"),
        (col("n_violations") === 0).as("passed"))
      .orderBy("check_name")
  }

  /** Bootstrap replicate count for [[bootstrapCi]]. The interval is the
    * (1st, Bth) order-statistic pair of the replicate means — plotting
    * position 1/(B+1) puts ≈2.4% tail mass outside each end at B=40,
    * the percentile-bootstrap 95% interval. */
  val BootstrapB = 40

  /** Cumulative Poisson(1) thresholds in ppm — P(X≤k)·10^6 truncated,
    * k=0..4; a uniform draw above the last threshold means weight 5.
    * Literal constants so both engines compare against identical
    * integers (no libm divergence can enter the weights). */
  val PoissonCumPpm: Seq[Long] = Seq(367879L, 735758L, 919698L, 981011L, 996340L)

  /** Deterministic POISSON BOOTSTRAP confidence interval (Efron 1979;
    * the Poisson-resampling form is the standard distributed variant —
    * Chamandy et al., Google 2012, "Estimating Uncertainty for Massive
    * Data Streams") for the mean document length per language — the
    * error bars a data-governance dashboard needs before declaring two
    * corpus snapshots different. Exact multinomial resampling needs a
    * global draw of N indices (undistributable); Poisson(1) weights per
    * (row, replicate) are iid and ROW-LOCAL, which is what makes the
    * bootstrap a single scan at any scale.
    *
    * Determinism: the uniform for (doc, replicate b) is the md5 prefix
    * of `doc_id#b` reduced mod 10^6 — the house content-hash-uniform
    * discipline keyed on the UNIQUE row id, not the text: this corpus
    * intentionally contains exact duplicates (the dedup suite's
    * fixtures), and text-keyed draws would hand every copy the same
    * weight in every replicate, correlating the draws and narrowing
    * the CI below its nominal coverage. The weight is how many
    * [[PoissonCumPpm]] thresholds the uniform clears,
    * so Spark and DuckDB draw bit-identical weights. Replicate means
    * run in fixed-point ppm (integer division); the CI is the
    * (min, max) of the B replicate means — the (1, B) order statistics.
    *
    * Shape: `explode(sequence(0, B-1))` fans each row out B× (row-local
    * CPU, embarrassingly parallel — the 100 TB cost model of bootstrap
    * IS the B× hash work), then ONE map-side-combined groupBy on
    * (lang, b) carries |langs|·B partial rows per task through the
    * shuffle; the order statistics fold the B-row-per-lang frame in a
    * second tiny aggregate. Nothing driver-side, no window over data. */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame =
    bootstrapCiOf(Tables.fanOut(Tables.documents(spark, dir)))

  /** [[bootstrapCi]]'s kernel over any (doc_id, lang, n_chars) frame. */
  private[graft] def bootstrapCiOf(docs: DataFrame): DataFrame = {
    val b = explode(sequence(lit(0), lit(BootstrapB - 1))).as("b")
    val uPpm = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit("#"), col("b").cast("string"))), 1, 8), 16, 10)
      .cast("long") % 1000000L
    val w = PoissonCumPpm.foldLeft(lit(0L)) { (acc, t) =>
      acc + when(col("u_ppm") >= t, 1L).otherwise(0L)
    }
    val reps = docs
      .select(col("lang"), col("n_chars"), col("doc_id"), b)
      .withColumn("u_ppm", uPpm)
      .select(col("lang"), col("b"), col("n_chars"), w.as("w"))
      .groupBy("lang", "b")
      .agg(expr("(sum(w * n_chars) * 1000000) div sum(w)").as("mean_ppm"))
    val point = docs
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        expr("(sum(n_chars) * 1000000) div count(1)").as("mean_ppm"))
    reps.groupBy("lang")
      .agg(min("mean_ppm").as("ci_lo_ppm"), max("mean_ppm").as("ci_hi_ppm"))
      .join(point, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("mean_ppm"),
        col("ci_lo_ppm"), col("ci_hi_ppm"),
        (col("ci_hi_ppm") - col("ci_lo_ppm")).as("ci_width_ppm"))
      .orderBy("lang")
  }

  /** Planted regression for [[bootstrapDiffCi]]: documents in these
    * languages gain this many chars on the CURRENT snapshot's metric —
    * the two-language crawl regression the significance test must flag
    * while the unshifted languages must NOT flag (both verdict branches
    * live, and the no-effect branch is the one a naive mean-diff
    * monitor gets wrong by alerting on noise). */
  val DiffPlantLangs: Seq[String] = Seq("de", "fr")
  val DiffPlantShift = 80L

  /** Bootstrap SIGNIFICANCE TEST for the mean-length difference between
    * two corpus snapshots — the inferential lens beside [[ksDrift]]:
    * KS answers "did the distribution move?" distribution-free;
    * this answers "how BIG is the move, with what uncertainty?" — the
    * effect-size-with-error-bars a drift dashboard needs before paging
    * anyone. Same ref/cur split as the drift monitors (doc parity), a
    * [[DiffPlantShift]]-char regression planted on [[DiffPlantLangs]]'
    * current snapshot; per replicate b the two snapshots draw
    * INDEPENDENT Poisson weights (the doc_id-keyed uniform — the two
    * snapshots' id sets are disjoint by the parity split, so no id ever
    * draws for both sides, and duplicate TEXTS never share a draw
    * within or across snapshots) and the replicate statistic is
    * mean_ref − mean_cur in integer ppm; the CI is the (1,B) order
    * statistics and `significant` = the CI excludes zero. Same shape as
    * [[bootstrapCi]]: B× row-local fanout, ONE (snap, lang, b)-keyed
    * map-side-combined pass, then B-row-per-lang folds. */
  def bootstrapDiffCi(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(spark, dir))
      .select(
        when(col("doc_id") % 2 === 0, lit("ref")).otherwise(lit("cur"))
          .as("snap"),
        col("lang"), col("doc_id"),
        (col("n_chars") + when(col("doc_id") % 2 =!= 0 &&
          col("lang").isin(DiffPlantLangs.map(x => x: Any): _*),
          lit(DiffPlantShift)).otherwise(lit(0L))).as("m"))
    val b = explode(sequence(lit(0), lit(BootstrapB - 1))).as("b")
    val uPpm = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit("#"), col("b").cast("string"))), 1, 8), 16, 10)
      .cast("long") % 1000000L
    val w = PoissonCumPpm.foldLeft(lit(0L)) { (acc, t) =>
      acc + when(col("u_ppm") >= t, 1L).otherwise(0L)
    }
    val reps = docs
      .select(col("snap"), col("lang"), col("m"), col("doc_id"), b)
      .withColumn("u_ppm", uPpm)
      .select(col("snap"), col("lang"), col("b"), col("m"), w.as("w"))
      .groupBy("snap", "lang", "b")
      .agg(expr("(sum(w * m) * 1000000) div sum(w)").as("mean_ppm"))
    val diffs = reps.filter(col("snap") === "ref")
      .select(col("lang"), col("b"), col("mean_ppm").as("ref_ppm"))
      .join(reps.filter(col("snap") === "cur")
        .select(col("lang"), col("b"), col("mean_ppm").as("cur_ppm")),
        Seq("lang", "b"))
      .select(col("lang"), (col("ref_ppm") - col("cur_ppm")).as("d_ppm"))
      .groupBy("lang")
      .agg(min("d_ppm").as("ci_lo_ppm"), max("d_ppm").as("ci_hi_ppm"))
    val point = docs.groupBy("lang")
      .agg(
        sum(when(col("snap") === "ref", 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("snap") === "cur", 1L).otherwise(0L)).as("n_cur"),
        (expr("(sum(CASE WHEN snap = 'ref' THEN m ELSE 0 END) * 1000000) " +
          "div sum(CASE WHEN snap = 'ref' THEN 1 ELSE 0 END)") -
          expr("(sum(CASE WHEN snap = 'cur' THEN m ELSE 0 END) * 1000000) " +
            "div sum(CASE WHEN snap = 'cur' THEN 1 ELSE 0 END)"))
          .as("diff_ppm"))
    point.join(diffs, Seq("lang"))
      .select(col("lang"), col("n_ref"), col("n_cur"), col("diff_ppm"),
        col("ci_lo_ppm"), col("ci_hi_ppm"),
        (!(col("ci_lo_ppm") <= 0L && col("ci_hi_ppm") >= 0L)).as("significant"))
      .orderBy("lang")
  }
}
