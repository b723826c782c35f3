package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** The relational operator surface: scans with pushdown, projections,
  * filters, every join shape, partial→final aggregation, grouping
  * sets/rollup/cube, distinct, windows, sorts/top-k, set operations.
  *
  * The reference engine has none of these (SURVEY.md §2.2) — its only
  * aggregate is the per-file count — but they are the capability set the
  * extension brief mandates, and each is expressed declaratively so
  * Catalyst chooses the physical strategy (broadcast vs shuffle join,
  * partial aggregation, AQE re-planning) that survives a 100 TB scale-up.
  *
  * Determinism contract: every query ends in a total `orderBy` (unique key
  * tiebreaks) and rounds floating aggregates, so results hash-match the
  * DuckDB oracle bit-for-bit regardless of partitioning.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary. Narrow scan (4 measure + 2 key + 1
    * filter column reach the parquet reader), partial agg before the
    * 2-group shuffle — the canonical additive-agg plan that scales
    * linearly with input. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1999-06-30").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** SQL front door: the engine's queries are equally expressible through
    * `spark.sql` — same Catalyst plan as the DataFrame API. This one adds
    * a SCALAR SUBQUERY (customers above the average balance), a plan
    * shape none of the DataFrame-built queries exercise. */
  def sqlAboveAvgBalance(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    // decimal aggregation for partition-order-independent results — see
    // customerGroupingSets
    spark.sql(
      """SELECT c_mktsegment, count(*) AS n,
        |       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*), 2) AS avg_bal
        |FROM customer_v
        |WHERE c_acctbal >
        |      (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
        |       FROM customer_v)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  /** TPC-H Q3-shaped: 3-way join, revenue top-10. customer/orders/lineitem
    * all scale with SF, so no join side is force-broadcast: AQE +
    * autoBroadcastJoinThreshold pick broadcast at small SF and shuffle
    * joins at 100 TB (a forced broadcast of customer OOMs the driver
    * there). orders↔lineitem co-shuffle on the order key. */
  def topRevenueOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("o_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped: 6-table star join → per-nation revenue. Only the
    * fixed-cardinality dimensions (nation=25, region=5 rows at every SF)
    * are force-broadcast; customer/supplier scale with SF and are left to
    * AQE — broadcast at test scale, shuffle join at 100 TB. The
    * lineitem↔orders fact join shuffles on orderkey once. */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(c,
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** Per-brand revenue via the part dimension. `part` scales with SF
    * (200k×SF rows), so the broadcast decision is left to AQE rather than
    * forced — at bench SF it still broadcasts, at 100 TB it shuffles. */
  def brandRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** TPC-H Q7-shaped VOLUME SHIPPING: bilateral trade revenue between
    * two nations by ship year. The scale-correct form filters BOTH
    * nation dims to the two names BEFORE their joins (each broadcast
    * nation join then semi-prunes the supplier/customer legs to ~2/25
    * of their rows ahead of the big three-way join), with only the
    * cross-pair residual left as a post-join filter. Date range reaches
    * the lineitem scan as a pushed predicate. Decimal partials keep the
    * revenue partition-order independent. */
  def volumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val (natA, natB) = ("NATION_3", "NATION_7")
    val pair = Seq(natA, natB)
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val n1 = Tables.nation(spark, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
    val c = Tables.customer(spark, dir)
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
    l.join(s, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === natA && col("cust_nation") === natB) ||
        (col("supp_nation") === natB && col("cust_nation") === natA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double"), 2).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8-shaped NATIONAL MARKET SHARE: one nation's share of the
    * supply volume for a part type sold into one region, by order year.
    * Selective dims first — part type and the customer-side
    * nation→region chain prune before the fact joins — and the share is
    * a conditional-sum / total-sum ratio inside ONE aggregation pass
    * (no self-join of the filtered frame against itself). */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val target = "NATION_3"
    val p = Tables.part(spark, dir).filter(col("p_type") === "PROMO")
      .select("p_partkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val r = Tables.region(spark, dir).filter(col("r_name") === "EUROPE")
    val nCust = Tables.nation(spark, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val c = Tables.customer(spark, dir)
      .join(broadcast(nCust), col("c_nationkey") === col("c_nk"))
    val nSupp = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(nSupp), col("s_nationkey") === col("s_nk"))
    val vol = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")
    Tables.lineitem(spark, dir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        round((sum(when(col("supp_nation") === target, vol)
            .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
          sum(vol).cast("double")), 4).as("mkt_share"),
        round(sum(vol).cast("double"), 2).as("total_volume"))
      .orderBy("o_year")
  }

  /** TPC-H Q13-shaped CUSTOMER DISTRIBUTION: how many customers placed
    * exactly k orders, INCLUDING the zero-order customers a plain inner
    * join would silently drop (the classic left-outer + count(non-null)
    * idiom — count(o_orderkey) counts matches, not rows). Two-level
    * aggregation: per-customer counts (corpus-keyed, map-side combined)
    * collapse to a |distinct k|-sized key space for the distribution —
    * nothing after the first aggregate scales with the corpus. */
  def customerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val perCust = c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** LEFT SEMI join (EXISTS): customers having at least one open order. */
  /** TPC-H Q15-shaped TOP SUPPLIER: the supplier(s) whose quarterly
    * revenue equals the maximum over all suppliers. The "view + scalar
    * max" of the SQL form becomes an aggregate plus a ONE-ROW broadcast
    * join against its own max — no global sort, no window over the whole
    * supplier frame (a `rank() OVER ()` with no partition key would pull
    * every supplier row through one task at 100 TB). Revenue sums in
    * DECIMAL so the max-equality comparison is partition-order exact —
    * a double sum could make Spark and the oracle disagree about which
    * supplier is "the" max by one ulp. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.join(broadcast(mx), col("total_rev") === col("max_rev"))
      .join(Tables.supplier(spark, dir),
        col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("total_rev").cast("double"), 2).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q17-shaped SMALL-QUANTITY REVENUE: average yearly revenue lost
    * if small-quantity orders (below 20% of the part's average quantity)
    * were no longer filled, for one brand. The correlated per-part AVG
    * subquery of the SQL form decorrelates into ONE window over the
    * brand-filtered lineitems — a single shuffle on partkey computes
    * sum(qty)/count per part and the threshold test in the same pass
    * (the classic agg-then-self-join plan scans lineitem twice). The
    * threshold is evaluated in INTEGERS — qty < 0.2·avg ⟺ 5·qty·cnt <
    * sum_qty with integral quantities — so no float division can flip a
    * boundary row between engines. Per-part group size is bounded (a part
    * appears in ~30 lineitems at any SF), so window state never grows
    * with the corpus. */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#3").select("p_partkey")
    val w = Window.partitionBy("l_partkey")
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_extendedprice"),
        col("l_quantity").cast("long").as("qty"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .withColumn("sum_qty", sum("qty").over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("qty") * lit(5) * col("cnt") < col("sum_qty"))
      .agg(round((sum(col("l_extendedprice").cast("decimal(18,4)")) /
        lit(7.0)).cast("double"), 2).as("avg_yearly"))
  }

  /** TPC-H Q4-shaped ORDER PRIORITY CHECKING: orders in one quarter with
    * at least one item shipped after the order date (the data has no
    * commit/receipt dates, so ship-after-order stands in for Q4's
    * late-commit test — the plan shape is Q4's). The EXISTS subquery
    * plans as a LEFT SEMI join with the ship>order residual riding the
    * join condition, so each order matches at most once and no lineitem
    * columns survive the join; the date range reaches the orders scan
    * (`PushedFilters`), and the final agg is a 5-key partial→final
    * count. One orderkey shuffle at any SF. */
  def orderPriorityCount(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q6-shaped FORECAST REVENUE CHANGE: one filtered scan, one
    * global sum — the canonical pushdown probe. All three predicates
    * (ship-date year, discount band, quantity cap) reach the parquet
    * scan as `PushedFilters`; revenue accumulates in DECIMAL(18,4) so
    * partials are partition-order independent and the 2dp round cannot
    * straddle a ulp between engines. */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(round(sum((col("l_extendedprice") * col("l_discount"))
        .cast("decimal(18,4)")).cast("double"), 2).as("revenue"))

  /** TPC-H Q10-shaped RETURNED ITEM REPORTING: top-20 customers by
    * revenue lost to returns in one quarter. Return flag and date range
    * reach their scans; the returned-lineitem↔orders join shuffles on
    * orderkey once, customer joins on custkey (AQE-broadcast at test SF,
    * co-partitioned SMJ at scale), and the 25-row nation dim is
    * force-broadcast. Revenue sums in DECIMAL before the 2dp round, and
    * the top-20 plans as `TakeOrderedAndProject` on (rounded revenue,
    * custkey) — a total order, never a global sort. */
  def returnedItemCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double"), 2).as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q14-shaped PROMO REVENUE SHARE: percentage of one month's
    * revenue from PROMO-type parts — a conditional-sum/total-sum ratio
    * inside ONE aggregation pass over the month's lineitems joined to
    * part (no self-join, no second scan; `q8_market_share`'s audited
    * shape on a thinner join). Both sums accumulate in DECIMAL; the
    * division happens once in double on two exact totals. */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select("p_partkey", "p_type")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .withColumn("vol",
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)"))
      .agg(round((lit(100.0) *
          sum(when(col("p_type") === "PROMO", col("vol"))
            .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
          sum(col("vol")).cast("double")), 4).as("promo_share"))
  }

  /** Threshold for [[largeOrders]]: an order's total quantity must beat
    * this to count as "large" (Q18's 300-unit bar; the synthetic data
    * tops out at ~460, so the cut is selective but non-empty). */
  val LargeOrderQty = 300L

  /** TPC-H Q18-shaped LARGE VOLUME CUSTOMER: orders whose total quantity
    * exceeds [[LargeOrderQty]], with their customers. The HAVING
    * subquery is ONE map-side-combined aggregate on orderkey (integral
    * quantities — the long cast makes the threshold integer-exact);
    * survivors are a thin (orderkey, qty) frame that joins orders and
    * customer by key. Top-10 by raw o_totalprice (a stored column, not
    * an aggregate — bit-identical across engines) with the orderkey
    * tiebreak plans as `TakeOrderedAndProject`. */
  def largeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > LargeOrderQty)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q19-shaped DISJUNCTIVE PREDICATE REVENUE: three (brand, size
    * band, quantity band) alternatives OR'd across the part↔lineitem
    * join — the classic test that a disjunction neither blocks the
    * equi-join (the OR must ride as a residual, not degrade the join to
    * a nested loop) nor defeats scan pruning. The IMPLIED conjunctions
    * are pre-filtered manually: part prunes to the three brands and
    * lineitem to the quantity hull [1,30] before the join (Catalyst
    * does not infer them from an OR), so both scans carry
    * `PushedFilters` and the join sides shrink ~3/25 and ~60% ahead of
    * the shuffle. Revenue accumulates in DECIMAL. */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#4"))
      .select("p_partkey", "p_brand", "p_size")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val alts =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#4" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 30))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .filter(alts)
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double"), 2).as("revenue"))
  }

  /** TPC-H Q21-shaped WAITING SUPPLIER: suppliers of one nation who were
    * the ONLY supplier with a returned ('R') item in a multi-supplier
    * finished order (the data has no commit/receipt dates, so the return
    * flag stands in for "late" — the plan shape is Q21's). The double
    * correlated EXISTS / NOT EXISTS of the SQL form — which naively
    * executes as two more passes over lineitem per outer row — becomes
    * ONE per-order aggregate: n_supp = distinct suppliers in the order,
    * n_late_supp = distinct suppliers with an R item; the Q21 condition
    * is exactly n_supp ≥ 2 ∧ n_late_supp = 1. The ORACLE is written in
    * the EXISTS form, so the hash-match machine-checks the rewrite. Both
    * the aggregate and the joins key on l_orderkey — one shuffle
    * partitioning reused across the whole plan. */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir).filter(col("n_name") === "NATION_5")
      .select(col("n_nationkey").as("s_nk"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(nat), col("s_nationkey") === col("s_nk"))
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_returnflag")
    val perOrder = l.groupBy("l_orderkey").agg(
      countDistinct(col("l_suppkey")).as("n_supp"),
      countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
        .as("n_late_supp"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    l.filter(col("l_returnflag") === "R")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(perOrder, "l_orderkey")
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), asc("s_name"))
      .limit(20)
  }

  /** TPC-H Q22-shaped IDLE HIGH-BALANCE CUSTOMERS: per-segment count and
    * balance of customers above the mean positive account balance with no
    * order since the cutoff. The scalar AVG subquery becomes a one-row
    * broadcast of (sum, count), and the mean test multiplies out —
    * bal·n_pos > sum_bal in DECIMAL — so no division is ever compared.
    * The NOT EXISTS is a left-anti join against the date-pruned orders
    * projection (two columns reach the scan). */
  def idleHighBalanceCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val stats = c.filter(col("c_acctbal") > 0).agg(
      sum(col("c_acctbal").cast("decimal(18,4)")).as("sum_bal"),
      count(lit(1)).as("n_pos"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey")
    c.join(broadcast(stats))
      .filter(col("c_acctbal").cast("decimal(18,4)") * col("n_pos") >
        col("sum_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal").cast("decimal(18,4)")).cast("double"), 2)
          .as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q11-shaped IMPORTANT PARTS: parts whose lineitem value exceeds
    * a fixed fraction (0.07%) of the global total — the HAVING-over-a-
    * scalar-aggregate-subquery shape. The per-part aggregate computes
    * once; its own re-aggregation (a few-thousand-row frame, not the
    * corpus) yields the global total as a one-row broadcast, and the
    * fraction test is integer-scaled decimal (value·10000 > 7·total) so
    * no engine disagrees at the threshold boundary. Ordered by the
    * ROUNDED output value so both engines sort the same key. */
  def importantParts(spark: SparkSession, dir: String): DataFrame = {
    val vals = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)")).as("val_d"))
    val tot = vals.agg(sum(col("val_d")).as("total"))
    vals.join(broadcast(tot))
      .filter(col("val_d") * lit(10000) > col("total") * lit(7))
      .select(col("l_partkey"),
        round(col("val_d").cast("double"), 2).as("value"))
      .orderBy(desc("value"), asc("l_partkey"))
  }

  def customersWithOpenOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** LEFT ANTI join (NOT EXISTS): segment histogram of customers with no
    * recent orders (the unfiltered variant is empty at every SF — all
    * customers have at least one order in the generated data). */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** LEFT OUTER join preserved-null semantics: per-customer order count
    * (zero included) and lifetime spend. */
  def customerOrderStats(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("total_spend"))
      .orderBy("c_custkey")
  }

  /** Window / ranking: top-3 orders per customer by price. The per-key
    * top-k pattern that at 100 TB wants a partial top-k before the
    * shuffle — Spark's WindowExec sorts within partitions of the hash
    * exchange on o_custkey, which AQE sizes. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    o.withColumn("rank_in_cust", row_number().over(w).cast("long"))
      .filter(col("rank_in_cust") <= 3)
      .select(col("o_custkey"), col("rank_in_cust"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy("o_custkey", "rank_in_cust")
  }

  /** Window / running aggregate: cumulative spend per customer in order
    * date order. */
  def runningCustomerSpend(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Window / lag: price delta between consecutive shipments of each
    * supplier. */
  def supplierShipmentDeltas(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val w = Window.partitionBy("l_suppkey")
      .orderBy(asc("l_shipdate"), asc("l_orderkey"), asc("l_linenumber"))
    l.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") -
          lag(col("l_extendedprice"), 1, 0.0).over(w), 2).as("price_delta"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  /** ROLLUP hierarchy totals. NULL group slots are coalesced to 'ALL' so
    * the oracle compare is collation-independent. */
  def returnFlagRollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy("returnflag", "linestatus")
  }

  /** CUBE over order status × priority. */
  def orderStatusCube(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("n_orders"), col("total_price"))
      .orderBy("orderstatus", "orderpriority")
  }

  /** GROUPING SETS via SQL — two independent group shapes in one pass.
    * `avg` runs over DECIMAL, not DOUBLE: double summation is
    * partition-order dependent (non-associative), and at sf0.001 one
    * group's average landed exactly on a .005 rounding boundary where
    * Spark's partial-sum order and DuckDB's sequential sum disagree in
    * the last ulp. Decimal addition is exact and associative, so the
    * result is identical under ANY partitioning — the right money-column
    * posture at cluster scale, not just an oracle trick. */
  def customerGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("gs_customer")
    spark.sql(
      """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
        |       coalesce(CAST(c_nationkey AS STRING), 'ALL') AS nationkey,
        |       count(1) AS n,
        |       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(1), 2) AS avg_bal
        |FROM gs_customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        |ORDER BY segment, nationkey""".stripMargin)
  }

  /** DISTINCT projection. */
  def distinctFlagStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** Exact multi-column COUNT(DISTINCT) — Catalyst expands to a
    * two-level aggregate automatically. */
  def distinctPartsPerFlag(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")

  /** Approximate distinct (HLL++) with an ORACLE-CHECKABLE envelope: the
    * sketch value itself is engine-specific (DuckDB can't reproduce
    * Spark's HLL), so the row emits the EXACT count plus the assertion
    * `|approx − exact| / exact <= 0.02` — DuckDB computes the same exact
    * count and a literal `true`, and the hash compare then proves the
    * sketch ran AND landed inside its accuracy envelope (rsd = 0.01, so
    * 2% is a 2-sigma bound; the sketch is deterministic for fixed data,
    * making this a stable gate, not a flaky one). */
  def approxDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    // dedup (type, user) FIRST: HLL insertion is idempotent, so the
    // sketch over the deduped set is the sketch over the raw stream —
    // and the exact count becomes a plain count(*). Mixing countDistinct
    // with a non-distinct aggregate in one agg would instead trigger
    // Catalyst's Expand rewrite (every row duplicated per aggregate
    // family; measured 3x slower here)
    Tables.fanOut(Tables.events(spark, dir))
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        count(lit(1)).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) / col("exact_users") <= 0.02)
          .as("within_tol"))
      .orderBy("event_type")

  /** Approximate percentile (the t-digest-style rank sketch beside the
    * HLL row) with the same envelope pattern as [[approxDistinctUsers]]
    * — but here the EXACT reference value stays Spark-side (Spark's
    * `percentile` over the same rows), because a floating percentile's
    * interpolation arithmetic is not guaranteed bit-equal across
    * engines: only the group key, an integer row count, and the boolean
    * envelope cross to DuckDB. accuracy=10000 bounds rank error at
    * n/10000, far inside the 1% value tolerance on this data. */
  def approxQuantilePrices(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_p50"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("n_rows"),
        (abs(col("approx_p50") - col("exact_p50")) / col("exact_p50") <= 0.01)
          .as("within_tol"))
      .orderBy("l_returnflag")

  /** lgConfigK for [[hllMergeUsers]]: 2¹² registers → σ ≈ 1.04/√4096 ≈
    * 1.6% relative error, well inside the 5% check envelope. */
  val HllLgK = 12

  /** MERGEABLE-sketch distinct counting: one HLL sketch per (type, day)
    * shard, daily sketches unioned into the per-type total — the
    * re-aggregation pattern a 100 TB pipeline actually runs. Raw data
    * is sketched ONCE at ingest granularity (here: day); every later
    * rollup (weekly, all-time, ad-hoc type filters) merges the tiny
    * binary sketches instead of rescanning events, which is what makes
    * distinct-count dashboards O(shards), not O(corpus). Spark 4's
    * DataSketches functions (`hll_sketch_agg` / `hll_union_agg` /
    * `hll_sketch_estimate`) carry the sketch as a first-class binary
    * column, so the daily frame is a normal table a warehouse would
    * persist beside its aggregates.
    *
    * Cross-engine rules as [[approxDistinctUsers]]: the estimate stays
    * Spark-side (DataSketches binaries are not portable arithmetic);
    * only the group key, exact integer counts, and the envelope
    * boolean cross to DuckDB. The suite additionally pins merge
    * consistency: union-of-daily-sketches ≈ one-shot sketch over the
    * same rows. */
  def hllMergeUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.fanOut(Tables.events(spark, dir))
    val daily = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(HllLgK)).as("sk"))
    val merged = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("est_users"))
    // exact reference on a pre-deduped frame (same Expand-rewrite
    // avoidance as approxDistinctUsers); 3-row join side broadcasts
    val exact = ev.select("event_type", "user_id").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("exact_users"))
    merged.join(exact, "event_type")
      .select(col("event_type"), col("n_days"), col("exact_users"),
        (abs(col("est_users") - col("exact_users")) / col("exact_users") <= 0.05)
          .as("within_tol"))
      .orderBy("event_type")
  }

  /** Support floor and output size for [[associationRules]]. */
  val RuleMinSupport = 2
  val RuleTopK = 20

  /** Market-basket association rules over order baskets: for part pairs
    * co-purchased in at least [[RuleMinSupport]] orders, both directed
    * rules with confidence = supp(a,b)/supp(a) and
    * lift = N·supp(a,b)/(supp(a)·supp(b)), top [[RuleTopK]] by lift.
    * The 2-itemset core of frequent-itemset mining, expressed as the
    * same order-keyed self-join the co-purchase graph uses: per-basket
    * fan-out is O(basket²) with baskets bounded by construction, pair
    * support is a map-side-combined count, and the support floor prunes
    * the pair table BEFORE the supports join — the a-priori property
    * (a pair can't beat a floor its items don't) keeps every later
    * stage sized by surviving pairs, not the catalog². Item supports
    * join in by key; the N scalar is a 1-row broadcast cross. */
  def associationRules(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.fanOut(Tables.lineitem(spark, dir))
    // per-basket distinct so multi-line items count one support each
    val baskets = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
      .distinct()
    val n = baskets.select(countDistinct(col("ok")).as("n_baskets"))
    val itemSupp = baskets.groupBy(col("item")).agg(count(lit(1)).as("supp"))
    val a = baskets.select(col("ok"), col("item").as("ia"))
    val b = baskets.select(col("ok"), col("item").as("ib"))
    val pairs = a.join(b, "ok").filter(col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("supp_ab"))
      .filter(col("supp_ab") >= RuleMinSupport)
    val directed = pairs.select(col("ia").as("antecedent"), col("ib").as("consequent"), col("supp_ab"))
      .unionByName(pairs.select(col("ib").as("antecedent"), col("ia").as("consequent"), col("supp_ab")))
    directed
      .join(itemSupp.select(col("item").as("antecedent"), col("supp").as("supp_a")), "antecedent")
      .join(itemSupp.select(col("item").as("consequent"), col("supp").as("supp_b")), "consequent")
      .crossJoin(broadcast(n))
      .select(col("antecedent"), col("consequent"), col("supp_ab"),
        col("supp_a"), col("supp_b"),
        round(col("supp_ab") / col("supp_a"), 4).as("confidence"),
        round(col("supp_ab") * col("n_baskets") / (col("supp_a") * col("supp_b")), 4)
          .as("lift"))
      .orderBy(desc("lift"), asc("antecedent"), asc("consequent"))
      .limit(RuleTopK)
  }

  /** Count-Min Sketch geometry: 4 independent md5-derived hash rows ×
    * 256 buckets. ε = e/w ≈ 1.06% of the stream length, δ = e^-d ≈ 1.8%. */
  val CmsDepth = 4
  val CmsWidth = 256

  /** COUNT-MIN SKETCH over the corpus token stream, queried for the
    * exact top-20 words — the third sketch beside HLL and the rank
    * sketch, and unlike those it is EXACTLY cross-engine: the d hash
    * rows are md5-derived (the only hash both engines share), every
    * count is integer, so DuckDB rebuilds the identical sketch and the
    * oracle checks estimates bit-for-bit, not an envelope. The output
    * pins the structural CMS guarantee `est >= exact` per word.
    *
    * Scale posture: the sketch IS the point — the (j, bucket) table is
    * d×w = 1,024 rows no matter the corpus; construction pre-aggregates
    * per word (sketch addition is linear, so summing per-word counts
    * into buckets equals streaming per-occurrence updates) and the
    * probe join touches 20×d rows against the 1,024-row sketch. The
    * corpus→vocabulary aggregation under all five consumers is ONE
    * shared subplan — AQE's exchange reuse materializes it once (7
    * `ReusedExchange`s in the executed plan, PLANS-verified) — so at
    * 100 TB the corpus is scanned once and every hash row works over
    * vocabulary-sized input. */
  def cmsTopWords(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.tokenize
    val occ = Tables.fanOut(Tables.documents(spark, dir))
      .select(explode(tokenize(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    def bucket(j: Int) =
      pmod(conv(substring(md5(concat_ws("#", lit(j.toString), col("word"))), 1, 8),
        16, 10).cast("long"), lit(CmsWidth.toLong))
    val contrib = (0 until CmsDepth).map(j =>
      occ.select(lit(j).as("j"), bucket(j).as("bucket"), col("cnt")))
      .reduce(_ unionByName _)
    val sketch = contrib.groupBy("j", "bucket").agg(sum("cnt").as("bucket_total"))
    val top = occ.orderBy(desc("cnt"), asc("word")).limit(20)
    val probes = (0 until CmsDepth).map(j =>
      top.select(col("word"), col("cnt"), lit(j).as("j"), bucket(j).as("bucket")))
      .reduce(_ unionByName _)
    probes.join(sketch, Seq("j", "bucket"))
      .groupBy("word", "cnt")
      .agg(min("bucket_total").as("cms_est"))
      .select(col("word"), col("cnt").as("exact_cnt"), col("cms_est"),
        (col("cms_est") >= col("cnt")).as("never_underestimates"))
      .orderBy(desc("exact_cnt"), asc("word"))
  }

  /** UNION / INTERSECT / EXCEPT in one tagged result: which nations have
    * customers vs suppliers. */
  def nationSetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_nationkey").as("nationkey")).distinct()
    val s = Tables.supplier(spark, dir).select(col("s_nationkey").as("nationkey")).distinct()
    val both = c.intersect(s).withColumn("tag", lit("both"))
    val cOnly = c.except(s).withColumn("tag", lit("customer_only"))
    val sOnly = s.except(c).withColumn("tag", lit("supplier_only"))
    both.union(cOnly).union(sOnly)
      .select("tag", "nationkey")
      .orderBy("tag", "nationkey")
  }

  /** Global sort + limit (top-k): driver-side k rows only. */
  def topOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(15)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("totalprice"))

  /** PIVOT: long→wide per-returnflag quantity totals. The value list is
    * EXPLICIT (`Seq("A","N","R")`), which is the scale-correct form —
    * without it Spark first runs a distinct scan of the pivot column to
    * discover values (an extra corpus pass, and a silent schema
    * dependence on the data). With the list, pivot compiles to one
    * conditional-aggregation pass: `sum(CASE WHEN ...)` per value, a
    * single partial→final agg, no extra shuffle vs a plain groupBy. */
  def returnFlagPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum(col("l_quantity")), 2))
      .orderBy("l_linestatus")

  /** Distributed second-moment statistics (corr, stddev) with EXACT
    * cross-engine parity: Spark's `corr`/`stddev` accumulate doubles in
    * partition order, so their low bits are not reproducible across
    * engines (or even runs at different parallelism). Instead the five
    * sufficient moments (n, Σx, Σy, Σx², Σy², Σxy) are summed in
    * DECIMAL — exact and associative, so partitioning cannot change
    * them — then the closed-form estimators are evaluated in double on
    * the driver-visible exact sums: both engines see bit-identical
    * inputs and run the same IEEE expression tree. This is also the
    * scale-correct plan: one partial→final agg, no second pass for the
    * means (the naive two-pass corr reads the corpus twice). */
  def flagQtyPriceStats(spark: SparkSession, dir: String): DataFrame = {
    val qd = col("l_quantity").cast("decimal(18,4)")
    val pd = col("l_extendedprice").cast("decimal(18,4)")
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(qd).as("sx"), sum(pd).as("sy"),
        sum(qd * qd).as("sxx"), sum(pd * pd).as("syy"),
        sum(qd * pd).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        round(
          (col("n") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
          sqrt((col("n") * col("sxx").cast("double") -
                 col("sx").cast("double") * col("sx").cast("double")) *
               (col("n") * col("syy").cast("double") -
                 col("sy").cast("double") * col("sy").cast("double"))), 6)
          .as("corr_qty_price"),
        round(
          sqrt((col("n") * col("sxx").cast("double") -
                 col("sx").cast("double") * col("sx").cast("double")) /
               (col("n").cast("double") * (col("n") - 1))), 6)
          .as("stddev_qty"))
      .orderBy("l_returnflag")
  }

  /** EXACT grouped percentiles (median / p90) — the exact complement to
    * the approx_percentile sketch path: Spark's `percentile` does a
    * full sort-based exact computation with linear interpolation, the
    * same definition as the oracle's quantile_cont. Exactness costs a
    * per-group sort of the values — the right tool for bounded groups
    * or final reporting; the sketch variant (`q_approx_quantile`)
    * remains the scale path for per-key percentiles over raw logs. */
  def exactPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("median_price"),
        round(percentile(col("l_extendedprice"), lit(0.9)), 4).as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Planted constraint violations for [[qualityAudit]] — the synthetic
    * generator emits perfectly clean tables, so without planting, the
    * audit would only ever prove the zero case (the r1 empty-dedup
    * trap). Each row trips exactly the violations named in its text:
    * an orphan order key, a non-positive quantity, a NULL return flag.
    * Single source of truth — the oracle VALUES clause mirrors this
    * list. Fields: (orderkey, quantity, returnflag). */
  val AuditPlanted: Seq[(Long, Double, Option[String])] = Seq(
    (88000001L, 10.0, Some("N")), // orphan l_orderkey (orders max is SF-bounded)
    (1L, -5.0, Some("N")),        // range violation, valid key
    (1L, 10.0, None))             // NULL return flag, valid key

  /** Declarative DATA-QUALITY audit — the admission gate a pipeline runs
    * before promoting a batch: referential integrity, range, not-null and
    * key-uniqueness constraints, each reported as (constraint,
    * n_violations, n_checked). All row-local checks fold into ONE
    * partial→final aggregation pass over lineitem (additive counters, no
    * per-constraint scans); the RI check is the single extra exchange —
    * a left-anti join keyed on the order key that AQE broadcasts when
    * the key set fits. Nothing here grows with constraint count: adding
    * a row-local rule is one more SUM column in the same pass. */
  def qualityAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val planted = AuditPlanted
      .map { case (k, q, f) => (k, q, f.orNull) }
      .toDF("l_orderkey", "l_quantity", "l_returnflag")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .unionByName(planted)
    val orders = Tables.orders(spark, dir)
    val rowLocal = li.agg(
      count(lit(1)).as("n_checked"),
      sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("v_range"),
      sum(when(col("l_returnflag").isNull, 1L).otherwise(0L)).as("v_null"))
    val orphans = li.join(orders, li("l_orderkey") === orders("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v_ri"))
    val dupKeys = orders.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("v_dup"))
    val base = rowLocal.crossJoin(orphans).crossJoin(dupKeys) // 1×1×1 rows
    def check(name: String, viol: Column, checked: Column) =
      base.select(lit(name).as("constraint"), viol.as("n_violations"),
        checked.as("n_checked"))
    check("lineitem.l_orderkey -> orders.o_orderkey", col("v_ri"), col("n_checked"))
      .unionByName(check("lineitem.l_quantity > 0", col("v_range"), col("n_checked")))
      .unionByName(check("lineitem.l_returnflag NOT NULL", col("v_null"), col("n_checked")))
      .unionByName(check("orders.o_orderkey UNIQUE", col("v_dup"), col("n_keys")))
      .orderBy("constraint")
  }

  /** TPC-H Q2-shaped MINIMUM-COST SUPPLIER: for each part in a size/type
    * slice, the EUROPE supplier(s) offering the lowest observed unit
    * price. The data ships no `partsupp` table, so the part↔supplier
    * offer relation derives from lineitem history — unit cost =
    * min(l_extendedprice / l_quantity) per (part, supplier) — the same
    * derivation q11/q16/q20 use. Q2's correlated MIN subquery becomes the
    * decorrelated two-level aggregate: per-(part,supp) min, then
    * per-part min over the region-pruned offers, joined back on cost
    * equality (raw IEEE doubles, identical in both engines because the
    * quotient inputs are identical parquet bytes; rounding happens only
    * at output so it cannot flip the argmin). Offers aggregate shuffles
    * on (partkey, suppkey); the part slice and the 3-table supplier
    * geography prune before the join-back, so the equality join runs on
    * the sliced offer set, not the corpus. */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val offers = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("uc"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("uc")).as("unit_cost_raw"))
    val euro = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val slice = Tables.part(spark, dir)
      .filter(col("p_size") === 7 && col("p_type") === "STANDARD")
      .select("p_partkey", "p_name")
    val sliced = offers
      .join(slice, col("l_partkey") === col("p_partkey"))
      .join(euro, col("l_suppkey") === col("s_suppkey"))
    val best = sliced.groupBy(col("l_partkey").as("b_partkey"))
      .agg(min("unit_cost_raw").as("best_cost"))
    sliced
      .join(best, col("l_partkey") === col("b_partkey") &&
        col("unit_cost_raw") === col("best_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"),
        round(col("unit_cost_raw"), 4).as("unit_cost"))
      .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"),
        asc("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q9-shaped PRODUCT TYPE PROFIT: profit by supplier nation and
    * order year for a part-name slice. No `partsupp` means no
    * ps_supplycost; the documented cost proxy is p_retailprice·qty/10
    * (one-tenth retail as unit cost), which preserves Q9's plan shape —
    * a 5-table join (fact + part + supplier + nation + orders) where the
    * LIKE-sliced part dimension semi-prunes the fact first and only the
    * pruned rows pay the orders join for the year column. Profit
    * accumulates in DECIMAL(18,4) (partition-order independent), rounded
    * once at output. */
  def productTypeProfit(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_name").like("%gear%"))
      .select("p_partkey", "p_retailprice")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    Tables.lineitem(spark, dir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity") / lit(10))
          .cast("decimal(18,4)").as("amount"))
      .groupBy("nation", "o_year")
      .agg(round(sum(col("amount")).cast("double"), 2).as("profit"))
      .orderBy(asc("nation"), desc("o_year"))
  }

  /** TPC-H Q12-shaped SHIPPING PRIORITY MIX: per ship year, how many
    * lineitems belonged to critical-priority orders vs the rest. The data
    * has no l_shipmode/commit/receipt dates, so the ship YEAR stands in
    * for Q12's mode grouping — the plan shape is Q12's: date-windowed
    * fact scan (range predicate pushed to parquet), one orderkey join,
    * then a conditional CASE aggregation (two additive counters in a
    * single partial→final pass, never two scans). */
  def priorityShippingMix(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .select("l_orderkey", "l_shipdate")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("l_shipdate")).as("ship_year"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("ship_year")
  }

  /** TPC-H Q16-shaped SUPPLIER COUNT BY PART DESCRIPTOR: how many
    * qualified suppliers have shipped each (brand, type, size) slice.
    * The part↔supplier relation again derives from lineitem; the
    * "customer complaints" exclusion (no s_comment column) becomes the
    * negative-balance supplier set, planned as a LEFT ANTI join before
    * the distinct count. The part slice broadcasts (a few hundred rows
    * after the size/brand filter at any SF — bounded by the descriptor
    * domain, not the corpus), so the only corpus-wide exchange is the
    * distinct-aggregate shuffle on the 4-column key. */
  def supplierCountByPart(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#5" &&
        col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val complained = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey")
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(complained, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"),
        asc("p_size"))
  }

  /** TPC-H Q20-shaped DOMINANT-SHARE PROMO SUPPLIERS: ASIA suppliers who
    * shipped more than a fifth of some red part's total 1997 volume. No
    * `partsupp` means no ps_availqty, so Q20's "stocked more than half
    * of shipped" becomes "shipped a dominant share" — the nested
    * per-(part,supp) vs per-part aggregate pair survives, compared in
    * exact DECIMAL with the fraction multiplied out (5·q_sp > t_p), so
    * no engine disagrees at the boundary. Plans as: name-sliced part
    * broadcast prunes the date-windowed fact, two stacked aggregates on
    * shuffle-compatible keys ((part,supp) → part), then a LEFT SEMI from
    * the region-pruned supplier dimension into the qualifying set. */
  def dominantShareSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val reds = Tables.part(spark, dir)
      .filter(col("p_name").like("red%")).select("p_partkey")
    val shipped = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(reds, col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("q_sp"))
    val totals = shipped.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum("q_sp").as("t_p"))
    val qualifying = shipped
      .join(totals, col("l_partkey") === col("t_partkey"))
      .filter(col("q_sp") * lit(5) > col("t_p"))
      .select(col("l_suppkey").as("q_suppkey"))
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .join(qualifying, col("s_suppkey") === col("q_suppkey"), "left_semi")
      .select(col("s_name"), round(col("s_acctbal"), 2).as("acctbal"),
        col("n_name"))
      .orderBy("s_name")
  }
}
