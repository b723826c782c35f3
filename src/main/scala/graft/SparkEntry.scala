package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator/capability from SURVEY.md §2
  * (reference surface) or the extension brief (relational, events, dedup,
  * similarity, text analysis, multimodal). [[oracleSql]] carries a
  * result-equivalent DuckDB query for each (omitted only where no SQL
  * equivalent exists, e.g. HLL sketches).
  *
  * Determinism rules shared by both sides: total ORDER BY with unique
  * tiebreaks, floating aggregates rounded, temporal outputs formatted as
  * strings, cross-engine hashing only via md5 (identical in Spark/DuckDB).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The
    * reference's one true query: per-document word count with
    * reference-exact tokenization (SURVEY.md §4.3). */
  def entry(spark: SparkSession): DataFrame =
    queries("wc_per_doc")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference surface: per-key word count pipeline (SURVEY §2.1) ----
    "wc_per_doc" -> ((s, dir) =>
      WordCount.perKey(Tables.documents(s, dir), col("doc_id"), col("text"))
        .withColumnRenamed("key", "doc_id")
        .orderBy("doc_id", "word")),
    "wc_global" -> ((s, dir) =>
      WordCount.global(Tables.documents(s, dir), col("text"))
        .orderBy("word")),
    "wc_top20" -> ((s, dir) =>
      WordCount.topK(Tables.documents(s, dir), col("text"), 20)),

    // ---- relational surface ----
    "q1_pricing"       -> (Relational.pricingSummary _),
    "q3_top_revenue"   -> (Relational.topRevenueOrders _),
    "q5_region_revenue" -> (Relational.regionRevenue _),
    "q_brand_revenue"  -> (Relational.brandRevenue _),
    "q_semi_join"      -> (Relational.customersWithOpenOrders _),
    "q_anti_join"      -> (Relational.customersWithoutOrders _),
    "q_outer_join"     -> (Relational.customerOrderStats _),
    "q_window_rank"    -> (Relational.topOrdersPerCustomer _),
    "q_window_running" -> (Relational.runningCustomerSpend _),
    "q_window_lag"     -> (Relational.supplierShipmentDeltas _),
    "q_rollup"         -> (Relational.returnFlagRollup _),
    "q_cube"           -> (Relational.orderStatusCube _),
    "q_grouping_sets"  -> (Relational.customerGroupingSets _),
    "q_distinct"       -> (Relational.distinctFlagStatus _),
    "q_count_distinct" -> (Relational.distinctPartsPerFlag _),
    "q_approx_distinct" -> (Relational.approxDistinctUsers _),
    "q_set_ops"        -> (Relational.nationSetOps _),
    "q_top_orders"     -> (Relational.topOrders _),

    // ---- events / time-series surface ----
    "q_events_hourly"   -> (EventsOps.hourlyTypeCounts _),
    "q_events_sessions" -> (EventsOps.userSessions _),
    "q_events_json"     -> (EventsOps.propsKeyHistogram _),
    "q_events_daily_share" -> (EventsOps.dailyTypeShare _),
  )

  /** DuckDB-dialect equivalents over the same tables (registered by the
    * driver under their bare names). Column names/aliases must match the
    * Spark output exactly — the compare sorts columns by name. */
  def oracleSql: Map[String, String] = Map(
    "wc_per_doc" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split(translate(regexp_replace(text, '[[:punct:]]', '', 'g'), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), t -> t <> '')) AS word
        |  FROM documents)
        |SELECT doc_id, word, count(*) AS cnt FROM tok
        |GROUP BY doc_id, word ORDER BY doc_id, word""".stripMargin,
    "wc_global" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split(translate(regexp_replace(text, '[[:punct:]]', '', 'g'), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), t -> t <> '')) AS word
        |  FROM documents)
        |SELECT word, count(*) AS cnt FROM tok GROUP BY word ORDER BY word""".stripMargin,
    "wc_top20" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split(translate(regexp_replace(text, '[[:punct:]]', '', 'g'), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' '), t -> t <> '')) AS word
        |  FROM documents)
        |SELECT word, count(*) AS cnt FROM tok GROUP BY word
        |ORDER BY cnt DESC, word LIMIT 20""".stripMargin,

    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-06-30'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_revenue" ->
      """SELECT o_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate  > TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_brand_revenue" ->
      """SELECT p_brand,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  round(sum(coalesce(o_totalprice, 0)), 2) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, rank_in_cust, o_orderkey, price FROM (
        |  SELECT o_custkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_cust,
        |    o_orderkey, round(o_totalprice, 2) AS price
        |  FROM orders) t
        |WHERE rank_in_cust <= 3 ORDER BY o_custkey, rank_in_cust""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_lag" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(l_extendedprice - lag(l_extendedprice, 1, 0.0)
        |    OVER (PARTITION BY l_suppkey
        |          ORDER BY l_shipdate, l_orderkey, l_linenumber), 2) AS price_delta
        |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
        |       coalesce(o_orderpriority, 'ALL') AS orderpriority,
        |       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY orderstatus, orderpriority""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
        |       coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nationkey,
        |       count(*) AS n, round(avg(c_acctbal), 2) AS avg_bal
        |FROM customer GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        |ORDER BY segment, nationkey""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_count_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_set_ops" ->
      """WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
        |     s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        |SELECT 'both' AS tag, nationkey
        |  FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s) t1
        |UNION ALL
        |SELECT 'customer_only' AS tag, nationkey
        |  FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s) t2
        |UNION ALL
        |SELECT 'supplier_only' AS tag, nationkey
        |  FROM (SELECT nationkey FROM s EXCEPT SELECT nationkey FROM c) t3
        |ORDER BY tag, nationkey""".stripMargin,
    "q_top_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin,

    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
        |       event_type, count(*) AS n_events,
        |       round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |numbered AS (
        |  SELECT user_id, value,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged),
        |per_sess AS (
        |  SELECT user_id, session_seq, count(*) AS n_events,
        |         round(sum(value), 2) AS session_value
        |  FROM numbered GROUP BY user_id, session_seq)
        |SELECT user_id, max(session_seq) AS n_sessions,
        |       round(avg(n_events), 2) AS avg_events_per_session,
        |       round(sum(session_value), 2) AS total_value
        |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_events_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       count(*) AS n
        |FROM events GROUP BY k ORDER BY k""".stripMargin,
    "q_events_daily_share" ->
      """WITH daily AS (
        |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |         event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT day, event_type, n,
        |       round(n / (sum(n) OVER (PARTITION BY day)), 4) AS share
        |FROM daily ORDER BY day, event_type""".stripMargin,
  )
}
