package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Constructed-input known answers for the five "-shaped" TPC-H queries
  * added in round 8 (q2/q9/q12/q16/q20 adaptations — the data ships no
  * partsupp/shipmode/commit-date columns, SURVEY §2.3). A hand-built
  * micro star schema exercises the edges the sf oracle cannot isolate:
  *  - q2: argmin ties keep BOTH suppliers; a cheaper non-EUROPE offer
  *    must NOT shadow the in-region minimum;
  *  - q20: the dominant-share test is strict (exactly 1/5 excluded);
  *  - q16: the negative-balance exclusion drops a supplier from the
  *    distinct count;
  *  - q12: the two conditional counters partition the joined window.
  */
class MiniTpchSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  /** One micro corpus written once for the suite. Two regions; supplier
    * 1/2/3 in EUROPE (nation 0), supplier 9 in ASIA (nation 1). Part 100
    * is the q2 slice target (size 7 STANDARD); part 200 fails the slice.
    * Unit costs on part 100: s1 = 10.0, s2 = 10.0 (tie), s9 = 5.0
    * (cheaper but out of region); s3 offers only part 200. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("mini_tpch").toFile
    d.deleteOnExit()
    val base = d.getAbsolutePath
    def w(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$base/$name.parquet")
    w(Seq((0, "EUROPE"), (1, "ASIA")).toDF("r_regionkey", "r_name"), "region")
    w(Seq((0, "NATION_A", 0), (1, "NATION_B", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey"), "nation")
    w(Seq(
        (1L, "Supp#1", 0, 100.0),
        (2L, "Supp#2", 0, 200.0),
        (3L, "Supp#3", 0, -50.0), // negative balance: q16 exclusion
        (9L, "Supp#9", 1, 300.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"), "supplier")
    w(Seq(
        (100L, "red widget", "Brand#1", "STANDARD", 7, 50.0),
        (200L, "red gear", "Brand#2", "LARGE", 9, 40.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice"), "part")
    w(Seq(
        (1000L, 10L, "F", 100.0, ts("1997-02-01"), "1-URGENT"),
        (1001L, 10L, "F", 100.0, ts("1997-06-01"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"), "orders")
    // lineitem: (orderkey, partkey, suppkey, linenumber, qty, extprice,
    // discount, tax, returnflag, linestatus, shipdate)
    w(Seq(
        // q2 offers on part 100: s1 tie @10, s2 tie @10, s9 cheaper @5
        (1000L, 100L, 1L, 1, 2.0, 20.0, 0.0, 0.0, "N", "O", ts("1997-03-01")),
        (1000L, 100L, 2L, 2, 4.0, 40.0, 0.0, 0.0, "N", "O", ts("1997-03-02")),
        (1000L, 100L, 9L, 3, 2.0, 10.0, 0.0, 0.0, "N", "O", ts("1997-03-03")),
        // part 200 rows: q16 counts s1 + s9, excludes s3; q20 volume
        // split 21/4/5 over s1/s3/s9 (30 total: s1 dominant, s9 exactly
        // 1/5 -> excluded by the strict test)
        (1001L, 200L, 1L, 1, 21.0, 210.0, 0.0, 0.0, "N", "O", ts("1997-07-01")),
        (1001L, 200L, 3L, 2, 4.0, 40.0, 0.0, 0.0, "N", "O", ts("1997-07-02")),
        (1001L, 200L, 9L, 3, 5.0, 50.0, 0.0, 0.0, "N", "O", ts("1997-07-03")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"), "lineitem")
    base
  }

  test("q2-shaped: in-region argmin, ties kept, out-of-region never shadows") {
    val rows = Relational.minCostSupplier(spark, dir).collect()
    // part 100 is the only slice part; EUROPE min is the s1/s2 tie at 10.0
    // — s9's cheaper 5.0 offer is out of region and must not erase them
    assert(rows.map(_.getAs[String]("s_name")).toSet == Set("Supp#1", "Supp#2"))
    assert(rows.forall(_.getAs[Double]("unit_cost") == 10.0))
    assert(rows.forall(_.getAs[Long]("p_partkey") == 100L))
    // ordered by s_acctbal desc: Supp#2 (200) before Supp#1 (100)
    assert(rows.map(_.getAs[String]("s_name")).toSeq ==
      Seq("Supp#2", "Supp#1"))
  }

  test("q12-shaped: conditional counters partition the joined window") {
    val rows = Relational.priorityShippingMix(spark, dir).collect()
      .map(r => r.getAs[Int]("ship_year") ->
        (r.getAs[Long]("high_line_count"), r.getAs[Long]("low_line_count")))
      .toMap
    // 1997: order 1000 (URGENT) ships 3 lines, order 1001 (LOW) 3 lines
    assert(rows(1997) == (3L, 3L))
    assert(rows.values.map { case (h, l) => h + l }.sum == 6L)
  }

  test("q16-shaped: negative-balance supplier excluded from distinct count") {
    val rows = Relational.supplierCountByPart(spark, dir).collect()
    // part 200 (Brand#2 LARGE size 9) shipped by s1, s3, s9 — s3 has
    // negative balance, so the count is 2; part 100's size 7 is not in
    // the q16 size slice
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("p_brand") == "Brand#2" &&
      r.getAs[Int]("p_size") == 9 &&
      r.getAs[Long]("supplier_cnt") == 2L)
  }

  test("q20-shaped: strict dominant-share keeps >1/5 and drops exactly 1/5") {
    val rows = Relational.dominantShareSuppliers(spark, dir).collect()
    // red parts: 100 and 200. Part-200 1997 volume 30 = s1:21, s3:4,
    // s9:5. s9 is ASIA but holds exactly 1/5 -> strict test drops it;
    // part-100 gives s9 2/8 = 1/4 > 1/5 -> s9 qualifies via part 100.
    // s1/s3 dominate but sit in EUROPE, outside the q20 region slice.
    assert(rows.map(_.getAs[String]("s_name")).toSet == Set("Supp#9"))
    assert(rows.head.getAs[String]("n_name") == "NATION_B")
  }

  test("q9-shaped: profit proxy aggregates per nation-year in DECIMAL") {
    val rows = Relational.productTypeProfit(spark, dir).collect()
      .map(r => (r.getAs[String]("nation"), r.getAs[Int]("o_year")) ->
        r.getAs[Double]("profit")).toMap
    // '%gear%' slices to part 200 (retail 40): per-line profit =
    // extprice·(1−disc) − 40·qty/10 → s1: 210−84=126, s3: 40−16=24
    // (both NATION_A), s9: 50−20=30 (NATION_B); order year 1997
    assert(rows == Map(("NATION_A", 1997) -> 150.0, ("NATION_B", 1997) -> 30.0))
  }
}
