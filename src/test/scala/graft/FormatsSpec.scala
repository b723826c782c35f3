package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{Formats, Tables}
import java.nio.file.Files

/** Connector round-trips and partition pruning. */
class FormatsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("every supported format round-trips the customer table") {
    // CSV/JSON have no native timestamp/decimal fidelity guarantees;
    // customer is all long/string/double -> exact in all four
    val src = Tables.customer(spark, dir)
    val expected = src.collect().map(_.toSeq).toSet
    for (fmt <- Formats.Supported) {
      val path = Files.createTempDirectory(s"graft-fmt-$fmt").toString + "/t"
      Formats.write(src, fmt, path)
      val back = Formats.read(spark, fmt, path, src.schema)
      assert(back.collect().map(_.toSeq).toSet == expected, s"format=$fmt")
    }
  }

  test("partitioned layout prunes partitions at planning time") {
    val path = Files.createTempDirectory("graft-part-prune").toString + "/orders"
    Formats.writePartitioned(
      Tables.orders(spark, dir), "parquet", path, "o_orderstatus")
    val pruned = spark.read.parquet(path).filter(col("o_orderstatus") === "O")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"expected a partition filter in:\n$plan")
    val expected = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O").count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("JDBC connector round-trips via embedded Derby with pushdown + parallel read") {
    val dbHome = Files.createTempDirectory("graft-derby").toString
    System.setProperty("derby.system.home", dbHome)  // keep derby.log out of the repo
    val url = s"jdbc:derby:$dbHome/graftdb;create=true"
    val src = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    Formats.jdbcWrite(src, url, "customer_jdbc")

    // plain read-back is exact
    val back = Formats.jdbcRead(spark, url, "customer_jdbc")
    assert(back.collect().map(_.toSeq).toSet == src.collect().map(_.toSeq).toSet)

    // a numeric predicate reaches the remote SQL, not the Spark filter
    val filtered = Formats.jdbcRead(spark, url, "customer_jdbc")
      .filter(col("c_custkey") < 50)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("c_custkey"),
      s"expected a pushed JDBC filter in:\n$plan")
    assert(filtered.count() == src.filter(col("c_custkey") < 50).count())

    // range partitioning fans the read out over n strides
    val n = src.count()
    val parallel = Formats.jdbcRead(spark, url, "customer_jdbc",
      Some(("c_custkey", 0L, n, 4)))
    assert(parallel.rdd.getNumPartitions == 4)
    assert(parallel.count() == n)
  }

  test("writeFinalOutputCompat reproduces the reference final_output tree") {
    import scala.jdk.CollectionConverters._
    val counts = graft.operators.WordCount.perKey(
      Tables.textCorpus(spark, SparkTestSession.resource("/corpus/basic")),
      regexp_extract(col("file"), "[^/]+$", 0), col("line"))
    val out = Files.createTempDirectory("graft-final-compat").toString
    graft.operators.WordCount.writeFinalOutputCompat(counts, out)
    val aLines = Files.readAllLines(
      java.nio.file.Paths.get(out, "final_output", "a.txt")).asScala.toSeq
    assert(aLines == Seq("(brown,1)", "(dog,1)", "(fox,2)", "(jumps,1)",
      "(lazy,1)", "(over,1)", "(quick,1)", "(sleeps,1)", "(the,3)"))
    val files = new java.io.File(out, "final_output").listFiles().map(_.getName).toSet
    assert(files == Set("a.txt", "b.txt"))
  }

  test("schema evolution: mergeSchema unions columns across parquet batches") {
    // the lake ingestion reality: batch 2 adds a column batch 1 lacks;
    // a mergeSchema read must union the schemas and null-fill the gap
    import spark.implicits._
    val path = Files.createTempDirectory("graft-evolve").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v1")
      .write.parquet(s"$path/batch=1")
    Seq((3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "v1", "v2")
      .write.parquet(s"$path/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.sorted.toSeq == Seq("batch", "id", "v1", "v2"))
    val rows = merged.select("id", "v2").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(rows(1L).isEmpty && rows(3L).contains(30.0))
    // and the evolved column still supports pushdown on the new batch
    val filtered = spark.read.option("mergeSchema", "true").parquet(path)
      .filter(col("v2") > 35.0)
    assert(filtered.collect().map(_.getAs[Long]("id")).toSeq == Seq(4L))
  }
}
