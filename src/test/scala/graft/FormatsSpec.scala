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
}
