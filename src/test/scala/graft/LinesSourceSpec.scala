package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Contract tests for the graft-lines DSv2 connector: the reference's
  * ⌈lines/N⌉ per-file partitioning, partition numbering, content
  * fidelity against the built-in text source, and column pruning
  * reaching the reader.
  */
class LinesSourceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val corpus = SparkEntry.PerFileCorpus

  private def linesPerFile: Map[String, Long] =
    spark.read.textFile(corpus).toDF("line")
      .withColumn("file", regexp_extract(input_file_name(), "[^/]+$", 0))
      .groupBy("file").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("per-file partitioning is ceil(lines/N) with 0-based part numbers") {
    val n = 3
    val df = spark.read.format("graft-lines")
      .option("linesPerPartition", n).load(corpus)
    val parts = df.groupBy(col("file"), col("part"))
      .agg(count(lit(1)).as("rows")).collect()
      .map(r => (r.getString(0).split("/").last, r.getInt(1)) -> r.getLong(2))
      .toMap
    val expected = linesPerFile
    // every file splits into ceil(lines/n) partitions numbered 0..k-1
    expected.foreach { case (file, lines) =>
      val k = math.ceil(lines.toDouble / n).toInt
      val mine = parts.keys.filter(_._1 == file).map(_._2).toSeq.sorted
      assert(mine == (0 until k), s"$file: $mine")
      // all partitions full except possibly the last
      (0 until k).foreach { p =>
        val rows = parts((file, p))
        if (p < k - 1) assert(rows == n) else assert(rows == lines - n.toLong * (k - 1))
      }
    }
    // the scan parallelism IS the partition count (one task per range)
    assert(df.rdd.getNumPartitions ==
      expected.values.map(l => math.ceil(l.toDouble / n).toInt).sum)
  }

  test("line content matches the built-in text source exactly") {
    val v2 = spark.read.format("graft-lines").load(corpus)
      .select(regexp_extract(col("file"), "[^/]+$", 0).as("file"), col("line"))
    val builtin = spark.read.textFile(corpus).toDF("line")
      .select(regexp_extract(input_file_name(), "[^/]+$", 0).as("file"), col("line"))
    assert(v2.exceptAll(builtin).count() == 0)
    assert(builtin.exceptAll(v2).count() == 0)
    assert(v2.count() > 0)
  }

  test("column pruning reaches the reader") {
    val df = spark.read.format("graft-lines").load(corpus).select("line")
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema()
    }
    assert(scans.nonEmpty)
    assert(scans.head.fieldNames.toSeq == Seq("line"))
  }

  test("seeked partitions carry exactly their line range") {
    // each reader SEEKS to a byte offset recorded at planning; a wrong
    // offset would shift/corrupt lines at a partition boundary, which
    // per-partition counts alone cannot catch — so pin each partition's
    // CONTENT against the file's true n-line chunks
    import scala.jdk.CollectionConverters._
    val n = 3
    val f = new java.io.File(corpus).listFiles().filter(_.isFile)
      .sortBy(_.getName).head
    val expected = java.nio.file.Files.readAllLines(f.toPath).asScala.toSeq
    val rows = spark.read.format("graft-lines")
      .option("linesPerPartition", n).load(corpus)
      .filter(col("file") === f.getAbsolutePath)
      .select("part", "line").collect()
    val byPart = rows.groupBy(_.getInt(0))
      .view.mapValues(_.map(_.getString(1)).toSeq.sorted).toMap
    val chunks = expected.grouped(n).toSeq
    assert(byPart.keySet == chunks.indices.toSet)
    chunks.zipWithIndex.foreach { case (chunk, p) =>
      assert(byPart(p) == chunk.sorted, s"partition $p of ${f.getName}")
    }
  }
}
