package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, regexp_extract}
import graft.operators.WordCount
import graft.sources.Tables
import java.io.File
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Golden byte-compare for the `FileProcessorRedOutput` analog
  * (FIXTURES.md §B): `(word,count)` lines, one directory per input file,
  * words in byte-lexicographic order (the reference's `std::map`
  * iteration order).
  */
class PerFileSinkSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def keyDirLines(out: String, key: String): Seq[String] = {
    val dir = new File(out, s"key=$key")
    val parts = dir.listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length == 1,
      s"expected exactly one part file per key dir, got ${parts.length}")
    Files.readAllLines(parts.head.toPath).asScala.toSeq
  }

  test("writePerFile: reference (word,count) format, byte-ordered, per file") {
    val counts = WordCount.perKey(
      Tables.textCorpus(spark, SparkTestSession.resource("/corpus/basic")),
      regexp_extract(col("file"), "[^/]+$", 0), col("line"))
    val out = Files.createTempDirectory("graft-sink").toString
    WordCount.writePerFile(counts, out)

    val a = keyDirLines(out, "a.txt")
    assert(a == Seq("(brown,1)", "(dog,1)", "(fox,2)", "(jumps,1)",
      "(lazy,1)", "(over,1)", "(quick,1)", "(sleeps,1)", "(the,3)"))
    assert(a == a.sorted) // byte-lexicographic, like std::map iteration

    val b = keyDirLines(out, "b.txt")
    assert(b == Seq("(a,2)", "(and,1)", "(barks,1)", "(dog,2)",
      "(fox,1)", "(the,1)"))
  }
}
