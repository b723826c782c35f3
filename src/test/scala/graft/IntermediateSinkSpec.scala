package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, regexp_extract}
import graft.operators.WordCount
import graft.sources.Tables
import java.io.File
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Compat-mode intermediate sinks (FIXTURES.md §B): the reference's
  * `temp_mapper/` and `temp_shuffler/` on-disk formats, recovered from
  * the sink binaries. These exist for byte-format compatibility only;
  * the tests parse the trees back with the reference's own parser rule
  * (`substr(1, indexOf(','))`) and check count conservation.
  */
class IntermediateSinkSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def toks = WordCount.tokens(
    Tables.textCorpus(spark, SparkTestSession.resource("/corpus/basic")),
    regexp_extract(col("file"), "[^/]+$", 0), col("line"))

  private def readTree(out: String): Seq[(String, String)] = {
    val root = new File(out)
    for {
      keyDir <- root.listFiles().toSeq if keyDir.getName.startsWith("key=")
      partDir <- keyDir.listFiles().toSeq if partDir.getName.startsWith("part=")
      f <- partDir.listFiles().toSeq if f.getName.startsWith("part-")
      line <- Files.readAllLines(f.toPath).asScala
    } yield (keyDir.getName.stripPrefix("key="), line)
  }

  test("map-output sink: (word,1) lines, counts conserve the token stream") {
    val out = Files.createTempDirectory("graft-mapout").toString
    WordCount.writeMapOutput(toks, out)
    val lines = readTree(out)
    assert(lines.forall { case (_, l) => l.startsWith("(") && l.endsWith(",1)") })
    // reference parser rule: word = substr(1, indexOf(','))
    val parsed = lines.map { case (k, l) => (k, l.substring(1, l.indexOf(','))) }
    val expected = toks.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(parsed.sorted == expected.sorted)
  }

  test("shuffle-output sink: (word,partial) lines sum to the final counts") {
    val out = Files.createTempDirectory("graft-shufout").toString
    WordCount.writeShufOutput(toks, out)
    val partials = readTree(out).map { case (k, l) =>
      val comma = l.lastIndexOf(',')
      ((k, l.substring(1, comma)), l.substring(comma + 1, l.length - 1).toLong)
    }
    val summed = partials.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val fin = WordCount.perKey(
        Tables.textCorpus(spark, SparkTestSession.resource("/corpus/basic")),
        regexp_extract(col("file"), "[^/]+$", 0), col("line"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(summed == fin)
  }
}
