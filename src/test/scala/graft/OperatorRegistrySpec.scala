package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.plugins.OperatorRegistry
import graft.sources.Tables

/** The dlopen-analog contract: resolve stages by name, compose a
  * pipeline, swap an operator implementation at runtime, fail on a
  * missing symbol.
  */
class OperatorRegistrySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def corpus(name: String) =
    Tables.textCorpus(spark, SparkTestSession.resource(name))
      .select(regexp_extract(col("file"), "[^/]+$", 0).as("file"), col("line"))

  test("registry pipeline reproduces the reference word-count phases") {
    val out = OperatorRegistry.pipeline(
        Seq("input", "mapper", "counter", "ordered_sink"))(corpus("/corpus/basic"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("a.txt", "the")) == 3L)
    assert(out(("b.txt", "dog")) == 2L)
  }

  test("swapping an operator changes the pipeline (the .so-swap analog)") {
    // tab-containing token: reference mapper keeps it whole, the swapped
    // whitespace mapper splits it
    val edges = corpus("/corpus/tokenizer-edges")
    val before = OperatorRegistry.pipeline(Seq("mapper", "counter"))(edges)
      .collect().map(_.getString(1)).toSet
    assert(before.contains("tab\there"))
    OperatorRegistry.register("mapper", df => df.select(col("file"),
      explode(TextFunctions.whitespaceTokens(lower(col("line")))).as("word")))
    try {
      val after = OperatorRegistry.pipeline(Seq("mapper", "counter"))(edges)
        .collect().map(_.getString(1)).toSet
      assert(!after.contains("tab\there"))
      assert(after.contains("tab") && after.contains("here"))
    } finally {
      // restore the built-in for other suites
      OperatorRegistry.register("mapper", df => df.select(col("file"),
        explode(TextFunctions.tokenize(col("line"))).as("word")))
    }
  }

  test("unknown stage fails like a missing dlsym symbol") {
    intercept[NoSuchElementException] {
      OperatorRegistry.resolve("nonexistent_stage")
    }
  }
}
