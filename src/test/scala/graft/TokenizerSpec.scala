package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.functions.TextFunctions

/** Pins the reference tokenizer kernel semantics recovered from
  * `MapperImpl.so → lowerRemovePunc @0x1f558` / `tokenize @0x1f8da`
  * (SURVEY.md §4.3.2) — the edge cases that differentiate the reference
  * from plausible alternatives (`\s+` splitting, punct→space
  * replacement, Unicode lowercasing).
  */
class TokenizerSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def toks(s: String): Seq[String] =
    Seq(s).toDF("text")
      .select(TextFunctions.tokenize(col("text")))
      .as[Seq[String]].head()

  test("apostrophe is deleted, not replaced: Don't -> dont") {
    assert(toks("Don't stop.") == Seq("dont", "stop"))
  }

  test("inner punctuation deletion joins fragments: end.Start -> endstart") {
    assert(toks("end.Start") == Seq("endstart"))
  }

  test("split on single space only; empty tokens dropped") {
    assert(toks("A  double  space") == Seq("a", "double", "space"))
  }

  test("tab is NOT a delimiter and survives inside a token") {
    assert(toks("Tab\there") == Seq("tab\there"))
  }

  test("ASCII lowercasing") {
    assert(toks("MiXeD CaSe") == Seq("mixed", "case"))
  }

  test("digits kept; underscore is in the punctuation class") {
    assert(toks("42 is number_7") == Seq("42", "is", "number7"))
  }

  test("non-ASCII letters pass through unlowered (C-locale tolower)") {
    assert(toks("Élan Go") == Seq("Élan", "go"))
  }

  test("empty line produces no tokens") {
    assert(toks("") == Seq.empty)
  }

  test("line of only punctuation produces no tokens") {
    assert(toks("!!! ... ??") == Seq.empty)
  }

  test("whitespaceTokens splits on runs of any whitespace") {
    val t = Seq("a\tb  c").toDF("text")
      .select(TextFunctions.whitespaceTokens(col("text")))
      .as[Seq[String]].head()
    assert(t == Seq("a", "b", "c"))
  }
}
