package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TextFunctions
import graft.functions.expr.LowerRemovePunc

/** The fused kernel must be byte-identical to the built-in composition
  * `translate(regexp_replace(c, "[\p{Punct}]", ""))` on ANY string —
  * that equivalence is what lets every DuckDB oracle keep matching after
  * the hot path switched to the native expression.
  */
class LowerRemovePuncKernelProps extends Properties("LowerRemovePunc") {

  private def reference(s: String): String =
    s.replaceAll("[\\p{Punct}]", "").map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)

  private val anyString = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.asciiPrintableChar, Gen.oneOf('É', 'ß', '中', '\t', '\n')))
      .map(_.mkString))

  property("kernel == regex+tolower on arbitrary strings") = forAll(anyString) { s =>
    LowerRemovePunc.kernel(UTF8String.fromString(s)).toString == reference(s)
  }
}

class LowerRemovePuncSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("fused normalize column == built-in composition on the corpus") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
        TextFunctions.normalize(col("text")).as("fused"),
        TextFunctions.normalizeBuiltin(col("text")).as("builtin"))
      .filter($"fused" =!= $"builtin")
    assert(diff.count() == 0)
  }

  test("graft_normalize is SQL-callable via SparkSessionExtensions") {
    val row = spark.sql("SELECT graft_normalize('Don''t STOP.\tok É') AS v")
      .as[String].head()
    assert(row == "dont stop\tok É")
  }

  test("CollapseNormalize rule rewrites nested normalize to one call") {
    // non-literal source: over a literal, ConstantFolding would erase the
    // expression entirely before the count
    val df = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(TextFunctions.normalize(TextFunctions.normalize(col("text"))).as("v"))
    val n = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case e: LowerRemovePunc => e }).size
    assert(n == 1)
    // and the collapsed plan still computes the right value
    assert(df.limit(1).as[String].head() ==
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(TextFunctions.normalize(col("text")).as("v"))
        .limit(1).as[String].head())
  }

  test("expression participates in codegen (no CodegenFallback)") {
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[LowerRemovePunc]))
  }
}
