package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.expr.NgramMd5

/** The fused gram-digest kernel must be digest-identical to the built-in
  * composition `md5(wordNgrams(toks, n))` (element-wise, binary ≡
  * unhex(hex)) — that equivalence is what keeps every span/boilerplate
  * oracle matching after the gram build switched to the native
  * expression (the r14 q_text_boilerplate fix).
  */
class NgramMd5KernelProps extends Properties("NgramMd5") {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  private def reference(toks: Seq[String], n: Int): Seq[String] =
    if (toks.length < n) Seq.empty
    else toks.sliding(n).map { w =>
      hex(java.security.MessageDigest.getInstance("MD5")
        .digest(w.mkString(" ").getBytes("UTF-8")))
    }.toSeq

  private val token = Gen.nonEmptyListOf(
    Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('é', '中', '-'))).map(_.mkString)
  private val tokensAndN = for {
    toks <- Gen.listOf(token)
    n <- Gen.choose(1, 9)
  } yield (toks, n)

  property("kernel digests == md5(join(slide(n))) on arbitrary token arrays") =
    forAll(tokensAndN) { case (toks, n) =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
      val out = NgramMd5.kernel(arr, n)
      val got = (0 until out.numElements()).map(i => hex(out.getBinary(i)))
      got == reference(toks, n)
    }
}

class NgramMd5Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("fused gram digests == unhex(md5(wordNgrams)) on the corpus") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(TextFunctions.tokenize(col("text")).as("toks"))
    val n = graft.operators.TextAnalysis.SpanN
    val diff = docs.select(
        TextFunctions.wordNgramMd5(col("toks"), n).as("fused"),
        transform(TextFunctions.wordNgrams(col("toks"), n),
          g => unhex(md5(g))).as("builtin"))
      .filter(not($"fused" <=> $"builtin"))
    assert(diff.count() == 0)
  }

  test("short docs yield an empty gram array, matching wordNgrams") {
    val df = Seq(Seq("a", "b"), Seq.empty[String]).toDF("toks")
      .select(TextFunctions.wordNgramMd5(col("toks"), 3).as("g"))
    assert(df.collect().forall(_.getSeq[Array[Byte]](0).isEmpty))
  }

  test("expression participates in codegen (no CodegenFallback)") {
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[NgramMd5]))
  }
}
