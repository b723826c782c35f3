package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.expr.NfcNormalize
import graft.operators.TextAnalysis

/** Pins the native NFC kernel: canonical composition, idempotence, the
  * allocation-free fast path, the SQL registry binding, and the census
  * plant arithmetic.
  */
class NfcNormalizeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def k(s: String): String =
    NfcNormalize.kernel(UTF8String.fromString(s)).toString

  test("decomposed e + U+0301 composes to é") {
    assert(k("cafe\u0301") == "caf\u00e9")
    assert(k("cafe\u0301").length == 4)
  }

  test("idempotent and identity on composed/ASCII text") {
    assert(k("caf\u00e9") == "caf\u00e9")
    assert(k(k("Ångström")) == k("Ångström"))
    val ascii = UTF8String.fromString("plain ascii text")
    // fast path: already-normalized input returns the SAME instance
    assert(NfcNormalize.kernel(ascii) eq ascii)
  }

  test("graft_nfc is callable from SQL via the extension registry") {
    val got = spark.sql("SELECT graft_nfc('cafe\u0301') AS n")
      .collect()(0).getString(0)
    assert(got == "caf\u00e9")
  }

  test("census: changed == planted count per lang, one char removed each") {
    val dir = "/root/testdata/sf0.001"
    val rows = TextAnalysis.unicodeNormCensus(spark, dir).collect()
    val planted = graft.sources.Tables.documents(spark, dir)
      .filter(org.apache.spark.sql.functions.col("doc_id")
        % TextAnalysis.NfcPlantMod === 0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val lang = r.getString(0)
      assert(r.getLong(2) == planted.getOrElse(lang, 0L))
      assert(r.getLong(3) == r.getLong(2)) // exactly one char composed away
    }
  }
}
