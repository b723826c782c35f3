package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** The LSH recall audit's fixed points: an identical pair is decile-9
  * truth and MUST be caught (identical shingle sets give identical
  * signatures, so every band matches); recall is a valid proportion in
  * every decile; deciles start at 5 (the J >= 0.5 truth floor).
  */
class LshRecallSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("identical docs are decile-9 truth with recall 1.0") {
    val same = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (0L, same),
      (1L, same),
      (2L, "totally different words in this unrelated document text"))
      .toDF("doc_id", "text")
    val rows = Dedup.lshRecallAuditOf(docs).collect()
    assert(rows.nonEmpty)
    val nine = rows.find(_.getLong(0) == 9L).get
    assert(nine.getLong(1) >= 1L)                 // n_true
    assert(nine.getLong(2) == nine.getLong(1))    // all caught
    assert(nine.getDouble(3) == 1.0)
    rows.foreach { r =>
      assert(r.getLong(0) >= 5L && r.getLong(0) <= 9L)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(2) <= r.getLong(1))
    }
  }
}
