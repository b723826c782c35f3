package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.functions.VectorFunctions

class VectorFunctionsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def eval(a: Seq[Float], b: Seq[Float]): (Double, Double) =
    Seq((a, b)).toDF("a", "b")
      .select(
        VectorFunctions.dot(col("a"), col("b")),
        VectorFunctions.cosine(col("a"), col("b")))
      .as[(Double, Double)].head()

  test("dot product of known vectors") {
    assert(eval(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))._1 == 32.0)
  }

  test("cosine of a vector with itself is 1.0") {
    assert(math.abs(eval(Seq(3f, 4f), Seq(3f, 4f))._2 - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0.0") {
    assert(eval(Seq(1f, 0f), Seq(0f, 1f))._2 == 0.0)
  }

  test("signBucket sets bit d iff v[d] >= 0") {
    val v = Seq(1f, -1f, 0f, -2f, 5f, -5f, 1f, -1f) // bits 0,2,4,6 -> 0x55
    val bucket = Seq(Tuple1(v)).toDF("v")
      .select(VectorFunctions.signBucket(col("v"), 8))
      .as[Long].head()
    assert(bucket == 0x55L)
  }
}
