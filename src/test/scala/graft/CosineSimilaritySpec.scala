package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.functions.VectorFunctions
import scala.util.Random

/** The native cosine kernel must be BIT-identical to the built-in
  * HOF-fold composition on arbitrary float vectors — that equivalence is
  * what keeps the embedding oracles green after the swap. Seeded batch
  * of 200 random pairs (mixed dims, signs, magnitudes, zero vectors)
  * evaluated in one DataFrame pass.
  */
class CosineSimilaritySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("native kernel == builtin composition, bit-for-bit, 200 seeded pairs") {
    val rnd = new Random(42)
    val pairs = (1 to 200).map { _ =>
      val n = 1 + rnd.nextInt(64)
      def v = Seq.fill(n)((rnd.nextFloat() - 0.5f) * 200f)
      (v, v)
    } ++ Seq((Seq(1f, 2f, 3f), Seq(-3f, 2f, -1f)))
    val rows = pairs.toDF("a", "b")
      .select(
        VectorFunctions.cosine(col("a"), col("b")),
        VectorFunctions.cosineBuiltin(col("a"), col("b")))
      .as[(Double, Double)].collect()
    rows.foreach { case (native, builtin) =>
      assert(java.lang.Double.doubleToLongBits(native) ==
        java.lang.Double.doubleToLongBits(builtin))
    }
    assert(rows.length == pairs.length)
  }

  test("double and mixed float/double arrays: kernel == builtin, bit-for-bit") {
    val rnd = new Random(7)
    val pairs = (1 to 100).map { _ =>
      val n = 1 + rnd.nextInt(64)
      (Seq.fill(n)((rnd.nextFloat() - 0.5f) * 200f),
        Seq.fill(n)((rnd.nextDouble() - 0.5) * 200.0))
    }
    // float × double (the kmeans-routed shape) and double × double
    val mixed = pairs.toDF("a", "b")
      .select(
        VectorFunctions.cosine(col("a"), col("b")),
        VectorFunctions.cosineBuiltin(col("a"), col("b")))
      .as[(Double, Double)].collect()
    val dd = pairs.map { case (a, b) => (a.map(_.toDouble), b) }.toDF("a", "b")
      .select(
        VectorFunctions.cosine(col("a"), col("b")),
        VectorFunctions.cosineBuiltin(col("a"), col("b")))
      .as[(Double, Double)].collect()
    (mixed ++ dd).foreach { case (native, builtin) =>
      assert(java.lang.Double.doubleToLongBits(native) ==
        java.lang.Double.doubleToLongBits(builtin))
    }
  }

  test("zero vector: native kernel yields IEEE NaN (ANSI builtin would throw)") {
    val native = Seq((Seq(0f, 0f), Seq(1f, 2f))).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")))
      .as[Double].head()
    assert(native.isNaN)
  }

  test("graft_cosine is SQL-callable via SparkSessionExtensions") {
    val v = spark.sql(
      "SELECT graft_cosine(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c")
      .as[Double].head()
    assert(math.abs(v - 1.0) < 1e-12)
  }
}
