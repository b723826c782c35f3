package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plugins.PhaseListener

class PhaseListenerSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("listener observes the phases of a shuffling job") {
    val l = new PhaseListener
    spark.sparkContext.addSparkListener(l)
    try {
      import spark.implicits._
      // two stages: partial agg -> exchange -> final agg
      Seq(("a", 1), ("b", 2), ("a", 3)).toDF("k", "v")
        .repartition(4).groupBy("k").count().collect()
      Thread.sleep(2000) // listener bus is async; private waitUntilEmpty is not accessible
      val log = l.log
      assert(log.exists(_.startsWith("job")), log.mkString("; "))
      assert(log.exists(_.contains("stage")), log.mkString("; "))
      assert(log.exists(_.contains("ended: JobSucceeded")), log.mkString("; "))
    } finally {
      spark.sparkContext.removeSparkListener(l)
    }
  }
}
