package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusMerge
import graft.streaming.DocsStream

/** Stream ≡ batch for SCD Type-2 maintenance: the three-version change
  * log replayed one version per micro-batch through
  * [[DocsStream.scd2Screen]] must reconstruct exactly the batch
  * history ([[CorpusMerge.scd2History]]) — closed emissions are final,
  * the latest open emission per key is the current row — and the
  * state store must stay at O(live keys). */
class Scd2StreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def writeOneFile(df: DataFrame, dest: Path): Unit = {
    val tmp = Files.createTempDirectory("graft-scd2-stage").toString + "/out"
    df.coalesce(1).write.parquet(tmp)
    val part = Files.list(Paths.get(tmp))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    Files.move(part, dest)
  }

  test("streamed log reconstructs the batch history; state stays O(keys)") {
    val dir = "/root/testdata/sf0.001"
    val in = Files.createTempDirectory("graft-scd2-in")
    val log = CorpusMerge.scd2Log(spark, dir)
    (1L to 3L).foreach { v =>
      writeOneFile(log.filter(col("version") === v),
        in.resolve(f"v$v%02d.parquet"))
    }
    val ckpt = Files.createTempDirectory("graft-scd2-ckpt").toString
    val schema = log.schema
    val q = DocsStream.scd2Screen(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(in.toString))
      .writeStream.format("memory").queryName("scd2_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000L)

    // state bound: one row per LIVE key, never more than distinct keys
    val liveKeys = CorpusMerge.scd2History(spark, dir)
      .filter(col("is_current")).count()
    val allKeys = log.select("doc_id").distinct().count()
    q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
      val st = p.stateOperators.map(_.numRowsTotal).sum
      assert(st <= allKeys, s"scd2 state exceeded key count: $st > $allKeys")
    }
    val lastState = q.recentProgress.filter(_.numInputRows > 0)
      .last.stateOperators.map(_.numRowsTotal).sum
    assert(lastState == liveKeys,
      s"final state should be the live-key count: $lastState vs $liveKeys")

    // reconstruction: closed emissions ∪ the latest open emission per
    // key (an open emission superseded by a later closure drops out)
    val emitted = spark.table("scd2_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getBoolean(3), r.getString(4)))
    val closed = emitted.filter(!_._4).toSet
    val closedFroms = closed.map(e => (e._1, e._2))
    val opens = emitted.filter(_._4)
      .filterNot(e => closedFroms.contains((e._1, e._2))).toSet
    val streamed = closed ++ opens
    val batch = CorpusMerge.scd2History(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getBoolean(3), r.getString(4))).toSet
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }
}
