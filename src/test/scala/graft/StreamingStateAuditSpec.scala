package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{DocsStream, EmbeddingsStream}

/** STATE-SIZE audit for the long-running streaming monitors: every
  * stateful twin is correctness-pinned elsewhere (stream ≡ batch), but
  * correctness says nothing about state GROWTH — a monitor whose state
  * keys on doc_id instead of source would pass every parity pin and
  * still OOM a month into production. These tests drive each monitor
  * through micro-batches of GROWING input and assert
  * `stateOperators.numRowsTotal` (from `StreamingQueryProgress`) stays
  * at the operator's documented bound — O(|sources|) for the quota and
  * heavy-hitter monitors, O(K) for the drift monitor — so an unbounded
  * state regression fails the suite, not the pager. */
class StreamingStateAuditSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def writeOneFile(df: DataFrame, dest: Path): Unit = {
    val tmp = Files.createTempDirectory("graft-audit-stage").toString + "/out"
    df.coalesce(1).write.parquet(tmp)
    val part = Files.list(Paths.get(tmp))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    Files.move(part, dest)
  }

  /** Run `mk(stream)` over the staged files one-per-trigger into a
    * memory sink; return (numInputRows, Σ state numRowsTotal) per
    * micro-batch that consumed input. */
  private def progressOf(inputDir: Path, schema: org.apache.spark.sql.types.StructType,
      name: String, mode: String)(mk: DataFrame => DataFrame): Seq[(Long, Long)] = {
    val ckpt = Files.createTempDirectory(s"graft-audit-ckpt-$name").toString
    val q = mk(spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inputDir.toString))
      .writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000L)
    q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map(p => (p.numInputRows,
        p.stateOperators.map(_.numRowsTotal).sum))
  }

  test("quota monitor state stays O(|sources|) while input grows") {
    val in = Files.createTempDirectory("graft-audit-cap-in")
    val sources = Seq("s0", "s1", "s2")
    (1 to 4).foreach { b =>
      val docs = (1 to b * 50).map { i =>
        val id = b * 10000L + i
        (id, s"text $id", "en", sources((i % 3)), 6L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      writeOneFile(docs, in.resolve(f"b$b%02d.parquet"))
    }
    val prog = progressOf(in, DocsStream.docSchema, "audit_cap", "append")(
      df => DocsStream.sourceCapAdmission(df, cap = 1000000L))
    assert(prog.size >= 4, s"expected one batch per file: $prog")
    // input grew 4x across batches; state must stay at |sources| = 3
    assert(prog.last._1 > prog.head._1 * 3)
    prog.foreach { case (_, stateRows) =>
      assert(stateRows <= sources.size.toLong,
        s"quota state exceeded |sources|: $prog")
    }
  }

  test("heavy-hitter monitor state stays O(|sources|) while the vocabulary grows") {
    val in = Files.createTempDirectory("graft-audit-hh-in")
    (1 to 4).foreach { b =>
      // every batch introduces a FRESH vocabulary (b-prefixed bigrams):
      // per-key MG summaries are capped at m inside the VALUE, so the
      // state-store row count must stay at the number of source keys
      val docs = (1 to 40 * b).map { i =>
        val id = b * 10000L + i
        (id, (1 to 12).map(t => s"w${b}_${i}_$t").mkString(" "),
          "en", s"s${i % 2}", 6L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      writeOneFile(docs, in.resolve(f"b$b%02d.parquet"))
    }
    val prog = progressOf(in, DocsStream.docSchema, "audit_hh", "update")(
      df => DocsStream.heavyHitterMonitor(df))
    assert(prog.size >= 4, s"expected one batch per file: $prog")
    prog.foreach { case (_, stateRows) =>
      assert(stateRows <= 2L, s"heavy-hitter state exceeded |sources|: $prog")
    }
  }

  test("drift monitor state stays O(K) while arrivals grow") {
    val in = Files.createTempDirectory("graft-audit-drift-in")
    val cents: Seq[(Long, Seq[Double])] = (0 until 4).map(c =>
      c.toLong -> Seq.tabulate(8)(d => if (d == c) 1.0 else 0.0))
    (1 to 4).foreach { b =>
      val vecs = (1 to 100 * b).map { i =>
        val c = i % 4
        (b * 10000L + i,
          Seq.tabulate(8)(d => if (d == c) 1.0f else 0.001f * (i % 7)))
      }.toDF("vec_id", "embedding")
      writeOneFile(vecs, in.resolve(f"b$b%02d.parquet"))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    val prog = progressOf(in, schema, "audit_drift", "complete")(
      df => EmbeddingsStream.clusterArrivals(df, cents))
    assert(prog.size >= 4, s"expected one batch per file: $prog")
    prog.foreach { case (_, stateRows) =>
      assert(stateRows <= cents.size.toLong,
        s"drift-monitor state exceeded K: $prog")
    }
  }
}
