package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{GraftLogOffset, LogSource}

/** The `graft-log` unbounded source: Kafka-shaped semantics (durable
  * per-partition offsets, admission control, earliest/latest starts)
  * over append-only log files, verified end-to-end through real
  * StreamingQuery runs — tail pickup, partial-line hold-back,
  * exactly-once restart from the checkpoint WAL, and backlog pacing. */
class LogSourceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def tempLogDir(): Path = Files.createTempDirectory("graft-log")

  private def append(dir: Path, name: String, text: String): Unit =
    Files.write(dir.resolve(name), text.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  test("batch read: complete lines with byte offsets; partial tail excluded") {
    val dir = tempLogDir()
    append(dir, "a.log", "x\nyy\nzzz") // "zzz" has no newline yet
    append(dir, "b.log", "héllo\n")    // multibyte survives byte-exact
    val rows = spark.read.format("graft-log").load(dir.toString)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set(("a.log", 0L, "x"), ("a.log", 2L, "yy"),
      ("b.log", 0L, "héllo")))
  }

  test("column pruning: value-only projection still reads correctly") {
    val dir = tempLogDir()
    append(dir, "a.log", "one\ntwo\n")
    val vals = spark.read.format("graft-log").load(dir.toString)
      .select("value").collect().map(_.getString(0)).toSet
    assert(vals == Set("one", "two"))
  }

  test("tail: appended records arrive; a half-written record is held " +
      "back until its newline lands") {
    val dir = tempLogDir()
    append(dir, "ev.log", "r1\nr2\n")
    val q = spark.readStream.format("graft-log").load(dir.toString)
      .writeStream.format("memory").queryName("log_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def vals() = spark.table("log_tail").collect()
        .map(_.getAs[String]("value")).toSet
      assert(vals() == Set("r1", "r2"))
      // producer writes r3 complete and r4 half-way
      append(dir, "ev.log", "r3\nr4-par")
      q.processAllAvailable()
      assert(vals() == Set("r1", "r2", "r3")) // r4 not consumed
      append(dir, "ev.log", "tial\n") // r4's newline lands
      q.processAllAvailable()
      assert(vals() == Set("r1", "r2", "r3", "r4-partial"))
    } finally q.stop()
  }

  test("restart with the same checkpoint resumes exactly-once") {
    val dir = tempLogDir()
    val out = Files.createTempDirectory("graft-log-out").toString
    val ckpt = Files.createTempDirectory("graft-log-ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-log").load(dir.toString)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000L)
    }
    append(dir, "ev.log", "a\nb\n")
    runOnce()
    append(dir, "ev.log", "c\n") // produced while the consumer is down
    runOnce()
    runOnce() // no new data: nothing reprocessed
    val sunk = spark.read.parquet(out)
    assert(sunk.collect().map(_.getAs[String]("value")).sorted.toSeq ==
      Seq("a", "b", "c")) // each exactly once — dupes would sort adjacent
  }

  test("maxBytesPerTrigger paces a backlog over multiple micro-batches") {
    val dir = tempLogDir()
    append(dir, "big.log", (1 to 100).map(i => f"rec$i%03d").mkString("", "\n", "\n"))
    val q = spark.readStream.format("graft-log")
      .option("maxBytesPerTrigger", 100) // ~14 records of 7 bytes
      .load(dir.toString)
      .writeStream.format("memory").queryName("log_paced")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    assert(spark.table("log_paced").count() == 100)
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 5, // 800 bytes / 100-byte cap
      s"expected a paced multi-batch catch-up, got $dataBatches batches")
  }

  test("each log file is an independent partition with its own offset") {
    val dir = tempLogDir()
    append(dir, "p0.log", "a0\n")
    append(dir, "p1.log", "b0\nb1\n")
    val q = spark.readStream.format("graft-log").load(dir.toString)
      .writeStream.format("memory").queryName("log_parts")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // one file advances, the other is idle; a NEW file joins at 0
      append(dir, "p0.log", "a1\n")
      append(dir, "p2.log", "c0\n")
      q.processAllAvailable()
      val byFile = spark.table("log_parts").collect()
        .groupBy(_.getAs[String]("file"))
        .view.mapValues(_.map(_.getAs[String]("value")).toSet).toMap
      assert(byFile == Map("p0.log" -> Set("a0", "a1"),
        "p1.log" -> Set("b0", "b1"), "p2.log" -> Set("c0")))
    } finally q.stop()
  }

  test("startingOffsets=latest skips the existing log, tails new records") {
    val dir = tempLogDir()
    append(dir, "ev.log", "old1\nold2\n")
    val q = spark.readStream.format("graft-log")
      .option("startingOffsets", "latest")
      .load(dir.toString)
      .writeStream.format("memory").queryName("log_latest")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("log_latest").count() == 0)
      append(dir, "ev.log", "new1\n")
      q.processAllAvailable()
      assert(spark.table("log_latest").collect()
        .map(_.getAs[String]("value")).toSet == Set("new1"))
    } finally q.stop()
  }

  test("offset json round-trips and is deterministic") {
    val o = GraftLogOffset(Map("b.log" -> 7L, "a.log" -> 0L))
    assert(o.json() == """{"a.log":0,"b.log":7}""")
    assert(GraftLogOffset.fromJson(o.json()) == o)
  }

  test("completeEnd finds the last newline, bounded by the cap") {
    val dir = tempLogDir()
    append(dir, "x.log", "ab\ncd\nef") // newlines at 2 and 5
    val f = dir.resolve("x.log").toFile
    assert(LogSource.completeEnd(f, 0L, Long.MaxValue) == 6L)
    assert(LogSource.completeEnd(f, 0L, 5L) == 3L) // cap before 2nd \n
    assert(LogSource.completeEnd(f, 6L, Long.MaxValue) == 6L) // only partial
    assert(LogSource.completeEnd(f, 0L, 2L) == 0L) // cap before any \n
  }
}
