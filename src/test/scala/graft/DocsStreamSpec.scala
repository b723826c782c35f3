package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Dedup
import graft.streaming.DocsStream

/** Batch≡stream equivalence for near-dup screening: streaming the
  * odd-id documents of sf0.001 against the static band index of the
  * even-id documents must reproduce exactly the batch
  * `incrementalMinhash` answer (which splits the same corpus the same
  * way) — including the per-row lambda signatures matching the batch
  * path's relational groupBy/min signatures bit-for-bit.
  */
class DocsStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("streaming near-dup screen == batch incrementalMinhash on bounded input") {
    val dir = "/root/testdata/sf0.001"
    val corpusBands = Dedup.bandIndexOf(
      graft.sources.Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0))
    val stream = DocsStream.readDocs(spark, dir).filter(col("doc_id") % 2 === 1)
    val q = DocsStream.nearDupScreen(stream, corpusBands)
      .writeStream
      .format("memory")
      .queryName("neardup_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val streamed = spark.table("neardup_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Dedup.incrementalMinhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming span-dedup screen == batch incremental span screen") {
    // the span-level twin of the near-dup pin: odd docs stream against
    // the static gram-df index of the even docs; every rebuilt text md5
    // must equal the batch screen's (same tokenizer, same gram digests,
    // same position union, same surviving sequence)
    val dir = "/root/testdata/sf0.001"
    val idx = graft.operators.TextAnalysis.spanGramIndexOf(
      graft.sources.Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0))
    val q = DocsStream.spanDedupScreen(
        DocsStream.readDocs(spark, dir).filter(col("doc_id") % 2 === 1), idx)
      .writeStream
      .format("memory")
      .queryName("spanscreen_test")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val streamed = spark.table("spanscreen_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val batch = graft.operators.TextAnalysis.dupSpanApplyIncremental(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // and the screen actually removed something: at least one doc lost
    // tokens to an indexed span (the planted near-dup passages)
    assert(batch.exists(_._2 < Int.MaxValue) && {
      val totalKept = batch.toSeq.map(_._2).sum
      val totalToks = graft.sources.Tables.documents(spark, dir)
        .filter(col("doc_id") % 2 === 1)
        .select(org.apache.spark.sql.functions.size(
          graft.functions.TextFunctions.tokenize(col("text"))).cast("long").as("n"))
        .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
      totalKept < totalToks
    })
  }

  test("streaming BM25 serve == batch incremental serve, via the PERSISTED index") {
    // odd probe docs stream as queries against the bucketed index
    // snapshot of the even half — the production serving flow: write
    // index once, every arriving query joins bucket-local
    val dir = "/root/testdata/sf0.001"
    val even = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 2 === 0)
    graft.operators.TextAnalysis.writeBm25Index(even, "bm25_idx_test")
    val q = DocsStream.bm25ServeScreen(
        DocsStream.readDocs(spark, dir)
          .filter(col("doc_id") % 2 === 1 && col("doc_id") < 10)
          .select(col("doc_id").as("query_id"), col("text")),
        graft.operators.TextAnalysis.readBm25Index(spark, "bm25_idx_test"))
      .writeStream
      .format("memory")
      .queryName("bm25serve_test")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val streamed = spark.table("bm25serve_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.operators.TextAnalysis.bm25ServeInc(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // scores discriminate (the screen ranks, it does not emit a constant)
    assert(batch.map(_._3).size > 1)
  }

  test("streaming heavy-hitter monitor: guarantee and error bound hold per source") {
    import spark.implicits._
    // planted corpus: per-source unique-bigram filler + a hot passage in
    // src_a whose two bigrams (40 occurrences each) clear N_a/m = 22.5
    val filler = (0L until 40L).flatMap { i =>
      Seq((i, ('a' to 'h').map(c => s"f${i}$c").mkString(" "), "en", "src_a", 0L),
        (1000L + i, ('a' to 'h').map(c => s"g${i}$c").mkString(" "), "en", "src_b", 0L))
    }
    val hot = (100L until 120L).map(i =>
      (i, "hot alpha hot alpha hot", "en", "src_a", 0L))
    val dir = java.nio.file.Files.createTempDirectory("graft-hhmon").toString
    (filler ++ hot).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/staging")
    // single documents.parquet file -> one trigger
    val part = new java.io.File(s"$dir/staging").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val m = 16
    val q = DocsStream.heavyHitterMonitor(DocsStream.readDocs(spark, dir), m)
      .writeStream
      .format("memory")
      .queryName("hhmon_test")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val got = spark.table("hhmon_test").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // true bigram counts per source, from the same parquet via batch
    val truth = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"),
        org.apache.spark.sql.functions.explode(
          graft.functions.TextFunctions.wordNgrams(
            graft.functions.TextFunctions.tokenize(col("text")), 2)).as("item"))
      .groupBy("source", "item").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nPerSource = truth.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    // superset guarantee: the hot bigrams (40 > N_a/m) are present
    assert(got.contains(("src_a", "hot alpha")))
    assert(got.contains(("src_a", "alpha hot")))
    // capacity bound per source
    got.keys.groupBy(_._1).foreach { case (src, ks) =>
      assert(ks.size <= m, s"$src summary over capacity") }
    // MG error bound: est <= truth and (truth - est) * m <= N_source
    got.foreach { case ((src, item), est) =>
      val t = truth((src, item))
      assert(est <= t, s"($src,$item) overcount")
      assert((t - est) * m <= nPerSource(src), s"($src,$item) bound")
    }
  }

  test("heavy-hitter monitor restart: MG state folds counts across runs") {
    import spark.implicits._
    import java.nio.file.Files
    // below-capacity vocabulary so the summary is EXACT counting: after
    // two AvailableNow runs over one checkpoint, lifetime counts must be
    // the sum of both batches — a fresh run on batch 2 alone would halve
    val staging = Files.createTempDirectory("graft-hhrestart").toString
    val ckpt = Files.createTempDirectory("graft-hhrestart-ck").toString
    val out = Files.createTempDirectory("graft-hhrestart-out").toString
    def batch(idBase: Long) = (idBase until idBase + 10L)
      .map(i => (i, "hot alpha hot alpha hot", "en", "src_a", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def drain(): Unit = {
      // foreachBatch: the sink shape that both accepts update-mode
      // stateful output AND recovers from the checkpoint
      val q = DocsStream.heavyHitterMonitor(
          spark.readStream.schema(DocsStream.docSchema).parquet(staging), 64)
        .writeStream
        .outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(out) }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000L)
    }
    batch(0L).write.mode("append").parquet(staging)
    drain()
    batch(100L).write.mode("append").parquet(staging)
    drain()
    val est = spark.read.parquet(out).collect()
      .filter(r => r.getString(0) == "src_a")
      .groupBy(_.getString(1)).map { case (item, rows) =>
        item -> rows.map(_.getLong(2)).max }
    // each doc contributes 2x "hot alpha" + 2x "alpha hot"; 20 docs total
    assert(est("hot alpha") === 40L)
    assert(est("alpha hot") === 40L)
  }

  test("streaming curation screen == batch incremental funnel flags") {
    // arriving odd docs flagged against the three artifacts persisted
    // from the even-doc corpus; the kernel is shared verbatim, so every
    // per-doc verdict row must match the batch flags exactly
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.fanOut(
      graft.sources.Tables.documents(spark, dir))
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val hashes = graft.operators.TextAnalysis.corpusHashIndexOf(corpus)
    val evalG = graft.operators.TextAnalysis.evalGramSetOf(
      corpus.filter(col("doc_id") % graft.operators.TextAnalysis.EvalMod === 0))
    val model = graft.operators.TextAnalysis.dsirModelInc(spark, dir)
    val q = DocsStream.curationScreen(
        DocsStream.readDocs(spark, dir).filter(col("doc_id") % 2 === 1),
        hashes, evalG, model)
      .writeStream
      .format("memory")
      .queryName("curation_screen_test")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000L)
    val streamed = spark.table("curation_screen_test").collect()
      .map(_.toString).toSet
    val batch = graft.operators.TextAnalysis.curationFlagsOf(
        docs.filter(col("doc_id") % 2 === 1), hashes, evalG, model)
      .collect().map(_.toString).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming DSIR importance screen == batch incremental screen") {
    // arriving odd docs scored against the dense model fit on the even
    // docs; the kernel is shared, so every (doc_id, n_grams, weight)
    // triple must match the batch screen exactly
    val dir = "/root/testdata/sf0.001"
    val q = DocsStream.dsirScoreScreen(
        DocsStream.readDocs(spark, dir).filter(col("doc_id") % 2 === 1),
        graft.operators.TextAnalysis.dsirModelInc(spark, dir))
      .writeStream
      .format("memory")
      .queryName("dsirscreen_test")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val streamed = spark.table("dsirscreen_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.operators.TextAnalysis.dsirScreenInc(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // weights must spread (the screen separates docs, not a constant)
    assert(batch.map(_._3).size > 1)
  }

  test("stream probes a PERSISTED band index - the production snapshot flow") {
    import java.nio.file.Files
    val dir = "/root/testdata/sf0.001"
    val idx = Files.createTempDirectory("graft-bandidx").toString + "/bands"
    // snapshot the corpus index once (in production: a periodic batch
    // job, bucketed by the band key), then the stream reads it like any
    // static table — signature arrays must survive the parquet round-trip
    Dedup.bandIndexOf(
        graft.sources.Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0))
      .write.parquet(idx)
    val q = DocsStream.nearDupScreen(
        DocsStream.readDocs(spark, dir).filter(col("doc_id") % 2 === 1),
        spark.read.parquet(idx))
      .writeStream
      .format("memory")
      .queryName("neardup_persisted")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val streamed = spark.table("neardup_persisted").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Dedup.incrementalMinhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("band-index snapshot ROTATION: restart against a rebuilt snapshot screens the enlarged corpus, exactly-once") {
    // the production refresh flow end to end: stream screens batch 1
    // against snapshot A; a batch job folds the processed docs into
    // snapshot B (A + batch 1, same catalog table, bucketed write);
    // the stream restarts from its checkpoint against B and screens
    // batch 2 — whose matches must include docs that exist ONLY in the
    // rebuilt snapshot — without reprocessing batch 1.
    import java.nio.file.{Files, Path, Paths}
    import org.apache.spark.sql.DataFrame
    val dir = "/root/testdata/sf0.001"
    val inputDir = Files.createTempDirectory("graft-rot-in")
    val out = Files.createTempDirectory("graft-rot-sink").toString
    val ckpt = Files.createTempDirectory("graft-rot-ckpt").toString
    val docs = graft.sources.Tables.documents(spark, dir)
    val corpusA = docs.filter(col("doc_id") % 2 === 0)
    val batch1 = docs.filter(col("doc_id") % 2 === 1)
    // batch 2: exact copies of five batch-1 docs under fresh ids — their
    // only guaranteed near-dups (est_jaccard = 1) are batch-1 docs, which
    // are in snapshot B but NOT in snapshot A
    val batch2 = batch1.orderBy("doc_id").limit(5)
      .withColumn("doc_id", col("doc_id") + 1000000L)

    def writeOneFile(df: DataFrame, dest: Path): Unit = {
      val tmp = Files.createTempDirectory("graft-rot-stage").toString + "/out"
      df.coalesce(1).write.parquet(tmp)
      val part = Files.list(Paths.get(tmp))
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().orElseThrow()
      Files.move(part, dest)
    }
    def runStream(): Unit = {
      val q = DocsStream.nearDupScreen(
          spark.readStream.schema(DocsStream.docSchema)
            .option("maxFilesPerTrigger", "1").parquet(inputDir.toString),
          Dedup.readBandIndex(spark, "rot_snapshot"))
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000L)
    }
    def sunk(): Set[(Long, Long)] = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    Dedup.writeBandIndex(corpusA, "rot_snapshot")      // snapshot A
    writeOneFile(batch1, inputDir.resolve("batch1.parquet"))
    runStream()
    val afterRun1 = sunk()
    assert(afterRun1.nonEmpty && afterRun1.forall(_._2 % 2 == 0),
      "run 1 must match only snapshot-A (even-id) corpus docs")

    Dedup.writeBandIndex(corpusA.unionByName(batch1), "rot_snapshot") // snapshot B
    writeOneFile(batch2, inputDir.resolve("batch2.parquet"))
    runStream()
    val afterRun2 = sunk()
    // exactly-once across the rotation: batch 1's output is preserved
    // verbatim — not reprocessed against B (a replay would self-match
    // every batch-1 doc now in the corpus at jaccard 1)
    assert(afterRun2.filter(_._1 < 1000000L) == afterRun1)
    assert(afterRun2.forall { case (n, d) => n != d })
    // and batch 2's matches reach docs that exist only in snapshot B
    val newMatches = afterRun2.filter(_._1 >= 1000000L)
    assert(newMatches.exists(_._2 % 2 == 1),
      "post-rotation matches must include new-corpus (odd-id) docs")
    // each planted copy found its batch-1 source
    assert(batch2.select("doc_id").collect().map(_.getLong(0)).forall(id =>
      newMatches.contains((id, id - 1000000L))))
  }

  test("near-dup screen restart with checkpoint is exactly-once (stateless query)") {
    import java.nio.file.Files
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft-neardup-sink").toString
    val ckpt = Files.createTempDirectory("graft-neardup-ckpt").toString
    val corpusBands = Dedup.bandIndexOf(
      graft.sources.Tables.documents(spark, dir).filter(col("doc_id") % 2 === 0))
    def runOnce(): Unit = {
      val q = DocsStream.nearDupScreen(
          DocsStream.readDocs(spark, dir).filter(col("doc_id") % 2 === 1),
          corpusBands)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000L)
    }
    runOnce()
    runOnce() // committed offsets: nothing reprocessed, nothing duplicated
    val sunk = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = Dedup.incrementalMinhash(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sunk.sorted == expected.sorted) // Seq compare: dupes would differ
  }

  test("graft-log message-bus ingest feeds the screen: tailed JSON docs " +
      "== batch incrementalMinhash") {
    import java.nio.file.{Files, StandardOpenOption}
    import java.nio.charset.StandardCharsets
    import org.apache.spark.sql.functions.{struct, to_json}
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
    // the producer side: odd-id docs as JSON lines (driver-side collect
    // is test harness only — a real producer writes the bus)
    val lines = docs.filter(col("doc_id") % 2 === 1)
      .select(to_json(struct(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))))
      .collect().map(_.getString(0))
    val logDir = Files.createTempDirectory("graft-docslog")
    def produce(batch: Seq[String]): Unit =
      Files.write(logDir.resolve("docs.log"),
        batch.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    val (first, rest) = lines.toSeq.splitAt(lines.length / 2)
    produce(first)
    val corpusBands = Dedup.bandIndexOf(docs.filter(col("doc_id") % 2 === 0))
    val q = DocsStream.nearDupScreen(
        DocsStream.readDocsLog(spark, logDir.toString), corpusBands)
      .writeStream.format("memory").queryName("neardup_log")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      produce(rest) // docs landing while the consumer is live
      q.processAllAvailable()
      val streamed = spark.table("neardup_log").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = Dedup.incrementalMinhash(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming CDC chunk screen == batch incremental screen") {
    // the re-delivered even docs arrive as a stream and are chunked
    // row-locally, probed against the static chunk-store key set; the
    // kernel is shared verbatim with Dedup.cdcScreenOf, so every
    // (doc_id, n_chunks, chunk_chars, n_new, new_chars) row must match
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val stored = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 2 === 0)
    val index = Dedup.cdcChunkIndexOf(stored)
    def redelivered(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + Dedup.CdcRedeliverShift).as("doc_id"),
        concat(lit("redelivered copy "), col("text")).as("text"))
    val q = DocsStream.cdcScreen(redelivered(DocsStream.readDocs(spark, dir)), index)
      .writeStream
      .format("memory")
      .queryName("cdc_screen_test")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000L)
    val streamed = spark.table("cdc_screen_test").collect()
      .map(_.toString).toSet
    val batch = Dedup.cdcScreenOf(
        redelivered(graft.sources.Tables.documents(spark, dir)), index)
      .collect().map(_.toString).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // the LBFS payoff on this plant: most re-delivered bytes dedup away
    val totals = Dedup.cdcScreenOf(
        redelivered(graft.sources.Tables.documents(spark, dir)), index)
      .agg(sum("chunk_chars"), sum("new_chars")).head()
    assert(totals.getLong(1) < totals.getLong(0) / 2,
      s"expected most re-delivered bytes to dedup: ${totals.mkString(",")}")
  }
}
