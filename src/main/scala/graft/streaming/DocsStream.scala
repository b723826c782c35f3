package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Dedup

/** Streaming near-dup screening — the STREAMING twin of
  * [[graft.operators.Dedup.incrementalMinhash]]: a stream of incoming
  * documents probed against the precomputed LSH band index of the
  * existing corpus ([[graft.operators.Dedup.bandIndexOf]]).
  *
  * The whole query is STATELESS: per-row signature expressions plus a
  * stream-static equi-join on (band, band_sig) — no watermark, no state
  * store, exactly-once under any restart. That is the point of the
  * design: the corpus side is a static snapshot (in production:
  * persisted, bucketed by the band key, refreshed by a batch job), so
  * screening N new documents costs O(N × matched-bucket size) no matter
  * how large the corpus is, and a crashed micro-batch replays with no
  * state to recover.
  *
  * Signature parity: the per-row `transform`/`array_min` lambdas here
  * compute the SAME integer arithmetic as the batch path's relational
  * `groupBy`/`min` (one md5 per shingle, 32 affine permutations mod
  * 2^31-1) — `min` over the same multiset — so stream and batch answers
  * are identical (pinned by the batch≡stream suite test). Interpreted
  * lambdas are the right trade on this path: each document's work is
  * row-local, so there is nothing for codegen'd partial aggregation to
  * combine, and no shuffle ever sees the text.
  */
object DocsStream {

  /** Parquet schema of the documents table for the file source. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Bounded file-source stream over the documents parquet in an sf
    * directory — `maxFilesPerTrigger` paces replay. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** Unbounded document ingest off a `graft-log` stream — the
    * message-bus twin of [[readDocs]]: each log record is one document
    * as a JSON line (newlines inside `text` are JSON-escaped, which is
    * what makes JSON-lines a valid log framing). Malformed records
    * parse to null doc_ids and are dropped LOUDLY-countable upstream
    * rather than crashing the query — the standard bad-record posture
    * of a bus consumer. Offsets, pacing, and exactly-once come from
    * the source ([[graft.sources.LogSource]]); this is just the
    * parse. */
  def readDocsLog(spark: SparkSession, logDir: String): DataFrame =
    spark.readStream.format("graft-log").load(logDir)
      .select(from_json(col("value"), docSchema).as("doc"))
      .select("doc.*")
      .filter(col("doc_id").isNotNull)

  /** Per-row word-3-gram shingles of `text` (same tokenizer kernel and
    * shingle definition as the batch path, as one array expression). */
  private def shingleArray(text: Column): Column = {
    val toks = graft.functions.TextFunctions.tokenize(text)
    val len = greatest(size(toks) - 2, lit(0))
    transform(arrays_zip(
        slice(toks, lit(1), len), slice(toks, lit(2), len), slice(toks, lit(3), len)),
      z => concat_ws(" ", z.getField("0"), z.getField("1"), z.getField("2")))
  }

  /** Per-row MinHash signature: one md5 per shingle, then
    * [[Dedup.MinhashK]] affine permutations, `array_min` each. */
  private def sigArray(shingles: Column): Column = {
    val xs = transform(shingles, g =>
      conv(substring(md5(g), 1, 8), 16, 10).cast("long"))
    array((0 until Dedup.MinhashK).map(i =>
      array_min(transform(xs, x => Dedup.minhashPerm(i, x)))): _*)
  }

  /** Screen a document stream against a static corpus band index:
    * emits (new_doc, dup_of, est_jaccard) for every (stream doc,
    * corpus doc) pair with estimated Jaccard >= `threshold`. Candidate
    * pairs sharing several bands are kept once via the same
    * first-matching-band filter as the batch path (no distinct — a
    * stream could not do one across batches anyway). */
  def nearDupScreen(newDocs: DataFrame, corpusBands: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val sigs = newDocs
      .select(col("doc_id").as("new_doc"), shingleArray(col("text")).as("gs"))
      .filter(size(col("gs")) > 0)
      .select(col("new_doc"), sigArray(col("gs")).as("sigs_b"))
    val probes = sigs
      .select(col("new_doc"), col("sigs_b"),
        explode(sequence(lit(0), lit(Dedup.MinhashBands - 1))).as("band"))
      .select(col("new_doc"), col("sigs_b"), col("band"),
        Dedup.bandSigExpr(col("sigs_b")).as("band_sig"))
    val corpus = corpusBands.select(col("doc_id").as("dup_of"),
      col("sigs").as("sigs_a"), col("band"), col("band_sig"))
    probes.join(corpus, Seq("band", "band_sig"))
      .filter(Dedup.noEarlierBandMatch)
      .select(col("new_doc"), col("dup_of"), Dedup.estJaccard.as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Streaming SPAN-DEDUP screen — the streaming twin of
    * [[graft.operators.TextAnalysis.spanScreenOf]]: arriving documents
    * rebuilt with every span the static GRAM-DF INDEX
    * ([[graft.operators.TextAnalysis.spanGramIndexOf]], persisted via
    * `writeSpanGramIndex` in production) already holds removed — the
    * Lee-et-al substring dedup applied at ingest, without recomputing
    * corpus df per batch.
    *
    * Shape: per-row tokenize + positioned gram digests, ONE
    * stream-static equi-join on `g` (left — zero-hit docs pass through
    * whole), then a per-document aggregation that unions covered
    * positions and rebuilds the surviving token sequence row-locally.
    * The aggregation keys are per-arrival unique doc_ids, complete
    * within their micro-batch — run in `update` mode each doc emits
    * exactly one row; production bounds the state store by
    * watermarking an arrival-time column (the keys never recur, so
    * dropped state is never needed again). Output schema and md5
    * discipline match the batch screen exactly (stream ≡ batch pinned
    * in the suite); like the batch form, a fully-covered document
    * emits nothing. */
  def spanDedupScreen(newDocs: DataFrame, gramIndex: DataFrame,
      n: Int = graft.operators.TextAnalysis.SpanN, minDf: Int = 2): DataFrame = {
    val toks = graft.functions.TextFunctions.tokenize(col("text"))
    // fused binary gram digests — must track the batch index's key type
    // ([[graft.operators.TextAnalysis.spanGramIndexOf]], r14)
    val grams = graft.functions.TextFunctions.wordNgramMd5(col("toks"), n)
    val d = newDocs.select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 1)
    val positioned = d
      .select(col("doc_id"), col("toks"), posexplode_outer(grams))
      .select(col("doc_id"), col("toks"), col("pos"), col("col").as("g"))
    val dup = gramIndex.filter(col("df_docs") >= minDf - 1)
      .select(col("g"), lit(1).as("hit"))
    val agg = positioned.join(dup, Seq("g"), "left")
      .select(col("doc_id"), col("toks"),
        when(col("hit").isNotNull,
          sequence(col("pos"), col("pos") + (n - 1))).as("cps"))
      .groupBy("doc_id")
      .agg(first(col("toks")).as("toks"),
        array_distinct(flatten(collect_list("cps"))).as("covered"))
    agg
      .select(col("doc_id"),
        filter(
          transform(col("toks"), (t, i) => struct(i.as("pos"), t.as("tok"))),
          s => !array_contains(col("covered"), s.getField("pos"))).as("keptS"))
      .filter(size(col("keptS")) >= 1)
      .select(col("doc_id"),
        size(col("keptS")).cast("long").as("n_kept"),
        md5(concat_ws(" ",
          transform(col("keptS"), s => s.getField("tok")))).as("cleaned_md5"))
  }

  /** Admission record emitted by [[sourceCapAdmission]]. */
  case class Admission(source: String, doc_id: Long, admit_seq: Long)

  /** STREAMING PER-SOURCE CAP — the ingest-time twin of
    * [[graft.operators.TextAnalysis.domainCapSample]]: admit at most
    * `cap` documents per source ACROSS micro-batches, dropping the
    * rest. The batch cap draws a content-hash sample over a complete
    * corpus; at ingest the corpus is never complete, so the streaming
    * policy is FIFO admission — first `cap` to arrive win (the standard
    * quota shape for crawl frontiers and per-tenant rate caps). Within
    * a micro-batch, rows admit in doc_id order, so the admitted set is
    * deterministic under shuffle/arrival reordering inside a batch.
    *
    * State is ONE long (the per-source admitted count) per source —
    * `flatMapGroupsWithState`, no timeout: the store stays O(|sources|)
    * forever, which is what makes the cap safe to leave running on an
    * unbounded stream. Exactly-once across restarts comes from the
    * state store checkpoint: a resumed query continues each source's
    * count where it stopped (pinned in the suite). Emits
    * (source, doc_id, admit_seq) with admit_seq contiguous 1..n per
    * source across the whole stream lifetime. */
  def sourceCapAdmission(newDocs: DataFrame,
      cap: Long = graft.operators.TextAnalysis.DomainCapK.toLong): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = newDocs.sparkSession
    import spark.implicits._
    newDocs.select(col("source"), col("doc_id")).as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, Admission](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (src, rows, state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val ids = rows.map(_._2).toArray.sorted
          val room = math.min(math.max(0L, cap - admitted), ids.length.toLong).toInt
          val out = ids.take(room).zipWithIndex.map { case (id, i) =>
            Admission(src, id, admitted + i + 1) }
          state.update(admitted + room)
          out.iterator
      }.toDF()
  }

  /** Streaming DSIR importance screen — the twin of
    * [[graft.operators.TextAnalysis.dsirScreenInc]]: arriving documents
    * scored against the PERSISTED model frame (bucket, lr_fp) by the
    * exact fixed-point sum. One stream-static broadcast equi-join plus a
    * SINGLE aggregation (run in update mode); the scoring kernel is
    * literally the batch one (`dsirScreenOf`), so stream ≡ batch is
    * parity by construction, and the suite pins it. */
  def dsirScoreScreen(newDocs: DataFrame, model: DataFrame): DataFrame =
    graft.operators.TextAnalysis.dsirScreenOf(newDocs, model)

  /** Streaming CURATION screen — the ingest-time twin of
    * [[graft.operators.TextAnalysis.curationFunnelInc]]: arriving
    * documents get their full per-stage verdict (quality, dedup vs the
    * persisted hash index, decontamination vs the persisted eval-gram
    * set, DSIR weight under the persisted dense model) as one row per
    * doc. Row-local flags + three stream-static joins + a SINGLE
    * per-doc aggregation (run in update mode); the kernel is literally
    * the batch one (`curationFlagsOf`), so stream ≡ batch is parity by
    * construction, and the suite pins it. The census stays batch-side
    * (governance numbers on the batch cadence); the stream emits the
    * per-document admission verdicts an ingest pipeline acts on. */
  def curationScreen(newDocs: DataFrame, corpusHashes: DataFrame,
      evalGrams: DataFrame, model: DataFrame): DataFrame =
    graft.operators.TextAnalysis.curationFlagsOf(
      newDocs, corpusHashes, evalGrams, model)

  /** Streaming CDC chunk screen — the ingest-time twin of
    * [[graft.operators.Dedup.cdcScreenIncremental]]: arriving documents
    * are content-defined-chunked ROW-LOCALLY (the chunk closure is pure
    * collection expressions — no window, no state, which is what makes
    * the identical kernel streaming-legal), probed against the
    * persisted chunk store's key set in one stream-static join, and
    * censused per doc (update mode): how many chunks/chars arrive vs
    * how many the store must actually persist. The kernel is literally
    * the batch one ([[graft.operators.Dedup.cdcScreenOf]]), so stream ≡
    * batch is parity by construction; the suite pins it. */
  def cdcScreen(newDocs: DataFrame, chunkIndex: DataFrame): DataFrame =
    graft.operators.Dedup.cdcScreenOf(newDocs, chunkIndex)

  /** Streaming BM25 serving — arriving `(query_id, text)` queries
    * scored against the PERSISTED denormalized postings index
    * ([[graft.operators.TextAnalysis.bm25IndexOf]] /
    * `writeBm25Index`). One stream-static equi-join on `word` (a
    * bucketed index snapshot joins with no index-side exchange) plus a
    * single (query, doc) aggregation — run in update mode. The scoring
    * kernel is literally the batch one (`bm25ScoreOf`), so
    * stream ≡ batch is parity by construction, and the suite pins it. */
  def bm25ServeScreen(newQueries: DataFrame, index: DataFrame): DataFrame =
    graft.operators.TextAnalysis.bm25ScoreOf(newQueries, index)

  /** Interval row emitted by [[scd2Screen]]: a CLOSED validity interval
    * is final the moment it closes; the OPEN (current) interval is
    * re-emitted whenever its key is touched — downstream upserts on
    * (doc_id, valid_from), the standard SCD2 sink contract. */
  case class Scd2Emit(doc_id: Long, valid_from: Long,
    valid_to: Option[Long], is_current: Boolean, text_md5: String)

  /** STREAMING SCD TYPE-2 maintenance — the ingest-time twin of
    * [[graft.operators.CorpusMerge.scd2History]]: arriving change rows
    * (doc_id, version, op, text) fold into one open-interval state per
    * key (`flatMapGroupsWithState`, no timeout). Each newer version
    * CLOSES the key's open interval (emitted once, final — exactly the
    * batch kernel's lead() semantics), a delete leaves the key closed,
    * an insert after a delete REOPENS it, and the current interval is
    * re-emitted per touching batch for the sink to upsert. State is
    * one (version, md5) pair per key — O(|dimension keys|), the SCD2
    * contract (the dimension is the small side by definition); the
    * suite pins closed ∪ latest-open ≡ the batch history across a
    * batch-split replay AND the state bound via
    * `StreamingQueryProgress`. */
  def scd2Screen(changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = changes.sparkSession
    import spark.implicits._
    changes.select(col("doc_id"), col("version"), col("op"),
        md5(col("text")).as("text_md5"))
      .as[(Long, Long, String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, String), Scd2Emit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[(Long, String)]) =>
          val out = scala.collection.mutable.ArrayBuffer[Scd2Emit]()
          var open: Option[(Long, String)] = state.getOption
          rows.toArray.sortBy(_._2).foreach { case (_, v, op, m) =>
            open.foreach { case (from, om) =>
              out += Scd2Emit(key, from, Some(v), is_current = false, om) }
            open = if (op == graft.operators.CorpusMerge.OpDelete) None
                   else Some((v, m))
          }
          open match {
            case Some((from, m)) =>
              state.update((from, m))
              out += Scd2Emit(key, from, None, is_current = true, m)
            case None => state.remove()
          }
          out.iterator
      }.toDF()
  }

  /** Streaming heavy-hitter candidate emitted by [[heavyHitterMonitor]]:
    * `est_count` is the Misra-Gries LOWER-BOUND estimate (within
    * N_source/m of truth), not an exact count. */
  case class HotItem(source: String, item: String, est_count: Long)

  /** STREAMING heavy-hitter monitor — the ingest-time twin of
    * `q_sketch_heavy_hitters`'s candidate phase: one Misra-Gries
    * summary per source maintained ACROSS micro-batches in
    * `flatMapGroupsWithState`, folding each batch's bigrams through the
    * same `MisraGriesAggregator.reduce` kernel the batch query runs, so
    * the superset guarantee (every item above N_source/m is present)
    * and the N/m error bound hold for the stream's lifetime counts —
    * order-independent properties, which is what makes them pinnable
    * where summary identity is not (MG content is arrival-order
    * dependent by nature). State is O(m) per source forever; each
    * trigger re-emits the current ≤m-row summary per updated source
    * (update mode). The EXACT phase stays batch — the monitor flags,
    * the recount confirms — which is the production split: hot-key /
    * hot-template detection at ingest, exact governance numbers on the
    * batch cadence. */
  def heavyHitterMonitor(newDocs: DataFrame,
      m: Int = graft.operators.TextAnalysis.HhCapacity): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = newDocs.sparkSession
    import spark.implicits._
    val agg = new graft.functions.MisraGriesAggregator(m)
    newDocs.select(col("source"),
        explode(graft.functions.TextFunctions.wordNgrams(
          graft.functions.TextFunctions.tokenize(col("text")), 2)).as("item"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, Long], HotItem](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (src, rows, state: GroupState[Map[String, Long]]) =>
          val updated = rows.foldLeft(state.getOption.getOrElse(Map.empty[String, Long])) {
            (buf, r) => agg.reduce(buf, r._2)
          }
          state.update(updated)
          updated.toSeq.sortBy { case (i, c) => (-c, i) }
            .map { case (i, c) => HotItem(src, i, c) }.iterator
      }.toDF()
  }
}
