package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Snapshot maintenance for a living corpus: apply a change batch
  * (inserts / updates / deletes) to the current snapshot — the MERGE /
  * upsert step every incremental ingestion pipeline runs between
  * crawls. The reference engine has no notion of mutation (it re-reads
  * a static directory per run, `asio_deep/main.cpp:230-234`); this is
  * extension surface mandated by the 100 TB pipeline brief.
  *
  * Scale posture: one equi-shuffle of snapshot and batch on the key —
  * the batch is typically orders of magnitude smaller, so AQE plans the
  * probe side broadcast when it fits. At warehouse scale the same
  * expression runs partition-pruned (copy-on-write only the partitions
  * the batch touches); nothing here collects or iterates on the driver.
  */
object CorpusMerge {

  /** Change-op column values. */
  val OpInsert = "I"; val OpUpdate = "U"; val OpDelete = "D"

  /** Deterministic right-to-be-forgotten set shared by the forget
    * (retraction) queries: ids with `id % ForgetMod == ForgetRem` are
    * the erasure-request list — hits both parity halves, so retraction
    * exercises snapshot AND delta rows. */
  val ForgetMod = 7L
  val ForgetRem = 3L

  /** Generic keyed MERGE: full-outer join snapshot × changes, then
    * resolve per row — delete drops, update/insert take the change
    * row's payload, unmatched snapshot rows carry. `payload` columns
    * must exist on both sides. */
  def mergeUpsert(snapshot: DataFrame, changes: DataFrame,
      key: String, payload: Seq[String]): DataFrame = {
    val s = snapshot.select((key +: payload).map(c => col(c).as(s"s_$c")): _*)
    val c = changes.select(col("op") +: (key +: payload).map(n => col(n).as(s"c_$n")): _*)
    def pick(n: String): Column =
      when(col("op").isin(OpUpdate, OpInsert), col(s"c_$n")).otherwise(col(s"s_$n"))
    s.join(c, s(s"s_$key") === c(s"c_$key"), "full_outer")
      .filter(col("op").isNull || col("op") =!= OpDelete)
      .select(coalesce(col(s"s_$key"), col(s"c_$key")).as(key) +:
        payload.map(n => pick(n).as(n)): _*)
  }

  /** Deterministic change batch over `documents` — derived from the
    * snapshot itself so the query needs no side files and the oracle
    * can rebuild it bit-for-bit: every doc_id ≡ 0 (mod 101) is deleted,
    * every remaining doc_id ≡ 0 (mod 97) gets a text revision, and
    * three new documents arrive. Delete wins on overlap (ids divisible
    * by both). */
  val InsertedDocs: Seq[(Long, String, String, String)] = Seq(
    (9200001L, "merge batch arrival one", "en", "planted_merge"),
    (9200002L, "merge batch arrival two", "de", "planted_merge"),
    (9200003L, "merge batch arrival three", "fr", "planted_merge"))

  def changeBatch(spark: SparkSession, dir: String): DataFrame =
    changeBatchOf(spark, Tables.documents(spark, dir))

  def changeBatchOf(spark: SparkSession, snap: DataFrame): DataFrame = {
    import spark.implicits._
    val touched = snap
      .filter(col("doc_id") % 101 === 0 || col("doc_id") % 97 === 0)
      .select(col("doc_id"),
        when(col("doc_id") % 101 === 0, lit(OpDelete)).otherwise(lit(OpUpdate)).as("op"),
        concat(col("text"), lit(" [rev2]")).as("text"),
        col("lang"), col("source"))
    val inserted = InsertedDocs.toDF("doc_id", "text", "lang", "source")
      .select(col("doc_id"), lit(OpInsert).as("op"), col("text"), col("lang"), col("source"))
    touched.unionByName(inserted)
  }

  /** INCREMENTAL VIEW MAINTENANCE: keep a per-(lang, source) aggregate
    * view (doc count, char total) current under the change batch by
    * computing DELTAS, never rescanning the corpus. The old values a
    * delete/update must retract come from ONE batch-keyed join against
    * the snapshot (O(batch) rows probe it; at warehouse scale that's a
    * broadcast of the batch keys into the snapshot scan, or an index
    * lookup — either way cost scales with the batch, not the corpus),
    * and the maintained view itself is the small aggregate table a real
    * deployment already has materialized. The ORACLE recomputes the
    * view from the fully-merged corpus — equality proves the
    * retract/apply algebra, which is the entire correctness risk of
    * IVM. Groups whose count reaches zero are dropped, as a recompute
    * would. */
  def incrementalViewMaintenance(spark: SparkSession, dir: String): DataFrame = {
    val snap = Tables.documents(spark, dir)
    val batch = changeBatch(spark, dir)
    // the pre-existing materialized view (small: |langs|×|sources|)
    val oldView = snap.groupBy("lang", "source")
      .agg(count(lit(1)).as("n0"), sum(length(col("text"))).cast("long").as("c0"))
    // per-change contributions; old payload via a batch-keyed join
    val old = snap.select(col("doc_id"), length(col("text")).cast("long").as("old_len"))
    val delta = batch
      .join(old, Seq("doc_id"), "left")
      .select(col("lang"), col("source"),
        when(col("op") === OpInsert, 1L)
          .when(col("op") === OpDelete, -1L).otherwise(0L).as("ddocs"),
        when(col("op") === OpInsert, length(col("text")).cast("long"))
          .when(col("op") === OpDelete, -col("old_len"))
          .otherwise(length(col("text")).cast("long") - col("old_len")).as("dchars"))
      .groupBy("lang", "source")
      .agg(sum("ddocs").as("dn"), sum("dchars").as("dc"))
    oldView.join(delta, Seq("lang", "source"), "full_outer")
      .select(col("lang"), col("source"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_docs"),
        (coalesce(col("c0"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("total_chars"))
      .filter(col("n_docs") > 0)
      .orderBy("lang", "source")
  }

  /** The registered query: apply the batch, then summarize per source —
    * action counts from the batch plus post-merge row/char totals from
    * the merged frame, proving the payload actually changed (updated
    * text carries the revision suffix into `chars_after`). Exact BIGINT
    * output only. */
  def mergeSummary(spark: SparkSession, dir: String): DataFrame = {
    val snap = Tables.documents(spark, dir)
    val batch = changeBatch(spark, dir)
    val merged = mergeUpsert(snap, batch, "doc_id", Seq("text", "lang", "source"))
    val actions = batch.groupBy("source")
      .agg(sum(when(col("op") === OpInsert, 1L).otherwise(0L)).as("n_ins"),
        sum(when(col("op") === OpUpdate, 1L).otherwise(0L)).as("n_upd"),
        sum(when(col("op") === OpDelete, 1L).otherwise(0L)).as("n_del"))
    merged.groupBy("source")
      .agg(count(lit(1)).as("rows_after"),
        sum(length(col("text"))).cast("long").as("chars_after"))
      .join(actions, Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("rows_after"), lit(0L)).as("rows_after"),
        coalesce(col("chars_after"), lit(0L)).as("chars_after"),
        coalesce(col("n_ins"), lit(0L)).as("n_ins"),
        coalesce(col("n_upd"), lit(0L)).as("n_upd"),
        coalesce(col("n_del"), lit(0L)).as("n_del"))
      .orderBy("source")
  }

  /** SNAPSHOT DIFF — the inverse of [[mergeUpsert]]: derive the change
    * set FROM two snapshots (CDC derivation / backfill reconciliation —
    * what a pipeline runs when an upstream re-delivers a corpus without
    * a changelog and it must recover what actually changed). One
    * full-outer join on the key, rows classified by presence and by
    * content hash: only-new → insert, only-old → delete, both sides
    * present with differing md5 → update; unchanged rows are dropped —
    * the diff is |Δ|-sized, never corpus-sized, no matter how large the
    * snapshots.
    *
    * Registered as the round-trip identity `diff(apply(S, Δ), S) ≡ Δ`:
    * the "new" snapshot is [[mergeUpsert]] applied to the deterministic
    * [[changeBatch]], so the recovered diff must be exactly that batch
    * (every update in the batch really changes the text, so no-op
    * updates cannot hide). The DuckDB oracle replays merge + diff
    * relationally — the hash match pins the merge algebra AND the diff
    * classification at once. `DiffSpec` pins the identity directly
    * against the batch frame.
    *
    * Scale: the join is one key-equi shuffle of both snapshots
    * (co-partitioned; with both sides bucketed by the key —
    * [[Layout.writeBucketed]] — it runs with zero exchanges). At
    * warehouse scale, partition-level content fingerprints (the
    * manifest's per-partition hash) short-circuit untouched partitions
    * before any row is read; the row-level compare here is the
    * within-touched-partition step of that plan. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val snap = Tables.documents(spark, dir)
    snapshotDiffOf(snap,
      mergeUpsert(snap, changeBatch(spark, dir),
        "doc_id", Seq("text", "lang", "source")))
  }

  /** Version-3 tweaks to the [[InsertedDocs]] keys — exercising SCD2
    * intervals on keys BORN inside the log: the first arrival gets a
    * second revision, the second is deleted. Single source of truth
    * for the Spark build and the oracle's VALUES clause. */
  val ThirdBatchTweaks: Seq[(Long, String, String)] = Seq(
    (InsertedDocs(0)._1, InsertedDocs(0)._2 + " [rev3]", OpUpdate),
    (InsertedDocs(1)._1, "", OpDelete))

  /** SCD TYPE-2 HISTORY materialization — the warehouse temporal
    * operator the merge family was missing: given a versioned change
    * log, build the dimension-history table (key, payload digest,
    * valid_from, valid_to, is_current) that point-in-time joins read.
    * The log here is three deterministic versions derived from the
    * snapshot itself (v1 = the initial load as inserts; v2 = the
    * [[changeBatch]]; v3 = a second revision wave at doc_id ≡ 0
    * (mod 89) plus [[ThirdBatchTweaks]]), so the oracle rebuilds it
    * bit-for-bit with no side files.
    *
    * The build is ONE window: rows ordered by version per key, each
    * non-delete row opens an interval, `lead(version)` closes it (an
    * update supersedes, a delete closes without a successor, and a
    * later insert after a delete REOPENS the key — doc_id 0 exercises
    * delete-then-revive here). valid_to is NULL on open intervals and
    * is_current ⇔ no successor row. Per-key partitions are bounded by
    * the version count, so the window never sees more than
    * |versions| rows per key — the 100 TB shape is a co-partitioned
    * sort within key groups, exactly how a warehouse MERGEs SCD2. */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    scd2Of(scd2Log(spark, dir)).orderBy("doc_id", "valid_from")

  /** The three-version deterministic change log behind [[scd2History]]
    * — exposed so the streaming twin can replay it batch by batch. */
  def scd2Log(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val snap = Tables.documents(spark, dir)
    val v1 = snap.select(col("doc_id"), lit(1L).as("version"),
      lit(OpInsert).as("op"), col("text"))
    val v2 = changeBatch(spark, dir)
      .select(col("doc_id"), lit(2L).as("version"), col("op"), col("text"))
    val v3 = snap.filter(col("doc_id") % 89 === 0)
      .select(col("doc_id"), lit(3L).as("version"), lit(OpUpdate).as("op"),
        concat(col("text"), lit(" [rev3]")).as("text"))
      .unionByName(ThirdBatchTweaks.toDF("doc_id", "text", "op")
        .select(col("doc_id"), lit(3L).as("version"), col("op"), col("text")))
    v1.unionByName(v2).unionByName(v3)
  }

  /** TIME-TRAVEL census — the read side of [[scd2History]]: for each
    * version v, reconstruct the corpus AS OF v straight from the
    * validity intervals (valid_from ≤ v < valid_to, open intervals
    * current forever) and report the per-version census. AS OF 1 is
    * the initial load; 2 reflects the change batch (deletes gone,
    * revisions live); 3 the second wave. One row-local interval test
    * per (interval, version) — versions ride an `explode` over a
    * 3-element literal, so the frame never exceeds 3× the history. */
  def timeTravelCensus(spark: SparkSession, dir: String): DataFrame =
    scd2History(spark, dir)
      .select(col("doc_id"), col("valid_from"), col("valid_to"),
        col("text_md5"),
        explode(array(lit(1L), lit(2L), lit(3L))).as("as_of"))
      .filter(col("valid_from") <= col("as_of") &&
        (col("valid_to").isNull || col("as_of") < col("valid_to")))
      .groupBy("as_of")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text_md5")).as("distinct_texts"))
      .orderBy("as_of")

  /** The SCD2 kernel over ANY (doc_id, version, op, text) change log:
    * one lead() window per key builds the validity intervals. */
  def scd2Of(log: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("version")
    log.withColumn("next_v", lead(col("version"), 1).over(w))
      .filter(col("op") =!= OpDelete)
      .select(col("doc_id"), col("version").as("valid_from"),
        col("next_v").as("valid_to"),
        col("next_v").isNull.as("is_current"),
        md5(col("text")).as("text_md5"))
  }

  /** The diff kernel over any two (doc_id, text) snapshots. */
  def snapshotDiffOf(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val before = oldSnap.select(col("doc_id"), md5(col("text")).as("old_md5"))
    val after = newSnap.select(col("doc_id"), md5(col("text")).as("new_md5"))
    before.join(after, Seq("doc_id"), "full_outer")
      .withColumn("op",
        when(col("old_md5").isNull, OpInsert)
          .when(col("new_md5").isNull, OpDelete)
          .when(col("old_md5") =!= col("new_md5"), OpUpdate))
      .filter(col("op").isNotNull)
      .select(col("doc_id"), col("op"), col("old_md5"), col("new_md5"))
      .orderBy("doc_id")
  }
}
