package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
