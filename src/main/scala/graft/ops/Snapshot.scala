package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CrossHash

/** Incremental corpus maintenance: merge a change batch (upserts +
  * tombstone deletes) into a corpus snapshot, latest-version-wins
  * (SURVEY §2c north-star extension — a daily-ingest pipeline's MERGE).
  *
  * The reference rewrites its whole output corpus on every job
  * (srics96/SDC_Mapreduce `src/worker/worker.cpp:290-303` — full shard
  * files each run); at 100 TB a daily crawl refresh cannot re-emit 100 TB
  * to change 0.1%, so the production shape is snapshot + change-batch →
  * next snapshot. This implements that merge declaratively.
  *
  * Scale design: ONE hash shuffle on `doc_id` with a map-side-combinable
  * `max(struct(version, …))` argmax — the same aggregate-form keep-one the
  * dedup survivors use (no per-key window sort). The change batch is
  * typically ≪ the snapshot, so AQE broadcast-joins nothing here — the
  * aggregate is the whole merge. With a bucketed snapshot layout
  * (Formats.writeBucketed on doc_id) even that shuffle drops to a
  * bucket-local merge of snapshot partitions with the (re-bucketed) batch.
  */
object Snapshot {

  /** The current corpus as a version-0 snapshot: one row per document with
    * a 60-bit content fingerprint (the payload stand-in — a real snapshot
    * carries the full column set; the fingerprint keeps the gate's merge
    * arithmetic content-addressed and cross-engine exact). */
  def baseSnapshot(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit(0).as("version"),
      lit("upsert").as("op"),
      CrossHash.h60(col("text")).as("fp"))

  /** A deterministic synthetic change batch derived from the corpus (no
    * side files at the gate): documents with `doc_id % 10 == 3` arrive
    * re-crawled (version-1 upsert with a rewritten payload fingerprint),
    * `doc_id % 10 == 7` arrive as tombstones (takedowns/robots removals). */
  def changeBatch(docs: DataFrame): DataFrame =
    docs.where(col("doc_id") % 10 === 3 || col("doc_id") % 10 === 7)
      .select(
        col("doc_id"),
        lit(1).as("version"),
        when(col("doc_id") % 10 === 3, lit("upsert"))
          .otherwise(lit("delete")).as("op"),
        when(col("doc_id") % 10 === 3,
          CrossHash.h60(concat(lit("v1:"), col("text"))))
          .otherwise(lit(null).cast("long")).as("fp"))

  /** The inverse of [[mergeSnapshot]]: extract the change batch that
    * turns snapshot `prev` into snapshot `next` — content-addressed CDC
    * the way table formats derive incremental feeds. One full-outer
    * hash join on `doc_id`; fingerprint comparison classifies each row
    * as `add` (new doc), `delete` (gone), or `update` (content changed);
    * identical rows drop out. With both snapshots bucketed on `doc_id`
    * (Formats.writeBucketed) even this join is shuffle-free.
    *
    * Round-trip law (proven in SnapshotSpec): applying the extracted
    * diff to `prev` via [[mergeSnapshot]] reproduces `next` exactly. */
  def diffSnapshots(prev: DataFrame, next: DataFrame): DataFrame =
    prev.select(col("doc_id"), col("fp").as("fp_prev"))
      .join(next.select(col("doc_id"), col("fp").as("fp_next")), Seq("doc_id"), "full_outer")
      .withColumn("op",
        when(col("fp_prev").isNull, "add")
          .when(col("fp_next").isNull, "delete")
          .when(col("fp_prev") =!= col("fp_next"), "update")
          .otherwise("unchanged"))
      .where(col("op") =!= "unchanged")
      .select(col("doc_id"), col("op"), col("fp_next").as("fp"))

  /** Latest-version-wins merge: union snapshot + batch, keep each
    * `doc_id`'s highest version via aggregate-form argmax, drop documents
    * whose winning row is a tombstone. Emits the next snapshot
    * `(doc_id, version, fp)`. */
  def mergeSnapshot(base: DataFrame, changes: DataFrame): DataFrame =
    base.unionByName(changes)
      .groupBy("doc_id")
      // struct comparison is field-order lexicographic, so `version` alone
      // decides (one row per (doc_id, version) by construction)
      .agg(max(struct(col("version"), col("op"), col("fp"))).as("w"))
      .where(col("w.op") === "upsert")
      .select(col("doc_id"), col("w.version").as("version"), col("w.fp").as("fp"))

  /** The second synthetic change batch, extending [[changeBatch]] into a
    * version CHAIN: at version 2 the re-crawled `%10 == 3` docs are taken
    * DOWN (upsert-then-delete — the history a time-travel read must not
    * conflate) and `%10 == 1` docs arrive re-crawled. */
  def changeBatchV2(docs: DataFrame): DataFrame =
    docs.where(col("doc_id") % 10 === 3 || col("doc_id") % 10 === 1)
      .select(
        col("doc_id"),
        lit(2).as("version"),
        when(col("doc_id") % 10 === 1, lit("upsert"))
          .otherwise(lit("delete")).as("op"),
        when(col("doc_id") % 10 === 1,
          CrossHash.h60(concat(lit("v2:"), col("text"))))
          .otherwise(lit(null).cast("long")).as("fp"))

  /** TIME-TRAVEL read: the corpus as of version `v`, reconstructed from
    * the base snapshot plus the accumulated change LOG (every batch row
    * stamped with its version) — the lakehouse read-at-version every
    * audit ("what did the training set contain when run X sampled it?")
    * and reproduction workflow needs. A version-pruned log fold is the
    * same ONE-aggregate argmax as [[mergeSnapshot]]; with the log stored
    * partitioned by version, the `version <= v` filter is partition
    * pruning, so reading an old version costs the base + the pruned
    * prefix, never the full history.
    *
    * Composition law (SnapshotSpec): `atVersion(base, log, n)` ==
    * `mergeSnapshot(atVersion(base, log, n-1), batch_n)` — folding the
    * log in one pass equals replaying the batches one by one. */
  def snapshotAtVersion(base: DataFrame, changeLog: DataFrame, v: Int): DataFrame =
    mergeSnapshot(base, changeLog.where(col("version") <= v))

  /** SCD TYPE-2 dimension build — the warehouse history shape: one row
    * per (document, contiguous content interval) with `valid_from` /
    * `valid_to` version bounds, derived from the same base + change log
    * the time-travel read folds. Each upsert OPENS an interval at its
    * version; the document's next event of ANY kind (re-crawl or
    * tombstone) CLOSES it — `lead(version)` over the per-document
    * version order; an open interval (`valid_to` null) is the current
    * row. A delete closes without opening, so a tombstoned document has
    * history but no current row — exactly how [[snapshotAtVersion]]
    * reads it at each version (SnapshotSpec proves the equivalence:
    * interval membership at v == time-travel content at v). The window
    * partitions by `doc_id` and each document's history is
    * versions-count-sized, so the sort is per-key and bounded — the
    * window family's usual scale contract. Change batches here always
    * rewrite the fingerprint; a source with no-op upserts would collapse
    * equal-adjacent rows first. */
  def scd2History(base: DataFrame, changeLog: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("version")
    base.unionByName(changeLog)
      .withColumn("valid_to", lead(col("version"), 1).over(w))
      .where(col("op") === "upsert")
      .select(col("doc_id"), col("version").as("valid_from"),
        col("valid_to"), col("fp"),
        col("valid_to").isNull.cast("int").as("is_current"))
  }
}
