package graft

import org.apache.spark.sql.functions._

import graft.functions.CrossHash
import graft.ops.Snapshot
import graft.sources.Tables

/** Latest-wins snapshot merge: upserts replace, tombstones delete,
  * untouched documents ride through byte-identical. */
class SnapshotSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, sfDir)

  test("mergeSnapshot applies upserts, drops tombstones, passes the rest through") {
    val merged = Snapshot.mergeSnapshot(
      Snapshot.baseSnapshot(docs), Snapshot.changeBatch(docs))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val byId = merged.map(r => r._1 -> r).toMap

    val expectedFps = docs.select(col("doc_id"),
      CrossHash.h60(col("text")).as("fp0"),
      CrossHash.h60(concat(lit("v1:"), col("text"))).as("fp1"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    expectedFps.foreach { case (id, fp0, fp1) =>
      id % 10 match {
        case 7 => assert(!byId.contains(id), s"tombstoned doc $id survived")
        case 3 => assert(byId(id) === ((id, 1, fp1)), s"doc $id not upserted")
        case _ => assert(byId(id) === ((id, 0, fp0)), s"doc $id mutated")
      }
    }
    val tombstones = expectedFps.count(_._1 % 10 == 7)
    assert(merged.length === expectedFps.length - tombstones)
  }

  test("diff/merge round-trip: merge(prev, diff(prev, next)) == next") {
    val base = Snapshot.baseSnapshot(docs)
    val next = Snapshot.mergeSnapshot(base, Snapshot.changeBatch(docs))
    val diff = Snapshot.diffSnapshots(base, next)

    // the extracted diff classifies exactly the synthetic batch's effect
    val byOp = diff.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(byOp.getOrElse("update", 0L) === docs.filter(col("doc_id") % 10 === 3).count())
    assert(byOp.getOrElse("delete", 0L) === docs.filter(col("doc_id") % 10 === 7).count())
    assert(!byOp.contains("add"))
    assert(diff.count() < n, "diff must be smaller than the corpus")

    // replay: the diff as a version-1 change batch applied to prev
    val replayBatch = diff.select(col("doc_id"), lit(1).as("version"),
      when(col("op") === "delete", lit("delete")).otherwise(lit("upsert")).as("op"),
      col("fp"))
    val replayed = Snapshot.mergeSnapshot(base, replayBatch)
      .select("doc_id", "fp").collect().map(_.toString).sorted.toSeq
    val expected = next.select("doc_id", "fp").collect().map(_.toString).sorted.toSeq
    assert(replayed === expected)
  }

  test("merge is idempotent: re-applying the same batch changes nothing") {
    val once = Snapshot.mergeSnapshot(
      Snapshot.baseSnapshot(docs), Snapshot.changeBatch(docs))
    // feed the merged snapshot back as the base (its rows carry the winning
    // versions) with the same change batch — latest-wins must be stable
    val base2 = once.select(col("doc_id"), col("version"), lit("upsert").as("op"), col("fp"))
    val twice = Snapshot.mergeSnapshot(base2, Snapshot.changeBatch(docs))
    assert(twice.collect().map(_.toString).sorted.toSeq ===
      once.collect().map(_.toString).sorted.toSeq)
  }

  test("snapshotAtVersion: one-pass log fold == batch-by-batch replay; history not conflated") {
    val base = Snapshot.baseSnapshot(docs)
    val b1 = Snapshot.changeBatch(docs)
    val b2 = Snapshot.changeBatchV2(docs)
    val log = b1.unionByName(b2)
    // composition law: folding the pruned log once equals replaying batches
    val v1Fold = Snapshot.snapshotAtVersion(base, log, 1).cache()
    val v2Fold = Snapshot.snapshotAtVersion(base, log, 2).cache()
    assert(v1Fold.exceptAll(Snapshot.mergeSnapshot(base, b1)).count() === 0)
    val replay = Snapshot.mergeSnapshot(
      v1Fold.select(col("doc_id"), col("version"), lit("upsert").as("op"), col("fp")), b2)
    assert(v2Fold.exceptAll(replay).count() === 0 &&
      replay.exceptAll(v2Fold).count() === 0)
    // upsert-then-delete history: %10==3 docs are PRESENT at v1 (with the
    // v1 fingerprint) and GONE at v2; %10==1 re-crawls only appear at v2
    assert(v1Fold.filter(col("doc_id") % 10 === 3 && col("version") =!= 1).count() === 0)
    assert(v1Fold.filter(col("doc_id") % 10 === 3).count() > 0)
    assert(v2Fold.filter(col("doc_id") % 10 === 3).count() === 0)
    assert(v1Fold.filter(col("doc_id") % 10 === 1 && col("version") =!= 0).count() === 0)
    assert(v2Fold.filter(col("doc_id") % 10 === 1 && col("version") =!= 2).count() === 0)
    // reading at v0 is the base corpus unchanged
    val v0 = Snapshot.snapshotAtVersion(base, log, 0)
    assert(v0.count() === docs.count())
  }

  test("scd2History: interval membership at every v == the time-travel read") {
    val docs = Tables.documents(spark, sfDir)
    val base = Snapshot.baseSnapshot(docs)
    val log = Snapshot.changeBatch(docs).unionByName(Snapshot.changeBatchV2(docs))
    val hist = Snapshot.scd2History(base, log).collect()
    // the SCD2 table and the log fold are two encodings of one history:
    // the rows whose [valid_from, valid_to) interval covers v must be
    // exactly the version-v snapshot, for EVERY v — including v1 where
    // %10==7 docs are tombstoned (history rows, no current row)
    for (v <- 0 to 2) {
      val member = hist
        .filter(r => r.getInt(1) <= v && (r.isNullAt(2) || r.getInt(2) > v))
        .map(r => (r.getLong(0), r.getLong(3))).toSet
      val travel = Snapshot.snapshotAtVersion(base, log, v).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(member === travel, s"interval read diverged at v=$v")
    }
    // a tombstoned doc keeps history but has no current row
    val tombstoned = hist.filter(_.getLong(0) % 10 == 7)
    assert(tombstoned.nonEmpty && tombstoned.forall(_.getInt(4) == 0))
  }
}
