package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

class StreamOpsSpec extends SparkTestBase {

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("streaming windowed counts equal the batch result (unified transform)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 2, "click", 2.0),
      Event(3, ts(70), 1, "view", 3.0),
      Event(4, ts(130), 2, "click", 4.0))

    val stream = MemoryStream[Event]
    val q = StreamOps.windowedEventCounts(stream.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("win_counts")
        .orderBy("win_start", "event_type").collect()
      val batch = StreamOps.windowedEventCounts(events.toDF())
        .orderBy("win_start", "event_type").collect()
      assert(streamed.toSeq === batch.toSeq)
      assert(streamed.length === 3) // 3 hourly windows (two clicks share one)
    } finally q.stop()
  }

  test("batch windowed counts over the events table are sane") {
    val out = StreamOps.windowedEventCounts(Tables.events(spark, sfDir)).cache()
    assert(out.count() > 0)
    val total = out.agg(sum("n")).collect()(0).getLong(0)
    assert(total === Tables.events(spark, sfDir).count())
  }

  test("sliding counts: streaming equals batch, every event lands in exactly 2 windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0),   // windows -30..30 and 0..60
      Event(2, ts(40), 2, "click", 2.0),  // windows 0..60 and 30..90
      Event(3, ts(70), 1, "view", 3.0))
    val stream = MemoryStream[Event]
    val q = StreamOps.slidingEventCounts(stream.toDF())
      .writeStream.format("memory").queryName("slide_counts")
      .outputMode("complete").start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("slide_counts")
        .orderBy("win_start", "event_type").collect()
      val batch = StreamOps.slidingEventCounts(events.toDF())
        .orderBy("win_start", "event_type").collect()
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
    // 1h windows every 30min: the event count across windows is exactly
    // 2x the event count — each event is in precisely dur/slide windows
    val ev = Tables.events(spark, sfDir)
    val out = StreamOps.slidingEventCounts(ev).cache()
    assert(out.agg(sum("n")).first().getLong(0) === 2 * ev.count())
    // and the tumbling gate's rows are the k=0 half of the slide grid:
    // every tumbling window start appears among the sliding starts
    val tumbling = StreamOps.windowedEventCounts(ev).select("win_start").distinct()
    assert(tumbling.join(out.select("win_start").distinct(),
      Seq("win_start"), "left_anti").count() === 0)
  }

  test("rateLimit: quota bites across micro-batches; streaming equals the batch window formula") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // user 1 fires 5 events inside one hour window, user 2 fires 2
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "click", 1.0),
      Event(3, ts(10), 1, "click", 1.0), Event(4, ts(15), 1, "click", 1.0),
      Event(5, ts(20), 1, "click", 1.0),
      Event(6, ts(2), 2, "view", 1.0), Event(7, ts(8), 2, "view", 1.0))
    val batch = StreamOps.rateLimit(events.toDS(), n = 3, windowMs = 3600000L)
      .collect().map(_.event_id).toSet
    assert(batch === Set(1L, 2L, 3L, 6L, 7L),
      "first 3 of user 1 admitted, user 2 untouched")
    // streaming, split mid-window: the admitted count must carry across
    // micro-batches (events 4 and 5 are rejected by STATE, not by sort)
    val stream = MemoryStream[Event]
    val q = StreamOps.rateLimit(stream.toDS(), n = 3, windowMs = 3600000L)
      .writeStream.format("memory").queryName("rate_admit")
      .outputMode("append").start()
    try {
      stream.addData(events.take(3): _*) // user-1 events 1..3 admitted
      q.processAllAvailable()
      stream.addData(events.drop(3): _*) // 4, 5 must be rejected; 6, 7 admitted
      q.processAllAvailable()
      val streamed = spark.table("rate_admit").collect().map(_.getLong(0)).toSet
      assert(streamed === batch, s"stream admitted $streamed, batch $batch")
    } finally q.stop()
  }

  test("rateLimit drops late events for expired windows instead of re-admitting") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Event]
    val q = StreamOps.rateLimit(stream.toDS(), n = 1, windowMs = 3600000L)
      .writeStream.format("memory").queryName("rate_late")
      .outputMode("append").start()
    try {
      // batch 1: user 1 fills its window's quota (n=1); a far-future event
      // pushes the watermark past that window's end
      stream.addData(Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(200), 9, "click", 1.0))
      q.processAllAvailable()
      // batch 2: unrelated traffic — the expired (user 1, window 0) state
      // times out and is evicted during this batch
      stream.addData(Event(4, ts(215), 8, "click", 1.0))
      q.processAllAvailable()
      // batch 3: a LATE event for the expired window. With no surviving
      // state a naive fold restarts the count at 0 and re-admits —
      // exceeding the quota (ADVICE r13). It must be dropped outright.
      stream.addData(Event(5, ts(1), 1, "click", 1.0))
      q.processAllAvailable()
      val admitted = spark.table("rate_late").collect().map(_.getLong(0)).toSet
      assert(admitted === Set(1L, 2L, 4L),
        s"late event for an expired window must be dropped, got $admitted")
    } finally q.stop()
  }

  test("sessionize on batch input closes gap sessions AND flushes final sessions") {
    import spark.implicits._
    // user 1: events at t0, t10, then t60 (gap > 30 min) -> two sessions
    // user 2: single event -> one session (batch sees complete data)
    val events = Seq(
      Event(1, ts(0), 1, "a", 1.0),
      Event(2, ts(10), 1, "a", 2.0),
      Event(3, ts(60), 1, "a", 4.0),
      Event(4, ts(0), 2, "b", 8.0)).toDS()
    val sessions = StreamOps.sessionize(events).collect().sortBy(s => (s.user_id, s.start_ts.getTime))
    assert(sessions.length === 3)
    assert(sessions(0).user_id === 1 && sessions(0).n_events === 2 && sessions(0).sum_value === 3.0)
    assert(sessions(0).start_ts === ts(0) && sessions(0).end_ts === ts(10))
    assert(sessions(1).user_id === 1 && sessions(1).n_events === 1 && sessions(1).sum_value === 4.0)
    assert(sessions(2).user_id === 2 && sessions(2).n_events === 1)
  }

  test("sessionize(batch) agrees with sessionizeBatch on the events table") {
    import spark.implicits._
    val raw = Tables.events(spark, sfDir)
    val typed = raw.select("event_id", "ts", "user_id", "event_type", "value").as[Event]
    val viaState = StreamOps.sessionize(typed)
      .select("user_id", "start_ts", "end_ts", "n_events")
      .orderBy("user_id", "start_ts").collect()
    val viaWindows = StreamOps.sessionizeBatch(raw)
      .select("user_id", "start_ts", "end_ts", "n_events")
      .orderBy("user_id", "start_ts").collect()
    assert(viaState.toSeq === viaWindows.toSeq)
  }

  test("native session_window form equals the cumulative form on the events table") {
    val raw = Tables.events(spark, sfDir)
    val native = StreamOps.sessionizeNative(raw).collect()
    val cumulative = StreamOps.sessionizeBatch(raw).collect()
    assert(native.toSeq === cumulative.toSeq)
    // the corpus carries no exact-gap ties (the one input where the two
    // forms legitimately differ) — assert that precondition so a testdata
    // regen that introduces one fails HERE with a message, not as an
    // opaque oracle hash mismatch
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val exactGap = raw
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(expr("unix_micros(ts) - unix_micros(prev)") === 30L * 60 * 1000 * 1000)
      .count()
    assert(exactGap === 0, "corpus gained an exact-gap tie; forms now differ by contract")
  }

  test("streaming sessionize emits a session when the event-time timeout fires") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Event]
    val q = StreamOps.sessionize(stream.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1 has two events within the gap — session stays open
      stream.addData(Event(1, ts(0), 1, "a", 1.0), Event(2, ts(10), 1, "a", 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() === 0, "session still open")
      // batch 2: a much later event advances the watermark (1h delay) far
      // past user 1's last event + gap -> the event-time timeout fires
      stream.addData(Event(3, ts(300), 2, "b", 4.0))
      q.processAllAvailable()
      // one more micro-batch so timeouts scheduled against the new
      // watermark actually execute
      stream.addData(Event(4, ts(301), 2, "b", 8.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions_out").collect()
      assert(sessions.length === 1)
      val s = sessions(0)
      assert(s.getLong(0) === 1L && s.getLong(3) === 2L && s.getDouble(4) === 3.0)
    } finally q.stop()
  }

  test("streaming dedupEvents drops duplicate event ids across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Event]
    val q = StreamOps.dedupEvents(stream.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData(Event(1, ts(0), 1, "a", 1.0), Event(1, ts(0), 1, "a", 1.0))
      q.processAllAvailable()
      // same id arriving again in a LATER micro-batch is also dropped
      stream.addData(Event(1, ts(1), 1, "a", 1.0), Event(2, ts(1), 1, "a", 2.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch result (unified transform)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0),     // joined by purchase at t30
      Event(2, ts(30), 1, "purchase", 5.0),
      Event(3, ts(10), 2, "click", 2.0),    // purchase 100 min later: out of window
      Event(4, ts(110), 2, "purchase", 6.0),
      Event(5, ts(90), 1, "click", 3.0),    // no purchase after it
      Event(6, ts(40), 3, "purchase", 7.0)) // purchase with no click
    val stream = MemoryStream[Event]
    val q = StreamOps.intervalJoin(stream.toDF())
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("ij_out").orderBy("l_id", "r_id").collect()
      val batch = StreamOps.intervalJoin(events.toDF())
        .orderBy("l_id", "r_id").collect()
      assert(streamed.toSeq === batch.toSeq)
      // only user 1's click(t0)->purchase(t30) pair is within the hour
      assert(batch.map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((1L, 2L)))
    } finally q.stop()
  }

  test("exactly-once file sink: batches land once, replays do not duplicate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("graft-eos").resolve("out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-eos-ck").toString
    val stream = MemoryStream[Event]
    val q = StreamOps.startExactlyOnceFileSink(stream.toDF(), outDir, ckDir)
    try {
      stream.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      stream.addData(Event(3, ts(2), 2, "click", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val written = spark.read.parquet(outDir)
    assert(written.count() === 3, "every event written exactly once")
    assert(written.select("event_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    // a replayed batch (at-least-once delivery) rewrites its directory
    // instead of appending — count unchanged after the manual replay
    val replay = Seq(Event(3, ts(2), 2, "click", 3.0)).toDF()
    // partition discovery infers batch_id as int — cast for the Long api
    val lastBatch = written.select(max(col("batch_id").cast("long"))).collect()(0).getLong(0)
    StreamOps.writeBatchIdempotent(replay, outDir, lastBatch)
    assert(spark.read.parquet(outDir).count() === 3, "replay does not duplicate")
  }

  test("staged stream batches absorb into the LSH index once; probe equals one-shot build") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val outDir = java.nio.file.Files.createTempDirectory("graft-ing").resolve("stage").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ing-ck").toString
    val stream = MemoryStream[(Long, Seq[Float])]
    try {
      // two micro-batches land exactly-once in batch_id dirs
      val rows = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
      val (b1, b2) = rows.partition(_._1 % 2 == 0)
      val q = StreamOps.startExactlyOnceFileSink(
        stream.toDF().toDF("vec_id", "embedding"), outDir, ckDir)
      try {
        stream.addData(b1); q.processAllAvailable()
        stream.addData(b2); q.processAllAvailable()
      } finally q.stop()
      // absorb stages into the index; a second call is a no-op
      def appendBatch(df: org.apache.spark.sql.DataFrame): Unit =
        graft.ops.Similarity.appendToLshIndex(
          df.select(col("vec_id"), col("embedding").cast("array<float>").as("embedding")),
          "graft_lsh_ing_spec")
      val absorbed = StreamOps.absorbStagedBatches(spark, outDir, "graft_lsh_ing_ledger")(appendBatch)
      assert(absorbed.size === 2, s"both staged batches absorb: $absorbed")
      val again = StreamOps.absorbStagedBatches(spark, outDir, "graft_lsh_ing_ledger")(appendBatch)
      assert(again.isEmpty, "re-running the maintenance job absorbs nothing")
      // retention: a staged-but-unabsorbed batch survives vacuum, absorbed
      // dirs are reclaimed, and a second vacuum is a no-op
      val unabsorbedDir = new java.io.File(s"$outDir/batch_id=99")
      unabsorbedDir.mkdirs()
      val vacuumed = StreamOps.vacuumAbsorbedBatches(spark, outDir, "graft_lsh_ing_ledger")
      assert(vacuumed === absorbed.sorted, s"vacuum reclaims exactly the absorbed ids: $vacuumed")
      assert(unabsorbedDir.exists(), "a not-yet-absorbed batch must survive vacuum")
      assert(!new java.io.File(s"$outDir/batch_id=${absorbed.head}").exists())
      assert(StreamOps.vacuumAbsorbedBatches(spark, outDir, "graft_lsh_ing_ledger").isEmpty,
        "second vacuum is a no-op")
      // the streamed-ingest index answers exactly like the one-shot build
      val viaStream = graft.ops.Similarity.lshTopKIndexed(
        spark, "graft_lsh_ing_spec", col("vec_id") < 5)
      val fresh = graft.ops.Similarity.lshTopK(emb, col("vec_id") < 5)
      assert(viaStream.collect().map(_.toString).sorted.toSeq === fresh.collect().map(_.toString).sorted.toSeq)
    } finally {
      Seq("graft_lsh_ing_spec", "graft_lsh_ing_ledger")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("staged stream batches absorb into the composed IVF×PQ index") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val outDir = java.nio.file.Files.createTempDirectory("graft-ivfpq-ing").resolve("stage").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ivfpq-ing-ck").toString
    val stream = MemoryStream[(Long, Seq[Float])]
    try {
      // the production lifecycle end to end: models published once, the
      // stream staged exactly-once, the maintenance job assigning AND
      // encoding each batch against the published models
      graft.ops.Similarity.buildIvfPqModels(emb, "graft_ivfpq_ing")
      val rows = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
      val (b1, b2) = rows.partition(_._1 % 2 == 0)
      val q = StreamOps.startExactlyOnceFileSink(
        stream.toDF().toDF("vec_id", "embedding"), outDir, ckDir)
      try {
        stream.addData(b1); q.processAllAvailable()
        stream.addData(b2); q.processAllAvailable()
      } finally q.stop()
      def appendBatch(df: org.apache.spark.sql.DataFrame): Unit =
        graft.ops.Similarity.appendToIvfPqIndex(spark,
          df.select(col("vec_id"), col("embedding").cast("array<float>").as("embedding")),
          "graft_ivfpq_ing")
      val absorbed = StreamOps.absorbStagedBatches(
        spark, outDir, "graft_ivfpq_ing_ledger")(appendBatch)
      assert(absorbed.size === 2)
      assert(StreamOps.absorbStagedBatches(
        spark, outDir, "graft_ivfpq_ing_ledger")(appendBatch).isEmpty)
      // the streamed-ingest composed index answers exactly like a one-shot
      // build (training is deterministic, so the models coincide)
      graft.ops.Similarity.buildIvfPqIndex(emb, "graft_ivfpq_ing_ref")
      val qdf = emb.filter(col("vec_id") < 5)
      val viaStream = graft.ops.Similarity
        .ivfPqTopKIndexed(spark, "graft_ivfpq_ing", qdf).collect().toSeq
      val oneShot = graft.ops.Similarity
        .ivfPqTopKIndexed(spark, "graft_ivfpq_ing_ref", qdf).collect().toSeq
      assert(viaStream === oneShot)
    } finally {
      Seq("graft_ivfpq_ing", "graft_ivfpq_ing_pivots", "graft_ivfpq_ing_books",
        "graft_ivfpq_ing_ledger", "graft_ivfpq_ing_ref",
        "graft_ivfpq_ing_ref_pivots", "graft_ivfpq_ing_ref_books")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("streaming near-dup admission: batch parity and TTL state eviction") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamOps.DocBand
    val docs = Tables.documents(spark, sfDir)
    // batch path of the unified transform == the declarative batch twin
    val bands = graft.ops.Dedup.bandedMinHash(docs)
      .withColumn("ts", expr("timestamp_seconds(1700000000 + doc_id)"))
      .select("doc_id", "ts", "band_idx", "band_hash").as[DocBand]
    val expected = graft.ops.Dedup.nearDupAdmit(docs)
      .collect().map(_.getLong(0)).toSet
    val viaState = graft.streaming.StreamOps.streamNearDupAdmitted(bands)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaState === expected)
    assert(viaState.size < docs.count(), "planted near-dups must be rejected")
    // batch parity must hold even when timestamps are INCONSISTENT with
    // doc_id order — batch mode settles claims in canonical doc_id order,
    // not pseudo-arrival order
    val tsReversed = graft.ops.Dedup.bandedMinHash(docs)
      .withColumn("ts", expr("timestamp_seconds(1700000000 - doc_id)"))
      .select("doc_id", "ts", "band_idx", "band_hash").as[DocBand]
    val viaStateRev = graft.streaming.StreamOps.streamNearDupAdmitted(tsReversed)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaStateRev === expected)

    // streaming path: one ordered batch of the full corpus, then a flush
    // record far in the future to push the watermark past every document
    val inputs = bands.orderBy("doc_id").collect().toSeq
    val stream = MemoryStream[DocBand]
    val guardKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val q = StreamOps.withChainedStateGuardBypassed(spark) {
      graft.streaming.StreamOps
        .streamNearDupAdmitted(stream.toDS(), delay = "1 second", ttlMs = 3600000L)
        .writeStream.format("memory").queryName("admit_out")
        .outputMode("append").start()
    }
    // the bypass is scoped to start(): the session guard is back at its
    // default while the admission query keeps running
    assert(spark.conf.get(guardKey, "true") === "true",
      "static stateful-operator guard must be restored after start()")
    try {
      stream.addData(inputs: _*)
      q.processAllAvailable()
      val farTs = 1700000000000L + 100L * 24 * 3600 * 1000
      def at(offsetMs: Long) = new Timestamp(farTs + offsetMs)
      // two far-future batches: the first advances the watermark past every
      // band's TTL, the second actually fires the pending timeouts (a
      // group's timeout only executes in a batch where it receives NO data,
      // so the eviction needs its own quiet batch)
      stream.addData(DocBand(900101L, at(0), 0, "flush-a"))
      q.processAllAvailable()
      stream.addData(DocBand(900102L, at(10000), 0, "flush-b"))
      q.processAllAvailable()
      // reuses doc 0's band_hash: doc 0's claim sat longer than the TTL in
      // event time, so its band state was evicted and the late doc with a
      // previously-claimed band is admitted fresh — watermark-bounded
      // state, observed from the outside
      stream.addData(DocBand(900001L, at(20000), inputs.head.band_idx, inputs.head.band_hash))
      q.processAllAvailable()
      stream.addData(DocBand(900103L, at(40000), 0, "flush-c"))
      q.processAllAvailable()
      val extras = Set(900001L, 900101L, 900102L, 900103L)
      val streamed = spark.table("admit_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert((streamed -- extras) === expected,
        "single ordered batch must reproduce the batch admission set")
      assert(streamed.contains(900001L),
        "band state must be TTL-evicted after the watermark passes")
    } finally q.stop()
  }

  test("quality-gated admission: gate is stateless/stream-safe; composition has MemoryStream parity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamOps.DocBand
    val docs = Tables.documents(spark, sfDir)
    // the quality gate is a pure row-local filter: applied to a STREAMING
    // frame it plans without any stateful operator (no watermark needed)
    val docStream = MemoryStream[(Long, String)]
    val streamingDocs = docStream.toDF().toDF("doc_id", "text")
    val gatedStream = graft.ops.Curation.qualityGate(streamingDocs)
    assert(gatedStream.isStreaming, "gate must preserve streaming-ness")
    assert(gatedStream.columns.toSeq === Seq("doc_id", "text"))
    // batch twin of the composition (the stream_curation_admit gate)
    val gated = graft.ops.Curation.qualityGate(docs)
    val expected = graft.ops.Dedup.nearDupAdmit(gated)
      .collect().map(_.getLong(0)).toSet
    // the composition is NOT a post-filter of the ungated admission:
    // dropping low-quality band owners must admit at least one doc the
    // ungated rule rejected (otherwise this gate tests nothing new)
    val ungated = graft.ops.Dedup.nearDupAdmit(docs)
      .collect().map(_.getLong(0)).toSet
    val gatedIds = gated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expected !== (ungated & gatedIds),
      "composition must differ from post-filtering the ungated admission")
    // streaming path: gated docs banded upstream (the DocBand wire format),
    // one ordered batch + a flush record to push the watermark
    val bands = graft.ops.Dedup.bandedMinHash(gated)
      .withColumn("ts", expr("timestamp_seconds(1700000000 + doc_id)"))
      .select("doc_id", "ts", "band_idx", "band_hash").as[DocBand]
    val inputs = bands.orderBy("doc_id").collect().toSeq
    val stream = MemoryStream[DocBand]
    val q = StreamOps.withChainedStateGuardBypassed(spark) {
      graft.streaming.StreamOps
        .streamNearDupAdmitted(stream.toDS(), delay = "1 second")
        .writeStream.format("memory").queryName("qadmit_out")
        .outputMode("append").start()
    }
    try {
      stream.addData(inputs: _*)
      q.processAllAvailable()
      val farTs = 1700000000000L + 100L * 24 * 3600 * 1000
      stream.addData(DocBand(900201L, new Timestamp(farTs), 0, "flush-q"))
      q.processAllAvailable()
      val streamed = spark.table("qadmit_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert((streamed - 900201L) === expected,
        "streamed quality-gated admission must equal the batch composition")
    } finally q.stop()
  }

  test("streaming decontamination: batch parity with decontaminate, watermark emission") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val all = Tables.documents(spark, sfDir)
    val train = all.filter(col("doc_id") % 7 =!= 0)
    val bench = all.filter(col("doc_id") % 7 === 0)
    val expected = graft.ops.Dedup.decontaminate(train, bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty, "some training docs must survive")
    assert(expected.size < train.count(), "the strict rule must reject something")
    // batch mode of the unified transform == the batch decontaminate rule
    val viaBatch = graft.streaming.StreamOps.streamDecontaminated(
      train.withColumn("ts", expr("timestamp_seconds(1700000000 + doc_id)")), bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaBatch === expected, "batch mode must equal decontaminate")
    // streaming path: the crawl arrives as one batch, then a far-future
    // row pushes the watermark past every document so verdicts emit
    val inputs = train
      .withColumn("ts", expr("timestamp_seconds(1700000000 + doc_id)"))
      .select(col("doc_id"), col("ts"), col("text"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSeq
    val stream = MemoryStream[(Long, Timestamp, String)]
    val q = graft.streaming.StreamOps.streamDecontaminated(
      stream.toDS().toDF("doc_id", "ts", "text"), bench, delay = "1 second")
      .writeStream.format("memory").queryName("decontam_out")
      .outputMode("append").start()
    try {
      stream.addData(inputs: _*)
      q.processAllAvailable()
      val farTs = 1700000000000L + 100L * 24 * 3600 * 1000
      stream.addData((999999L, new Timestamp(farTs), "flush row"))
      q.processAllAvailable()
      val streamed = spark.table("decontam_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // the flush row's own verdict stays pending behind the watermark, so
      // the emitted set IS the batch answer — no extras to subtract
      assert(streamed === expected,
        "streamed admission set must equal the batch decontaminate set")
    } finally q.stop()
  }

  test("streaming quality scoring: stateless projection equals the batch scorer") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    // 4 training rounds keep the spec fast — serve-side parity is
    // independent of training depth
    val w = graft.ops.Classifier.train(docs, iters = 4).last
    val expected = graft.ops.Classifier.scores(docs, w)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    val inputs = docs
      .withColumn("ts", expr("timestamp_seconds(1700000000 + doc_id)"))
      .select("doc_id", "ts", "text").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSeq
    val stream = MemoryStream[(Long, Timestamp, String)]
    val q = graft.streaming.StreamOps.streamQualityScored(
      stream.toDS().toDF("doc_id", "ts", "text"), w)
      .writeStream.format("memory").queryName("clf_out")
      .outputMode("append").start()
    try {
      stream.addData(inputs: _*)
      q.processAllAvailable()
      val streamed = spark.table("clf_out")
        .select("doc_id", "p", "pred", "label")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed === expected,
        "stateless streaming scorer must equal the batch scorer exactly")
    } finally q.stop()
  }

  test("streaming tombstone filter: stateless anti-join equals the batch filter") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val tombstones = docs.filter(col("doc_id") % 11 === 5).select("doc_id")
    val expected = docs.join(tombstones, Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expected.size < docs.count(), "the tombstone list must be non-empty")
    val inputs = docs
      .withColumn("ts", expr("timestamp_seconds(1700000000 + doc_id)"))
      .select("doc_id", "ts", "text").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSeq
    val stream = MemoryStream[(Long, Timestamp, String)]
    val q = graft.streaming.StreamOps.streamTombstoneFiltered(
      stream.toDS().toDF("doc_id", "ts", "text"), tombstones)
      .writeStream.format("memory").queryName("tomb_out")
      .outputMode("append").start()
    try {
      stream.addData(inputs: _*)
      q.processAllAvailable()
      // re-deliver a tombstoned doc (the resurfacing re-crawl): it must
      // be dropped again — the static verdict is per-row, replay-stable
      stream.addData(inputs.filter(_._1 % 11 == 5).take(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("tomb_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed === expected,
        "streamed admission must equal the batch anti-join, replays included")
    } finally q.stop()
  }

  test("streaming snapshot merge: final state matches the batch merge, replays emit nothing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ops.Snapshot
    import graft.streaming.StreamOps.DocChange

    val docs = Tables.documents(spark, sfDir)
    val base = Snapshot.baseSnapshot(docs)
    val batchMerged = Snapshot.mergeSnapshot(base, Snapshot.changeBatch(docs))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    def changesOf(df: org.apache.spark.sql.DataFrame): Seq[DocChange] =
      df.collect().map(r => DocChange(r.getLong(0), r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq

    val stream = MemoryStream[DocChange]
    val q = StreamOps.streamSnapshotMerge(stream.toDS())
      .writeStream.format("memory").queryName("snap_merge")
      .outputMode("append").start()
    try {
      // microbatch 1: the base snapshot; 2: the CDC batch; 3: a full replay
      // of the CDC batch (at-least-once delivery) — must emit zero new rows
      stream.addData(changesOf(base): _*)
      q.processAllAvailable()
      stream.addData(changesOf(Snapshot.changeBatch(docs)): _*)
      q.processAllAvailable()
      val afterCdc = spark.table("snap_merge").count()
      stream.addData(changesOf(Snapshot.changeBatch(docs)): _*)
      q.processAllAvailable()
      assert(spark.table("snap_merge").count() === afterCdc, "replay re-emitted rows")

      // reconstruct the live snapshot: winning (max-version) row per doc,
      // tombstones excluded — must equal the batch merge exactly
      val emitted = spark.table("snap_merge")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
      val live = emitted.groupBy(_._1).values.map(_.maxBy(_._2))
        .filter(_._3 == "upsert").map(r => (r._1, r._2, r._4.get)).toSet
      assert(live === batchMerged)
    } finally q.stop()
  }

  test("streaming snapshot merge resolves same-version conflicts like the batch struct max") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ops.Snapshot
    import graft.streaming.StreamOps.DocChange
    // same version, delete vs upsert, both arrival orders in ONE microbatch:
    // batch-side max(struct(version, op, fp)) keeps the upsert ('u' > 'd')
    val conflicting = Seq(
      DocChange(1L, 1, "delete", None), DocChange(1L, 1, "upsert", Some(42L)),
      DocChange(2L, 1, "upsert", Some(7L)), DocChange(2L, 1, "delete", None))
    val base = Seq(DocChange(1L, 1, "delete", None), DocChange(2L, 1, "upsert", Some(7L)))
      .toDF("doc_id", "version", "op", "fp")
    val batchWinners = Snapshot.mergeSnapshot(base,
      Seq(DocChange(1L, 1, "upsert", Some(42L)), DocChange(2L, 1, "delete", None))
        .toDF("doc_id", "version", "op", "fp"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet

    val stream = MemoryStream[DocChange]
    val q = StreamOps.streamSnapshotMerge(stream.toDS())
      .writeStream.format("memory").queryName("snap_conflict")
      .outputMode("append").start()
    try {
      stream.addData(conflicting: _*)
      q.processAllAvailable()
      val live = spark.table("snap_conflict")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .groupBy(_._1).values.map(_.maxBy(x => (x._2, x._3, x._4.isDefined, x._4.getOrElse(0L))))
        .filter(_._3 == "upsert").map(r => (r._1, r._4.get)).toSet
      assert(live === batchWinners)
      assert(live === Set((1L, 42L), (2L, 7L)), "upsert must beat delete on version ties")
    } finally q.stop()
  }

  test("sessionizeBatch matches hand-computed sessions and counts all events") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, ts(0), 1.0),
      (2L, 1L, ts(10), 2.0),
      (3L, 1L, ts(60), 4.0),
      (4L, 2L, ts(0), 8.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = StreamOps.sessionizeBatch(df).collect()
    assert(out.length === 3) // user1: 2 sessions, user2: 1
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getLong(4)).toSeq === Seq(2L, 1L))
    // corpus-level: session event counts partition the event set
    val corpus = StreamOps.sessionizeBatch(Tables.events(spark, sfDir))
    assert(corpus.agg(sum("n_events")).collect()(0).getLong(0) ===
      Tables.events(spark, sfDir).count())
  }

  test("streaming anomaly flags equal the batch probe; baseline append is additive") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.ops.Relational
    // 10 uniform history days of 10 events for type 'a' → σ=0, so ANY
    // probe count above the mean must flag and the mean itself must not
    val hist = (for (d <- 1 to 10; i <- 1 to 10) yield
      (d * 100L + i, Timestamp.valueOf(f"2024-03-$d%02d 00:00:${i % 60}%02d"), "a"))
      .toDF("event_id", "ts", "event_type")
    Relational.buildAnomalyBaseline(hist.filter(col("ts") < "2024-03-06"), "t_anom_spec")
    Relational.appendToAnomalyBaseline(hist.filter(col("ts") >= "2024-03-06"), "t_anom_spec")
    Relational.buildAnomalyBaseline(hist, "t_anom_one")
    val probe = Seq(
      ("a", java.sql.Date.valueOf("2024-03-21"), 10L),
      ("a", java.sql.Date.valueOf("2024-03-22"), 11L),
      ("a", java.sql.Date.valueOf("2024-03-23"), 3L)
    ).toDF("event_type", "day", "x")
    val batch = Relational.anomalyFlagIndexed(spark, "t_anom_spec", probe)
      .collect().map(r => r.getDate(1).toString -> r.getInt(3)).toMap
    assert(batch === Map("2024-03-21" -> 0, "2024-03-22" -> 1, "2024-03-23" -> 0),
      s"zero-variance baseline verdicts wrong: $batch")
    // append == one-shot through the stored moments
    val oneShot = Relational.anomalyFlagIndexed(spark, "t_anom_one", probe)
      .collect().map(_.toString).sorted.toSeq
    val folded = Relational.anomalyFlagIndexed(spark, "t_anom_spec", probe)
      .collect().map(_.toString).sorted.toSeq
    assert(oneShot === folded, "moment append diverged from one-shot")
    // streaming twin: same verdicts from a MemoryStream of rollups
    val stream = MemoryStream[(String, java.sql.Date, Long)]
    val q = StreamOps.streamAnomalyFlagged(spark,
        stream.toDF().toDF("event_type", "day", "x"), "t_anom_spec")
      .writeStream.format("memory").queryName("anom_out")
      .outputMode("append").start()
    try {
      stream.addData(("a", java.sql.Date.valueOf("2024-03-21"), 10L),
        ("a", java.sql.Date.valueOf("2024-03-22"), 11L),
        ("a", java.sql.Date.valueOf("2024-03-23"), 3L))
      q.processAllAvailable()
      val streamed = spark.table("anom_out")
        .collect().map(r => r.getDate(1).toString -> r.getInt(3)).toMap
      assert(streamed === batch, "streamed verdicts diverged from batch")
    } finally q.stop()
  }

  test("absorb crash window: at-least-once replay, ledger never double-commits") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-absorb-fip").toString
    val ledger = "t_absorb_fip_ledger"
    try {
      // two staged exactly-once batches, written directly (the sink's
      // layout contract — batch_id=N dirs — is all absorb consumes)
      Seq(10L, 11L).toDF("doc_id").write.parquet(s"$dir/batch_id=0")
      Seq(12L).toDF("doc_id").write.parquet(s"$dir/batch_id=1")
      var appends = 0
      def append(df: org.apache.spark.sql.DataFrame): Unit = { appends += 1; df.count() }
      // die between batch 0's append and its ledger commit — the
      // documented at-least-once window (StreamOps.scala)
      graft.sources.Formats.failpoint = "absorb.after_append"
      intercept[RuntimeException](
        StreamOps.absorbStagedBatches(spark, dir, ledger)(append(_)))
      graft.sources.Formats.failpoint = ""
      assert(appends === 1, "crash fired after exactly one append")
      assert(!spark.catalog.tableExists(ledger),
        "nothing may be ledger-committed before its append completed")
      // recovery = re-run: the crashed batch REPLAYS (at-least-once, as
      // documented), batch 1 absorbs once, and the ledger converges with
      // each id exactly once
      val ids = StreamOps.absorbStagedBatches(spark, dir, ledger)(append(_))
      assert(ids === Seq(0L, 1L))
      assert(appends === 3, s"batch 0 twice (replay) + batch 1 once, got $appends")
      val committed = spark.table(ledger).collect().map(_.getLong(0)).sorted
      assert(committed.toSeq === Seq(0L, 1L), "ledger holds each id exactly once")
      // converged: a further run is a no-op
      assert(StreamOps.absorbStagedBatches(spark, dir, ledger)(append(_)).isEmpty)
      assert(appends === 3)
    } finally {
      graft.sources.Formats.failpoint = ""
      spark.sql(s"DROP TABLE IF EXISTS $ledger")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
