package graft

import org.apache.spark.sql.DataFrame

import graft.ops.{Classifier, Dedup, Packing, SharedCorpus, TextAnalysis}
import graft.sources.Tables

/** The shared token projection must be a pure transport optimization:
  * every operator fed the pinned projection answers bit-identically to the
  * same operator fed the raw parquet table. */
class SharedCorpusSpec extends SparkTestBase {

  private def raw = Tables.documents(spark, sfDir)

  // pin once for the suite; serveShared is restored after each check so
  // other suites (which expect the raw path) are unaffected
  private def pinnedDocs: DataFrame = {
    SharedCorpus.pin(spark, sfDir)
    SharedCorpus.serveShared = true
    SharedCorpus.docsTok(spark, sfDir)
  }

  private def assertSame(f: DataFrame => DataFrame): Unit = {
    val p = pinnedDocs
    try {
      val shared = f(p).collect().toSeq
      SharedCorpus.serveShared = false
      val plain = f(raw).collect().toSeq
      assert(shared === plain)
    } finally SharedCorpus.serveShared = true
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
}
