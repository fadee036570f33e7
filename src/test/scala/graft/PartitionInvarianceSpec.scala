package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.ops.{Dedup, Packing, Sampling, Similarity, Snapshot, TextAnalysis}
import graft.sources.Tables

/** Partition-count invariance: operator results must not depend on how the
  * input happens to be laid out across partitions — on a real cluster the
  * partitioning changes with file sizes, AQE decisions, retries, and
  * speculative execution, so any layout-sensitive result is a latent
  * nondeterminism bug at 100 TB. Each case runs the same operator over
  * 1-partition and many-partition copies of the same input and demands
  * identical results. */
class PartitionInvarianceSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, sfDir)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def invariant(name: String)(op: DataFrame => DataFrame): Unit = {
    val narrow = op(docs.repartition(1))
    val wide = op(docs.repartition(13))
    assert(sortedRows(narrow) === sortedRows(wide), s"$name is layout-sensitive")
  }

  test("exact dedup is partition-count invariant") {
    invariant("exactDedup")(Dedup.exactDedup)
  }

  test("minhash pairs are partition-count invariant") {
    invariant("minHashPairs")(Dedup.minHashPairs(_))
  }

  test("simhash fingerprints are partition-count invariant") {
    invariant("simHash")(Dedup.simHash)
  }

  test("hash sampling is partition-count invariant (retry-stable)") {
    invariant("hashSample")(Sampling.hashSample(_, "doc_id", 10))
  }

  test("tf-idf is partition-count invariant (quantized log + exact counts)") {
    invariant("tfIdf")(TextAnalysis.tfIdf)
  }

  test("capped n-gram jaccard pairs are partition-count invariant") {
    // the df-prefilter + posting-list explode path: the cap decision and
    // the pair multiset must not depend on how shingles land in partitions
    invariant("ngramJaccardPairs")(Dedup.ngramJaccardPairs(_))
  }

  test("near-dup survivors are partition-count invariant (driver union-find tier)") {
    invariant("nearDupSurvivors/driver")(Dedup.nearDupSurvivors(_))
  }

  test("near-dup survivors are partition-count invariant (distributed label tier)") {
    // maxDriverEdges = -1 forces pointer-jumping label propagation — the
    // tier whose convergence loop actually runs on a cluster
    invariant("nearDupSurvivors/distributed")(Dedup.nearDupSurvivors(_, maxDriverEdges = -1L))
  }

  test("quality-aware survivors are partition-count invariant") {
    invariant("nearDupSurvivorsBy")(
      Dedup.nearDupSurvivorsBy(_, TextAnalysis.qualityCol))
  }

  test("greedy near-dup admission is partition-count invariant") {
    invariant("nearDupAdmit")(Dedup.nearDupAdmit)
  }

  test("span rewrite is partition-count invariant (global ownership argmin)") {
    invariant("removeDuplicateSpans")(Dedup.removeDuplicateSpans(_))
  }

  test("contamination stats are partition-count invariant") {
    invariant("contaminationStats")(d =>
      Dedup.contaminationStats(
        d.filter(col("doc_id") % 7 =!= 0), d.filter(col("doc_id") % 7 === 0)))
  }

  test("pii redaction is partition-count invariant") {
    invariant("redactPii")(TextAnalysis.redactPii)
  }

  test("bigram-LM scoring is partition-count invariant (quantized float mean)") {
    invariant("lmScore")(TextAnalysis.lmScore)
  }

  test("repetition stats are partition-count invariant (exact count fractions)") {
    invariant("repetitionStats")(TextAnalysis.repetitionStats)
  }

  test("filter funnel is partition-count invariant (conditional count aggregate)") {
    invariant("filterFunnel")(TextAnalysis.filterFunnel(_))
  }

  test("sequence packing is partition-count invariant (per-bucket running sums)") {
    invariant("packSequences")(Packing.packSequences(_))
  }

  test("token-budget sampling is partition-count invariant (per-source prefix)") {
    invariant("tokenBudgetSample")(Packing.tokenBudgetSample(_))
  }

  test("salted token-budget sampling is partition-count invariant") {
    invariant("tokenBudgetSampleSalted")(Packing.tokenBudgetSampleSalted(_))
  }

  test("document chunking is partition-count invariant (pure projection)") {
    invariant("chunkDocuments")(Packing.chunkDocuments(_))
  }

  test("nfc normalization is partition-count invariant (pure projection)") {
    invariant("normalizeText")(TextAnalysis.normalizeText)
  }

  test("hash-embed featurization is partition-count invariant (exact votes)") {
    invariant("hashEmbed")(TextAnalysis.hashEmbed(_))
  }

  test("textRank is partition-count invariant (fixed-point integer iterations)") {
    invariant("textRank")(TextAnalysis.textRank(_))
  }

  test("trained quality classifier is partition-count invariant (integer gradients)") {
    invariant("qualityClassifier")(graft.ops.Classifier.qualityClassifier(_))
  }

  test("bm25 search is partition-count invariant (quantized score, id tiebreak)") {
    invariant("bm25Search")(
      TextAnalysis.bm25Search(_, Seq("spark", "window", "join")))
  }

  test("source mixing is partition-count invariant (source-level float, integer walk)") {
    invariant("sourceMixSample")(Packing.sourceMixSample(_))
  }

  test("streaming decontamination batch mode is partition-count invariant") {
    invariant("streamDecontaminated") { d =>
      graft.streaming.StreamOps.streamDecontaminated(
        d.filter(col("doc_id") % 7 =!= 0)
          .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(col("doc_id"))),
        d.filter(col("doc_id") % 7 === 0))
    }
  }

  test("snapshot merge is partition-count invariant (argmax keep-one)") {
    invariant("mergeSnapshot")(d =>
      Snapshot.mergeSnapshot(Snapshot.baseSnapshot(d), Snapshot.changeBatch(d)))
  }

  test("snapshot diff is partition-count invariant (full-outer fp compare)") {
    invariant("diffSnapshots") { d =>
      val base = Snapshot.baseSnapshot(d)
      Snapshot.diffSnapshots(base,
        Snapshot.mergeSnapshot(base, Snapshot.changeBatch(d)))
    }
  }

  test("cross-corpus near-dup join is partition-count invariant") {
    invariant("crossCorpusNearDups")(d =>
      Dedup.crossCorpusNearDups(
        d.filter(col("doc_id") % 3 =!= 0), d.filter(col("doc_id") % 3 === 0)))
  }

  test("k-means IVF top-k is partition-count invariant (fixed-point centroids)") {
    def embs = Tables.embeddings(spark, sfDir)
    val narrow = Similarity.ivfTopKKmeans(embs.repartition(1), col("vec_id") < 10)
    val wide = Similarity.ivfTopKKmeans(embs.repartition(13), col("vec_id") < 10)
    assert(sortedRows(narrow) === sortedRows(wide),
      "ivfTopKKmeans is layout-sensitive")
  }

  test("cluster-balanced sampling is partition-count invariant") {
    def embs = Tables.embeddings(spark, sfDir)
    val narrow = Similarity.clusterBalancedSample(embs.repartition(1))
    val wide = Similarity.clusterBalancedSample(embs.repartition(13))
    assert(sortedRows(narrow) === sortedRows(wide),
      "clusterBalancedSample is layout-sensitive")
  }

  test("BPE-budget packers are partition-count invariant (r12)") {
    // broadcast-vocab counts + the per-bucket walks: the stored-model
    // lookups and the integer walk must not see the input layout
    import graft.ops.Bpe
    try {
      Bpe.buildBpeModel(docs, "graft_bpe_inv_spec")
      invariant("packGreedyBpe")(d =>
        Packing.packGreedyBpe(spark, d, "graft_bpe_inv_spec"))
      invariant("packSequencesBpe")(d =>
        Packing.packSequencesBpe(spark, d, "graft_bpe_inv_spec"))
    } finally {
      Seq("graft_bpe_inv_spec", "graft_bpe_inv_spec_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("perceptual-hash pairs are partition-count invariant (r12)") {
    def blobs = graft.ops.Multimodal.synthesizePng(docs)
    val narrow = graft.ops.Multimodal.pHashPairs(blobs.repartition(1))
    val wide = graft.ops.Multimodal.pHashPairs(blobs.repartition(13))
    assert(sortedRows(narrow) === sortedRows(wide), "pHashPairs is layout-sensitive")
  }

  test("daily-batch decision table is partition-count invariant (r12)") {
    // the whole composite — signal scan, indexed near-dup probe,
    // decontamination semi-join, survivor walk — under relaid input
    import graft.ops.{Curation, Dedup}
    try {
      Dedup.buildBandIndex(Curation.corpusOf(docs), "graft_daily_inv")
      invariant("dailyBatch")(d =>
        Curation.dailyBatch(spark, d, "graft_daily_inv"))
    } finally {
      Seq("graft_daily_inv", "graft_daily_inv_sigs", "graft_daily_inv_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
