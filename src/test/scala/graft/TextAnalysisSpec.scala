package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis
import graft.sources.Tables

class TextAnalysisSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, sfDir)

  private def tinyDocs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox", "en", "src0", 19L),
      (2L, "the  quick   brown fox", "en", "src0", 22L), // extra whitespace
      (3L, "der hund und die katze", "de", "src1", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("tokenStats invariants: counts positive, alnum <= ws, mean length sane") {
    val out = TextAnalysis.tokenStats(docs).cache()
    assert(out.count() === docs.count())
    assert(out.filter(col("n_ws_tokens") <= 0).count() === 0)
    assert(out.filter(col("n_alnum_tokens") > col("n_ws_tokens")).count() === 0)
    assert(out.filter(col("mean_tok_len") <= 0 || col("mean_tok_len") > 50).count() === 0)
    // BPE-ish segmentation is never coarser than whitespace tokens
    assert(out.filter(col("n_bpe_tokens") < col("n_ws_tokens")).count() === 0)
  }

  test("langId picks marker-dominant language with priority tiebreak") {
    val out = TextAnalysis.langId(tinyDocs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "en") // 'the' + 'a'... 'the' hits en
    assert(out(3L) === "de") // der/und/die
    val corpus = TextAnalysis.langId(docs)
    assert(corpus.filter(!col("pred_lang").isin("en", "de", "fr", "es", "und")).count() === 0)
  }

  test("quality score bounded in [0, 1]") {
    val out = TextAnalysis.qualityScore(docs)
    assert(out.filter(col("quality") < 0 || col("quality") > 1).count() === 0)
    assert(out.filter(col("alnum_ratio") < 0 || col("alnum_ratio") > 1).count() === 0)
  }

  test("phraseSearch: adjacency-exact matches incl. overlaps and short docs") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "a a a b", "en", "s", 7L),        // "a a" overlaps: 2 matches
      (2L, "a b a b", "en", "s", 7L),        // no adjacent "a a"
      (3L, "x a a y a a", "en", "s", 11L),   // 2 separated matches
      (4L, "a", "en", "s", 1L))              // shorter than the phrase
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.phraseSearch(crafted, Seq("a", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 2L), (3L, 2L)))
    // corpus: ranked non-increasing, each hit doc really contains the phrase
    val hits = TextAnalysis.phraseSearch(docs, Seq("table", "hash")).collect()
    assert(hits.nonEmpty)
    val counts = hits.map(_.getLong(1))
    assert(counts.sameElements(counts.sortBy(-_)))
    val ids = hits.map(_.getLong(0)).toSet
    val really = docs.filter(lower(col("text")).contains("table hash"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(really))
  }

  test("distributionDrift: exact cross-multiplied ranking on a crafted split") {
    import spark.implicits._
    // A: 4 tokens (x x y z), B: 2 tokens (y y) — hand drift with
    // totals (4, 2): x |2*2-0*4|=4, y |1*2-2*4|=6, z |1*2-0*4|=2
    val a = Seq((1L, "x x y z", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val b = Seq((2L, "y y", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.distributionDrift(a, b)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(out.toSeq === Seq(("y", 1L, 2L, 6L), ("x", 2L, 0L, 4L), ("z", 1L, 0L, 2L)))
    // corpus run: k rows, drift non-increasing, a one-sided word surfaces
    val corpus = TextAnalysis.distributionDrift(
      docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 =!= 0))
      .collect().map(_.getLong(5))
    assert(corpus.length === 20 && corpus.sameElements(corpus.sortBy(-_)))
  }

  test("tfIdf: rare terms outscore ubiquitous ones, tf weighted") {
    val out = TextAnalysis.tfIdf(docs).cache()
    assert(out.count() > 0)
    // a term in every document gets ln((N+1)/(N+1)) = 0 weight;
    // weights are monotonically decreasing in df for equal tf
    val byDf = out.filter(col("tf") === 1).select("df", "tfidf").distinct()
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(byDf.sliding(2).forall { case Array((_, a), (_, b)) => a >= b; case _ => true })
    val n = docs.count()
    assert(out.filter(col("df") === n && col("tf") === 1)
      .collect().forall(_.getDouble(4) === 0.0))
  }

  test("bm25Search matches a driver-side replay of the formula, ranks tf up and length down") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark spark spark join window filter"), // high tf, short
      (2L, "spark join"),                            // short, 2 query terms
      (3L, "spark filter filter filter filter filter filter filter filter filter"), // 1 hit, long
      (4L, "filter group sort"),                     // no query terms
      (5L, "window window join spark table table"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25Search(corpus, Seq("spark", "window", "join"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

    // independent replay (k1 = 1.2, b = 0.75)
    val toks = corpus.collect().map(r => (r.getLong(0),
      r.getString(1).toLowerCase.split("\\s+").filter(_.matches("^[a-z0-9]+$")).toSeq)).toMap
    val n = toks.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val terms = Seq("spark", "window", "join")
    val df = terms.map(t => t -> toks.values.count(_.contains(t))).toMap
    def score(id: Long): Double = {
      val dl = toks(id).size
      val s = terms.map { t =>
        val tf = toks(id).count(_ == t)
        if (tf == 0) 0.0
        else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) * (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }.sum
      // Spark's round() is HALF_UP on BigDecimal — mirror it exactly
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = toks.keys.toSeq
      .map(id => (id, score(id))).filter(_._2 != 0.0)
      .sortBy { case (id, s) => (-s, id) }
    assert(out.toSeq === expected, "scores and ranking must match the replay")
    // doc 4 has no query term: absent from results
    assert(!out.exists(_._1 === 4L))
    // higher tf at comparable length wins; a lone hit diluted by length loses
    val byId = out.toMap
    assert(byId(1L) > byId(3L), "tf-heavy short doc must outrank diluted long doc")
  }

  test("textRank matches a driver-side fixed-point replay on a crafted graph") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "hub spoke1 hub spoke2 hub spoke3"),
      (2L, "spoke1 hub"),
      (3L, "isolated"),
      (4L, "chain1 chain2 chain1"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.textRank(corpus, iters = 8, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    // independent replay with plain Scala maps, same fixed-point rule
    val toksByDoc = corpus.collect().map(r =>
      r.getString(1).toLowerCase.split("\\s+").filter(_.matches("^[a-z0-9]+$")).toSeq)
    val bi = toksByDoc.flatMap(a => a.zip(a.drop(1))).filter(p => p._1 != p._2)
    val edges = (bi ++ bi.map(_.swap)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wsrc = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nodes = toksByDoc.flatten.distinct.sorted
    val n = nodes.size
    var r = nodes.map(w => w -> math.round(1e12 / n)).toMap
    val teleport = math.round((1.0 - 0.85) * 1e12 / n)
    for (_ <- 1 to 8) {
      val cin = edges.toSeq.map { case ((src, dst), w) =>
        dst -> math.round(0.85 * (w.toDouble / wsrc(src)) * r(src))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map(w => w -> (teleport + cin.getOrElse(w, 0L))).toMap
    }
    val expected = r.toSeq.sortBy { case (w, rk) => (-rk, w) }.take(10)
    assert(out === expected, "ranks must match the fixed-point replay exactly")
    // the hub is the best-connected node: it must outrank every spoke
    val byWord = out.toMap
    assert(byWord("hub") > byWord("spoke2"), "hub must outrank a leaf spoke")
    // an isolated word receives only teleport mass
    assert(byWord("isolated") === teleport)
  }

  test("hybridSearch fuses the two verified rankings with exact RRF") {
    import graft.ops.Similarity
    val terms = Seq("spark", "window", "join")
    val out = TextAnalysis.hybridSearch(docs, terms).collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq

    // rebuild the fusion from the two independently-gated rankings
    val sp = TextAnalysis.bm25Search(docs, terms, 100).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val dn = Similarity.bruteForceTopK(
      TextAnalysis.hashEmbed(docs).select(col("doc_id").as("vec_id"), col("embedding")),
      col("vec_id") === 0L, 100).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap
    val expected = (sp.keySet ++ dn.keySet).toSeq.map { id =>
      val rrf = sp.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
        dn.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      (id, rrf, sp.get(id), dn.get(id))
    }.sortBy { case (id, rrf, _, _) => (-rrf, id) }.take(20)
    assert(out === expected, "fused ranking must match the driver-side RRF replay")
    // the fusion genuinely mixes the two retrievers
    assert(out.exists(_._3.isDefined), "top-20 must include a sparse-retrieved doc")
    assert(out.exists(_._4.isDefined), "top-20 must include a dense-retrieved doc")
  }

  test("hybridSearchIndexed fuses the two stored-index probes with exact RRF") {
    import graft.ops.Similarity
    val terms = Seq("spark", "window", "join")
    graft.sources.Formats.writeManaged(
      TextAnalysis.hashEmbed(docs).select(col("doc_id").as("vec_id"), col("embedding")),
      "t_hyb_hemb")
    TextAnalysis.buildBm25Index(docs, "t_hyb_bm25")
    Similarity.buildLshIndex(spark.table("t_hyb_hemb"), "t_hyb_lsh")
    val q = TextAnalysis.hybridSearchIndexed(spark, "t_hyb_bm25", "t_hyb_lsh", terms)
    val out = q.collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq

    // rebuild the fusion from the two independently-gated probe rankings
    val sp = TextAnalysis.bm25SearchIndexed(spark, "t_hyb_bm25", terms, 100).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val dn = Similarity.lshTopKIndexed(spark, "t_hyb_lsh", col("vec_id") === 0L, 100)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val expected = (sp.keySet ++ dn.keySet).toSeq.map { id =>
      val rrf = sp.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
        dn.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      (id, rrf, sp.get(id), dn.get(id))
    }.sortBy { case (id, rrf, _, _) => (-rrf, id) }.take(20)
    assert(out === expected, "fused ranking must match the driver-side RRF replay")
    // the fusion genuinely mixes the two retrievers
    assert(out.exists(_._3.isDefined), "top-20 must include a sparse-retrieved doc")
    assert(out.exists(_._4.isDefined), "top-20 must include a dense-retrieved doc")
    // production-plan property: the sparse probe reads ONLY the query
    // terms' posting buckets — bucket pruning must survive into the fused
    // plan (the dense side's exchange-free probe is asserted in
    // SimilaritySpec over the same lshTopKIndexed path)
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.contains("SelectedBucketsCount"),
      s"fused plan must keep the bm25 probe's bucket pruning:\n$planStr")
  }

  test("bm25 index: probe equals direct search, append equals one-shot, pruned exchange-free plan") {
    val terms = Seq("spark", "window", "join")
    val direct = TextAnalysis.bm25Search(docs, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    TextAnalysis.buildBm25Index(docs, "t_bm25_spec")
    val probe = TextAnalysis.bm25SearchIndexed(spark, "t_bm25_spec", terms)
    assert(probe.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === direct,
      "stored-index probe must answer bit-identically to the direct search")

    // the probe scans only the query terms' buckets (bucket pruning on the
    // word filter), and the per-word df aggregation plans exchange-free
    // over the bucketed layout
    val planStr = probe.queryExecution.executedPlan.toString
    assert(planStr.contains("SelectedBucketsCount"),
      s"word filter must prune buckets:\n$planStr")
    val dfqPlan = spark.table("t_bm25_spec")
      .filter(col("word").isin(terms: _*))
      .groupBy("word").agg(count(lit(1)).as("df"))
      .queryExecution.executedPlan.toString
    assert(!dfqPlan.contains("ShuffleExchange"),
      s"df aggregation must not shuffle the bucketed postings:\n$dfqPlan")

    // incremental: doc-disjoint halves built + appended answer identically,
    // and the merged stats row equals the one-shot build's
    TextAnalysis.buildBm25Index(docs.filter(col("doc_id") % 2 === 0), "t_bm25_spec_incr")
    TextAnalysis.appendToBm25Index(docs.filter(col("doc_id") % 2 =!= 0), "t_bm25_spec_incr")
    val incr = TextAnalysis.bm25SearchIndexed(spark, "t_bm25_spec_incr", terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(incr === direct, "two-batch index must equal the one-shot build")
    val one = spark.table("t_bm25_spec_stats").collect()(0)
    val two = spark.table("t_bm25_spec_incr_stats").collect()(0)
    assert((two.getLong(0), two.getLong(1)) === ((one.getLong(0), one.getLong(1))),
      "stats row must merge by exact integer addition")
  }

  test("approxDistinctWords: HLL error bound holds per source") {
    // the operator emits its own |approx − exact| <= max(16, 0.1·exact)
    // bound as the 0/1 `ok` column (what the DuckDB gate hashes); every
    // source must report the bound held over a real exact count
    val out = TextAnalysis.approxDistinctWords(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) > 0, s"source ${r.getString(0)}: empty exact count")
      assert(r.getInt(2) == 1, s"source ${r.getString(0)}: HLL bound violated")
    }
  }

  test("curationPipeline: min(struct) keep-one matches the window form, no Window in plan") {
    val out = TextAnalysis.curationPipeline(docs)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected pure aggregation plan, got:\n$plan")
    // result-equivalence with the window-row_number formulation it replaced
    import org.apache.spark.sql.expressions.Window
    val scored = docs.select(col("doc_id"), TextAnalysis.nTokensCol.as("n_tokens"),
      TextAnalysis.qualityCol.as("quality"), TextAnalysis.predLangCol.as("pred_lang"),
      TextAnalysis.fpNormCol.as("fp_norm"))
      .filter(col("quality") >= 0.6 && col("pred_lang") === "en")
    val w = Window.partitionBy(col("fp_norm")).orderBy(col("doc_id"))
    val expected = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("doc_id", "n_tokens", "quality")
    assert(out.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(out).count() === 0)
    assert(out.count() > 0)
  }

  test("redactPii scrubs emails, phones, and IPs with exact counts") {
    import spark.implicits._
    val dirty = Seq(
      (1L, "mail alice.smith+x@corp.example.com or bob@ex.io now"),
      (2L, "call 555-123-4567 then 800-555-0199 from 192.168.1.254"),
      (3L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(dirty).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)), r.getString(4))).toMap
    assert(out(1L)._1 === ((2L, 0L, 0L)))
    assert(out(1L)._2 === "mail <EMAIL> or <EMAIL> now")
    assert(out(2L)._1 === ((0L, 2L, 1L)))
    assert(out(2L)._2 === "call <PHONE> then <PHONE> from <IP>")
    assert(out(3L)._1 === ((0L, 0L, 0L)))
    assert(out(3L)._2 === "nothing sensitive here")
    // redaction is idempotent: placeholders contain nothing the patterns match
    val again = TextAnalysis.redactPii(
      TextAnalysis.redactPii(dirty).select(col("doc_id"), col("redacted").as("text")))
    assert(again.collect().map(r => r.getLong(0) -> r.getString(4)).toMap
      === out.map { case (k, v) => k -> v._2 })
  }

  test("lmScore: add-one-smoothed bigram log-probs match a hand computation") {
    import spark.implicits._
    // filtered tokens: d1=[a,b,a,b]  d2=[a] ("B!" fails the alnum filter
    // → one token, no bigrams)  d3=[z,z]
    // bigram counts: (a,b)=2 (b,a)=1 (z,z)=1; c1: a=2 b=1 z=1; vocab V=3
    val tiny = Seq(
      (1L, "a b a b"), (2L, "a B!"), (3L, "z z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(tiny).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val pAB = math.log(3.0 / 5.0) // (2+1)/(2+3)
    val pBA = math.log(2.0 / 4.0) // (1+1)/(1+3)
    val pZZ = math.log(2.0 / 4.0)
    assert(out.keySet === Set(1L, 3L), "docs without bigrams are absent")
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._2 - BigDecimal((pAB + pBA + pAB) / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(3L)._1 === 1L)
    assert(math.abs(out(3L)._2 - BigDecimal(pZZ)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("lmScore: corpus scores are log-probabilities (negative, finite)") {
    val scored = TextAnalysis.lmScore(docs).collect()
    assert(scored.length > 0)
    assert(scored.forall { r =>
      val s = r.getDouble(2); s < 0.0 && !s.isNaN && !s.isInfinite
    })
  }

  test("lm model: stored-model scoring equals train-per-call, one corpus pass in the probe") {
    try {
      TextAnalysis.buildLmModel(docs, "t_lm_spec")
      val indexed = TextAnalysis.lmScoreIndexed(spark, docs, "t_lm_spec")
      val direct = TextAnalysis.lmScore(docs)
      // exact integer counts + the same float expression → bit parity
      assert(indexed.collect().map(_.toString).sorted.toSeq === direct.collect().map(_.toString).sorted.toSeq,
        "stored-model scoring must answer bit-identically to train-per-call")
      // the probe's ONLY corpus-scale pass is the scored docs' bigram
      // projection: training would scan documents at least twice more
      // (c12 chain + vocab distinct)
      val plan = indexed.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val docScans = "documents\\.parquet".r.findAllIn(plan).length
      assert(docScans == 1,
        s"probe must scan documents once ($docScans scans):\n$plan")
      assert(plan.contains("t_lm_spec["),
        s"probe must read the stored count table:\n$plan")
    } finally {
      Seq("t_lm_spec", "t_lm_spec_c1", "t_lm_spec_vocab", "t_lm_spec_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("lm model: delta append equals one-shot build; probe fold is exchange-free") {
    try {
      // doc-disjoint halves: bulk build + delta append
      TextAnalysis.buildLmModel(docs.filter(col("doc_id") % 2 === 0), "t_lm_incr_spec")
      TextAnalysis.appendToLmModel(docs.filter(col("doc_id") % 2 =!= 0), "t_lm_incr_spec")
      TextAnalysis.buildLmModel(docs, "t_lm_one_spec")
      val incr = TextAnalysis.lmScoreIndexed(spark, docs, "t_lm_incr_spec")
      val one = TextAnalysis.lmScoreIndexed(spark, docs, "t_lm_one_spec")
      // within-doc bigram counts are exactly additive across disjoint
      // batches and the vocab set unions — bit parity with the one-shot
      assert(incr.collect().map(_.toString).sorted.toSeq === one.collect().map(_.toString).sorted.toSeq)
      // ...and with the train-per-call form (transitively the oracle)
      assert(incr.collect().map(_.toString).sorted.toSeq === TextAnalysis.lmScore(docs).collect().map(_.toString).sorted.toSeq)
      // the append landed DELTAS: duplicate (w1, w2) keys across batches
      val t = spark.table("t_lm_incr_spec")
      assert(t.count() > t.select("w1", "w2").distinct().count(),
        "append must land per-batch delta rows, not rewrite the model")
      // the probe's delta fold must ride the bucketed layout: no shuffle
      // between the count-table scans and their aggregations
      val foldPlan = spark.table("t_lm_incr_spec")
        .groupBy("w1", "w2").agg(sum("c12"))
        .queryExecution.executedPlan.toString
      assert(!foldPlan.contains("ShuffleExchange") && !foldPlan.contains("Exchange hashpartitioning"),
        s"delta fold must be exchange-free on the bucketed table:\n$foldPlan")
    } finally {
      Seq("t_lm_incr_spec", "t_lm_incr_spec_c1", "t_lm_incr_spec_vocab", "t_lm_incr_spec_meta",
        "t_lm_one_spec", "t_lm_one_spec_c1", "t_lm_one_spec_vocab", "t_lm_one_spec_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("lm model: merging compaction collapses deltas, scores unchanged") {
    import graft.sources.Formats
    try {
      TextAnalysis.buildLmModel(docs.filter(col("doc_id") % 2 === 0), "t_lm_cpt_spec")
      TextAnalysis.appendToLmModel(docs.filter(col("doc_id") % 2 =!= 0), "t_lm_cpt_spec")
      val before = TextAnalysis.lmScoreIndexed(spark, docs, "t_lm_cpt_spec").collect().toSeq
      val t = spark.table("t_lm_cpt_spec")
      assert(t.count() > t.select("w1", "w2").distinct().count(),
        "precondition: the appended model carries delta rows")
      TextAnalysis.compactLmModel(spark, "t_lm_cpt_spec")
      // deltas collapsed: one row per key in every member table, one file
      // per bucket, and the fold's totals — hence the scores — unchanged
      val tc = spark.table("t_lm_cpt_spec")
      assert(tc.count() === tc.select("w1", "w2").distinct().count())
      val v = spark.table("t_lm_cpt_spec_vocab")
      assert(v.count() === v.distinct().count())
      assert(Formats.bucketedFileCount(spark, "t_lm_cpt_spec") <= 8)
      val after = TextAnalysis.lmScoreIndexed(spark, docs, "t_lm_cpt_spec").collect().toSeq
      assert(after === before, "compaction must not move a single score bit")
    } finally {
      Seq("t_lm_cpt_spec", "t_lm_cpt_spec_c1", "t_lm_cpt_spec_vocab", "t_lm_cpt_spec_meta",
        "t_lm_cpt_spec__compacting", "t_lm_cpt_spec_c1__compacting",
        "t_lm_cpt_spec_vocab__compacting")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("textrank edges: delta-append graph ranks identically to the direct loop") {
    try {
      TextAnalysis.buildTextRankEdges(docs.filter(col("doc_id") % 2 === 0), "t_tr_spec")
      TextAnalysis.appendToTextRankEdges(docs.filter(col("doc_id") % 2 =!= 0), "t_tr_spec")
      val indexed = TextAnalysis.textRankIndexed(spark, "t_tr_spec").collect().toSeq
      val direct = TextAnalysis.textRank(docs).collect().toSeq
      // within-doc adjacency counts fold exactly and the node set unions,
      // so the fixed point is bit-identical
      assert(indexed === direct)
      // the appended graph carries delta rows (the probe folds them)
      val t = spark.table("t_tr_spec")
      assert(t.count() > t.select("src", "dst").distinct().count())
      // the re-rank never rescans the corpus: only stored tables in plan
      val plan = TextAnalysis.textRankIndexed(spark, "t_tr_spec")
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("documents.parquet"),
        s"indexed rank must not rescan the corpus:\n$plan")
      // merging compaction collapses the deltas; ranks bit-unchanged
      TextAnalysis.compactTextRankEdges(spark, "t_tr_spec")
      val tc = spark.table("t_tr_spec")
      assert(tc.count() === tc.select("src", "dst").distinct().count())
      assert(TextAnalysis.textRankIndexed(spark, "t_tr_spec").collect().toSeq === direct)
    } finally {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      Seq("t_tr_spec", "t_tr_spec_nodes", "t_tr_spec_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("normalizeText: decomposed and precomposed spellings collapse to one fingerprint") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Cafe\u0301 ole\u0301"), // decomposed: e + U+0301 combining acute
      (2L, "Caf\u00e9 ol\u00e9"),   // precomposed U+00E9
      (3L, "plain ascii")).toDF("doc_id", "text")
    val out = TextAnalysis.normalizeText(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // same canonical form → same fingerprint, even though raw lengths differ
    assert(out(1L)._3 === out(2L)._3)
    assert(out(1L)._1 === 10L && out(1L)._2 === 8L) // two marks composed away
    assert(out(2L)._1 === 8L && out(2L)._2 === 8L)  // already canonical
    assert(out(3L)._1 === out(3L)._2)               // ASCII rides through
  }

  test("repetitionStats: n-gram repetition fractions match a hand computation") {
    import spark.implicits._
    val tiny = Seq(
      // 2-grams: [a b, b a, a b, b c] → t=4 d=3 top=2; 3-grams all distinct
      (1L, "a b a b c"),
      // 2-grams: [x x]×3 → dup 2/3, top 1.0; 3-grams: [x x x]×2 → dup 1/2
      (2L, "x x x x"),
      // single token: no n-grams at all → all fractions 0
      (3L, "hello"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(tiny).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(1L) === ((5L, 0.25, 0.5, 0.0)))
    assert(out(2L) === ((4L, 2.0 / 3.0, 1.0, 0.5)))
    assert(out(3L) === ((1L, 0.0, 0.0, 0.0)))
  }

  test("filterFunnel: stages are monotone and every stage binds on the corpus") {
    val rows = TextAnalysis.filterFunnel(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, q, l, c) =>
      assert(n >= q && q >= l && l >= c, s"funnel not monotone for $src: $n $q $l $c")
    }
    def tot(f: ((String, Long, Long, Long, Long)) => Long) = rows.map(f).sum
    assert(tot(_._2) === docs.count())
    // thresholds chosen so each successive stage rejects someone somewhere
    assert(tot(_._3) < tot(_._2), "quality floor never binds")
    assert(tot(_._4) < tot(_._3), "language gate never binds")
    assert(tot(_._5) < tot(_._4), "repetition cap never binds")
  }

  test("hashEmbed: unit-norm float vectors matching a driver-side replay") {
    val dim = 64
    val out = TextAnalysis.hashEmbed(docs, dim).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(out.nonEmpty && out.forall(_._2.length === dim))

    // unit L2 norm (or exact zero vector for token-free docs)
    out.foreach { case (id, v) =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5 || n === 0.0, s"doc $id norm $n")
    }
    // no zero vectors on the real corpus (every doc has alnum tokens) —
    // this is what keeps the downstream cosine well-defined
    assert(out.forall(_._2.exists(_ != 0.0f)), "corpus produced a zero vector")

    // independent driver-side replay of the signed hashing trick
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val texts = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    out.take(5).foreach { case (id, v) =>
      val votes = new Array[Long](dim)
      texts(id).toLowerCase.split("\\s+")
        .filter(_.matches("^[a-z0-9]+$"))
        .foreach { t =>
          val idx = (h60("he:" + t) % dim).toInt
          votes(idx) += (if (h60("hs:" + t) % 2 == 0) 1L else -1L)
        }
      val norm = math.sqrt(votes.map(x => x.toDouble * x).sum)
      val exp = votes.map(x => if (norm > 0) (x / norm).toFloat else 0.0f)
      assert(v.sameElements(exp), s"doc $id embedding mismatch")
    }
  }

  test("hashEmbed: token-free documents get the zero vector") {
    import spark.implicits._
    val weird = Seq((1L, "!!! ... ---"), (2L, ""), (3L, "ok words here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.hashEmbed(weird, 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    assert(out.size === 3)
    assert(out(1L).forall(_ === 0.0f))
    assert(out(2L).forall(_ === 0.0f))
    assert(out(3L).exists(_ !== 0.0f))
  }

  test("hashEmbedWindows: window chunking equals hashEmbed of each chunk, " +
      "window cap holds, unit norms, layout-invariant") {
    import spark.implicits._
    // 10 alnum tokens -> windows [t0..t7], [t8 t9]; cap 4 is not hit.
    // ("tok8","tok9" would be a one-in-32 accident: both hash to dim 9
    // with opposite signs, so THAT window correctly cancels to zero and
    // is dropped — "word*" verified non-cancelling)
    val toks = (0 until 10).map(i => s"word$i")
    val one = Seq((7L, toks.mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.hashEmbedWindows(one, dim = 16).collect()
      .map(r => (r.getLong(1), r.getSeq[Float](2).toArray)).toMap
    assert(out.keySet === Set(0L, 1L))
    // each window vector IS hashEmbed of a doc holding just that chunk —
    // the chunking adds position structure, not new featurization
    def embedOf(text: String): Array[Float] =
      TextAnalysis.hashEmbed(Seq((0L, text)).toDF("doc_id", "text"), 16)
        .collect().head.getSeq[Float](1).toArray
    assert(out(0L).sameElements(embedOf(toks.take(8).mkString(" "))))
    assert(out(1L).sameElements(embedOf(toks.drop(8).mkString(" "))))
    // the cap: a 100-token doc keeps exactly maxWins windows
    val long = Seq((8L, (0 until 100).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val capped = TextAnalysis.hashEmbedWindows(long, dim = 16).collect()
    assert(capped.map(_.getLong(1)).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    // real corpus: unit norms, win bounded, repartition-stable
    val real = TextAnalysis.hashEmbedWindows(docs).cache()
    assert(real.filter(col("win") >= 4 || col("win") < 0).count() === 0)
    real.collect().foreach { r =>
      val n = math.sqrt(r.getSeq[Float](2).map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"(${r.getLong(0)},${r.getLong(1)}) norm $n")
    }
    val again = TextAnalysis.hashEmbedWindows(docs.repartition(7))
    assert(real.exceptAll(again).count() === 0 &&
      again.exceptAll(real).count() === 0)
    real.unpersist()
  }

  test("fingerprint: fp_norm is whitespace-invariant, fp_raw is not") {
    val fps = TextAnalysis.fingerprint(tinyDocs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fps(1L)._2 === fps(2L)._2, "normalized fingerprints collapse whitespace variants")
    assert(fps(1L)._1 !== fps(2L)._1, "raw fingerprints differ")
    assert(fps(1L)._1 !== fps(3L)._1)
  }

  test("hybridSearchManyIndexed: each query's slice equals its single-query run") {
    val docs = Tables.documents(spark, sfDir)
    try {
      TextAnalysis.buildBm25Index(docs, "graft_bm25_many_spec")
      graft.ops.Similarity.buildLshIndex(
        TextAnalysis.hashEmbed(docs)
          .select(col("doc_id").as("vec_id"), col("embedding")),
        "graft_lsh_many_spec")
      val workload = Seq(0L -> Seq("spark", "window"), 1L -> Seq("join", "filter"))
      val many = TextAnalysis.hybridSearchManyIndexed(spark,
          "graft_bm25_many_spec", "graft_lsh_many_spec", workload)
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(r =>
          (r.getLong(1), r.getDouble(2), Option(r.get(3)), Option(r.get(4)))).toSeq)
        .toMap
      workload.foreach { case (qid, terms) =>
        val single = TextAnalysis.hybridSearchIndexed(spark,
            "graft_bm25_many_spec", "graft_lsh_many_spec", terms, queryId = qid)
          .collect()
          .map(r => (r.getLong(0), r.getDouble(1), Option(r.get(2)), Option(r.get(3))))
          .toSeq
        assert(many(qid) === single,
          s"query $qid: batched ranking must equal the single-query ranking")
      }
      // and the standalone sparse workload probe agrees with the
      // single-query BM25 search per query
      val bmMany = TextAnalysis.bm25SearchManyIndexed(spark,
          "graft_bm25_many_spec", workload)
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSeq).toMap
      workload.foreach { case (qid, terms) =>
        val single = TextAnalysis.bm25SearchIndexed(spark,
            "graft_bm25_many_spec", terms)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(bmMany(qid) === single,
          s"query $qid: batched BM25 must equal the single-query search")
      }
    } finally Seq("graft_bm25_many_spec", "graft_bm25_many_spec_stats",
      "graft_lsh_many_spec").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("vocabDispersion: uniform vocab has Gini 0, max skew has (n-1)/n") {
    import spark.implicits._
    val docs = Seq(
      // uniform: four words, one count each → gini_num must be EXACTLY 0
      (1L, "aa bb cc dd", "u"),
      // skewed: counts [1, 7] sorted → num = 2(1·1+2·7) − 3·8 = 6, den = 16
      (2L, "zz zz zz zz zz zz zz ab", "s")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.vocabDispersion(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("u") === ((4L, 4L, 0L, 16L)), s"uniform: ${got("u")}")
    assert(got("s") === ((2L, 8L, 6L, 16L)), s"skewed: ${got("s")}")
    // entropy: uniform over 4 words = ln(4); skew = ln(8) − (7·ln 7)/8
    val ent = TextAnalysis.vocabDispersion(docs)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(ent("u") === math.rint(math.log(4) * 1e6) / 1e6)
    assert(ent("s") ===
      math.rint((math.log(8) - 7 * math.log(7) / 8) * 1e6) / 1e6)
  }
}
