package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CrossHash

/** Text-analysis operators for a large-scale training-data pipeline
  * (north-star extensions beyond the reference's word count — SURVEY §2c).
  *
  * The reference's only text analytics is whitespace tokenization + alnum
  * filtering inside a user Python mapper (srics96/SDC_Mapreduce
  * `src/app/mapper.py:4-18`); everything here generalizes that surface into
  * declarative per-document statistics. Every operator is a single
  * narrow-dependency projection or one hash-aggregation — no joins, no
  * multi-pass — so at 100 TB each is one scan over `documents` with
  * map-side partial aggregation and full whole-stage codegen (no UDFs:
  * tokenization and scoring are built-in expression trees Catalyst prunes
  * to just the `text` + key columns at the parquet reader).
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased text — the reference mapper's
    * tokenizer (`src/app/mapper.py:4-6`) with case folding. */
  def toks(c: Column): Column = split(lower(c), "\\s+")

  /** BPE-ish subword segmentation regex: runs of 1–4 letters, single
    * digits, or single non-alnum glyphs — a deterministic stand-in for a
    * byte-pair vocabulary that needs no model file. */
  val BpeRe = "[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"

  /** Per-language marker words for the n-gram/stopword language heuristic.
    * Deliberately tiny and deterministic; order is the tiebreak priority. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  /** Marker-hit count over a whitespace-token array column — so callers
    * holding the shared token projection ([[SharedCorpus]]) count hits
    * without re-splitting the text. */
  private[ops] def markerHits(lang: String, ws: Column): Column = {
    val set = LangMarkers.toMap.apply(lang)
    size(filter(ws, t => t.isin(set: _*))).cast("long")
  }

  private[ops] def markerHits(lang: String): Column =
    markerHits(lang, toks(col("text")))

  // ---- single-pass column builders (all over a `text` column, with
  // token-array overloads so the shared projection is never re-split) ----
  // Exposed so composite pipelines ([[curationPipeline]]) can compute
  // every signal in ONE scan instead of joining per-signal DataFrames.

  /** Whitespace token count. */
  def nTokensCol: Column = nTokensCol(toks(col("text")))
  def nTokensCol(ws: Column): Column = size(ws).cast("long")

  /** Alnum-token count (lowercased). */
  def nAlnumCol: Column =
    expr("size(filter(split(lower(text), '\\\\s+'), t -> t rlike '^[a-z0-9]+$'))").cast("long")
  def nAlnumCol(alnum: Column): Column = size(alnum).cast("long")

  /** The quality score of [[qualityScore]] as a bare column. */
  def qualityCol: Column = {
    val nTok = nTokensCol
    val alnum = nAlnumCol
    val stop = markerHits("en")
    least(nTok.cast("double") / 100.0, lit(1.0)) * 0.2 +
      (alnum.cast("double") / nTok) * 0.5 +
      least(stop.cast("double") / nTok * 4.0, lit(1.0)) * 0.3
  }

  /** [[qualityCol]] over the shared token-projection columns. The
    * expression tree is the same fixed operation order, so the score is
    * bit-identical to the inline form (SharedCorpusSpec pins it). */
  def qualityColOf(ws: Column, alnum: Column): Column = {
    val nTok = nTokensCol(ws)
    val nAl = nAlnumCol(alnum)
    val stop = markerHits("en", ws)
    least(nTok.cast("double") / 100.0, lit(1.0)) * 0.2 +
      (nAl.cast("double") / nTok) * 0.5 +
      least(stop.cast("double") / nTok * 4.0, lit(1.0)) * 0.3
  }

  /** The predicted language of [[langId]] as a bare column. */
  def predLangCol: Column = predLangColOf(toks(col("text")))

  def predLangColOf(ws: Column): Column = {
    val (en, de, fr, es) =
      (markerHits("en", ws), markerHits("de", ws),
        markerHits("fr", ws), markerHits("es", ws))
    when(en >= de && en >= fr && en >= es && en > 0, "en")
      .when(de >= fr && de >= es && de > 0, "de")
      .when(fr >= es && fr > 0, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }

  /** Whitespace-normalized 60-bit fingerprint of [[fingerprint]]. */
  def fpNormCol: Column =
    CrossHash.h60(trim(regexp_replace(lower(col("text")), "\\s+", " ")))

  /** Token-count statistics per document: whitespace tokens, BPE-ish
    * subword tokens, alnum tokens, and mean token length. One projection —
    * scales as a pure map over the corpus. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val ws = SharedCorpus.wsOf(docs)
    docs.select(
      col("doc_id"),
      size(ws).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(BpeRe), lit(0))).cast("long").as("n_bpe_tokens"),
      size(SharedCorpus.alnumOf(docs)).cast("long").as("n_alnum_tokens"),
      (aggregate(transform(ws, t => length(t)), lit(0L), (a, x) => a + x)
        .cast("double") / size(ws)).as("mean_tok_len"))
  }
  // NOTE (r18): final presentational `orderBy`s removed from the per-doc
  // projections and join-rooted stats in this file — the driver's gate
  // sorts rows before hashing, and on a zero-shuffle projection the range
  // sort's bound-sampling pass re-executed the whole projection (~2x,
  // guide §2.4; measured on ta_repetition: 1.94 s -> 0.87 s).

  /** Language identification via marker-word scoring: count each language's
    * marker hits, predict the argmax (priority order breaks ties), emit
    * `und` when nothing matches. A real lang-ID model swaps in as a richer
    * marker table — the plan shape (single scan, no shuffle until the
    * optional aggregate) is the production shape. */
  def langId(docs: DataFrame): DataFrame = {
    val ws = SharedCorpus.wsOf(docs)
    docs.select(
      col("doc_id"),
      predLangColOf(ws).as("pred_lang"),
      greatest(markerHits("en", ws), markerHits("de", ws),
        markerHits("fr", ws), markerHits("es", ws)).as("n_hits"))
  }

  /** Quality scoring: length score, alnum ratio, stopword-density penalty —
    * the standard cheap pre-filter before expensive LLM-data curation.
    * All arithmetic is int-ratio → double in a fixed operation order, so
    * the score is bit-reproducible across engines and partitionings. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val (ws, alnum) = (SharedCorpus.wsOf(docs), SharedCorpus.alnumOf(docs))
    docs.select(
      col("doc_id"),
      nTokensCol(ws).as("n_tokens"),
      (nAlnumCol(alnum).cast("double") / nTokensCol(ws)).as("alnum_ratio"),
      (markerHits("en", ws).cast("double") / nTokensCol(ws)).as("stop_ratio"),
      qualityColOf(ws, alnum).as("quality"))
  }

  /** Top bigrams across the corpus by frequency (deterministic tiebreak on
    * the bigram text) — the n-gram frequency table feeding vocabulary and
    * collocation analysis. */
  def topBigrams(docs: DataFrame, k: Int = 20): DataFrame =
    Dedup.shingles(docs, n = 2)
      .groupBy("shingle")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("shingle"))
      .limit(k)

  /** TF-IDF per (document, term): tf from one token-explode aggregation,
    * df from a second aggregation over the distinct (doc, term) pairs, the
    * corpus size joined in as a broadcast scalar. Two shuffles total, both
    * on high-cardinality keys — the plan a 100 TB corpus wants (term df is
    * the only global state, and it is one row per vocab term).
    * `tfidf = round(tf * ln((N+1)/(df+1)), 6)` — smoothed so df=N terms
    * keep nonzero weight. The 6-decimal quantization absorbs the ≤1-ulp
    * spread between the JVM's StrictMath.log and libm's ln (no corpus
    * value sits within 1e-8 of a rounding boundary — verified for sf0.01
    * and sf0.1 — while the engines differ by ~1e-16). */
  def tfIdf(docs: DataFrame): DataFrame = {
    val toks = docs.select(
      col("doc_id"),
      explode(SharedCorpus.alnumOf(docs)).as("word"))
    // tf materialized ONCE (r19): it feeds the score join AND the df
    // aggregation — as a plan the tokenize + (doc, word) aggregation ran
    // twice per call. This is the posting table a real pipeline persists.
    val tf = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "word")
      .crossJoin(broadcast(n))
      .select(
        col("doc_id"), col("word"), col("tf"), col("df"),
        round(col("tf").cast("double") *
          log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6).as("tfidf"))
  }

  /** BM25 ranked keyword search — the retrieval twin of the vector ANN
    * tier: score every document against a bag-of-terms query with the
    * Robertson/Okapi BM25 formula and return the top-k
    * (`score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`,
    * `idf = ln(1 + (N−df+0.5)/(df+0.5))`). Together with [[hashEmbed]] +
    * LSH this gives the engine both halves of a retrieval stack — sparse
    * lexical and dense vector — over the same corpus.
    *
    * Scale shape: the token stream is filtered to the QUERY'S terms before
    * anything shuffles, so the tf aggregation touches only matching
    * postings (query-sized, not corpus-sized); document lengths are one
    * map-side-combined per-doc count (the only corpus-wide aggregate, and
    * the same table an index build would persist); df and the N/avgdl
    * scalars ride broadcast joins. Top-k is a rounded-score sort with
    * doc_id tiebreak — same 6-decimal cross-engine quantization contract
    * as [[tfIdf]]/[[lmScore]]. */
  def bm25Search(docs: DataFrame, terms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Search needs at least one query term")
    val toks = docs.select(
      col("doc_id"),
      explode(SharedCorpus.alnumOf(docs)).as("word"))
    // document length = size of the token ARRAY (r19, guide §2.3): the
    // old explode + groupBy(doc_id) count shuffled and re-aggregated the
    // full token stream just to count it. `size` is the same number per
    // row with no explode and no aggregation; `dl > 0` reproduces
    // explode's semantics exactly (token-less docs emit no row).
    val dl = docs.select(col("doc_id"),
        size(SharedCorpus.alnumOf(docs)).cast("long").as("dl"))
      .filter(col("dl") > 0)
    val tf = toks.filter(col("word").isin(terms: _*))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    rankBm25(
      tf.join(broadcast(dfreq), "word")
        .join(dl, "doc_id")
        .crossJoin(broadcast(bm25Stats(dl)))
        .select(col("doc_id"), bm25ScoreCol(k1, b).as("s")), k)
  }

  /** Exact phrase search — adjacency-exact multi-word matching, the
    * retrieval primitive BM25's bag-of-terms scoring cannot express: a
    * document matches at position i iff tokens i..i+n-1 equal the phrase
    * verbatim. Returns the top-k documents by match count (doc_id
    * tiebreak).
    *
    * Plan shape: the [[graft.ops.Dedup.shingles]] position-explode form —
    * the token array materializes BEFORE the position explode, so the
    * regex split runs once per document. (The first cut scanned positions
    * inside a `transform` lambda; CollapseProject inlined the split into
    * the lambda body and re-tokenized the document once per position —
    * O(tokens²), 3.1 s at sf0.1 for what this form does in 0.3.) A short
    * tail window slices to < n tokens and can never equal the n-token
    * phrase, so no explicit length guard is needed; one doc-keyed count
    * is the only shuffle before the top-k. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String], k: Int = 20): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs a non-empty phrase")
    val n = phrase.length
    docs.select(col("doc_id"), SharedCorpus.wsOf(docs).as("a"))
      .select(col("doc_id"), col("a"),
        explode(sequence(lit(1), greatest(size(col("a")) - (n - 1), lit(1)))).as("i"))
      .filter(array_join(slice(col("a"), col("i"), lit(n)), " ") === phrase.mkString(" "))
      .groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
      .orderBy(col("n_matches").desc, col("doc_id"))
      .limit(k)
  }

  /** HYBRID retrieval — reciprocal-rank fusion of the engine's two
    * retrieval halves over the same corpus (the modern default for search
    * over a document store): the sparse ranking is [[bm25Search]]'s
    * term-query top-`candidates`, the dense ranking is exact cosine
    * against a query document's [[hashEmbed]] vector, and each document's
    * fused score is `Σ 1/(kRrf + rank)` over the rankings that retrieved
    * it (RRF, Cormack et al. — rank-based, so the two scorers' wildly
    * different score scales never need calibration).
    *
    * Determinism: both inputs are already oracle-gated rankings with
    * integer ranks; the fusion arithmetic is two correctly-rounded IEEE
    * ops per row in a fixed expression order — no float aggregation
    * anywhere. Scale shape: both rankings bound their candidate sets
    * before the fusion join, so the full-outer join runs on two
    * `candidates`-sized tables regardless of corpus size. */
  def hybridSearch(docs: DataFrame, terms: Seq[String], queryDocId: Long = 0L,
      k: Int = 20, candidates: Int = 100, kRrf: Int = 60): DataFrame = {
    val sparse = sparseRanking(bm25Search(docs, terms, candidates))
    // embed ONCE (r19, guide §1.2): bruteForceTopK references its input
    // twice (query panel + neighbor side), and as a plain plan each
    // reference re-ran the full corpus featurization — the physical plan
    // carried two identical corpus-wide hashEmbed subtrees. The
    // checkpoint is ADVICE-r13-clean (ContextCleaner-reclaimed) and is
    // exactly the embed-once/serve-from-vectors shape of the indexed twin.
    val emb = hashEmbed(docs)
      .select(col("doc_id").as("vec_id"), col("embedding"))
      .localCheckpoint(eager = false)
    val dense = Similarity.bruteForceTopK(
      emb, col("vec_id") === queryDocId, candidates)
      .select(col("neighbor_id").as("doc_id"), col("rn").as("r_dense"))
    rrfFuse(sparse, dense, k, kRrf)
  }

  /** Query-MANY indexed hybrid retrieval — [[hybridSearchIndexed]] for a
    * whole workload in one plan: every query's sparse half probes the
    * shared BM25 posting buckets (one bucket-pruned scan for the UNION of
    * all query terms, df and corpus stats computed once and shared), every
    * dense half rides one multi-query LSH probe, and the RRF tail fuses
    * per (query_id, doc_id). This is the serving shape at scale: N queries
    * cost one pass over their combined postings + band buckets, not N
    * plan launches — and each query's ranking is IDENTICAL to its
    * single-query [[hybridSearchIndexed]] run (per-query windows see
    * exactly the rows the single-query top-k saw; SparkEntry's gate shares
    * a per-query-replayed oracle). Queries are a driver-known workload
    * (`(query_id, terms)`, with query_id doubling as the dense query's
    * vec_id), so the term filter pushes down as an `IN` literal. */
  def hybridSearchManyIndexed(spark: org.apache.spark.sql.SparkSession,
      bm25Table: String, lshTable: String, queries: Seq[(Long, Seq[String])],
      k: Int = 20, candidates: Int = 100, kRrf: Int = 60,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "hybridSearchManyIndexed needs at least one query, each with terms")
    import org.apache.spark.sql.expressions.Window
    val sparse = rankBm25Many(spark, bm25Table, queries, candidates, k1, b)
      .select("query_id", "doc_id", "r_sparse")
    val dense = Similarity.lshTopKIndexed(spark, lshTable,
        col("vec_id").isin(queries.map(_._1): _*), candidates)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rn").as("r_dense"))
    val wF = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("r_sparse")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("r_dense")), lit(0.0)))
      .withColumn("fr", row_number().over(wF))
      .filter(col("fr") <= k)
      .select("query_id", "doc_id", "rrf", "r_sparse", "r_dense")
      .orderBy(col("query_id"), col("rrf").desc, col("doc_id"))
  }

  /** Query-MANY indexed BM25 search — the standalone sparse half of
    * [[hybridSearchManyIndexed]]: a whole keyword workload through one
    * bucket-pruned posting scan (union of all query terms; df and corpus
    * stats computed once and shared across queries), per-query top-k.
    * Each query's ranking is identical to its single-query
    * [[bm25SearchIndexed]] run. */
  def bm25SearchManyIndexed(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: Seq[(Long, Seq[String])], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    rankBm25Many(spark, table, queries, k, k1, b)
      .select("query_id", "doc_id", "score")
      .orderBy(col("query_id"), col("score").desc, col("doc_id"))

  /** Shared multi-query BM25 ranking: per-query `(doc_id, score, r_sparse)`
    * capped at `limit`, off one scan of the union of all query terms'
    * posting buckets. */
  private def rankBm25Many(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: Seq[(Long, Seq[String])], limit: Int,
      k1: Double, b: Double): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "a BM25 workload needs at least one query, each with terms")
    graft.sources.Formats.requireBuilt(spark, table)
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val words = queries.flatMap(_._2).distinct
    // dedupe the FLATTENED (qid, word) pairs, not per-entry: a workload
    // repeating a query_id across entries must not double-count a term's
    // BM25 contribution (single-query isin() dedupes implicitly; ADVICE r9)
    val qTerms = queries.flatMap { case (qid, ts) => ts.map((qid, _)) }
      .distinct.toDF("query_id", "word")
    val p = spark.table(table).filter(col("word").isin(words: _*))
    val dfq = p.groupBy("word").agg(count(lit(1)).as("df"))
    val stats = spark.table(table + "_stats")
      .select(col("n_docs"),
        (col("total_dl").cast("double") / col("n_docs")).as("avgdl"))
    val wS = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    p.join(broadcast(qTerms), Seq("word"))
      .join(broadcast(dfq), Seq("word"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), bm25ScoreCol(k1, b).as("s"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum("s"), 6).as("score"))
      .withColumn("r_sparse", row_number().over(wS).cast("long"))
      .filter(col("r_sparse") <= limit)
  }

  /** Rank a BM25 top-`candidates` table into `(doc_id, r_sparse)`. The
    * candidate list is <= `candidates` rows by construction, so the
    * single-partition rank window is bounded. */
  private def sparseRanking(bm25Top: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    bm25Top.withColumn("r_sparse",
      row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("r_sparse"))
  }

  /** The shared RRF tail of the direct and indexed hybrid searches: fuse a
    * `(doc_id, r_sparse)` and a `(doc_id, r_dense)` ranking with
    * `Σ 1/(kRrf + rank)`. One expression for both paths so they cannot
    * drift; both inputs are candidate-bounded, so the full-outer join runs
    * on two tiny tables regardless of corpus size. */
  private[graft] def rrfFuse(sparse: DataFrame, dense: DataFrame, k: Int,
      kRrf: Int): DataFrame =
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("r_sparse")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("r_dense")), lit(0.0))).as("rrf"),
        col("r_sparse"), col("r_dense"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)

  /** Query-many half of HYBRID retrieval — the production composition the
    * two index builds exist for: the sparse ranking probes a stored
    * [[buildBm25Index]] table (reads ONLY the query terms' postings), the
    * dense ranking probes a stored [[graft.ops.Similarity.buildLshIndex]]
    * table over the hash-embed vectors (reads ONLY the query's band
    * buckets), and the same RRF tail as [[hybridSearch]] fuses the two.
    * Per-query cost is O(postings + band buckets) — no corpus scan and no
    * re-featurization on either side, which is the difference between a
    * search engine and a batch job at 100 TB. The dense ranks are the LSH
    * probe's (band-collision candidates re-ranked by exact cosine), so the
    * fusion semantics are `RRF(bm25, lshTopKIndexed)` — the oracle replays
    * the banding, not the brute-force scan. */
  def hybridSearchIndexed(spark: org.apache.spark.sql.SparkSession,
      bm25Table: String, lshTable: String, terms: Seq[String],
      queryId: Long = 0L, k: Int = 20, candidates: Int = 100,
      kRrf: Int = 60): DataFrame = {
    val sparse = sparseRanking(bm25SearchIndexed(spark, bm25Table, terms, candidates))
    val dense = Similarity.lshTopKIndexed(spark, lshTable,
      col("vec_id") === queryId, candidates)
      .select(col("neighbor_id").as("doc_id"), col("rn").as("r_dense"))
    rrfFuse(sparse, dense, k, kRrf)
  }

  /** The per-(doc, term) BM25 contribution over columns
    * (tf, df, dl, n_docs, avgdl) — ONE expression shared by the direct and
    * indexed search paths so their scores are bit-identical (both gates
    * share one oracle). */
  private def bm25ScoreCol(k1: Double, b: Double): org.apache.spark.sql.Column =
    log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
      (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))

  /** Corpus stats row (n_docs, avgdl) from the per-doc length table.
    * avgdl is the double quotient of exact longs (a doc length sum and a
    * count), so the one-shot and incremental index paths compute the SAME
    * double — a float avg whose partial-sum order varied could not
    * guarantee that. */
  private def bm25Stats(dl: DataFrame): DataFrame =
    dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl"))
      .select(col("n_docs"),
        (col("total_dl").cast("double") / col("n_docs")).as("avgdl"))

  private def rankBm25(perTerm: DataFrame, k: Int): DataFrame =
    perTerm.groupBy("doc_id").agg(round(sum("s"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  /** Posting rows of the persisted BM25 index: one row per (word, doc)
    * carrying the term frequency AND the document length denormalized in —
    * the classic search-index layout, so a probe never joins the
    * corpus-sized doc-length table. */
  private def bm25Postings(docs: DataFrame): DataFrame = {
    val tf = docs.select(
      col("doc_id"),
      explode(SharedCorpus.alnumOf(docs)).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    tf.join(tf.groupBy("doc_id").agg(sum("tf").as("dl")), "doc_id")
  }

  /** Build-once half of the BM25 build/query split (the inverted-index
    * twin of [[graft.ops.Similarity.buildLshIndex]]): posting lists
    * bucketed + sorted on `word` (probes on a term set read only matching
    * buckets, and per-word aggregation plans exchange-free), plus a
    * one-row `<table>_stats` side table holding exact (n_docs, total_dl).
    * df is NOT stored: a probe derives each query term's df by counting
    * that term's postings — the rows it already reads — so appends never
    * rewrite global state beyond the stats row. */
  def buildBm25Index(docs: DataFrame, table: String, numBuckets: Int = 8): Unit = {
    graft.sources.Formats.writeBucketed(bm25Postings(docs), table, Seq("word"), numBuckets)
    graft.sources.Formats.writeManaged(
      docs.sparkSession.table(table).select("doc_id", "dl").distinct()
        .agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl")),
      table + "_stats")
    val (n, fp) = graft.sources.Formats.corpusStamp(docs, "doc_id")
    graft.sources.Formats.writeBuildMeta(docs.sparkSession, table,
      s"kind=bm25,buckets=$numBuckets", n, fp)
  }

  /** Incremental-ingest half: posting rows of the NEW batch appended into
    * the bucketed layout (existing postings are neither read nor
    * rewritten — Spark bucketing is per-file), and the stats row updated
    * by pure integer addition from a one-row read. Batches must be
    * doc-disjoint (same contract as the ANN index appends); because df is
    * probe-derived and the stats math is exact integer sums, a two-batch
    * index answers bit-identically to a one-shot build of the union.
    *
    * Crash contract: the append is NOT atomic across (postings, stats
    * row, manifest) — a mid-append crash leaves the family inconsistent,
    * and naively re-running would double-append the postings half.
    * Recovery is a rebuild, or routing ingest through the ledgered
    * [[graft.streaming.StreamOps.absorbStagedBatches]] path, whose
    * batch-granular ledger makes the replay window explicit (and whose
    * crash recovery is failpoint-proven in StreamOpsSpec). */
  def appendToBm25Index(newDocs: DataFrame, table: String, numBuckets: Int = 8): Unit = {
    val spark = newDocs.sparkSession
    val p = bm25Postings(newDocs)
    graft.sources.Formats.writeBucketedAppend(p, table, Seq("word"), numBuckets)
    val add = p.select("doc_id", "dl").distinct()
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl")).collect()(0)
    val old = spark.table(table + "_stats").collect()(0)
    import spark.implicits._
    graft.sources.Formats.writeManaged(
      Seq((old.getLong(0) + add.getLong(0), old.getLong(1) + add.getLong(1)))
        .toDF("n_docs", "total_dl"),
      table + "_stats")
    val (bn, bfp) = graft.sources.Formats.corpusStamp(newDocs, "doc_id")
    graft.sources.Formats.foldBuildMeta(spark, table,
      s"kind=bm25,buckets=$numBuckets", bn, bfp)
  }

  /** Delete propagation — the FORGET half of the BM25 index lifecycle:
    * the deleted documents' posting rows are physically removed through
    * [[graft.sources.Formats.purgeBucketed]]'s crash-safe rewrite, the
    * one-row `_stats` table is rewritten by exact-integer subtraction of
    * the deleted docs' (count, Σdl) — read from the postings BEFORE the
    * rewrite, the mirror of the append's addition — and the manifest
    * folds the deleted ids out (xor is self-inverse). A purged index
    * then scores every query bit-identically to one REBUILT from the
    * filtered corpus: df, N, and avgdl are all derived from exactly the
    * surviving postings + stats (PurgeSpec proves table, stats, and
    * manifest equality).
    *
    * The folded stamp and stats cover only `deleteIds ∩ posting doc
    * ids`, so over-broad or re-issued forget requests are safe no-ops.
    * One caveat that asymmetry buys: a corpus document with ZERO alnum
    * tokens has no posting rows, so purging its id folds nothing — its
    * build-time stamp contribution stays in the manifest until a
    * rebuild (it never affects scoring; scoring reads postings only).
    * Same HARD CONTRACT as the appends: single writer, crash between
    * the rewrites and the meta fold means rebuild. */
  def purgeFromBm25Index(spark: org.apache.spark.sql.SparkSession, table: String,
      deleteIds: DataFrame, numBuckets: Int = 8): Unit = {
    graft.sources.Formats.requireBuilt(spark, table)
    val ids = deleteIds.select("doc_id").distinct()
    val present = spark.table(table)
      .join(broadcast(ids), "doc_id").select("doc_id", "dl").distinct()
    val del = present.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl")).collect()(0)
    val (dn, dfp) = graft.sources.Formats.corpusStamp(present.select("doc_id"), "doc_id")
    graft.sources.Formats.purgeBucketed(spark, table,
      Seq("word"), numBuckets, "doc_id", ids)
    val old = spark.table(table + "_stats").collect()(0)
    import spark.implicits._
    graft.sources.Formats.writeManaged(
      Seq((old.getLong(0) - del.getLong(0),
        old.getLong(1) - (if (del.isNullAt(1)) 0L else del.getLong(1))))
        .toDF("n_docs", "total_dl"),
      table + "_stats")
    graft.sources.Formats.foldBuildMeta(spark, table,
      s"kind=bm25,buckets=$numBuckets", -dn, dfp)
  }

  /** Query-many half: [[bm25Search]] semantics (and the same oracle)
    * against a stored [[buildBm25Index]] table. The probe reads ONLY the
    * query terms' postings (bucket pruning on the `word` filter), derives
    * df from those same rows with an exchange-free per-word count, and
    * broadcasts df + the stats row — so query cost scales with the terms'
    * posting lists, never the corpus. */
  def bm25SearchIndexed(spark: org.apache.spark.sql.SparkSession, table: String,
      terms: Seq[String], k: Int = 20, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25SearchIndexed needs at least one query term")
    graft.sources.Formats.requireBuilt(spark, table)
    val p = spark.table(table).filter(col("word").isin(terms: _*))
    val dfq = p.groupBy("word").agg(count(lit(1)).as("df"))
    val stats = spark.table(table + "_stats")
      .select(col("n_docs"),
        (col("total_dl").cast("double") / col("n_docs")).as("avgdl"))
    rankBm25(
      p.join(broadcast(dfq), "word")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), bm25ScoreCol(k1, b).as("s")), k)
  }

  /** Bigram language-model scoring — the CCNet-style perplexity-proxy
    * quality signal: train an add-one-smoothed bigram model on the corpus
    * itself (counts + vocab size), then score every document by its mean
    * log P(w_i | w_{i-1}). Low scores flag boilerplate/gibberish the way a
    * real KenLM filter does; the model here is the corpus's own statistics
    * so the gate needs no model file, but the plan shape is the production
    * shape (swap the self-trained count tables for a reference corpus's).
    *
    * Scale: bigram extraction is a single projection (adjacent pairs of the
    * alnum-filtered token array — no self-join); the count tables are
    * map-side-combined hash aggregates on word keys; scoring is two shuffle
    * joins of the token-scale table against the much smaller count tables
    * (AQE broadcasts them when they fit) plus one broadcast scalar for the
    * vocab size — the tfIdf plan family. Per-doc mean is the only float
    * aggregate; rounded to 6 places like tfidf for cross-engine stability. */
  def lmScore(docs: DataFrame): DataFrame = {
    val f = docs.select(col("doc_id"), SharedCorpus.alnumOf(docs).as("a"))
    // bigrams materialized ONCE (r19, guide §1.2): as a plan, `bi` is
    // referenced by the score join AND (via c12) the count tables, so the
    // corpus tokenize + bigram explode executed three times per call; c12
    // likewise feeds both the join and c1. At 100 TB the production path
    // is the stored-model twin (ta_lm_indexed) — this keeps the
    // from-scratch twin at one tokenize pass for the bigram side.
    val bi = f.where(size(col("a")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(a) - 2), i -> struct(a[i] AS w1, a[i + 1] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .localCheckpoint(eager = false)
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(eager = false)
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = f.select(explode(col("a")).as("w")).agg(count_distinct(col("w")).as("v"))
    bi.join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log((col("c12") + lit(1.0)) / (col("c1") + col("v")))), 6).as("avg_logp"))
  }

  /** The (w1, w2) adjacent-bigram projection of a corpus — the shared
    * extraction of the LM build, append, and score paths. */
  private def lmBigrams(docs: DataFrame): DataFrame =
    docs.select(SharedCorpus.alnumOf(docs).as("a"))
      .where(size(col("a")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(a) - 2), i -> struct(a[i] AS w1, a[i + 1] AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Build-once half of the LM build/score split, mirroring
    * [[buildBm25Index]]: persist the bigram model [[lmScore]] retrains on
    * every call — `<table>` = (w1, w2, c12) bucketed + sorted on `w1`,
    * `<table>_c1` = (w1, c1) bucketed on `w1` (the exact integer row sums
    * of c12), and `<table>_vocab` = the distinct unigrams bucketed on
    * `w` (the vocab SIZE is a probe-side count over it — a distinct
    * count is NOT batch-additive, so the model stores the distinct SET,
    * which unions trivially under append). All statistics are exact
    * integers, so scoring against the stored model is bit-identical to
    * [[lmScore]]'s train-per-call — the indexed gate shares its oracle.
    * At 100 TB the corpus-scale training aggregations run once here;
    * scoring then joins token-scale bigrams against count tables that
    * AQE broadcasts when they fit.
    *
    * Incremental contract (the delta-table design every warehouse uses
    * for additive models): the stored rows are batch DELTAS — a probe
    * folds them with an EXCHANGE-FREE per-bucket aggregation (the tables
    * are bucketed on the fold key, so hash(w1) already clusters every
    * delta of a key in one task) — and [[appendToLmModel]] lands a new
    * batch's deltas without reading or rewriting the accumulated model.
    * Within-doc bigram counts are exactly additive across doc-disjoint
    * batches, so an N-batch model folds to the one-shot build's numbers
    * bit-for-bit. [[graft.sources.Formats.compactBucketed]]-style
    * maintenance (aggregate + rewrite) applies when the delta count
    * grows. */
  def buildLmModel(docs: DataFrame, table: String, numBuckets: Int = 8): Unit = {
    val c12 = lmBigrams(docs).groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    graft.sources.Formats.writeBucketed(c12, table, Seq("w1"), numBuckets)
    val spark = docs.sparkSession
    graft.sources.Formats.writeBucketed(
      spark.table(table).groupBy("w1").agg(sum("c12").as("c1")),
      s"${table}_c1", Seq("w1"), numBuckets)
    graft.sources.Formats.writeBucketed(
      docs.select(SharedCorpus.alnumOf(docs).as("a"))
        .select(explode(col("a")).as("w")).distinct(),
      s"${table}_vocab", Seq("w"), numBuckets)
    val (n, fp) = graft.sources.Formats.corpusStamp(docs, "doc_id")
    graft.sources.Formats.writeBuildMeta(docs.sparkSession, table,
      s"kind=lm2,buckets=$numBuckets", n, fp)
  }

  /** Incremental-ingest half: the NEW batch's count deltas and distinct
    * unigrams appended into the bucketed layouts — the accumulated model
    * is neither read nor rewritten (Spark bucketing is per-file), and the
    * probe's per-bucket fold makes an N-batch model answer bit-identically
    * to a one-shot build of the union (same oracle). Batches must be
    * doc-disjoint, the family-wide append contract. */
  def appendToLmModel(newDocs: DataFrame, table: String, numBuckets: Int = 8): Unit = {
    val bi = lmBigrams(newDocs)
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    graft.sources.Formats.writeBucketedAppend(c12, table, Seq("w1"), numBuckets)
    graft.sources.Formats.writeBucketedAppend(
      c12.groupBy("w1").agg(sum("c12").as("c1")),
      s"${table}_c1", Seq("w1"), numBuckets)
    graft.sources.Formats.writeBucketedAppend(
      newDocs.select(SharedCorpus.alnumOf(newDocs).as("a"))
        .select(explode(col("a")).as("w")).distinct(),
      s"${table}_vocab", Seq("w"), numBuckets)
    val (n, fp) = graft.sources.Formats.corpusStamp(newDocs, "doc_id")
    graft.sources.Formats.foldBuildMeta(newDocs.sparkSession, table,
      s"kind=lm2,buckets=$numBuckets", n, fp)
  }

  /** Maintenance half of the LM delta design: fold the accumulated
    * per-batch delta rows back to one aggregated row per key (and the
    * vocab back to one distinct set) and one file per bucket — what
    * bounds both a probe's fold work and its file count after sustained
    * ingest. Runs through the crash-safe rewrite
    * ([[graft.sources.Formats.compactDeltaTable]]), so every crash
    * window recovers by re-running; scores are identical before and
    * after (the probe's fold is exactly what this materializes once). */
  def compactLmModel(spark: org.apache.spark.sql.SparkSession, table: String,
      numBuckets: Int = 8): Unit = {
    graft.sources.Formats.compactDeltaTable(spark, table,
      Seq("w1", "w2"), Seq("c12"), Seq("w1"), numBuckets)
    graft.sources.Formats.compactDeltaTable(spark, s"${table}_c1",
      Seq("w1"), Seq("c1"), Seq("w1"), numBuckets)
    graft.sources.Formats.compactDeltaTable(spark, s"${table}_vocab",
      Seq("w"), Seq.empty, Seq("w"), numBuckets)
  }

  /** Score half: [[lmScore]] semantics (same oracle) against a stored
    * [[buildLmModel]] table triple. The scored docs' bigram projection is
    * the only corpus-scale pass — counts and vocab are read, not
    * retrained. Bigrams unseen by the stored model drop out of the score
    * exactly as they do in the train-per-call form's inner joins. */
  def lmScoreIndexed(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
      table: String): DataFrame = {
    graft.sources.Formats.requireBuilt(spark, table)
    val bi = docs.select(col("doc_id"), SharedCorpus.alnumOf(docs).as("a"))
      .where(size(col("a")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(a) - 2), i -> struct(a[i] AS w1, a[i + 1] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // fold the batch DELTAS into totals: both count tables are bucketed
    // on the fold key, so these aggregations plan with NO exchange (a
    // one-shot build has one delta per key and folds to itself); the
    // vocab size is a distinct count over the stored unigram SET — the
    // one statistic that cannot be stored as an additive scalar
    val c12 = spark.table(table).groupBy("w1", "w2").agg(sum("c12").as("c12"))
    val c1 = spark.table(s"${table}_c1").groupBy("w1").agg(sum("c1").as("c1"))
    val stats = spark.table(s"${table}_vocab")
      .agg(count_distinct(col("w")).as("v"))
    bi.join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log((col("c12") + lit(1.0)) / (col("c1") + col("v")))), 6).as("avg_logp"))
  }

  /** TextRank keyword extraction — PageRank over the corpus's word
    * co-occurrence graph (nodes = alnum words, undirected edges = adjacent
    * word pairs weighted by adjacency count, self-loops dropped), fixed
    * `iters` damped iterations from a uniform start, top-k by final rank.
    * The third deterministic training loop in the engine next to k-means
    * and BPE — and unlike those, its per-round state (the rank vector) is
    * FULLY distributed: nothing but a node count ever reaches the driver.
    *
    * Cross-engine determinism is the k-means trick re-applied: ranks live
    * as FIXED-POINT integers (scale 1e12). Each edge's contribution
    * `damping * (w / W_src) * r_src` is one double expression rounded to
    * a long BEFORE the incoming-edge sum, so every aggregation is exact
    * integer addition — summation order (the thing that differs across
    * partitionings and engines) cannot move a single bit. The DuckDB
    * oracle replays all `iters` rounds as chained CTEs.
    *
    * Scale shape: the corpus is touched ONCE (the bigram projection —
    * adjacent pairs of the token array, no self-join); everything after
    * runs on the vocab-sized node table and the unique-bigram-sized edge
    * table. Each iteration is one shuffle join of edges against ranks and
    * one map-side-combined integer sum — the textbook distributed
    * PageRank step. Edge/node tables are persisted across the loop and
    * released before return; the final rank table stays cached
    * (caller-clears contract, as for the pair miners). */
  def textRank(docs: DataFrame, iters: Int = 8, damping: Double = 0.85,
      k: Int = 20): DataFrame = {
    val edges = textRankEdgeDeltas(docs)
    val nodes = docs.select(SharedCorpus.alnumOf(docs).as("a"))
      .select(explode(col("a")).as("word")).distinct()
    rankLoop(edges, nodes, iters, damping, k)
  }

  /** The undirected weighted co-occurrence edge counts of a corpus — the
    * corpus-scale half of [[textRank]], and the DELTA rows
    * [[buildTextRankEdges]] stores (adjacency counts are within-doc, so
    * they are exactly additive across doc-disjoint batches). */
  private def textRankEdgeDeltas(docs: DataFrame): DataFrame = {
    val bi = docs.select(SharedCorpus.alnumOf(docs).as("a"))
      .where(size(col("a")) >= 2)
      .select(explode(expr(
        "filter(transform(sequence(0, size(a) - 2), " +
          "i -> struct(a[i] AS w1, a[i + 1] AS w2)), p -> p.w1 != p.w2)")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    bi.select(col("w1").as("src"), col("w2").as("dst"))
      .unionAll(bi.select(col("w2").as("src"), col("w1").as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  /** The shared fixed-point PageRank loop of the direct and
    * edge-table-stored paths. `edges` must carry the FOLDED (src, dst, w)
    * totals; `nodes` the full word set INCLUDING isolated words — they
    * carry teleport-only rank, and the vocab count n sets the teleport
    * mass, so dropping them would move every rank. */
  private def rankLoop(edges: DataFrame, nodes0: DataFrame, iters: Int,
      damping: Double, k: Int): DataFrame = {
    val e = edges.join(edges.groupBy("src").agg(sum("w").as("wsrc")), "src").persist()
    val nodes = nodes0.persist()
    val n = nodes.count() // vocab count — the loop's only driver traffic
    val scale = 1e12
    val init = math.round(scale / n)
    val teleport = math.round((1.0 - damping) * scale / n)
    // Unlike the BPE/k-means loops there is NO per-round driver dependency
    // (ranks never leave the cluster), so the iterations compose LAZILY:
    // each round chains one join + one integer aggregation onto the plan
    // and a single action at the end runs the whole chain as one job. The
    // edge/node tables are referenced by every round and stay persisted
    // (caller-clears contract, as for the pair miners) — forcing a
    // cache+count per round was 5x slower in fixed job overhead.
    var r = nodes.withColumn("r", lit(init))
    for (_ <- 1 to iters) {
      val contrib = e.join(r.withColumnRenamed("word", "src"), "src")
        .select(col("dst").as("word"),
          round(lit(damping) * (col("w").cast("double") / col("wsrc")) * col("r"))
            .cast("long").as("c"))
        .groupBy("word").agg(sum("c").as("cin"))
      r = nodes.join(contrib, Seq("word"), "left")
        .select(col("word"),
          (lit(teleport) + coalesce(col("cin"), lit(0L))).as("r"))
    }
    r.orderBy(col("r").desc, col("word")).limit(k)
      .select(col("word"), col("r").as("rank"))
  }

  /** Build-once half of the TextRank graph lifecycle: the co-occurrence
    * edge DELTAS bucketed on `src` plus the full node set (the LM vocab
    * pattern — a distinct set unions under append where a count scalar
    * would not), stamped with the build manifest. The corpus-scale bigram
    * extraction runs here; ranking then iterates over the vocab-scale
    * graph without ever rescanning the corpus. */
  def buildTextRankEdges(docs: DataFrame, table: String, numBuckets: Int = 8): Unit = {
    graft.sources.Formats.writeBucketed(
      textRankEdgeDeltas(docs), table, Seq("src"), numBuckets)
    graft.sources.Formats.writeBucketed(
      docs.select(SharedCorpus.alnumOf(docs).as("a"))
        .select(explode(col("a")).as("word")).distinct(),
      s"${table}_nodes", Seq("word"), numBuckets)
    val (n, fp) = graft.sources.Formats.corpusStamp(docs, "doc_id")
    graft.sources.Formats.writeBuildMeta(docs.sparkSession, table,
      s"kind=textrank_edges,buckets=$numBuckets", n, fp)
  }

  /** Incremental-ingest half: the NEW batch's edge deltas and node rows
    * appended — the accumulated graph is neither read nor rewritten, and
    * within-doc adjacency counts are exactly additive across doc-disjoint
    * batches, so N appended batches fold to the one-shot extraction
    * bit-for-bit (the gate shares [[textRank]]'s oracle). */
  def appendToTextRankEdges(newDocs: DataFrame, table: String,
      numBuckets: Int = 8): Unit = {
    graft.sources.Formats.writeBucketedAppend(
      textRankEdgeDeltas(newDocs), table, Seq("src"), numBuckets)
    graft.sources.Formats.writeBucketedAppend(
      newDocs.select(SharedCorpus.alnumOf(newDocs).as("a"))
        .select(explode(col("a")).as("word")).distinct(),
      s"${table}_nodes", Seq("word"), numBuckets)
    val (n, fp) = graft.sources.Formats.corpusStamp(newDocs, "doc_id")
    graft.sources.Formats.foldBuildMeta(newDocs.sparkSession, table,
      s"kind=textrank_edges,buckets=$numBuckets", n, fp)
  }

  /** Maintenance: fold the accumulated edge deltas back to one row per
    * (src, dst) and the node set to one row per word — same crash-safe
    * merging rewrite and same rationale as [[compactLmModel]]; ranks are
    * identical before and after. */
  def compactTextRankEdges(spark: org.apache.spark.sql.SparkSession,
      table: String, numBuckets: Int = 8): Unit = {
    graft.sources.Formats.compactDeltaTable(spark, table,
      Seq("src", "dst"), Seq("w"), Seq("src"), numBuckets)
    graft.sources.Formats.compactDeltaTable(spark, s"${table}_nodes",
      Seq("word"), Seq.empty, Seq("word"), numBuckets)
  }

  /** Rank from the STORED graph: fold the edge deltas (exchange-free on
    * the bucketed src key), distinct the node set, and run the same
    * fixed-point loop — the corpus is never rescanned, so a re-rank after
    * ingest costs vocab-scale work only. Bit-identical to [[textRank]]
    * over the same corpus (same oracle). */
  def textRankIndexed(spark: org.apache.spark.sql.SparkSession, table: String,
      iters: Int = 8, damping: Double = 0.85, k: Int = 20): DataFrame = {
    graft.sources.Formats.requireBuilt(spark, table)
    val edges = spark.table(table).groupBy("src", "dst").agg(sum("w").as("w"))
    val nodes = spark.table(s"${table}_nodes").select("word").distinct()
    rankLoop(edges, nodes, iters, damping, k)
  }

  /** Approximate distinct-term counts per source (HyperLogLog++) next to
    * the exact count. The approx path is the 100 TB answer — constant
    * memory per group, mergeable sketch, no second shuffle of raw terms;
    * the exact column exists here to expose the error empirically
    * (TextAnalysisSpec bounds it). Sketch internals differ per engine, so
    * this query is rows-only in the driver gate. */
  /** Count-min frequency sketch over all alnum tokens — the mergeable
    * point-frequency twin of [[approxDistinctWords]]'s HLL sketch: one
    * pass, `eps * N` additive error, never underestimates, and sketches
    * merge across partitions (which is how Spark computes it). At 100 TB
    * this answers "how often does token X occur" without a word-keyed
    * shuffle — the sketch is the only thing that crosses the wire. */
  def tokenCountSketch(docs: DataFrame, eps: Double = 1e-4,
      confidence: Double = 0.99): org.apache.spark.util.sketch.CountMinSketch =
    docs.select(explode(SharedCorpus.alnumOf(docs)).as("word"))
      .stat.countMinSketch(col("word"), eps, confidence, 42)

  /** Per-source distinct-word counts: HLL++ sketch next to the exact
    * count. The sketch VALUE is engine-specific (un-oracle-able by
    * construction), but its accuracy contract is not: `ok` asserts
    * `|approx − exact| <= max(16, 5·rsd·exact)` — five relative standard
    * deviations at rsd = 0.02, with an absolute floor for tiny sources —
    * so the DuckDB gate hash-checks the exact count AND the bound as
    * deterministic values (VERDICT r10 item 8) instead of a rows-only
    * pass. */
  def approxDistinctWords(docs: DataFrame): DataFrame = {
    val toks = docs.select(
      col("source"),
      explode(SharedCorpus.alnumOf(docs)).as("word"))
    // Pre-reduce to the DISTINCT (source, word) pairs first (r19, guide
    // §2.3): the one-aggregate form planned countDistinct +
    // approx_count_distinct as an Expand — the full token stream
    // duplicated 2x and shuffled. The distinct-pair aggregation partial-
    // aggregates map-side, so only vocabulary-sized rows cross the wire;
    // n_exact is then a plain count and the HLL sketch is IDENTICAL
    // (register updates are multiplicity-invariant, so feeding each word
    // once per source yields the same estimate as once per occurrence).
    val words = toks.groupBy("source", "word").agg(count(lit(1)).as("c"))
    words.groupBy("source").agg(
      count(lit(1)).as("n_exact"),
      approx_count_distinct(col("word"), 0.02).as("n_approx"))
      .select(col("source"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")).cast("double") <=
          greatest(lit(16.0), lit(5.0 * 0.02) * col("n_exact")))
          .cast("int").as("ok"))
      .orderBy("source")
  }

  /** Vocabulary DISPERSION per source — the two classic "is this source
    * a real corpus or a template mill" signals over the word-frequency
    * distribution:
    *
    *  - GINI coefficient of word counts, computed EXACTLY as an integer
    *    rational: with counts x₁≤…≤xₙ (rank i), `G = (2Σi·xᵢ − (n+1)·S)
    *    / (n·S)` — numerator/denominator emitted as longs, the double is
    *    one exact division. Rank ties don't matter mathematically (equal
    *    x values contribute the same Σi·x under any tie order), but the
    *    (count, word) tiebreak keeps the plan deterministic anyway.
    *  - Shannon ENTROPY `ln(T) − (Σ c·ln c)/T`, rounded to 6 decimals —
    *    the [[tfIdf]] discipline: JVM StrictMath.log and libm differ by
    *    ≤1 ulp (~1e-16) and no corpus value sits near a 1e-6 boundary,
    *    so the quantized value is engine-exact.
    *
    * The per-source rank window sorts the VOCABULARY histogram (tens of
    * thousands of rows), never the token stream — the corpus contributes
    * one counting aggregation. */
  def vocabDispersion(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(col("source"), explode(SharedCorpus.alnumOf(docs)).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("c"), col("word"))
    counts
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_vocab"), sum("c").as("total_tokens"),
        sum(col("i") * col("c")).as("ixc"),
        sum(col("c") * log(col("c").cast("double"))).as("clnc"))
      .select(col("source"), col("n_vocab"), col("total_tokens"),
        (lit(2L) * col("ixc") - (col("n_vocab") + 1) * col("total_tokens"))
          .as("gini_num"),
        (col("n_vocab") * col("total_tokens")).as("gini_den"),
        round(log(col("total_tokens").cast("double")) -
          col("clnc") / col("total_tokens"), 6).as("entropy6"))
      .orderBy("source")
  }

  // ---- stored HLL sketch lifecycle: the mergeable distinct-count
  // ARTIFACT (Datasketches HLL via Spark's hll_sketch_agg family) ----

  /** Build the per-source distinct-word sketch table: one Datasketches
    * HLL sketch row per source, plus the family's one-row build manifest.
    * THE point of a stored sketch over [[approxDistinctWords]]'s inline
    * `approx_count_distinct`: the sketch is a PERSISTED, MERGEABLE
    * artifact — tomorrow's batch appends its own sketch rows without
    * rereading the accumulated corpus, and the union of sketches IS the
    * sketch of the union (HLL merge = element-wise register max, exact —
    * SketchSpec pins union-of-batches == one-shot to the bit). That is
    * the only way a 100 TB pipeline tracks corpus-lifetime distinct
    * counts: the corpus is scanned once per batch, state is KB-sized. */
  def buildHllIndex(docs: DataFrame, table: String, lgK: Int = 12): Unit = {
    val sk = docs
      .select(col("source"), explode(SharedCorpus.alnumOf(docs)).as("word"))
      .groupBy("source")
      .agg(expr(s"hll_sketch_agg(word, $lgK)").as("sketch"))
    graft.sources.Formats.writeBucketed(sk, table, Seq("source"), 4)
    val (n, fp) = graft.sources.Formats.corpusStamp(docs, "doc_id")
    graft.sources.Formats.writeBuildMeta(docs.sparkSession, table,
      s"kind=hll,lgk=$lgK", n, fp)
  }

  /** Ingest half: the batch's own sketch rows appended as DELTAS (same
    * delta-table discipline as the LM counts — the accumulated sketches
    * are neither read nor rewritten; the probe's union folds them).
    * Doc-disjointness is NOT required here: HLL union is idempotent on
    * re-inserted values (register max), so overlapping batches stay
    * CORRECT for the estimate — only the manifest stamp keeps the
    * family-wide disjointness convention. */
  def appendToHllIndex(newDocs: DataFrame, table: String, lgK: Int = 12): Unit = {
    val sk = newDocs
      .select(col("source"), explode(SharedCorpus.alnumOf(newDocs)).as("word"))
      .groupBy("source")
      .agg(expr(s"hll_sketch_agg(word, $lgK)").as("sketch"))
    graft.sources.Formats.writeBucketedAppend(sk, table, Seq("source"), 4)
    val (n, fp) = graft.sources.Formats.corpusStamp(newDocs, "doc_id")
    graft.sources.Formats.foldBuildMeta(newDocs.sparkSession, table,
      s"kind=hll,lgk=$lgK", n, fp)
  }

  /** Probe: per-source estimate from the UNION of stored sketch rows —
    * KB-scale, no corpus access. */
  def distinctFromHllIndex(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame = {
    graft.sources.Formats.requireBuilt(spark, table)
    spark.table(table).groupBy("source")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch, false))").as("n_est"))
  }

  /** Gate form: stored-sketch estimates against the exact counts, with
    * the accuracy contract as deterministic booleans ([[approxDistinctWords]]'s
    * oracle discipline — lgK=12 ⇒ rsd ≈ 1.04/√4096 ≈ 1.6%, bounded at
    * ~3σ = 5% with an absolute floor for tiny sources). The exact side
    * is computed for the ORACLE's benefit; a deployment reads only
    * [[distinctFromHllIndex]]. */
  def hllDistinctIndexed(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, table: String): DataFrame = {
    val est = distinctFromHllIndex(spark, table)
    docs.select(col("source"), explode(SharedCorpus.alnumOf(docs)).as("word"))
      .groupBy("source").agg(countDistinct(col("word")).as("n_exact"))
      .join(broadcast(est), Seq("source"))
      .select(col("source"), col("n_exact"),
        (abs(col("n_est") - col("n_exact")).cast("double") <=
          greatest(lit(16.0), lit(0.05) * col("n_exact")))
          .cast("int").as("ok"))
      .orderBy("source")
  }

  /** Heavy hitters by exact count next to a COUNT-MIN SKETCH probe — the
    * third mergeable-sketch family (HLL distinct, KLL quantiles, CMS
    * frequencies): at 100 TB the per-partition CMS tables merge by
    * element-wise ADD (commutative, so the sketch is partition- and
    * order-invariant given a fixed seed) and frequency queries never
    * rescan the corpus. The gate follows the sketch contract pattern
    * (VERDICT r10 item 8): the top-k words and exact counts hash-compare,
    * and the sketch's accuracy contract rides as deterministic booleans —
    * `ok_lower` (CMS never underestimates, a hard guarantee) and
    * `ok_upper` (estimate ≤ exact + 2·ε·N; Markov over the ~10
    * independent rows at conf 0.999 puts the failure odds per word below
    * 1e-6, vs the ~1% per word a 1·ε·N bound would gamble on a hash
    * gate). The driver holds only the sketch (depth×width counters) and
    * the k result rows. */
  def heavyHittersCms(docs: DataFrame, k: Int = 50, eps: Double = 0.005,
      conf: Double = 0.999, seed: Int = 42): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(explode(SharedCorpus.alnumOf(docs)).as("word"))
    val sketch = words.stat.countMinSketch("word", eps, conf, seed)
    val slack = math.ceil(2.0 * eps * sketch.totalCount).toLong
    val top = words.groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(k)
      .collect() // k result rows — the output, not the corpus
      .map { r =>
        val (w, c) = (r.getString(0), r.getLong(1))
        val est = sketch.estimateCount(w)
        (w, c, if (est >= c) 1 else 0, if (est <= c + slack) 1 else 0)
      }
    top.toSeq.toDF("word", "cnt", "ok_lower", "ok_upper")
      .orderBy(col("cnt").desc, col("word"))
  }

  // ---- stored COUNT-MIN SKETCH lifecycle (r15): the mergeable
  // point-FREQUENCY artifact, completing the persisted-sketch trio
  // (HLL distinct counts above, the moments/profile artifacts in
  // Formats/events, and now CMS frequencies) ----

  /** Default CMS depth (independent hash rows). */
  val CmsDepth = 4
  /** Default CMS width (counter slots per row). Build parameters, not
    * engine constants (VERDICT r15 missing #2): [[buildCmsIndex]] takes
    * `depth`/`width`, persists them in the manifest, and every probe and
    * append reads them back from the ARTIFACT — at 100 TB vocabulary the
    * operator widens the sketch at build time (ε·N error scales with
    * 1/width), no recompile. */
  val CmsWidth = 2048

  /** Slot of `word` in CMS hash row `d`: one [[CrossHash.h32]] family
    * member per row — the same seeded-MD5 discipline as the MinHash
    * permutations, so the sketch CONTENT (not just its contract) has an
    * exact DuckDB mirror. */
  private def cmsSlot(word: Column, d: Int, width: Int): Column =
    pmod(graft.functions.CrossHash.h32(concat(lit(s"cms$d:"), word)),
      lit(width.toLong))

  /** DuckDB equivalent of [[cmsSlot]], for oracle authoring. */
  def cmsSlotSql(wordExpr: String, d: Int, width: Int = CmsWidth): String =
    s"${graft.functions.CrossHash.h32Sql(s"'cms$d:' || $wordExpr")} % $width"

  /** [[cmsSlotSql]] with the depth as a SQL expression (e.g. a `t.d`
    * column) instead of a literal — the single definition both the engine
    * and every DuckDB oracle share, so a change to the hash or the width
    * cannot drift the two sides (ADVICE r15). `'cms' || CAST(d AS
    * VARCHAR) || ':'` concatenates to exactly the literal `'cms$d:'`
    * prefix of the column form. */
  def cmsSlotSqlD(wordExpr: String, dExpr: String, width: Int = CmsWidth): String =
    s"${graft.functions.CrossHash.h32Sql(
      s"'cms' || CAST($dExpr AS VARCHAR) || ':' || $wordExpr")} % $width"

  /** The batch's sketch rows: `(d, slot, cnt)` counter increments.
    * Computed vocabulary-first (one word-keyed count, map-side combined),
    * then each VOCAB row fans out to `depth` slot increments — the
    * depth replication touches the histogram, never the token stream.
    * Unlike Spark's `stat.countMinSketch` (an opaque driver-side blob),
    * the sketch here is a RELATION: merge = slot-wise ADD = a grouped
    * sum, probe = a broadcast join, compaction = the same ping-pong
    * rewrite every stored family uses — and the estimate itself is
    * oracle-replayable because [[cmsSlot]] is cross-engine. */
  private def cmsRows(docs: DataFrame, depth: Int, width: Int): DataFrame = {
    val vc = docs.select(explode(SharedCorpus.alnumOf(docs)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
    vc.select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), cmsSlot(col("word"), d, width).as("slot"))): _*)).as("ds"),
        col("c"))
      .groupBy(col("ds.d").as("d"), col("ds.slot").as("slot"))
      .agg(sum("c").as("cnt"))
  }

  /** The stored sketch's `(depth, width)`, read back from its build
    * manifest — the artifact, not the binary, is the source of truth. */
  def cmsParams(spark: org.apache.spark.sql.SparkSession, table: String): (Int, Int) = {
    val p = graft.sources.Formats.metaParams(spark, table)
    require(p.get("kind").contains("cms"),
      s"'$table' is not a CMS family (manifest kind=${p.getOrElse("kind", "?")})")
    (p("d").toInt, p("w").toInt)
  }

  /** Build the stored CMS: ≤ depth·width counter rows + the family's
    * one-row build manifest recording `d`/`w`. At 100 TB the corpus
    * contributes one map-side-combined count; the stored artifact is
    * KB-scale (width is a BUILD choice — size it to the vocabulary's
    * ε·N error budget here, not at compile time). */
  def buildCmsIndex(docs: DataFrame, table: String,
      depth: Int = CmsDepth, width: Int = CmsWidth): Unit = {
    graft.sources.Formats.writeBucketed(cmsRows(docs, depth, width), table, Seq("slot"), 4)
    val (n, fp) = graft.sources.Formats.corpusStamp(docs, "doc_id")
    graft.sources.Formats.writeBuildMeta(docs.sparkSession, table,
      s"kind=cms,d=$depth,w=$width", n, fp)
  }

  /** Ingest half: the batch's OWN counter rows appended as deltas (the
    * accumulated sketch is neither read nor rewritten — the LM-counts
    * delta discipline); the probe folds duplicates by summation, and
    * [[compactCmsIndex]] collapses them back to one row per slot. CMS
    * merge is counter addition, so append-then-fold == one-shot exactly
    * (SketchSpec pins it), PROVIDED batches are doc-disjoint — CMS adds,
    * so re-inserting a batch double-counts; the manifest stamp xor is
    * exactly the guard that makes a replayed append detectable.
    *
    * The batch's rows are hashed with the STORED `(d, w)` read from the
    * manifest — an append can never disagree with the build's geometry.
    * A caller that *believes* it knows the geometry declares it via
    * `expectDepth`/`expectWidth` and a mismatch fails loudly BEFORE any
    * data row is written (appending rows hashed at the wrong width would
    * silently corrupt every estimate — the exact failure the manifest
    * exists to prevent). */
  def appendToCmsIndex(newDocs: DataFrame, table: String,
      expectDepth: Option[Int] = None, expectWidth: Option[Int] = None): Unit = {
    val (d, w) = cmsParams(newDocs.sparkSession, table)
    require(expectDepth.forall(_ == d) && expectWidth.forall(_ == w),
      s"append declared CMS geometry d=${expectDepth.getOrElse(d)}," +
        s"w=${expectWidth.getOrElse(w)} but '$table' was built with d=$d,w=$w — " +
        "appending rows hashed at a different geometry would silently corrupt " +
        "every estimate; rebuild or drop the declaration")
    graft.sources.Formats.writeBucketedAppend(cmsRows(newDocs, d, w), table, Seq("slot"), 4)
    val (n, fp) = graft.sources.Formats.corpusStamp(newDocs, "doc_id")
    graft.sources.Formats.foldBuildMeta(newDocs.sparkSession, table,
      s"kind=cms,d=$d,w=$w", n, fp)
  }

  /** Collapse appended delta rows to one row per `(d, slot)` — rides the
    * crash-safe BUCKETED ping-pong rewrite (the table is slot-bucketed,
    * so the rewrite must restage bucketed files — the plain rewrite
    * would leave a bucketed catalog entry pointing at unbucketed files). */
  def compactCmsIndex(spark: org.apache.spark.sql.SparkSession, table: String): Unit =
    graft.sources.Formats.rewriteBucketed(spark, table, Seq("slot"), 4)(
      _.groupBy("d", "slot").agg(sum("cnt").as("cnt")))

  /** Point-frequency estimates for `queries` (a one-column `word` frame)
    * from the stored sketch: fan each query word to its stored-depth
    * slots, broadcast-join the folded counter rows, estimate = min over
    * rows. The folded sketch is BROADCAST — it is bounded at depth·width
    * rows by construction, so the probe joins with no shuffle however
    * large the query set. No corpus access; an unseen word whose slots
    * are all empty estimates 0 (left join + coalesce — the inner-join
    * form would silently drop it). The query words are hashed with the
    * `(d, w)` read from the build manifest (one extra one-row read next
    * to [[graft.sources.Formats.requireBuilt]]'s catalog check) —
    * probing at a guessed width would hash every word to the wrong
    * slots. */
  def cmsEstimates(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame): DataFrame = {
    graft.sources.Formats.requireBuilt(spark, table)
    val (depth, width) = cmsParams(spark, table)
    val folded = spark.table(table).groupBy("d", "slot").agg(sum("cnt").as("cnt"))
    val fan = queries.select(col("word"),
        explode(array((0 until depth).map(d =>
          struct(lit(d).as("d"), cmsSlot(col("word"), d, width).as("slot"))): _*)).as("ds"))
      .select(col("word"), col("ds.d").as("d"), col("ds.slot").as("slot"))
    fan.join(broadcast(folded), Seq("d", "slot"), "left")
      .groupBy("word").agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Gate form: the exact top-`k` words (computed corpus-side for the
    * ORACLE's benefit — a deployment reads only [[cmsEstimates]]) joined
    * with their stored-sketch estimates. Every column hash-compares:
    * the DuckDB oracle replays the sketch construction slot for slot,
    * which is strictly stronger evidence than [[heavyHittersCms]]'s
    * accuracy booleans — the estimate VALUE is pinned cross-engine. */
  def heavyHittersFromCms(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, table: String, k: Int = 20): DataFrame = {
    val top = docs.select(explode(SharedCorpus.alnumOf(docs)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(k)
    top.join(broadcast(cmsEstimates(spark, table, top.select("word"))), Seq("word"))
      .select(col("word"), col("cnt"), col("est"))
      .orderBy(col("cnt").desc, col("word"))
  }

  /** One-pass pipeline audit counters via Spark's `Observation` API: the
    * curation filter runs ONCE and its input count, input token total and
    * survivor count ride the SAME pass as accumulator-backed observed
    * metrics — no second scan, which at 100 TB is the difference between
    * auditing a pipeline and doubling its cost. EAGER by design (the
    * metrics only exist after an action); returns the one-row counter
    * table the audit log would persist. The counters are exact integers,
    * so the oracle is a plain re-aggregation. */
  def observedCurationCounters(docs: DataFrame, minQuality: Double = 0.6): DataFrame = {
    val spark = docs.sparkSession
    val (ws, alnum) = (SharedCorpus.wsOf(docs), SharedCorpus.alnumOf(docs))
    val scored = docs.select(col("doc_id"),
      nTokensCol(ws).as("n_tokens"), qualityColOf(ws, alnum).as("q"))
    val obs = org.apache.spark.sql.Observation()
    // the observe node sits ABOVE the scoring projection and BELOW the
    // filter, so the metrics see every input row while the action drives
    // only the survivors
    scored.observe(obs,
      count(lit(1)).as("n_in"),
      sum(col("n_tokens")).as("tokens_in"),
      count(when(col("q") >= minQuality, 1)).as("n_kept"))
      .filter(col("q") >= minQuality)
      .count()
    val m = obs.get
    import spark.implicits._
    Seq((m("n_in").asInstanceOf[Long], m("tokens_in").asInstanceOf[Long],
      m("n_kept").asInstanceOf[Long]))
      .toDF("n_in", "tokens_in", "n_kept")
  }

  /** Corpus distribution-drift report — the pipeline monitor a training
    * team reads when a new crawl lands: the k words whose relative
    * frequency moved most between corpus A and corpus B. Drift is ranked
    * by the EXACT integer cross-multiplication
    * `|cnt_a·total_b − cnt_b·total_a|` (the common-denominator form of
    * `|freq_a − freq_b|`), computed in DECIMAL so the ordering — the part
    * boundary ties would corrupt — never touches a float; the per-side
    * relative frequencies are emitted as single exact-long divisions for
    * the human reader. Words present on only one side count 0 on the
    * other (full-outer + coalesce).
    *
    * Scale shape: one token explode + word-keyed count per side (map-side
    * combined), a full-outer word join of the two vocab-sized count
    * tables, two one-row total scalars broadcast, one top-k sort on the
    * exact key. At real scale the drift product stays in DECIMAL end to
    * end; the gate surfaces it as a LONG (exact for any corpus whose
    * token total squares under 2^63). */
  def distributionDrift(a: DataFrame, b: DataFrame, k: Int = 20): DataFrame = {
    def counts(df: DataFrame, cName: String) =
      df.select(explode(SharedCorpus.alnumOf(df)).as("word"))
        .groupBy("word").agg(count(lit(1)).as(cName))
    val ca = counts(a, "cnt_a")
    val cb = counts(b, "cnt_b")
    val totals = ca.agg(sum("cnt_a").as("total_a"))
      .crossJoin(cb.agg(sum("cnt_b").as("total_b")))
    val dec = "decimal(18,0)"
    ca.join(cb, Seq("word"), "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
      .crossJoin(broadcast(totals))
      .withColumn("drift_x",
        abs(col("cnt_a").cast(dec) * col("total_b") -
          col("cnt_b").cast(dec) * col("total_a")))
      .select(
        col("word"), col("cnt_a"), col("cnt_b"),
        (col("cnt_a").cast("double") / col("total_a")).as("freq_a"),
        (col("cnt_b").cast("double") / col("total_b")).as("freq_b"),
        col("drift_x").cast("long").as("drift"))
      .orderBy(col("drift").desc, col("word"))
      .limit(k)
  }

  /** Unicode NFC normalization audit — the canonicalization pass a
    * multilingual corpus runs before fingerprinting/dedup, so visually
    * identical strings with different codepoint sequences (`é` precomposed
    * vs `e`+combining acute) collapse to one form. Emits per-document raw
    * and normalized codepoint lengths plus the normalized fingerprint —
    * the columns a curation pipeline joins back to decide "was this
    * document non-canonical?" (len_raw != len_nfc) without shipping the
    * text twice.
    *
    * Runs on [[graft.functions.NfcNormalize]], a codegen'd Catalyst
    * expression (a Scala UDF would break whole-stage codegen on the
    * corpus's hottest scan). Single projection, no shuffle. */
  def normalizeText(docs: DataFrame): DataFrame = {
    graft.functions.NfcNormalize.register(docs.sparkSession)
    val norm = expr("nfc_normalize(text)")
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("len_raw"),
      length(norm).cast("long").as("len_nfc"),
      CrossHash.h60(norm).as("nfc_fp"))
  }

  /** Within-document repetition statistics — the Gopher/MassiveText-family
    * repetition filters: the fraction of a document's 2-gram/3-gram
    * occurrences that are repeats, and the share claimed by its single most
    * frequent 2-gram. High values flag the auto-generated boilerplate and
    * keyword-stuffed spam that per-corpus dedup can't see (the repetition
    * is *inside* one document).
    *
    * Scale: ONE projection, zero shuffles — repetition is an intra-document
    * property, so nothing ever needs to cross the wire. Totals are direct
    * arithmetic on the token count; distinct counts are `array_distinct`
    * per row; the top-gram multiplicity is a max-run fold over the SORTED
    * gram array (duplicates are adjacent after `sort_array`), so the whole
    * operator is embarrassingly parallel and its cost is exactly one corpus
    * scan at any scale. (The first cut shuffled (doc_id, gram) pairs twice
    * and joined back — 7 s at sf0.1 for what this form does in well under
    * one; per-doc stats never needed a shuffle at all.) The emitted
    * fractions are single IEEE divisions of exact integer counts —
    * bit-identical across engines and layouts, no rounding. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    def gramArr(n: Int) = s"CASE WHEN size(a) >= $n THEN " +
      s"transform(sequence(0, size(a) - $n), i -> concat_ws(' ', slice(a, i + 1, $n))) " +
      "ELSE array() END"
    // longest run of equal adjacent elements in the sorted gram array ==
    // the highest multiplicity of any gram
    val maxRun =
      """aggregate(sort_array(g2),
        |  named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
        |  (s, x) -> IF(s.prev IS NOT NULL AND x = s.prev,
        |    named_struct('prev', x, 'run', s.run + 1, 'best', greatest(s.best, s.run + 1)),
        |    named_struct('prev', x, 'run', 1, 'best', greatest(s.best, 1))),
        |  s -> s.best)""".stripMargin
    // explicit zero-denominator branch: under ANSI mode (Spark 4 default)
    // even double 0/0 raises DIVIDE_BY_ZERO instead of yielding NULL
    def frac(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den).otherwise(lit(0.0))
    docs.select(col("doc_id"), SharedCorpus.wsOf(docs).as("a"))
      .withColumn("g2", expr(gramArr(2)))
      .withColumn("g3", expr(gramArr(3)))
      .select(
        col("doc_id"),
        size(col("a")).cast("long").as("n_tokens"),
        greatest(size(col("a")) - 1, lit(0)).cast("long").as("t2"),
        size(array_distinct(col("g2"))).cast("long").as("d2"),
        expr(maxRun).cast("long").as("m2"),
        greatest(size(col("a")) - 2, lit(0)).cast("long").as("t3"),
        size(array_distinct(col("g3"))).cast("long").as("d3"))
      .select(
        col("doc_id"), col("n_tokens"),
        frac(col("t2") - col("d2"), col("t2")).as("dup_2gram_frac"),
        frac(col("m2"), col("t2")).as("top_2gram_frac"),
        frac(col("t3") - col("d3"), col("t3")).as("dup_3gram_frac"))
  }
  // ^ UNSORTED (r18): the final orderBy was presentational — the driver's
  // gate sorts rows before hashing (see mapreduce_wordcount, green since r1
  // with non-ORDER-BY row order) — and it was not free: a global sort on a
  // zero-shuffle operator adds a range exchange whose bound-sampling pass
  // re-executes the whole gram projection, i.e. ~2x the operator
  // (guide §2.4, the ta_hash_embed r16 precedent). At 100 TB the sort also
  // forces a corpus-wide range shuffle no caller of per-doc stats needs.

  /** Per-source curation funnel — the acceptance report a curation team
    * reads before committing a filter config: how many documents survive
    * each successive stage (quality floor → language gate → repetition
    * cap). Chained `count(when(...))` conditional aggregates over ONE scan
    * computing every signal column at once (the [[curationPipeline]]
    * single-pass discipline); counts are exact integers, so the oracle
    * comparison is trivial, and the columns are monotone non-increasing by
    * construction (spec-pinned). At 100 TB this is one map-side-combined
    * aggregation keyed by source. */
  /** Duplicate-2-gram occurrence fraction of the ws token-array column
    * named `a` — [[repetitionStats]]'s zero-shuffle form, shared by
    * [[filterFunnel]] and [[graft.ops.Curation.dailyBatch]] so the two
    * funnels cannot drift. */
  private[ops] def dup2FracOfA: Column = dup2FracOf(col("a"))

  /** Duplicate-bigram fraction of a token-array column. Callers that sit
    * under a FILTER must pass a cheap reference (a lambda variable or a
    * materialized column), not the raw `split()` expression: predicate
    * pushdown substitutes blindly (no CollapseProject-style "referenced
    * more than once and non-cheap" guard), so a split passed here would
    * re-tokenize at every reference — including INSIDE the per-element
    * lambda, i.e. twice per token (see [[graft.ops.Curation.qualityGate]]
    * for the let-binding that prevents this). */
  private[ops] def dup2FracOf(a: Column): Column = {
    val t2 = greatest(size(a) - 1, lit(0)).cast("long")
    // distinct bigrams as a ZIP of two slices into structs — one
    // interpreted call per array instead of a per-element lambda
    // building concat strings (measured 15-22x: the HOF interpreter's
    // per-element eval + string allocation dominated the whole quality
    // gate). Struct equality == string equality here: whitespace-split
    // tokens cannot contain the separator, so (w1, w2) pairs and
    // "w1 w2" strings have identical distinct counts.
    val d2 = size(array_distinct(arrays_zip(
      slice(a, lit(1), t2), slice(a, lit(2), t2)))).cast("long")
    when(t2 > 0, (t2 - d2).cast("double") / t2).otherwise(lit(0.0))
  }

  def filterFunnel(docs: DataFrame, minQuality: Double = 0.6,
      lang: String = "en", maxDup2: Double = 0.05): DataFrame = {
    val dup2 = dup2FracOfA
    docs
      .select(col("source"), SharedCorpus.wsOf(docs).as("a"),
        SharedCorpus.alnumOf(docs).as("al"))
      .select(col("source"), qualityColOf(col("a"), col("al")).as("q"),
        predLangColOf(col("a")).as("l"), dup2.as("r"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        count(when(col("q") >= minQuality, 1)).as("n_quality"),
        count(when(col("q") >= minQuality && col("l") === lang, 1)).as("n_lang"),
        count(when(col("q") >= minQuality && col("l") === lang &&
          col("r") <= maxDup2, 1)).as("n_clean"))
      .orderBy("source")
  }

  /** PII patterns for [[redactPii]] — deliberately lookaround-free so the
    * same pattern text runs identically under Java regex (Spark) and RE2
    * (DuckDB), which is what lets the redaction gate hash-match across
    * engines. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re  = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII redaction — the scrubbing pass a training corpus runs before
    * anything else sees the text: emails, phone-shaped numbers, and IPv4
    * literals are replaced with typed placeholder tokens, with per-doc
    * match counts kept as the audit signal. Pure codegen'd regex
    * expressions (no UDF), one projection over the corpus — the same
    * single-scan shape as the rest of this module, unchanged at 100 TB.
    * Replacement order is fixed (email → phone → IP) and the placeholder
    * tokens contain no digits, so the three patterns cannot create or
    * destroy each other's matches. */
  def redactPii(docs: DataFrame): DataFrame = {
    val redacted = regexp_replace(regexp_replace(regexp_replace(
      col("text"), EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"), Ipv4Re, "<IP>")
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      redacted.as("redacted"),
      CrossHash.h60(redacted).as("redacted_fp"))
  }

  /** Document fingerprints: a 60-bit content hash of the raw text and one
    * of the whitespace-normalized text (lowercase, runs of whitespace
    * collapsed) — the exact-dedup keys, usable directly in a groupBy at
    * any scale because they are plain codegen'd column expressions. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      CrossHash.h60(col("text")).as("fp_raw"),
      fpNormCol.as("fp_norm"))

  /** End-to-end curation pipeline — the composite a training-data run
    * actually executes: score quality + language + fingerprint in ONE scan
    * of the corpus, keep documents clearing the quality bar in the target
    * language, then drop near-identical texts (normalized-fingerprint
    * dedup, lowest doc_id survives). Plan shape: one projection plus one
    * hash-shuffle on the 60-bit key — the keep-one is a `min(struct)`
    * argmin (the [[graft.ops.Dedup.nearDupSurvivorsBy]] pattern), so it
    * partial-aggregates map-side and never sorts within a key; unchanged
    * at 100 TB. */
  def curationPipeline(docs: DataFrame, minQuality: Double = 0.6,
      lang: String = "en"): DataFrame = {
    val (ws, alnum) = (SharedCorpus.wsOf(docs), SharedCorpus.alnumOf(docs))
    val scored = docs.select(
      col("doc_id"),
      nTokensCol(ws).as("n_tokens"),
      qualityColOf(ws, alnum).as("quality"),
      predLangColOf(ws).as("pred_lang"),
      fpNormCol.as("fp_norm"))
    val kept = scored.filter(col("quality") >= minQuality && col("pred_lang") === lang)
    kept.groupBy(col("fp_norm"))
      .agg(min(struct(col("doc_id"), col("n_tokens"), col("quality"))).as("k"))
      .select(col("k.doc_id").as("doc_id"), col("k.n_tokens").as("n_tokens"),
        col("k.quality").as("quality"))
  }

  /** Text→vector featurization: hashing-trick bag-of-tokens (signed
    * feature hashing, Weinberger et al. 2009) over the alnum token stream.
    * Each token scatters a ±1 vote into dimension `h("he:"+tok) % dim`
    * (sign from an independent hash bit), and the integer vote vector is
    * L2-normalized to a FLOAT array — the same shape as the `embeddings`
    * table, so the whole similarity/ANN tier composes directly over raw
    * text (clean → embed → dedup/ANN end-to-end from the corpus; the
    * reference's mapper-defines-the-feature pattern,
    * srics96/SDC_Mapreduce `src/app/mapper.py:10-18`).
    *
    * Scale + exactness: explode tokens (two codegen'd md5s per token) and
    * hash-aggregate the ±1 votes on (doc_id, dim) — map-side combinable,
    * so at 100 TB the shuffle carries at most docs×dim partial sums, not
    * the token stream. (A zero-shuffle per-row fold was tried first and is
    * ~100× slower: scattering into a dim-wide accumulator is O(dim) of
    * interpreted lambda per token, outside whole-stage codegen.) The
    * dense vector assembles per doc from the vote map; all arithmetic is
    * exact-integer until the final `v / sqrt(Σv²)`, two correctly-rounded
    * IEEE ops over exact ints — bit-identical in DuckDB's replay with no
    * rounding escape hatch. Empty/all-filtered docs get the zero vector
    * (explode_outer keeps them; null-dim votes are dropped at assembly). */
  def hashEmbed(docs: DataFrame, dim: Int = Similarity.Dim): DataFrame = {
    val voted = docs
      .select(col("doc_id"), explode_outer(SharedCorpus.alnumOf(docs)).as("tok"))
      .groupBy(col("doc_id"),
        pmod(CrossHash.h60(concat(lit("he:"), col("tok"))), lit(dim.toLong)).as("idx"))
      .agg(sum(when(
        pmod(CrossHash.h60(concat(lit("hs:"), col("tok"))), lit(2L)) === 0, 1L)
        .otherwise(-1L)).as("v"))
    // Dense assembly with NO higher-order functions: transform/aggregate
    // lambdas are CodegenFallback (interpreted per row, outside
    // whole-stage codegen) and measured ~3x slower here; `dim` is a
    // compile-time constant, so the vector is an explicit dim-wide array
    // of codegen'd element_at lookups and the squared norm is the exact
    // integer vote sum aggregated alongside the map (identical to the
    // array fold it replaces: absent dims contribute zero).
    voted.groupBy(col("doc_id"))
      .agg(
        map_from_entries(
          collect_list(when(col("idx").isNotNull, struct(col("idx"), col("v")))))
          .as("m"),
        sum(when(col("idx").isNotNull, col("v") * col("v")).otherwise(0L)).as("ss"))
      .select(col("doc_id"),
        array((0 until dim).map(i =>
          coalesce(element_at(col("m"), lit(i.toLong)), lit(0L))): _*).as("v"),
        sqrt(col("ss").cast("double")).as("norm"))
      .select(col("doc_id"),
        array((0 until dim).map(i =>
          when(col("norm") > 0, col("v")(i).cast("double") / col("norm"))
            .otherwise(lit(0.0d)).cast("float")): _*).as("embedding"))
  }

  /** PER-TOKEN-WINDOW featurization — [[hashEmbed]] lifted from documents
    * to consecutive `winTokens`-token windows of the alnum token stream:
    * one L2-normalized signed-hash vector per (doc, window), capped at the
    * first `maxWins` windows (the truncated-encoding convention every
    * late-interaction encoder applies — ColBERT truncates documents to a
    * fixed token budget). This is the corpus-derived multi-vector input
    * the MaxSim stack serves ([[graft.ops.Similarity.maxSimTopKTokens]]):
    * text → window vectors → late-interaction retrieval end-to-end with
    * no given embeddings table, closing the same loop for the multi-vector
    * stack that [[hashEmbed]] + LSH closed for the single-vector one.
    *
    * Unlike [[hashEmbed]] the result is position-DEPENDENT (windows chunk
    * the ordered token stream), but both engines' tokenizers preserve
    * stream order, so the replay is still exact. All-cancelled (zero-norm)
    * windows are dropped on both sides — a zero vector has no cosine and
    * would ride engine-specific NaN semantics into the ranking. Scale
    * shape: one explode + two hash-aggregations, map-side combinable,
    * shuffle bounded by docs × maxWins × dim partial sums. Returns
    * `(doc_id, win, embedding)`. */
  def hashEmbedWindows(docs: DataFrame, dim: Int = Similarity.Dim,
      winTokens: Int = 8, maxWins: Int = 4): DataFrame = {
    val voted = docs
      .select(col("doc_id"), posexplode(SharedCorpus.alnumOf(docs)).as(Seq("pos", "tok")))
      .withColumn("win", expr(s"pos div $winTokens"))
      .filter(col("win") < maxWins)
      .groupBy(col("doc_id"), col("win"),
        pmod(CrossHash.h60(concat(lit("he:"), col("tok"))), lit(dim.toLong)).as("idx"))
      .agg(sum(when(
        pmod(CrossHash.h60(concat(lit("hs:"), col("tok"))), lit(2L)) === 0, 1L)
        .otherwise(-1L)).as("v"))
    voted.groupBy(col("doc_id"), col("win"))
      .agg(
        map_from_entries(collect_list(struct(col("idx"), col("v")))).as("m"),
        sum(col("v") * col("v")).as("ss"))
      .filter(col("ss") > 0) // all-cancelled window: no direction to keep
      .select(col("doc_id"), col("win"),
        array((0 until dim).map(i =>
          coalesce(element_at(col("m"), lit(i.toLong)), lit(0L))): _*).as("v"),
        sqrt(col("ss").cast("double")).as("norm"))
      .select(col("doc_id"), col("win"),
        array((0 until dim).map(i =>
          (col("v")(i).cast("double") / col("norm")).cast("float")): _*).as("embedding"))
  }
}
