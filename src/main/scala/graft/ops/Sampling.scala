package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CrossHash

/** Deterministic sampling for training-data pipelines — hash-based, not
  * `rand()`-based: a hash of a stable key gives the same sample on every
  * run, every retry, every engine (reproducibility is a correctness
  * requirement for dataset curation, and `rand()` breaks it under task
  * retry and partition reordering). All three operators are pure
  * projections/filters over the key hash — no shuffle except the explicit
  * per-stratum top-k — and all are oracle-checkable because [[CrossHash]]
  * has an exact DuckDB mirror.
  */
object Sampling {

  /** Uniform `pct`% sample: keep rows whose key-hash bucket (0..99) falls
    * below `pct`. Deterministic, stable under repartitioning, and
    * composable (different `salt` values give independent samples). */
  def hashSample(df: DataFrame, keyCol: String, pct: Int, salt: String = ""): DataFrame =
    df.filter(bucket100(keyCol, salt) < pct)

  private def bucket100(keyCol: String, salt: String): Column =
    pmod(CrossHash.h32(concat(lit(salt), col(keyCol).cast("string"))), lit(100L))

  /** DuckDB mirror of the sampling predicate (oracle authoring). */
  def bucket100Sql(keyExpr: String, salt: String = ""): String =
    s"${CrossHash.h32Sql(s"'$salt' || CAST($keyExpr AS VARCHAR)")} % 100"

  /** Stratified sample: per-stratum percentage rates (e.g. downsample the
    * dominant language, keep the rest) — the class-rebalancing primitive.
    * Unlisted strata default to `defaultPct`. */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct).cast("long")) { case (acc, (k, v)) =>
      when(col(strataCol) === k, v.toLong).otherwise(acc)
    }
    df.filter(bucket100(keyCol, "") < rate)
  }

  /** Exactly `n` pseudo-random rows per stratum: rank by key hash within
    * each stratum, keep the first n. Deterministic "reservoir" — one
    * shuffle on the stratum key. */
  def perStratumSample(df: DataFrame, keyCol: String, strataCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(CrossHash.h32(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
      .drop("rn")
  }

  /** Deterministic train/validation/test split assignment: each row's
    * key-hash bucket (0..99) lands in exactly one of the cumulative
    * percentage ranges, so the assignment is (a) DISJOINT and EXHAUSTIVE
    * by construction, (b) stable under re-partitioning, re-ingestion and
    * engine choice (the reproducibility contract an eval split must
    * carry — a `randomSplit` re-deals the corpus on every retry), and
    * (c) pure projection: no shuffle, no state. `splits` maps name →
    * percentage and must sum to 100 (fail loudly — a silent 95% split
    * would leak 5% of documents out of every split). */
  def splitAssign(df: DataFrame, keyCol: String,
      splits: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10),
      salt: String = "split"): DataFrame = {
    require(splits.map(_._2).sum == 100,
      s"split percentages must sum to 100: $splits")
    val edges = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }
    val b = bucket100(keyCol, salt)
    val assign = splits.zip(edges).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), lo)) => when(b >= lo, name).otherwise(acc)
    }
    df.withColumn("split", assign)
  }

  /** DuckDB mirror of [[splitAssign]]'s rule, for oracle authoring. */
  def splitAssignSql(keyExpr: String,
      splits: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10),
      salt: String = "split"): String = {
    val edges = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }
    val b = bucket100Sql(keyExpr, salt)
    val cases = splits.zip(edges).reverse.map { case ((name, _), lo) =>
      s"WHEN $b >= $lo THEN '$name'"
    }.mkString(" ")
    s"CASE $cases END"
  }

  /** LEAKAGE-FREE train/val/test split — [[splitAssign]] lifted from
    * documents to NEAR-DUP COMPONENTS: a plain per-document hash split
    * routinely places a document in train and its near-duplicate in test,
    * silently turning the eval set into memorization credit (the classic
    * contamination-through-splitting failure every LLM data pipeline must
    * close). Here the unit of assignment is the whole near-dup component:
    * resolve components exactly as [[Dedup.nearDupComponents]] (MinHash
    * band collisions → hybrid union-find / min-label propagation), then
    * hash-split on the component LABEL, so every member of a component —
    * and therefore every near-dup pair — lands in the SAME split by
    * construction. Singletons (label == doc_id) degrade to the plain
    * per-document split.
    *
    * Scale shape: the component resolution is the already-bounded hybrid
    * (banded pair list, never all-pairs; ≤4M-edge driver union-find or
    * distributed pointer jumping), and the split itself stays a pure
    * projection over the label — deterministic, disjoint + exhaustive,
    * stable under repartitioning, engine-replayable (the oracle computes
    * the same labels via recursive-CTE closure and the same bucket rule).
    * Returns `(doc_id, label, split)`. */
  def splitAssignLeakFree(docs: DataFrame,
      splits: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10),
      salt: String = "split"): DataFrame = {
    val labels = Dedup.nearDupComponents(docs)
    val out = splitAssign(labels, "label", splits, salt)
      .select(col("doc_id"), col("label"), col("split"))
      .orderBy("doc_id")
      .persist()
    out.count() // materialize before releasing the label table
    labels.unpersist()
    out
  }

  /** SPLIT-STABILITY audit for [[splitAssignLeakFree]] under corpus
    * growth — the operational question the component-keyed split raises
    * that the plain per-doc split never does: a new document can BRIDGE
    * two components, merging them under a new (smaller) minimum label,
    * and every member of the absorbed component flips split. A training
    * pipeline must SEE that before it happens silently (an eval doc
    * flipping into train invalidates history; train flipping into test
    * leaks memorized data into eval). This report computes the leak-free
    * assignment over yesterday's corpus and today's, joins on the common
    * documents, and returns the split TRANSITION MATRIX — one row per
    * (split_was, split_now) with the doc count and the id range, so the
    * off-diagonal mass (the flips) is one glance and the flipped ids are
    * range-boundable for a follow-up listing. The diagonal-only matrix
    * is the stability certificate a release pipeline gates on.
    *
    * Scale shape: two component resolutions (each the bounded hybrid)
    * plus one equi-join on doc_id and a ≤|splits|² aggregation — nothing
    * new shuffles beyond what the assignments themselves cost. */
  def splitDriftReport(docsOld: DataFrame, docsNew: DataFrame,
      splits: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10),
      salt: String = "split"): DataFrame = {
    val a = splitAssignLeakFree(docsOld, splits, salt)
    val b = splitAssignLeakFree(docsNew, splits, salt)
    val out = a.select(col("doc_id"), col("split").as("split_was"))
      .join(b.select(col("doc_id"), col("split").as("split_now")), Seq("doc_id"))
      .groupBy("split_was", "split_now")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("split_was", "split_now")
      .persist()
    out.count() // materialize before releasing the two assignment tables
    a.unpersist(); b.unpersist()
    out
  }

  /** Systematic probability-proportional-to-size document sampling: walk
    * each `source`'s documents in deterministic hash order accumulating
    * token counts, and keep a document iff its token span crosses a
    * multiple of `stepTokens` — so inclusion probability is proportional
    * to document LENGTH (one kept doc per `stepTokens` corpus tokens).
    * This is the size-weighted sample a curation pipeline audits with
    * (inspect documents in proportion to the tokens they contribute, so
    * the review covers the corpus by token mass, not by document count);
    * docs longer than `stepTokens` are always kept.
    *
    * The hash-order token walk is [[graft.ops.Packing.tokenBudgetSample]]'s
    * plan (one shuffle on `source`, per-source window sum) with the prefix
    * predicate swapped for the boundary-crossing rule; all arithmetic is
    * exact integer `div` on longs, so the kept set is a pure function of
    * the corpus — no float drift, no `rand()`. For a pathologically hot
    * source, salt into sub-strata exactly as
    * [[graft.ops.Packing.tokenBudgetSampleSalted]] does. */
  def ppsSample(docs: DataFrame, stepTokens: Long = 400L): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), col("source"),
      size(SharedCorpus.wsOf(docs)).cast("long").as("n_tokens"),
      Packing.orderHash.as("h"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .where(expr(s"(cum_before + n_tokens) div $stepTokens") >
        expr(s"cum_before div $stepTokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_before"))
      .orderBy("doc_id")
  }
}
