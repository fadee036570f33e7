package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text dataflow operators — the reference's entire query surface, Spark-first.
  *
  * The reference (srics96/SDC_Mapreduce) computes word count over text corpora:
  * tokenize on whitespace (`src/app/mapper.py:4-6`), keep alnum tokens
  * (`src/app/mapper.py:16`), emit `(word, 1)` (`:18`), hash-shuffle on word
  * (`src/worker/worker.cpp:244-250`), per-key sum with a two-level combiner tree
  * (`src/app/reducer.py:17-24`, `src/worker/worker.cpp:290-299`), key-sorted text
  * output (`src/app/reducer.py:26-27`).
  *
  * Here the whole pipeline is one declarative chain: Catalyst plans the shuffle,
  * `HashAggregateExec` gives partial+final aggregation (the combiner tree) for
  * free, and every step stays inside whole-stage codegen. At 100 TB the shape is
  * unchanged — the shuffle keys on `word` (high cardinality, low skew) and the
  * map-side partial agg collapses each input split to its distinct-word counts
  * before the exchange.
  */
object TextOps {

  /** Reference mapper's token filter: `word.isalnum()` (`src/app/mapper.py:16`). */
  val AlnumRe = "^[A-Za-z0-9]+$"

  /** Tokenize a text column on whitespace → array column (reference M2). */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** One row per alnum token (reference M1+M2+M3 — the mapper as a dataflow). */
  def explodeTokens(df: DataFrame, textCol: String): DataFrame =
    df.select(col("*"), explode(tokens(col(textCol))).as("word"))
      .filter(col("word").rlike(AlnumRe))

  /** Flagship word count (reference's one real query, end-to-end). */
  def wordCount(docs: DataFrame): DataFrame =
    explodeTokens(docs.select("text"), "text")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Tokens per document — tokenize/project shape with a per-key aggregate. */
  def tokensPerDoc(docs: DataFrame): DataFrame =
    explodeTokens(docs.select("doc_id", "text"), "text")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"))
}
