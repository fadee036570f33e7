package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins — the 100 TB failure mode the reference never
  * reaches (its hash shuffle `std::hash(word) % R`,
  * srics96/SDC_Mapreduce `src/worker/worker.cpp:244-250`, sends every
  * record of a hot key to one reducer with no recourse).
  *
  * Two tools, complementary:
  *  - AQE skew-join (`spark.sql.adaptive.skewJoin.enabled`, on by default
  *    in Spark 4) splits oversized shuffle partitions at runtime — free,
  *    use it first.
  *  - [[saltedJoin]] for when the skew is in the KEY ITSELF (one key >>
  *    one partition): spread the big side's hot keys over `salt` synthetic
  *    sub-keys and replicate the small side once per sub-key. Join results
  *    are identical to the plain join; the shuffle fans the hot key out
  *    `salt` ways at the cost of a `salt`-times replication of the small
  *    side (bounded: replicate AFTER pruning the small side to its join
  *    columns).
  */
object Skew {

  /** Pre-flight KEY-SKEW report for a planned join/aggregation — the
    * diagnostic a 100 TB pipeline runs BEFORE picking between the plain
    * shuffle, AQE, and [[saltedJoin]]: for each candidate key column, the
    * top-`topK` heaviest values with their share of the table (ppm) and
    * their multiple of the mean per-key count. A key whose `x_mean_pct`
    * is in the thousands is the one that pins a reducer (exactly the
    * reference's `std::hash(word) % R` failure mode,
    * srics96/SDC_Mapreduce `src/worker/worker.cpp:244-250`).
    *
    * Scale design: ONE pass over the table for ALL audited columns — each
    * row explodes to one `(key_col, key_value)` entry per column, so the
    * scan happens once (the top-k and stats branches both read the
    * shared histogram aggregation, deduped at runtime by exchange reuse
    * — PlanAuditSpec pins it) and the only wide state is the per-column
    * value HISTOGRAM (vocabulary-scale, not row-scale); the top-k sits
    * on the histogram. All derived measures are exact integer arithmetic
    * (`div`) with the `x_mean_pct` numerator widened through
    * decimal(38,0) — `cnt * n_distinct * 100` exceeds 2^63 once a
    * ~1e11-row hot key meets a vocabulary-scale n_distinct, exactly the
    * 100 TB shape this report exists to flag — so the report is engine-
    * and partitioning-exact at any scale. Ties in the top-k rank break
    * on `key_value` ascending NULLS LAST (DuckDB's ORDER BY default), so
    * auditing a nullable key column stays oracle-exact. */
  def keySkewReport(df: DataFrame, keyCols: Seq[String], topK: Int = 5): DataFrame = {
    val pairs = df.select(explode(array(keyCols.map(c =>
        struct(lit(c).as("key_col"), col(c).cast("string").as("key_value"))): _*)).as("kv"))
      .select(col("kv.key_col"), col("kv.key_value"))
    val hist = pairs.groupBy("key_col", "key_value").agg(count(lit(1)).as("cnt"))
    val stats = hist.groupBy("key_col").agg(
      sum("cnt").as("n_total"), count(lit(1)).as("n_distinct"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key_col").orderBy(col("cnt").desc, col("key_value").asc_nulls_last)
    hist.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .join(broadcast(stats), Seq("key_col"))
      .select(col("key_col"), col("rk"), col("key_value"), col("cnt"),
        expr("CAST(cnt AS DECIMAL(38,0)) * 1000000 div n_total").as("ppm"),
        expr("CAST(cnt AS DECIMAL(38,0)) * n_distinct * 100 div n_total")
          .as("x_mean_pct"),
        col("n_total"), col("n_distinct"))
  }

  /** Pre-flight JOIN-CARDINALITY report — the second pre-flight
    * diagnostic next to [[keySkewReport]]: the EXACT output size of a
    * planned equi-join computed from the two sides' key histograms
    * (`|A ⋈ B| = Σ_k cntA(k)·cntB(k)`) without materializing a single
    * joined row, plus the top-`topK` keys by output contribution — the
    * keys that would explode the join (this engine's own fuzzy-join
    * candidate blowup, a ~56M-pair join from ONE hot q-gram, is exactly
    * the shape this report surfaces in advance for the price of two
    * counting aggregations and a vocabulary-scale histogram join).
    *
    * All measures exact integers (`contrib`, its ppm share of
    * `total_pairs`); DECIMAL(38,0) from the per-key MULTIPLY onward —
    * `cnt_left * cnt_right` in long wraps once a hot key has >~3e9 rows
    * per side, which is precisely the blowup scale this report exists to
    * warn about — so neither the top-k ordering nor the total can ever
    * aggregate a wrapped value. The OUTWARD `contrib`/`total_pairs`
    * columns are BIGINT (decimal stays internal, under the aggregation):
    * a report whose total exceeds 2^63 pairs (~9e18 — beyond any
    * runnable join) fails LOUDLY via [[guardedLong]] instead of either
    * wrapping or silently widening the output schema. Ties break on
    * `key_value` ascending NULLS LAST to stay oracle-exact (NULL keys
    * never survive the histogram equi-join, but the convention matches
    * [[keySkewReport]]). */
  def joinCardinalityReport(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, topK: Int = 5): DataFrame = {
    val hl = left.groupBy(col(leftKey).cast("string").as("key_value"))
      .agg(count(lit(1)).as("cnt_left"))
    val hr = right.groupBy(col(rightKey).cast("string").as("key_value"))
      .agg(count(lit(1)).as("cnt_right"))
    val contrib = hl.join(hr, Seq("key_value"))
      .withColumn("contrib",
        (col("cnt_left").cast("decimal(19,0)") *
          col("cnt_right").cast("decimal(19,0)")).cast("decimal(38,0)"))
    val total = contrib.agg(
      sum(col("contrib")).cast("decimal(38,0)").as("total_pairs"),
      count(lit(1)).as("n_keys_matched"))
    // distributed top-k (TakeOrdered), then rank the K survivors — never
    // a global single-task sort of the key histogram
    val top = contrib.orderBy(col("contrib").desc, col("key_value").asc_nulls_last)
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("contrib").desc, col("key_value").asc_nulls_last)
    top.withColumn("rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(total))
      .select(col("rk"), col("key_value"), col("cnt_left"), col("cnt_right"),
        guardedLong(col("contrib"), "contrib"),
        expr("contrib * 1000000 div total_pairs").as("ppm"),
        guardedLong(col("total_pairs"), "total_pairs"),
        col("n_keys_matched"))
  }

  /** Narrow an internal DECIMAL(38,0) measure to the BIGINT outward
    * contract, failing LOUDLY (runtime `raise_error`, not a wrap and not
    * an ANSI-config-dependent cast) if the value exceeds the long range.
    * Outward gate schemas use BIGINT/DOUBLE/STRING only — DECIMAL stays
    * internal, under aggregations (BASELINE.md, outward-type rule). */
  private[graft] def guardedLong(c: Column, name: String): Column =
    when(c > lit(Long.MaxValue).cast("decimal(38,0)") ||
         c < lit(Long.MinValue).cast("decimal(38,0)"),
      raise_error(concat(
        lit(s"Skew report: $name overflows BIGINT outward contract: "),
        c.cast("string"))))
      .otherwise(c.cast("long")).as(name)

  /** Equi-join `big ⋈ small` on `bigKey == smallKey`, salted `salt` ways.
    * The big side's salt must be uniform PER ROW — a content hash would
    * send byte-identical duplicate rows of a hot key (the classic
    * duplicated-log-line skew) all to one bucket, fixing nothing. A
    * per-row id modulo `salt` spreads them evenly; any salt assignment is
    * join-correct because the small side is exploded once per salt value.
    * Semantics: inner join, same result multiset as
    * `big.join(small, bigKey === smallKey)`. */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, salt: Int = 8): DataFrame = {
    val saltCol = "__graft_salt"
    val saltedBig = big.withColumn(saltCol,
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val saltedSmall = small
      .withColumn(saltCol, explode(sequence(lit(0), lit(salt - 1))))
      .withColumn(saltCol, col(saltCol).cast("long"))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
          saltedBig(saltCol) === saltedSmall(saltCol))
      .drop(saltCol)
  }
}
