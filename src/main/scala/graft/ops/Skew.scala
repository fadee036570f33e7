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
