package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col

/** The reference's defining feature re-expressed as a typed Spark API:
  * arbitrary user map and reduce functions over a dataset.
  *
  * In srics96/SDC_Mapreduce the mapper is a user Python program piped over
  * stdin/stdout (`src/worker/python_executor.h:10-28`, invoked at
  * `src/worker/worker.cpp:209`) emitting `key value` lines, and the reducer is a
  * per-key fold applied hierarchically — once per intermediate file, then once
  * over the concatenation (`src/worker/worker.cpp:290-299`,
  * `src/app/reducer.py:17-24`). That hierarchy is only correct for
  * associative + commutative reducers; we make the same contract explicit here
  * (see [[MapReduceSpec]]'s permutation/re-partition property test).
  *
  * Spark mapping: mapper = `flatMap` (a typed UDTF), reducer =
  * `groupByKey.reduceGroups` — which compiles to a `ReduceAggregator` with
  * partial (map-side) aggregation and a final merge, i.e. exactly the
  * reference's two-level combiner tree, but spill-aware and codegen-planned.
  * `numReducers` maps to the output partitioning (reference
  * `std::hash(key) % R`, `src/worker/worker.cpp:244-250`).
  */
object MapReduce {

  /** Run a user map/reduce job: `mapper` may emit 0..N key-value pairs per
    * input record; `reducer` must be associative and commutative (the same
    * contract the reference silently assumes for its hierarchical reduce).
    * Output is hash-partitioned into `numReducers` partitions and sorted by
    * key within each partition — the reference's output contract (R3: sorted
    * per-reducer files, no global merge).
    */
  def mapReduce[I, K: Encoder, V: Encoder](input: Dataset[I])(
      mapper: I => IterableOnce[(K, V)],
      reducer: (V, V) => V,
      numReducers: Int = 3): Dataset[(K, V)] = {
    implicit val kvEnc: Encoder[(K, V)] = Encoders.tuple(
      implicitly[Encoder[K]], implicitly[Encoder[V]])
    input
      .flatMap(mapper)                                   // M1: user flatMap
      .groupByKey(_._1)                                  // P1: shuffle on key
      .reduceGroups((a, b) => (a._1, reducer(a._2, b._2))) // R1+R2: partial+final
      .map(_._2)
      .repartition(numReducers, col("_1"))
      .sortWithinPartitions("_1")                        // R3: per-reducer sort
  }

  /** UDAF-shaped variant: fold each record into a typed [[Aggregator]] buffer.
    * `Aggregator.merge` is the reference's outer (cross-file) reduce pass;
    * Spark invokes it at the partial→final boundary.
    */
  def aggregateByKey[I, K: Encoder, B, O: Encoder](input: Dataset[I])(
      key: I => K, agg: Aggregator[I, B, O]): Dataset[(K, O)] = {
    implicit val koEnc: Encoder[(K, O)] = Encoders.tuple(
      implicitly[Encoder[K]], implicitly[Encoder[O]])
    input.groupByKey(key).agg(agg.toColumn)
  }

  /** Word count via the typed map/reduce surface — the reference's shipped
    * mapper/reducer pair (`src/app/mapper.py`, `src/app/reducer.py`) as Scala
    * functions, byte-for-byte the same semantics (whitespace split, alnum
    * filter, +1 per token, per-key sum).
    */
  def wordCountJob(lines: Dataset[String], numReducers: Int = 3): Dataset[(String, Long)] = {
    import lines.sparkSession.implicits._
    mapReduce(lines)(
      mapper = line => line.split("\\s+").iterator
        .filter(w => w.nonEmpty && w.matches(TextOps.AlnumRe))
        .map(w => (w, 1L)),
      reducer = (a: Long, b: Long) => a + b,
      numReducers = numReducers)
  }
}
