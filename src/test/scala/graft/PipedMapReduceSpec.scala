package graft

import org.apache.spark.sql.functions._

import graft.ops.{PipedMapReduce, TextOps}
import graft.sources.Tables

class PipedMapReduceSpec extends SparkTestBase {

  test("piped subprocess word count equals the native declarative word count") {
    val docs = Tables.documents(spark, sfDir).select(col("text").as("value")).limit(100)
    val piped = PipedMapReduce.pipedWordCount(spark, docs)
      .orderBy("word")
    val native = TextOps.wordCount(docs.withColumnRenamed("value", "text"))
    val pipedRows = piped.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val nativeRows = native.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(pipedRows === nativeRows)
    assert(pipedRows.nonEmpty)
  }

  test("reduce-side output is sorted within each of R partitions (reference R3 contract)") {
    val docs = Tables.documents(spark, sfDir).select(col("text").as("value")).limit(50)
    val out = PipedMapReduce.pipedWordCount(spark, docs, numReducers = 3)
    assert(out.rdd.getNumPartitions === 3)
    // each partition's words arrive sorted (reducer emits sorted keys)
    val perPartitionSorted = out.rdd
      .mapPartitions(it => Iterator(it.map(_.getString(0)).toSeq))
      .collect()
      .forall(ws => ws == ws.sorted)
    assert(perPartitionSorted)
  }
}
