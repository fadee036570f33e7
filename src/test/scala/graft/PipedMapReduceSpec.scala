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
      .orderBy("word") // op returns unsorted since r18; pin order for the zip-compare
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

  test("a crashing user script fails the job loudly, surfacing exit code + stderr") {
    val docs = Tables.documents(spark, sfDir).select(col("text").as("value")).limit(5)
    val badMapper =
      """import sys
        |sys.stderr.write("boom: cannot parse config\n")
        |sys.exit(3)
        |""".stripMargin
    val ex = intercept[Throwable] {
      PipedMapReduce.pipedJob(spark, docs, badMapper, PipedMapReduce.ReducerPy).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(ex).mkString("\n")
    assert(all.contains("exited with code 3"), s"exit status must be surfaced, got: $all")
    assert(all.contains("boom: cannot parse config"), "stderr tail must be in the failure")
  }
}
