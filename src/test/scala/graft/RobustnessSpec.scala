package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Degenerate-input behavior: operators must return empty/sane results on
  * empty or minimal corpora, never throw — at 100 TB a partition (or a
  * whole filtered input) being empty is routine, not exceptional. */
class RobustnessSpec extends SparkTestBase {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def docsOf(rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), docSchema)

  private val emptyDocs = docsOf(Nil)
  private val oneDoc = docsOf(Seq(Row(7L, "solo document here", "en", "s", 18L)))

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))
  private val emptyEmb =
    spark.createDataFrame(spark.sparkContext.parallelize(Seq.empty[Row], 2), embSchema)

  test("dedup operators on empty and single-doc corpora") {
    assert(Dedup.exactDedup(emptyDocs).count() === 0)
    assert(Dedup.minHashPairs(emptyDocs).count() === 0)
    assert(Dedup.simHashPairs(emptyDocs).count() === 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs).count() === 0)
    assert(Dedup.nearDupSurvivors(emptyDocs).count() === 0)
    assert(Dedup.exactDedup(oneDoc).count() === 1)
    assert(Dedup.minHashPairs(oneDoc).count() === 0)
    assert(Dedup.nearDupSurvivors(oneDoc).collect().map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("text analysis on empty and single-doc corpora") {
    assert(TextAnalysis.tokenStats(emptyDocs).count() === 0)
    assert(TextAnalysis.tfIdf(emptyDocs).count() === 0)
    assert(TextAnalysis.curationPipeline(emptyDocs).count() === 0)
    val stats = TextAnalysis.tokenStats(oneDoc).collect()(0)
    assert(stats.getLong(1) === 3) // "solo document here"
  }

  test("similarity on empty embeddings") {
    assert(Similarity.bruteForceTopK(emptyEmb, col("vec_id") < 10).count() === 0)
    assert(Similarity.embeddingNearDupPairs(emptyEmb).count() === 0)
    assert(Similarity.lshTopK(emptyEmb, col("vec_id") < 10).count() === 0)
    assert(Similarity.ivfTopK(emptyEmb, col("vec_id") < 10).count() === 0)
    assert(Similarity.embeddingNearDupPairsLSH(emptyEmb).count() === 0)
  }

  test("streaming transforms on empty batch input") {
    import graft.streaming.StreamOps
    val emptyEvents = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row], 2),
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
    assert(StreamOps.windowedEventCounts(emptyEvents).count() === 0)
    assert(StreamOps.sessionizeBatch(emptyEvents).count() === 0)
    assert(StreamOps.dedupEvents(emptyEvents).count() === 0)
    assert(StreamOps.intervalJoin(emptyEvents).count() === 0)
  }

  test("multimodal on empty corpus") {
    val blobs = Multimodal.asBlobTable(emptyDocs)
    assert(Multimodal.blobMetadata(blobs).count() === 0)
    assert(Multimodal.decodeFeatures(
      blobs.withColumn("mime", lit("image/png"))).count() === 0)
    assert(Multimodal.sampleFrames(blobs).count() === 0)
  }
}
