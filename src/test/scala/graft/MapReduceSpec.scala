package graft

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

import graft.ops.MapReduce

class MapReduceSpec extends SparkTestBase {
  import spark.implicits._

  test("wordCountJob matches the declarative pipeline on real documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val typed = MapReduce.wordCountJob(docs.select("text").as[String])
      .collect().toMap
    val declarative = graft.ops.TextOps.wordCount(docs)
      .as[(String, Long)].collect().toMap
    assert(typed == declarative)
  }

  test("mapReduce output is sorted by key within each partition (R3 contract)") {
    val ds = Seq.tabulate(200)(i => s"w${i % 17} w${i % 5}").toDS()
    val out = MapReduce.wordCountJob(ds, numReducers = 3)
    assert(out.rdd.getNumPartitions == 3)
    val perPart = out.mapPartitions(it => Iterator(it.map(_._1).toSeq)).collect()
    perPart.foreach(keys => assert(keys == keys.sorted))
    // no key straddles two partitions (hash partitioning on key)
    val keyParts = out.rdd.mapPartitionsWithIndex((i, it) => it.map(kv => (kv._1, i)))
      .distinct().countByKey()
    assert(keyParts.values.forall(_ == 1))
  }

  test("property: counts invariant under permutation and re-partitioning (R2 contract)") {
    val vocab = Vector("a", "b", "cc", "d1", "e2e")
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val ls = List.fill(30)(List.fill(5)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val parts = 1 + rnd.nextInt(8)
      val base = MapReduce.wordCountJob(ls.toDS()).collect().toMap
      val shuffled = MapReduce.wordCountJob(
        spark.createDataset(rnd.shuffle(ls)).repartition(parts),
        numReducers = 2).collect().toMap
      assert(base == shuffled, s"seed=$seed parts=$parts")
    }
  }

  test("aggregateByKey with a custom Aggregator (UDAF surface)") {
    val sumAgg = new Aggregator[(String, Long), Long, Long] {
      def zero = 0L
      def reduce(b: Long, a: (String, Long)) = b + a._2
      def merge(b1: Long, b2: Long) = b1 + b2   // the reference's outer reduce pass
      def finish(b: Long) = b
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
    val ds = Seq(("a", 1L), ("b", 2L), ("a", 3L)).toDS()
    val got = MapReduce.aggregateByKey(ds)(_._1, sumAgg).collect().toMap
    assert(got == Map("a" -> 4L, "b" -> 2L))
  }
}
