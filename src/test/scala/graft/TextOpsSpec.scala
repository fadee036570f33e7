package graft

import graft.ops.TextOps

class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("wordCount counts alnum tokens, drops punctuation tokens") {
    val docs = Seq(
      "the quick brown fox",
      "the quick ... fox!",   // "..." and "fox!" are not alnum → dropped
      "the the the").toDF("text")
    val got = TextOps.wordCount(docs).as[(String, Long)].collect()
    assert(got.toSeq.sortBy(_._1) == Seq(
      "brown" -> 1L, "fox" -> 1L, "quick" -> 2L, "the" -> 5L))
  }

  test("wordCount of the reference golden input (4x 'This a input test file')") {
    // FIXTURES.md §A.1: /root/reference/src/app/input.txt shape — recomputed
    // independently, not trusting the reference's inconsistent hand-made golden.
    val docs = Seq.fill(4)("This a input test file").toDF("text")
    val got = TextOps.wordCount(docs).as[(String, Long)].collect().toMap
    assert(got == Map("This" -> 4L, "a" -> 4L, "input" -> 4L, "test" -> 4L, "file" -> 4L))
  }

  test("tokensPerDoc counts per document") {
    val docs = Seq((1L, "a b c"), (2L, "x !! y")).toDF("doc_id", "text")
    val got = TextOps.tokensPerDoc(docs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 2L))
  }
}
