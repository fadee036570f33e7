package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Curation, SharedCorpus}

/** Adaptive per-source quality floor: the histogram+boundary selection
  * must EQUAL the per-source rank formulation (top-⌈frac·n⌉ by
  * (quality key desc, doc_id asc)) — including when the boundary key is
  * heavily tied, which is exactly where a sloppy threshold filter keeps
  * too many or too few. */
class QualityFloorSpec extends SparkTestBase {

  private def rankSelect(scored: org.apache.spark.sql.DataFrame,
      frac: Double): Set[Long] = {
    val w = Window.partitionBy("source")
      .orderBy(col("qkey").desc, col("doc_id"))
    scored
      .withColumn("rn", row_number().over(w))
      .withColumn("k",
        ceil(count(lit(1)).over(Window.partitionBy("source")) * frac)
          .cast("long"))
      .filter(col("rn") <= col("k"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("qualityFloor == per-source rank selection on the sf0.001 corpus") {
    val docs = SharedCorpus.docsTok(spark,
      sfDir)
    val got = Curation.qualityFloor(docs, 0.5)
    val gotIds = got.select("doc_id").collect().map(_.getLong(0)).toSet
    // frac=1 keeps every doc ⇒ the full scored table, same columns
    val scored = Curation.qualityFloor(docs, 1.0)
    assert(gotIds === rankSelect(scored, 0.5))
    // per-source exact-k contract
    val bySrc = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = scored.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (src, n) =>
      assert(bySrc(src) === math.ceil(n * 0.5).toLong,
        s"source $src kept ${bySrc.get(src)} of $n") }
  }

  test("qualityFloor boundary ties resolve by doc_id, exactly k kept") {
    import spark.implicits._
    // one source, 6 docs: two clearly-high, four TIED at the boundary
    // quality (identical text ⇒ identical qkey); frac=0.5 ⇒ k=3 ⇒ the
    // boundary key contributes exactly ONE doc, the smallest doc_id
    val docs = Seq(
      (1L, "the a of to and in is it you that big good day"),
      (2L, "the a of to and in is it you that big good day"),
      (10L, "zz7 qq9"), (11L, "zz7 qq9"), (12L, "zz7 qq9"), (13L, "zz7 qq9")
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val kept = Curation.qualityFloor(docs, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 10L), s"boundary tie-break wrong: $kept")
  }
}
