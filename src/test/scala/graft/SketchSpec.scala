package graft

import org.apache.spark.sql.functions._

import graft.ops.{Relational, TextAnalysis}
import graft.sources.Tables

/** Accuracy bounds for the mergeable-sketch aggregates (count-min,
  * approximate quantiles) against their exact counterparts — the sketches
  * are engine-specific, so these are unit-bounded rather than
  * oracle-compared (same contract as the HLL test in TextAnalysisSpec). */
class SketchSpec extends SparkTestBase {

  test("count-min sketch never underestimates and stays within eps * N") {
    val docs = Tables.documents(spark, sfDir)
    val eps = 1e-3
    val sketch = TextAnalysis.tokenCountSketch(docs, eps = eps)
    val exact = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy("word").count()
      .orderBy(desc("count"), col("word"))
      .limit(20).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    val n = sketch.totalCount()
    exact.foreach { case (word, trueCount) =>
      val est = sketch.estimateCount(word)
      assert(est >= trueCount, s"'$word' underestimated: $est < $trueCount")
      assert(est <= trueCount + (eps * n).ceil.toLong,
        s"'$word' overestimated beyond eps*N: $est vs $trueCount (N=$n)")
    }
  }

  test("approx quantiles land within one exact-percentile bracket") {
    val approx = Relational.approxQuantilesQty(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Relational.percentilesQty(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet === exact.keySet)
    // percentile_approx returns an actual data value; with integral
    // quantities the sketch answer must sit within 1 of the interpolated
    // exact percentile at this accuracy
    for ((flag, (a25, a50, a75)) <- approx) {
      val (e25, e50, e75) = exact(flag)
      assert(math.abs(a25 - e25) <= 1.0, s"$flag p25: $a25 vs $e25")
      assert(math.abs(a50 - e50) <= 1.0, s"$flag p50: $a50 vs $e50")
      assert(math.abs(a75 - e75) <= 1.0, s"$flag p75: $a75 vs $e75")
    }
  }
}
