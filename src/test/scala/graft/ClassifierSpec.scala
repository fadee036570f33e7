package graft

import org.apache.spark.sql.functions._

import graft.ops.Classifier
import graft.sources.Tables

/** The trained quality classifier: the Spark training loop must match a
  * driver-side replay of the fixed-point GD bit-for-bit (cross-engine
  * parity is the DuckDB oracle's job; this isolates the Spark assembly),
  * and the learned model must genuinely discriminate — not collapse to
  * the majority class. */
class ClassifierSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, sfDir)

  private def halfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("training matches a driver-side fixed-point replay, round for round") {
    val hist = Classifier.train(docs)

    // independent replay from the SAME exact features
    val f = Classifier.features(docs).collect()
      .map(r => (Array(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)),
        r.getDouble(5)))
    val n = f.length
    var w = Array(0L, 0L, 0L, 0L)
    val expected = Seq.newBuilder[Seq[Long]]
    for (_ <- 1 to Classifier.DefaultIters) {
      val g = Array(0L, 0L, 0L, 0L)
      for ((x, y) <- f) {
        val z = (w(0) * x(0) + w(1) * x(1) + w(2) * x(2) + w(3) * x(3)) / Classifier.Scale
        val p = 1.0 / (1.0 + math.exp(-z))
        for (j <- 0 to 3) g(j) += halfUp(Classifier.Scale * (p - y) * x(j))
      }
      w = w.indices.map(j =>
        w(j) - halfUp(Classifier.DefaultLr * g(j) / n.toDouble)).toArray
      expected += w.toSeq
    }
    assert(hist === expected.result(),
      "every round's fixed-point weights must match the replay exactly")
  }

  test("stored model: build/score split equals train-per-call, manifest stamped") {
    import graft.sources.Formats
    try {
      Classifier.buildClassifierModel(docs, "t_clf_model_spec")
      // the stored vector IS the final training round
      val stored = Classifier.storedWeights(spark, "t_clf_model_spec")
      assert(stored === Classifier.train(docs).last)
      // scoring under the stored model is row-identical to train-per-call
      val indexed = Classifier.scoresIndexed(spark, docs, "t_clf_model_spec").collect().toSeq
      val direct = Classifier.qualityClassifier(docs).collect().toSeq
      assert(indexed === direct)
      // the manifest stamps exactly the training corpus + params
      val Some((n, fp, params, _)) = Formats.readBuildMeta(spark, "t_clf_model_spec")
      assert((n, fp) === Formats.corpusStamp(docs, "doc_id"))
      assert(params === s"kind=clf,iters=${Classifier.DefaultIters},lr=${Classifier.DefaultLr}")
      // a missing manifest makes scoring refuse loudly
      spark.sql("DROP TABLE t_clf_model_spec_meta")
      intercept[IllegalArgumentException](
        Classifier.scoresIndexed(spark, docs, "t_clf_model_spec"))
    } finally {
      Seq("t_clf_model_spec", "t_clf_model_spec_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("the learned model discriminates: beats nothing-learned, predicts both classes") {
    val out = Classifier.qualityClassifier(docs).cache()
    val n = out.count().toDouble
    val acc = out.filter(col("pred") === col("label")).count() / n
    val posFrac = out.filter(col("pred") === 1L).count() / n
    val base = out.filter(col("label") === 1L).count() / n
    assert(acc >= 0.75, s"accuracy $acc too low")
    assert(acc >= math.max(base, 1 - base),
      s"accuracy $acc must beat the majority-class baseline ${math.max(base, 1 - base)}")
    assert(posFrac > 0.2 && posFrac < 0.8,
      s"positive fraction $posFrac — model collapsed to one class")
    // probabilities are calibrated-ish: confident positives score higher
    // than confident negatives on average
    val meanP1 = out.filter(col("label") === 1L).agg(avg("p")).collect()(0).getDouble(0)
    val meanP0 = out.filter(col("label") === 0L).agg(avg("p")).collect()(0).getDouble(0)
    assert(meanP1 > meanP0 + 0.1,
      s"mean p for positives ($meanP1) must clearly exceed negatives ($meanP0)")
    out.unpersist()
  }
}
