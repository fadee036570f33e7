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

  test("approx quantiles: in-operator error bounds hold, counts exact") {
    // the operator emits the |approx − exact| <= eps contract as 0/1
    // columns (this is what the DuckDB gate hashes); every group must
    // report the bound held, and the exact group counts must agree with
    // the exact-percentile twin
    val approx = Relational.approxQuantilesQty(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    val exact = Relational.percentilesQty(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(approx.keySet === exact.keySet)
    for ((flag, (ok25, ok50, ok75, n)) <- approx) {
      assert(ok25 == 1 && ok50 == 1 && ok75 == 1,
        s"$flag: sketch bound violated ($ok25, $ok50, $ok75)")
      assert(n === exact(flag), s"$flag: group count $n vs ${exact(flag)}")
    }
  }

  test("stored HLL: union of batch sketches == one-shot sketch, to the bit") {
    import org.apache.spark.sql.functions._
    val docs = graft.ops.SharedCorpus.docsTok(spark, sfDir)
    val words = docs.select(col("source"), col("doc_id"),
      explode(graft.ops.SharedCorpus.alnumOf(docs)).as("word"))
    // the mergeability contract that makes the sketch a valid stored
    // artifact: per-batch sketches unioned == the sketch of the union —
    // not approximately, EXACTLY (HLL merge is element-wise register max)
    val oneShot = words.groupBy("source")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(word, 12))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val unioned = words
      .groupBy(col("source"), expr("doc_id % 4").as("b"))
      .agg(expr("hll_sketch_agg(word, 12)").as("sk"))
      .groupBy("source")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(oneShot === unioned,
      s"HLL union diverged from one-shot: $oneShot vs $unioned")
    // and the gate's bound booleans hold everywhere
    val gate = graft.SparkEntry.queries("ta_distinct_hll_indexed")(spark, sfDir)
      .collect()
    assert(gate.nonEmpty && gate.forall(_.getInt(2) == 1),
      "stored-HLL estimate out of its 5% bound")
    // the same equality THROUGH the stored tables: the incr gate's
    // build+append index answers identically to the one-shot index —
    // i.e. the parquet-binary round trip preserves the merge exactly
    graft.SparkEntry.queries("ta_distinct_hll_incr")(spark, sfDir).collect()
    def estOf(table: String): Map[String, Long] =
      graft.ops.TextAnalysis.distinctFromHllIndex(spark, table)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estOf("graft_hll_idx") === oneShot)
    assert(estOf("graft_hll_incr") === oneShot)
  }

  test("stored CMS: append+compact == one-shot, never underestimates, " +
      "unseen words survive the probe") {
    val all = graft.ops.SharedCorpus.docsTok(spark, sfDir)
    TextAnalysis.buildCmsIndex(all, "graft_cms_one")
    TextAnalysis.buildCmsIndex(all.filter(col("doc_id") % 2 === 0), "graft_cms_two")
    TextAnalysis.appendToCmsIndex(all.filter(col("doc_id") % 2 =!= 0), "graft_cms_two")
    TextAnalysis.compactCmsIndex(spark, "graft_cms_two")
    // counter addition is exact: the compacted two-batch sketch must be
    // BIT-EQUAL to the one-shot relation, not just estimate-equal
    def rows(t: String) = spark.table(t).collect().map(_.toString).sorted.toSeq
    assert(rows("graft_cms_one") === rows("graft_cms_two"),
      "appended+compacted CMS relation diverged from one-shot")
    // probe contract on the exact top-20: estimate >= exact always
    val hh = TextAnalysis.heavyHittersFromCms(spark, all, "graft_cms_one").collect()
    assert(hh.length == 20)
    hh.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"CMS underestimated '${r.getString(0)}': ${r.getLong(2)} < ${r.getLong(1)}"))
    // a word the corpus never saw must SURVIVE the probe (left join +
    // coalesce — an inner-join regression would silently drop it) and
    // estimate below any real heavy hitter
    import spark.implicits._
    val unseen = TextAnalysis.cmsEstimates(spark, "graft_cms_one",
      Seq("zzqqxunseenzz").toDF("word")).collect()
    assert(unseen.length == 1 && unseen.head.getLong(1) >= 0L)
  }

  test("stored histogram: append+compact == one-shot, quantile bracketed " +
      "within its bin") {
    val li = Tables.lineitem(spark, sfDir)
    Relational.buildHistIndex(li, "graft_hist_one")
    Relational.buildHistIndex(li.filter(col("l_orderkey") % 2 === 0), "graft_hist_two")
    Relational.appendToHistIndex(li.filter(col("l_orderkey") % 2 =!= 0), "graft_hist_two")
    Relational.compactHistIndex(spark, "graft_hist_two")
    def rows(t: String) = spark.table(t).collect().map(_.toString).sorted.toSeq
    assert(rows("graft_hist_one") === rows("graft_hist_two"),
      "appended+compacted histogram diverged from one-shot")
    val probe = Relational.histQuantiles(spark, "graft_hist_one").collect()
    assert(probe.length == 12) // 3 flags x 4 percentiles
    // bracket property: the exact ceil(pq% * N)-th smallest price per
    // flag must lie inside the reported bin [bucket*w, (bucket+1)*w)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val ranked = li.select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("rn", row_number().over(w).cast("long"))
    probe.foreach { r =>
      val (grp, pq, n, bucket) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val target = (n * pq + 99) / 100
      val exact = ranked.filter(col("l_returnflag") === grp && col("rn") === target)
        .select("l_extendedprice").head().getDouble(0)
      val width = Relational.HistWidth.toDouble
      assert(exact >= bucket * width && exact < (bucket + 1) * width,
        s"$grp p$pq: exact $exact outside bin $bucket")
    }
  }

  test("sketch geometry is a build parameter persisted in the manifest: " +
      "w=8192 builds without recompiling, mismatched appends rejected") {
    import spark.implicits._
    val all = graft.ops.SharedCorpus.docsTok(spark, sfDir)
    // CMS at a non-default geometry — the whole lifecycle (build, append
    // with params read back from the manifest, compact, probe) runs at
    // d=6,w=8192 with no engine constant involved
    TextAnalysis.buildCmsIndex(all, "graft_cms_wide", depth = 6, width = 8192)
    assert(TextAnalysis.cmsParams(spark, "graft_cms_wide") === ((6, 8192)))
    TextAnalysis.buildCmsIndex(all.filter(col("doc_id") % 2 === 0),
      "graft_cms_wide2", depth = 6, width = 8192)
    TextAnalysis.appendToCmsIndex(all.filter(col("doc_id") % 2 =!= 0),
      "graft_cms_wide2", expectDepth = Some(6), expectWidth = Some(8192))
    TextAnalysis.compactCmsIndex(spark, "graft_cms_wide2")
    def rows(t: String) = spark.table(t).collect().map(_.toString).sorted.toSeq
    assert(rows("graft_cms_wide") === rows("graft_cms_wide2"),
      "appended+compacted wide CMS relation diverged from one-shot")
    // the wide sketch's relation really is the wide geometry: 6 depth
    // rows, slots under 8192, and (being 4x wider) it estimates the
    // exact top-20 at least as tightly as the default sketch while
    // never underestimating
    val stored = spark.table("graft_cms_wide")
      .agg(countDistinct(col("d")).as("nd"), max(col("slot")).as("mx")).head()
    assert(stored.getLong(0) === 6L && stored.getLong(1) < 8192L)
    val hh = TextAnalysis.heavyHittersFromCms(spark, all, "graft_cms_wide").collect()
    assert(hh.length == 20)
    hh.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"wide CMS underestimated '${r.getString(0)}'"))
    // an append that believes the wrong geometry fails loudly BEFORE
    // writing a data row
    val before = rows("graft_cms_wide2")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.appendToCmsIndex(all.limit(1), "graft_cms_wide2",
        expectWidth = Some(2048))
    }
    assert(e.getMessage.contains("built with d=6,w=8192"))
    assert(rows("graft_cms_wide2") === before,
      "rejected append must not have written data rows")
    // histogram: same discipline at a non-default bin width
    val li = Tables.lineitem(spark, sfDir)
    Relational.buildHistIndex(li, "graft_hist_narrow", binWidth = 250L)
    assert(Relational.histParams(spark, "graft_hist_narrow") === 250L)
    val probe = Relational.histQuantiles(spark, "graft_hist_narrow").collect()
    assert(probe.length == 12)
    probe.foreach { r => // est_hi uses the stored width, not the default
      assert(r.getLong(4) === (r.getLong(3) + 1L) * 250L)
    }
    val he = intercept[IllegalArgumentException] {
      Relational.appendToHistIndex(li.limit(1), "graft_hist_narrow",
        expectWidth = Some(1000L))
    }
    assert(he.getMessage.contains("built with w=250"))
    // and the param-typed readers refuse a family of the wrong kind
    intercept[IllegalArgumentException] {
      TextAnalysis.cmsParams(spark, "graft_hist_narrow")
    }
  }

  test("profile index: build+append fold == one-shot build, bit-equal") {
    import org.apache.spark.sql.functions._
    val o = graft.sources.Tables.orders(spark, sfDir)
    graft.ops.Relational.buildProfileIndex(o, "graft_prof_one")
    graft.ops.Relational.buildProfileIndex(
      o.filter(col("o_orderkey") % 2 === 0), "graft_prof_two")
    graft.ops.Relational.appendToProfileIndex(
      o.filter(col("o_orderkey") % 2 =!= 0), "graft_prof_two")
    val a = graft.ops.Relational.profileFromIndex(spark, "graft_prof_one", o)
      .collect().map(_.toString).sorted.toSeq
    val b = graft.ops.Relational.profileFromIndex(spark, "graft_prof_two", o)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b, "batch fold diverged from one-shot profile")
    assert(a.nonEmpty && a.forall(_.endsWith(",1]")),
      s"HLL distinct estimate out of bound in $a")
  }
}
