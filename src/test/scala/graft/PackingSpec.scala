package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing
import graft.sources.Tables

/** Sequence packing + token-budget sampling: structural invariants a
  * training dataloader depends on, checked against an independent
  * driver-side reconstruction of the packing layout. */
class PackingSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, sfDir)

  test("repeatEpochs: per-source token delivery lands in [budget, budget + max_doc)") {
    val budget = 5000L
    val out = Packing.repeatEpochs(docs, budgetTokens = budget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.length.toLong === docs.count())
    out.groupBy(_._2).foreach { case (src, rows) =>
      val total = rows.map(_._3).sum
      val full = budget / total
      // every doc repeats full or full+1 times; the +1 set is non-empty
      // iff the budget has a remainder
      assert(rows.forall(r => r._4 == full || r._4 == full + 1), s"$src: $rows")
      val extra = rows.filter(_._4 == full + 1)
      if (budget % total == 0) assert(extra.isEmpty)
      else assert(extra.nonEmpty, s"$src: remainder prefix empty")
      // delivered tokens cover the budget and overshoot by less than the
      // largest prefix document (whole-document granularity)
      val delivered = rows.map(r => r._4 * r._3).sum
      val maxDoc = rows.map(_._3).max
      assert(delivered >= budget && delivered < budget + maxDoc,
        s"$src delivered $delivered for budget $budget")
    }
    // layout invariance
    val re = Packing.repeatEpochs(docs.repartition(7), budgetTokens = budget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(re.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
  }

  test("packGreedy: no document split, gapless next-fit layout, matches driver replay") {
    val budget = 64L
    val out = Packing.packGreedy(docs, budgetTokens = budget, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length.toLong === docs.count())
    assert(out.map(_._1).distinct.length === out.length)
    // per (bucket, seq): offsets are the exact running sum (gapless,
    // overlap-free) and a sequence only exceeds the budget when it is a
    // single oversized document — the no-split contract
    out.groupBy(t => (t._2, t._3)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.head._4 === 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 === a._4 + a._5)
        case _ =>
      }
      val fill = sorted.last._4 + sorted.last._5
      assert(fill <= budget || sorted.length === 1,
        s"multi-doc sequence over budget: $sorted")
    }
    // independent driver-side replay of the whole greedy walk
    val base = docs
      .select(col("doc_id"), size(graft.ops.SharedCorpus.wsOf(docs)).cast("long"),
        Packing.orderHash)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = base.map { case (id, n, h) => (h % 4, h, id, n) }.sortBy(t => (t._1, t._2, t._3))
      .foldLeft((Map.empty[Long, (Long, Long)], Vector.empty[(Long, Long, Long, Long, Long)])) {
        case ((state, acc), (bucket, _, id, n)) =>
          val (seq, fill) = state.getOrElse(bucket, (1L, 0L))
          val (nSeq, nOff) = if (fill > 0 && fill + n > budget) (seq + 1, 0L) else (seq, fill)
          (state.updated(bucket, (nSeq, nOff + n)), acc :+ ((id, bucket, nSeq, nOff, n)))
      }._2
    assert(out.sortBy(_._1).toVector === expect.sortBy(_._1))
    // layout invariance: the walk depends only on (bucket, h, doc_id)
    val re = Packing.packGreedy(docs.repartition(7), budgetTokens = budget, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(re.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
  }

  test("packGreedyBpe budgets by STORED-vocab subword counts, every doc packed") {
    import graft.ops.Bpe
    try {
      Bpe.buildBpeModel(docs, "graft_bpe_pack_spec")
      val out = Packing.packGreedyBpe(spark, docs, "graft_bpe_pack_spec").cache()
      // every document gets a slot (zero-alnum docs pack with n_tokens 0)
      assert(out.count() === docs.count())
      // n_tokens equals the stored-vocab tokenizer's n_subwords, with the
      // 0 default for documents the word-level tokenizer drops
      val bpe = Bpe.tokenizeWithStoredVocab(spark, docs, "graft_bpe_pack_spec")
        .select(col("doc_id"), col("n_subwords"))
      val mismatch = out.join(bpe, Seq("doc_id"), "left")
        .filter(col("n_tokens") =!= coalesce(col("n_subwords"), lit(0L)))
      assert(mismatch.count() === 0)
      // no-split contract under the BPE budget: a doc fits inside its
      // sequence unless it alone exceeds the whole budget at offset 0
      val over = out.filter(
        col("seq_offset") + col("n_tokens") > Packing.DefaultBpeBudget &&
          !(col("seq_offset") === 0))
      assert(over.count() === 0)
      // the concat-chunk sibling walks the same counts: every doc packed,
      // offsets inside the budget, and per-doc counts identical
      val seq = Packing.packSequencesBpe(spark, docs, "graft_bpe_pack_spec").cache()
      assert(seq.count() === docs.count())
      assert(seq.filter(col("seq_offset") >= Packing.DefaultBpeBudget).count() === 0)
      assert(seq.select("doc_id", "n_tokens").except(
        out.select("doc_id", "n_tokens")).count() === 0)
      seq.unpersist()
      out.unpersist()
    } finally {
      Seq("graft_bpe_pack_spec", "graft_bpe_pack_spec_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("packSequences lays documents end-to-end with no gaps or overlaps per bucket") {
    val budget = 64L
    val out = Packing.packSequences(docs, budgetTokens = budget, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // every document packed exactly once
    val total = docs.count()
    assert(out.length.toLong === total)
    assert(out.map(_._1).distinct.length.toLong === total)

    // offsets stay inside the sequence budget
    assert(out.forall { case (_, _, _, off, _) => off >= 0 && off < budget })

    // within a bucket, global positions (seq_id * budget + offset) are the
    // exact running sum of token counts — end-to-end, gapless, overlap-free
    out.groupBy(_._2).foreach { case (_, rows) =>
      val byPos = rows.sortBy(r => r._3 * budget + r._4)
      var cum = 0L
      byPos.foreach { case (id, _, seqId, off, n) =>
        assert(seqId === cum / budget, s"doc $id seq_id")
        assert(off === cum % budget, s"doc $id offset")
        cum += n
      }
    }
  }

  test("packSequences layout is a pure function of content (reshard + rerun stable)") {
    val a = Packing.packSequences(docs.repartition(1)).collect().map(_.toString).sorted
    val b = Packing.packSequences(docs.repartition(13)).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("chunkDocuments: overlapping windows tile each document exactly") {
    import spark.implicits._
    val tiny = Seq((1L, "a b c d e f g"), (2L, "x y"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = Packing.chunkDocuments(tiny, chunkTokens = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // doc 1 (7 tokens): starts 0,2,4,6 → windows of 4,4,3,1 tokens
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(c => (c._2, c._3, c._4)).toSeq ===
      Seq((0L, 0L, 4L), (1L, 2L, 4L), (2L, 4L, 3L), (3L, 6L, 1L)))
    // doc 2 (2 tokens): one window; doc 3: one single-token window
    assert(out.filter(_._1 == 2L).map(c => (c._2, c._3, c._4)).toSeq === Seq((0L, 0L, 2L)))
    assert(out.filter(_._1 == 3L).map(c => (c._2, c._3, c._4)).toSeq === Seq((0L, 0L, 1L)))

    // fingerprints are the h60 of the exact window text (overlap included)
    val expectedFp = Seq("a b c d", "c d e f", "e f g", "g", "x y", "solo")
      .toDF("s").select(graft.functions.CrossHash.h60(col("s")))
      .collect().map(_.getLong(0)).toSeq
    assert((d1 ++ out.filter(_._1 == 2L) ++ out.filter(_._1 == 3L))
      .map(_._5).toSeq === expectedFp)
  }

  test("tokenBudgetSample keeps exactly the hash-order prefix under budget, per source") {
    val budget = 300L
    val kept = Packing.tokenBudgetSample(docs, budgetTokens = budget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    // reconstruct the full per-source hash-order walk independently
    val walk = docs
      .select(col("doc_id"), col("source"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n"),
        Packing.orderHash.as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._2)

    val expected = walk.toSeq.flatMap { case (src, rows) =>
      var cum = 0L
      rows.sortBy(r => (r._4, r._1)).flatMap { case (id, _, n, _) =>
        val keep = cum < budget
        cum += n
        if (keep) Some((id, src)) else None
      }
    }.toSet
    assert(kept.map(r => (r._1, r._2)).toSet === expected)

    // the reported cumulative positions are under budget by construction
    assert(kept.forall(_._4 < budget))
    // and the cut binds: some source must have dropped documents
    assert(kept.length < docs.count())
  }

  test("sourceMixSample: budgets follow n^alpha and the walk is the budget prefix") {
    val total = 4000L
    val alpha = 0.5
    val kept = Packing.sourceMixSample(docs, total, alpha)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // rebuild the budgets independently: floor(round(total * n^a / Σ n^a, 6))
    val srcTokens = docs
      .select(col("source"), size(split(lower(col("text")), "\\s+")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // z mirrors the operator's order-fixed normalizer: each pow term
    // rounded to 6 places, summed exactly as decimals (ADVICE r7)
    val z = srcTokens.values
      .map(t => BigDecimal(math.pow(t, alpha)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    val budgets = srcTokens.map { case (s, t) =>
      s -> math.floor(BigDecimal(total.toDouble * math.pow(t, alpha) / z)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
    }
    assert(kept.forall(r => r._5 === budgets(r._2)),
      "emitted budget must equal the independently derived one")
    // temperature math conserves the budget (floor loses < 1 per source)
    assert(budgets.values.sum <= total && budgets.values.sum > total - budgets.size)

    // kept set is exactly each source's hash-order prefix under its budget
    val walk = docs
      .select(col("doc_id"), col("source"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n"),
        Packing.orderHash.as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._2)
    val expected = walk.toSeq.flatMap { case (src, rows) =>
      var cum = 0L
      rows.sortBy(r => (r._4, r._1)).flatMap { case (id, _, n, _) =>
        val keep = cum < budgets(src)
        cum += n
        if (keep) Some((id, src)) else None
      }
    }.toSet
    assert(kept.map(r => (r._1, r._2)).toSet === expected)
    // the mixing cut binds
    assert(kept.length < docs.count())
    // order-insensitive normalizer: the sample is identical however the
    // input is partitioned (the decimal z makes the float sum exact)
    val reshard = Packing.sourceMixSample(docs.repartition(13), total, alpha)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(reshard.toSeq === kept.toSeq)
    // alpha < 1 rebalances: the LARGEST source's budget share must sit
    // below its natural token share (down-weighted), the smallest above
    val totalTok = srcTokens.values.sum.toDouble
    val budTot = budgets.values.sum.toDouble
    val (maxSrc, maxTok) = srcTokens.maxBy(_._2)
    val (minSrc, minTok) = srcTokens.minBy(_._2)
    if (maxTok > minTok) {
      assert(budgets(maxSrc) / budTot < maxTok / totalTok + 1e-9,
        "hot source must be down-weighted at alpha < 1")
      assert(budgets(minSrc) / budTot > minTok / totalTok - 1e-9,
        "small source must be up-weighted at alpha < 1")
    }
  }

  test("tokenBudgetSampleSalted spreads a hot source across sub-strata") {
    val subStrata = 8
    val budget = 800L
    val kept = Packing.tokenBudgetSampleSalted(docs, budget, subStrata)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    // every sub-stratum independently respects its sub-budget
    val subBudget = budget / subStrata
    assert(kept.forall(_._5 < subBudget))

    // the skewed-source work really spreads: for the source with the most
    // kept docs, documents land in MANY sub-strata (parallel bounded walks,
    // not one per-source sort)
    val bySource = kept.groupBy(_._2)
    val (hotSrc, hotRows) = bySource.maxBy(_._2.length)
    val subsUsed = hotRows.map(_._3).distinct
    assert(subsUsed.length >= subStrata / 2,
      s"hot source $hotSrc only used ${subsUsed.length} of $subStrata sub-strata")

    // the salt is content-deterministic: sub == h % subStrata for every row
    val hs = docs.select(col("doc_id"), Packing.orderHash.as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(kept.forall(r => r._3 === hs(r._1) % subStrata))

    // the plan caps every sort at (source, sub): the cum-sum window must be
    // partitioned by BOTH keys — a per-source-only window would be the
    // single-task mega-source sort this operator exists to avoid
    val plan = Packing.tokenBudgetSampleSalted(docs, budget, subStrata)
      .queryExecution.optimizedPlan.toString
    val specs = "windowspecdefinition\\(([^)]*?) ASC".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(s => s.contains("source") && s.contains("sub")),
      s"window not partitioned by (source, sub):\n$specs")
  }

  test("shardShuffle: per-shard ranks are a 1..n permutation; a new seed re-permutes") {
    val out = Packing.shardShuffle(docs).cache()
    assert(out.count() === docs.count(), "every document gets a coordinate")
    // within each shard, shard_pos is exactly the permutation 1..n
    val bad = out.groupBy("shard").agg(
      count(lit(1)).as("n"), min("shard_pos").as("mn"),
      max("shard_pos").as("mx"), countDistinct("shard_pos").as("nd"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n") || col("nd") =!= col("n"))
    assert(bad.count() === 0, "shard ranks are gapless and duplicate-free")
    // pure function of (corpus, seed): rerun and reshard agree
    val again = Packing.shardShuffle(docs.repartition(5))
    assert(out.exceptAll(again).count() === 0 && again.exceptAll(out).count() === 0)
    // a new epoch seed yields a genuinely different permutation of the
    // same corpus (same rows, mostly different coordinates)
    val epoch1 = Packing.shardShuffle(docs, seed = "epoch1")
    val stable = out.join(epoch1, Seq("doc_id", "shard", "shard_pos")).count()
    assert(stable < out.count() / 2, s"epoch1 left $stable coordinates unchanged")
  }

  test("shard plan lifecycle: stored coordinates equal recompute; probe refuses unbuilt") {
    try {
      Packing.buildShardPlan(spark, docs, "graft_plan_t")
      // the published artifact IS the shuffle's own coordinates
      val stored = (0L until 8L).map(sh =>
        Packing.readShardPlan(spark, "graft_plan_t", sh)).reduce(_ unionAll _)
      val fresh = Packing.shardShuffle(docs)
      assert(stored.exceptAll(fresh).count() === 0 &&
        fresh.exceptAll(stored).count() === 0)
      // a worker's read is bucket-pruned to its shard's files: the scan
      // must not touch other shards' rows
      val one = Packing.readShardPlan(spark, "graft_plan_t", 3L)
      assert(one.filter(col("shard") =!= 3L).count() === 0)
      assert(one.count() === fresh.filter(col("shard") === 3L).count())
    } finally {
      Seq("graft_plan_t", "graft_plan_t_meta")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
    // the probe refuses a plan that was never published
    intercept[IllegalArgumentException] {
      Packing.readShardPlan(spark, "graft_plan_missing", 0L)
    }
  }

  test("interleaveShuffle: rounds are source-unique and stream in order — the mixing guarantee") {
    val out = Packing.interleaveShuffle(docs).cache()
    assert(out.count() === docs.count())
    // (shard, round, source) is unique: a round touches a source at most once
    assert(out.groupBy("shard", "round", "source").count()
      .filter(col("count") > 1).count() === 0)
    // rounds are non-decreasing along every shard's stream
    val rows = out.select("shard", "shard_pos", "round")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { case (shard, rs) =>
      val rounds = rs.sortBy(_._2).map(_._3)
      assert(rounds.zip(rounds.tail).forall { case (a, b) => a <= b },
        s"shard $shard streams a later round before an earlier one")
    }
    // the structural consequence: any same-source adjacent pair means the
    // OTHER sources ran out in that round — with the corpus's balanced
    // sources, the max same-source run is tiny vs a run in a plain sort
    val nSources = docs.select("source").distinct().count()
    rows.foreach { case (shard, rs) =>
      val srcByPos = out.filter(col("shard") === shard)
        .orderBy("shard_pos").select("source").collect().map(_.getString(0))
      val maxRun = srcByPos.foldLeft((0, 0, "")) { case ((best, cur, prev), s) =>
        val c = if (s == prev) cur + 1 else 1
        (math.max(best, c), c, s)
      }._1
      assert(maxRun <= nSources,
        s"shard $shard has a same-source run of $maxRun (> $nSources sources)")
    }
  }

  test("curriculumShuffle: tiers bucket the quality score, cleanest tier streams first") {
    val out = Packing.curriculumShuffle(docs).cache()
    assert(out.count() === docs.count())
    assert(out.filter(col("tier") < 0 || col("tier") > 3).count() === 0)
    assert(out.select("tier").distinct().count() > 1, "corpus spans multiple tiers")
    // within each shard, tier is non-increasing along shard_pos: the
    // dataloader reads the cleanest band first
    val rows = out.select("shard", "shard_pos", "tier")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { case (shard, rs) =>
      val tiers = rs.sortBy(_._2).map(_._3)
      assert(tiers.zip(tiers.tail).forall { case (a, b) => a >= b },
        s"shard $shard streams a lower tier before a higher one")
    }
    // the tier agrees with the quality score's bucket, doc by doc
    val q = graft.ops.TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), least(floor(col("quality") * 4), lit(3L)).cast("long").as("want"))
    assert(out.join(q, "doc_id").filter(col("tier") =!= col("want")).count() === 0)
  }

  test("packFillStats: ledger totals reconcile exactly with the packer's layout") {
    val packed = Packing.packGreedy(docs).cache()
    val stats = Packing.packFillStats(docs).cache()
    // one ledger row per packed sequence; doc and token totals conserved
    assert(stats.count() === packed.select("bucket", "seq_id").distinct().count())
    assert(stats.agg(sum("n_docs")).first().getLong(0) === packed.count())
    assert(stats.agg(sum("fill_tokens")).first().getLong(0) ===
      packed.agg(sum("n_tokens")).first().getLong(0))
    // budget discipline: within-budget sequences never overflow, waste is
    // their exact shortfall; oversized sequences are no-split singletons
    // with zero waste by definition
    val budget = Packing.DefaultBudget
    assert(stats.filter(!col("oversized") &&
      (col("fill_tokens") > budget ||
        col("waste_tokens") =!= lit(budget) - col("fill_tokens"))).count() === 0)
    assert(stats.filter(col("oversized") &&
      (col("n_docs") =!= 1 || col("waste_tokens") =!= 0)).count() === 0)
  }
}
