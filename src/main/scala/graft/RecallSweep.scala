package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.sources.Tables

/** Tuning harness for the compressed ANN tiers (VERDICT r13 item 1):
  * sweeps nprobe × PQ codebook size × refine shortlist width over the
  * sf embeddings, printing avg/min recall@5 against the exact scan plus
  * probe wall-seconds — the recall-vs-cost curve recorded in BASELINE.md
  * next to the r13 recall ladder. The codebook axis passes `pqCodes`
  * (the centroid count whose 16→64 step `Similarity.PqCodes` cites as
  * its evidence — ADVICE r14 fixed this harness actually sweeping
  * k-means iterations under a codebook label); the iteration axis is
  * deliberately NOT swept (measured r14: no effect on this corpus).
  *
  * Also validates the RECALL-TARGET mode (VERDICT r14 item 5): for each
  * corpus shape — the shipped iid-random worst case AND a clustered
  * synthetic (vectors mixed 9:1 toward one of 8 anchor directions, the
  * shape production embeddings have) — `pickNprobe`'s choice must make
  * the refined probe MEET the requested average recall@5. Run:
  * `SPARK_GRAFT_CPUS=8 sbt "runMain graft.RecallSweep /root/testdata/sf0.01"` */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus, "graft-recall-sweep")
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir).cache()
    emb.count()
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, col("vec_id") < 10).cache()
    exact.count()

    def measure(approx: DataFrame, truth: DataFrame): (Double, Double, Double) = {
      val t0 = System.nanoTime()
      val a = approx.cache()
      a.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val r = Similarity.recallAtK(a, truth)
        .agg(avg("recall"), min("recall")).head()
      a.unpersist()
      (r.getDouble(0), r.getDouble(1), sec)
    }
    def report(name: String, approx: DataFrame, truth: DataFrame = exact): Unit = {
      val (av, mn, sec) = measure(approx, truth)
      println(f"SWEEP $name%-32s avg=$av%5.3f min=$mn%5.3f sec=$sec%6.2f")
    }

    for (np <- Seq(2, 4, 8))
      report(s"ivf nprobe=$np",
        Similarity.ivfTopK(emb, col("vec_id") < 10, nprobe = np))

    Similarity.buildVectorStore(emb, "graft_sweep_vec")
    for (pq <- Seq(16, 64)) {
      val tbl = s"graft_sweep_ivfpq_pq$pq"
      Similarity.buildIvfPqIndex(emb, tbl, pqCodes = pq)
      for (np <- Seq(4, 6, 8, 10, 12))
        report(s"ivfpq pq=$pq nprobe=$np",
          Similarity.ivfPqTopKIndexed(spark, tbl, queries, nprobe = np))
      for (np <- Seq(6, 8, 10, 12); w <- Seq(50, 100))
        report(s"refine pq=$pq np=$np w=$w",
          Similarity.ivfPqRefineTopKIndexed(spark, tbl, "graft_sweep_vec",
            queries, candidates = w, nprobe = np))
    }

    // ---- recall-target mode: the pick must MEET the target on both the
    // iid-random worst case and a clustered synthetic ---------------------
    val anchors = emb.filter(col("vec_id") < 8)
      .orderBy("vec_id").select("embedding")
      .collect().map(_.getSeq[Float](0))
    val anchorLit = typedlit(anchors.map(_.toSeq).toSeq)
    val clustered = emb.select(col("vec_id"),
      zip_with(
        element_at(anchorLit, (col("vec_id") % 8).cast("int") + 1),
        col("embedding"),
        (a, x) => (a * lit(0.9f) + x * lit(0.1f)).cast("float")).as("embedding"))
      .cache()
    clustered.count()
    for ((shape, corpus, truth) <- Seq(
        ("random", emb, exact),
        ("clustered", clustered,
          Similarity.bruteForceTopK(clustered, col("vec_id") < 10).cache()))) {
      val tbl = s"graft_sweep_tgt_$shape"
      Similarity.buildIvfPqIndex(corpus, tbl)
      Similarity.buildVectorStore(corpus, s"${tbl}_vec")
      for (t <- Seq(0.8, 0.9)) {
        val np = Similarity.pickNprobe(spark, tbl, t)
        val (av, mn, sec) = measure(
          Similarity.ivfPqRefineTopKIndexed(spark, tbl, s"${tbl}_vec",
            corpus.filter(col("vec_id") < 10), recallTarget = Some(t)), truth)
        println(f"TARGET $shape%-9s t=$t nprobe=$np%2d " +
          f"avg=$av%5.3f min=$mn%5.3f sec=$sec%6.2f met=${av >= t}")
      }
    }

    // ---- MANY-CELL pruning power (r16, VERDICT r15 missing 3): a
    // 256-cell IVF, conservative pick vs occupancy-aware calibration, on
    // both corpus shapes. The conservative coverage model cannot prune a
    // balanced index (expected ~0.9*cells for t=0.9 — that is the model's
    // honesty, not a bug); the calibrated width is the deployment answer,
    // validated here by measuring the IVF probe's ACTUAL recall at the
    // calibrated width against held-out queries. ------------------------
    // held-out queries DISJOINT from the calibration sample but from the
    // SAME distribution (typical members, not the 8 anchor vectors —
    // anchors are degenerate queries on the clustered corpus: their cell
    // ordering is tie-shaped, so they measure distribution shift, not
    // calibration transfer)
    val holdout = col("vec_id") >= 74 && col("vec_id") < 90
    for ((shape, corpus) <- Seq(("random", emb), ("clustered", clustered))) {
      val truth = Similarity.bruteForceTopK(corpus, holdout).cache()
      val tbl = s"graft_sweep_256_$shape"
      val cells = 256
      Similarity.buildIvfIndex(corpus, tbl, kClusters = cells)
      for (t <- Seq(0.8, 0.9)) {
        val cons = Similarity.pickNprobe(spark, tbl, t)
        // 64-query calibration sample (vec_id 10..=73), disjoint from the
        // held-out queries the recall is then measured on; the default
        // ~2σ margin covers the sample estimate's binomial error
        val cal = Similarity.calibrateNprobe(spark, tbl,
          col("vec_id") >= 10 && col("vec_id") < 74, t)
        val (av, mn, sec) = measure(
          Similarity.ivfTopKIndexed(spark, tbl, holdout, nprobe = cal), truth)
        println(f"CELLS256 $shape%-9s t=$t cons=$cons%3d/$cells cal=$cal%3d/$cells " +
          f"avg=$av%5.3f min=$mn%5.3f sec=$sec%6.2f met=${av >= t}")
      }
    }
    // ---- MaxSim per-token probe (r18, VERDICT r17 item 4): the
    // (nprobe × shortlist) recall surface over the stored IVF index +
    // vector store, then the calibrated pick per target — the
    // late-interaction analogue of the CELLS256 calibration, recorded in
    // BASELINE.md next to the single-vector ladder. The exact ground
    // truth is the late-interaction scan itself (single-vector brute
    // force is the wrong truth for this tier).
    Similarity.buildIvfIndex(emb, "graft_sweep_ms_ivf")
    Similarity.buildVectorStore(emb, "graft_sweep_ms_vec")
    Similarity.maxSimProbeCalibration(spark, "graft_sweep_ms_ivf",
        "graft_sweep_ms_vec", expr("dkey % 10 = 0"))
      .collect().foreach(r => println(
        f"MAXSIM np=${r.getInt(0)}%2d sl=${r.getInt(1)}%3d " +
          f"recall=${r.getDouble(2)}%5.3f"))
    for (t <- Seq(0.8, 0.9)) {
      scala.util.Try(Similarity.calibrateMaxSimProbe(spark,
          "graft_sweep_ms_ivf", "graft_sweep_ms_vec",
          expr("dkey % 10 = 0"), t)) match {
        case scala.util.Success((np, sl)) =>
          println(f"MAXSIM TARGET t=$t np=$np%2d sl=$sl%3d met=true")
        case scala.util.Failure(e) =>
          println(s"MAXSIM TARGET t=$t UNREACHABLE on grid: ${e.getMessage}")
      }
    }
    // Clustered shape for MaxSim: anchor by DOC GROUP (dkey % 8), not by
    // vec_id — the ivf clustered synthetic above cycles anchors WITHIN a
    // group (vec_id % 8), which makes every document identical under
    // MaxSim. Grouping docs into 8 "topics" is the shape a real
    // late-interaction corpus has (a document's tokens share its topic).
    val msClustered = emb.select(col("vec_id"),
      zip_with(
        element_at(anchorLit, ((col("vec_id") / 8).cast("long") % 8).cast("int") + 1),
        col("embedding"),
        (a, x) => (a * lit(0.9f) + x * lit(0.1f)).cast("float")).as("embedding"))
      .cache()
    msClustered.count()
    Similarity.buildIvfIndex(msClustered, "graft_sweep_msc_ivf")
    Similarity.buildVectorStore(msClustered, "graft_sweep_msc_vec")
    Similarity.maxSimProbeCalibration(spark, "graft_sweep_msc_ivf",
        "graft_sweep_msc_vec", expr("dkey % 10 = 0"))
      .collect().foreach(r => println(
        f"MAXSIM-CLUSTERED np=${r.getInt(0)}%2d sl=${r.getInt(1)}%3d " +
          f"recall=${r.getDouble(2)}%5.3f"))
    for (t <- Seq(0.8, 0.9)) {
      scala.util.Try(Similarity.calibrateMaxSimProbe(spark,
          "graft_sweep_msc_ivf", "graft_sweep_msc_vec",
          expr("dkey % 10 = 0"), t)) match {
        case scala.util.Success((np, sl)) =>
          println(f"MAXSIM-CLUSTERED TARGET t=$t np=$np%2d sl=$sl%3d met=true")
        case scala.util.Failure(e) =>
          println(s"MAXSIM-CLUSTERED TARGET t=$t UNREACHABLE on grid: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
