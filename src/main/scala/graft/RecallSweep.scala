package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.sources.Tables

/** Tuning harness for the compressed ANN tiers (VERDICT r13 item 1):
  * sweeps nprobe × PQ codebook size × refine shortlist width over the
  * sf embeddings, printing avg/min recall@5 against the exact scan plus
  * probe wall-seconds — the recall-vs-cost curve recorded in BASELINE.md
  * next to the r13 recall ladder. Run:
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

    def report(name: String, approx: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val a = approx.cache()
      a.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val r = Similarity.recallAtK(a, exact)
        .agg(avg("recall"), min("recall")).head()
      a.unpersist()
      println(f"SWEEP $name%-32s avg=${r.getDouble(0)}%5.3f min=${r.getDouble(1)}%5.3f sec=$sec%6.2f")
    }

    for (np <- Seq(2, 4, 8))
      report(s"ivf nprobe=$np",
        Similarity.ivfTopK(emb, col("vec_id") < 10, nprobe = np))

    Similarity.buildVectorStore(emb, "graft_sweep_vec")
    for (km <- Seq(2, 8)) {
      val tbl = s"graft_sweep_ivfpq_km$km"
      Similarity.buildIvfPqIndex(emb, tbl, iters = km)
      for (np <- Seq(4, 6, 8, 10, 12))
        report(s"ivfpq km=$km nprobe=$np",
          Similarity.ivfPqTopKIndexed(spark, tbl, queries, nprobe = np))
      for (np <- Seq(6, 8, 10, 12); w <- Seq(50, 100))
        report(s"refine km=$km np=$np w=$w",
          Similarity.ivfPqRefineTopKIndexed(spark, tbl, "graft_sweep_vec",
            queries, candidates = w, nprobe = np))
    }
    spark.stop()
  }
}
