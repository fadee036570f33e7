package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for the mm_phash_indexed probe elevation (r16,
  * VERDICT r15 weak #1): times each stage of the indexed probe
  * separately — blob read, probe-third dHash decode, band join, final
  * pair assembly — so the elevated component is named, not guessed.
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.MmProbeProfile /root/testdata/sf0.1"` */
object MmProbeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-mm-profile")
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Multimodal
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    // build once (untimed for the steady story)
    graft.sources.Formats.writeManaged(
      Multimodal.synthesizePng(graft.sources.Tables.documents(spark, sfDir)),
      "graft_prof_blobs")
    Multimodal.buildPhashIndex(
      spark.table("graft_prof_blobs").filter(col("doc_id") % 3 =!= 0),
      "graft_prof_phidx")
    val probe = spark.table("graft_prof_blobs").filter(col("doc_id") % 3 === 0)
    // warm runs first, then three timed decompositions
    (1 to 2).foreach { _ =>
      Multimodal.phashPairsIndexed(spark, "graft_prof_phidx", probe)
        .queryExecution.toRdd.count()
    }
    (1 to 3).foreach { i =>
      time(s"run$i full probe") {
        Multimodal.phashPairsIndexed(spark, "graft_prof_phidx", probe)
          .queryExecution.toRdd.count()
      }
      time(s"run$i dHash only") {
        Multimodal.dHash(probe).queryExecution.toRdd.count()
      }
      time(s"run$i blob scan only") {
        probe.queryExecution.toRdd.count()
      }
      time(s"run$i index scan only") {
        spark.table("graft_prof_phidx").queryExecution.toRdd.count()
      }
      time(s"run$i codeClasses+ckpt") {
        Multimodal.codeClasses(Multimodal.dHash(probe), "phash")
          .localCheckpoint().count()
      }
    }
    spark.stop()
  }
}
