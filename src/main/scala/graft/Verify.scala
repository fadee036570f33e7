package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: run only these query names (local iteration;
    // the driver always passes exactly two args → full sweep). Unknown
    // names fail loudly — a typo would otherwise write nothing and exit 0,
    // looking exactly like a passing gate.
    val only = args.drop(2).toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt, "graft-verify")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Deployment mode under test: by default pin the shared token
    // projection, so the driver's DuckDB gate correctness-checks the
    // tokenize-once mode; SPARK_GRAFT_VERIFY_RAW=1 skips the pin and
    // forces the raw-recompute path instead — the mode the bench's
    // steady-state timings execute — so BOTH modes can be oracle-verified
    // end-to-end (ADVICE r10; the per-operator raw-vs-pinned bit-equality
    // is additionally pinned by SharedCorpusSpec).
    val rawMode = sys.env.get("SPARK_GRAFT_VERIFY_RAW").contains("1")
    if (!rawMode)
      try graft.ops.SharedCorpus.pin(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] SharedCorpus.pin failed: ${e.getMessage}")
      }
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try graft.ops.SharedCorpus.withMode(!rawMode) {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    graft.ops.SharedCorpus.unpinAll(spark)
    spark.stop()
  }
}
