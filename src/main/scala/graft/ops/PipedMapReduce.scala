package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Literal-fidelity user-code surface: arbitrary executable map and reduce
  * scripts piped over stdin/stdout, exactly the reference's execution model
  * (srics96/SDC_Mapreduce forks the user's Python program with the shard
  * on stdin and collects stdout — `src/worker/python_executor.h:10-28`,
  * invoked at `src/worker/worker.cpp:209`; reduce likewise per intermediate
  * file, `src/worker/worker.cpp:290-299`).
  *
  * Spark mapping: `rdd.pipe(cmd)` runs one subprocess per partition and
  * streams the partition through it — the same process-per-shard
  * amortization as the reference, with Spark handling shard planning,
  * scheduling, shuffle, and retries. The map phase pipes input splits
  * through the mapper; the shuffle is an explicit `HashPartitioner(R)` on
  * the emitted key (the reference's `std::hash(word) % R`,
  * `src/worker/worker.cpp:244-250`); the reduce phase pipes each of the R
  * partitions through the reducer, which sees every value for its keys —
  * the reference's reduce contract.
  *
  * Requires the interpreter (`python3` here) on executor nodes — true in
  * this container and standard on production Spark images. The scripts
  * below are graft-authored equivalents of the reference's semantics
  * (whitespace split → alnum filter → `(word, 1)` → per-key sum → sorted
  * output), not copies.
  */
object PipedMapReduce {

  /** Graft-authored mapper: stdin text lines → `word 1` per alnum token. */
  val MapperPy: String =
    """import sys
      |for line in sys.stdin:
      |    for tok in line.split():
      |        if tok.isalnum():
      |            sys.stdout.write(tok + " 1\n")
      |""".stripMargin

  /** Graft-authored reducer: `key value` lines → `key sum` sorted by key. */
  val ReducerPy: String =
    """import sys
      |counts = {}
      |for line in sys.stdin:
      |    parts = line.strip().split(" ")
      |    if len(parts) != 2:
      |        continue
      |    try:
      |        counts[parts[0]] = counts.get(parts[0], 0) + int(parts[1])
      |    except ValueError:
      |        continue
      |for k in sorted(counts):
      |    sys.stdout.write(k + " " + str(counts[k]) + "\n")
      |""".stripMargin

  /** Write a script locally and register it with `SparkContext.addFile`,
    * so EXECUTORS fetch their own copy — resolved at task time via
    * `SparkFiles.get`. A bare driver-local temp path would break on any
    * non-local cluster (executors have their own filesystems). The
    * distributed filename is content-addressed (md5 of the body), so any
    * number of distinct user scripts coexist and re-submitting the same
    * body is a no-op (`addFile` rejects re-registering a filename from a
    * new path). */
  private val distributed = scala.collection.mutable.Set[String]()
  private def distribute(spark: SparkSession, body: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(body.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(12)
    val name = s"graft_pipe_$digest.py"
    distributed.synchronized {
      if (!distributed.contains(name)) {
        val p = Files.createTempDirectory("graft-pipe").resolve(name)
        Files.write(p, body.getBytes(StandardCharsets.UTF_8))
        p.toFile.deleteOnExit()
        spark.sparkContext.addFile(p.toString)
        distributed += name
      }
      name
    }
  }

  /** Pipe a partition through `python3 <script>` — the script NAME is
    * resolved with `SparkFiles.get` INSIDE the task (each executor fetches
    * its own copy; a driver-resolved absolute path would only work in
    * local mode). A writer thread feeds stdin while the task thread
    * consumes stdout, and a third thread drains stderr — a script logging
    * heavily to stderr would otherwise fill the OS pipe buffer and
    * deadlock the subprocess. A non-zero exit FAILS the task (with the
    * stderr tail in the message) instead of silently yielding truncated
    * output; Spark's retry then re-runs the partition — the same contract
    * as `RDD.pipe`. */
  private def pipeThrough(rdd: org.apache.spark.rdd.RDD[String], scriptName: String)
      : org.apache.spark.rdd.RDD[String] =
    rdd.mapPartitions { it =>
      val script = org.apache.spark.SparkFiles.get(scriptName)
      val proc = new ProcessBuilder("python3", script)
        .redirectErrorStream(false).start()
      val writer = new Thread(() => {
        val out = new java.io.PrintWriter(proc.getOutputStream)
        try it.foreach(out.println) finally out.close()
      })
      writer.setDaemon(true)
      writer.start()
      // bounded stderr tail: drained continuously (no pipe-buffer deadlock),
      // last lines kept for the failure message
      val errTail = new java.util.ArrayDeque[String]()
      val errDrain = new Thread(() => {
        val src = scala.io.Source.fromInputStream(proc.getErrorStream)
        try src.getLines().foreach { l =>
          errTail.synchronized {
            errTail.addLast(l)
            if (errTail.size > 20) errTail.removeFirst()
          }
        } finally src.close()
      })
      errDrain.setDaemon(true)
      errDrain.start()
      val reader = scala.io.Source.fromInputStream(proc.getInputStream)
      new Iterator[String] {
        private val inner = reader.getLines()
        def hasNext: Boolean = {
          val h = inner.hasNext
          if (!h) {
            reader.close()
            val exit = proc.waitFor()
            errDrain.join(2000)
            if (exit != 0) {
              val tail = errTail.synchronized {
                import scala.jdk.CollectionConverters._
                errTail.iterator.asScala.mkString("\n")
              }
              throw new RuntimeException(
                s"piped subprocess '$scriptName' exited with code $exit; stderr tail:\n$tail")
            }
          }
          h
        }
        def next(): String = inner.next()
      }
    }

  /** Run a full piped map/shuffle/reduce job with ARBITRARY user scripts —
    * the reference's defining surface (any executable reading `k v` lines
    * on stdin, writing `k v` lines on stdout). Returns the reducer's raw
    * output lines as a single `value` column; callers parse their own
    * schema (the reference's output contract is untyped text too).
    * `numReducers` = number of reduce-side partitions (and subprocesses). */
  def pipedJob(spark: SparkSession, lines: DataFrame,
      mapperBody: String, reducerBody: String, numReducers: Int = 3): DataFrame = {
    import spark.implicits._
    val mapperName = distribute(spark, mapperBody)
    val reducerName = distribute(spark, reducerBody)
    val mapped = pipeThrough(lines.select("value").as[String].rdd, mapperName) // M1: user map subprocess
    val shuffled = mapped
      .map { l => val i = l.lastIndexOf(' '); (l.substring(0, i), l.substring(i + 1)) }
      .partitionBy(new HashPartitioner(numReducers))     // P1: hash shuffle on key
      .map { case (k, v) => s"$k $v" }
    pipeThrough(shuffled, reducerName).toDF("value")     // R1–R3: user reduce subprocess
  }

  /** The canonical piped job: word count with the graft-authored mapper and
    * reducer. Returns `(word, cnt)` rows parsed back from the reducer. */
  def pipedWordCount(spark: SparkSession, lines: DataFrame, numReducers: Int = 3): DataFrame = {
    import spark.implicits._
    pipedJob(spark, lines, MapperPy, ReducerPy, numReducers)
      .select("value").as[String]
      .map { l =>
        val i = l.lastIndexOf(' ')
        (l.substring(0, i), l.substring(i + 1).toLong)
      }
      .toDF("word", "cnt")
  }
}
