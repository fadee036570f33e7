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

  private def materialize(name: String, body: String): Path = {
    val dir = Files.createTempDirectory("graft-pipe")
    val p = dir.resolve(name)
    Files.write(p, body.getBytes(StandardCharsets.UTF_8))
    p
  }

  /** Run a full piped map/shuffle/reduce word-count job over text lines.
    * Returns `(word, cnt)` rows parsed back from the reducer's output.
    * `numReducers` = number of reduce-side partitions (and subprocesses). */
  def pipedWordCount(spark: SparkSession, lines: DataFrame, numReducers: Int = 3): DataFrame = {
    import spark.implicits._
    val mapper = materialize("mapper.py", MapperPy).toString
    val reducer = materialize("reducer.py", ReducerPy).toString

    val mapped = lines.select("value").as[String].rdd
      .pipe(Seq("python3", mapper))                      // M1: user map subprocess
    val shuffled = mapped
      .map { l => val i = l.lastIndexOf(' '); (l.substring(0, i), l.substring(i + 1)) }
      .partitionBy(new HashPartitioner(numReducers))     // P1: hash shuffle on key
      .map { case (k, v) => s"$k $v" }
    val reduced = shuffled
      .pipe(Seq("python3", reducer))                     // R1–R3: user reduce subprocess
      .map { l =>
        val i = l.lastIndexOf(' ')
        (l.substring(0, i), l.substring(i + 1).toLong)
      }
    reduced.toDF("word", "cnt")
  }
}
