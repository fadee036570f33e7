package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Job-control surface of the reference, as a library facade (SURVEY C1/C2).
  *
  * The reference submits jobs as `{reducer_count, shard_size, files[]}` over
  * HTTP into a ZooKeeper queue (`src/webclient/webclient.cpp:17-55`,
  * `clientsdk/job_details.py:3-6`); a polling master shards the files by byte
  * ranges (`src/master/sharding.h:27-83`) and drives map/reduce workers. All of
  * that control plane is Spark itself; what remains meaningful to a user is the
  * job spec and the text-in/sorted-text-out contract, which this keeps.
  *
  * `shardSize` maps to `spark.sql.files.maxPartitionBytes` — Spark's input-split
  * planner is the reference's shard planner (greedy byte bin-packing across
  * files, record-aligned boundaries, `src/worker/worker.cpp:124-182`).
  * `reducerCount` maps to the output partitioning (one sorted text file per
  * reducer, `final_<task>.txt` shape, `src/worker/worker.cpp:298-303`).
  */
object Engine {

  /** Reference job payload (FIXTURES.md §A.4), defaults from
    * `clientsdk/job_details.py:3-6`. */
  final case class JobSpec(
      files: Seq[String],
      reducerCount: Int = 3,
      shardSize: Long = 50000L)

  /** Terminal record of a queued job — the engine-side equivalent of the
    * reference's `/jobs/job_<seq>` znode lifecycle (`status=CREATED` →
    * `COMPLETED`, `src/master/master.cpp:300-336,374-381`). */
  final case class JobResult(
      jobId: Int,
      spec: JobSpec,
      status: String, // COMPLETED | FAILED
      distinctKeys: Long,
      outDir: String,
      error: Option[String] = None)

  /** Async handle to a submitted job — the engine-side equivalent of the
    * reference's poll-while-running status surface (a client polls
    * `/jobs/job_<seq>/status` mid-run, `src/master/master.cpp:300-336`,
    * `src/webclient/webclient.cpp:42-51`). [[status]] transitions
    * CREATED → RUNNING → COMPLETED|FAILED|CANCELLED and can be polled from
    * any thread; [[await]] blocks for the terminal [[JobResult]];
    * [[cancel]] aborts the job's Spark stages via its job group and the
    * job terminates CANCELLED. */
  object JobHandle {
    private[Engine] val seq = new java.util.concurrent.atomic.AtomicLong(0L)
  }

  final class JobHandle private[Engine] (
      val jobId: Int,
      val spec: JobSpec,
      spark: SparkSession) {
    private val state = new java.util.concurrent.atomic.AtomicReference[String]("CREATED")
    private val transitionLog = new java.util.concurrent.CopyOnWriteArrayList[String]()
    transitionLog.add("CREATED")
    private val done = new java.util.concurrent.CountDownLatch(1)
    @volatile private var terminal: JobResult = _

    private val prog = new java.util.concurrent.atomic.AtomicLong(
      java.lang.Double.doubleToLongBits(0.0))

    // process-unique, not just per-jobId: cancelJobGroupAndFutureJobs
    // poisons a group id permanently, and callers (runQueueConcurrent, a
    // restarted JobServer) legitimately reuse small integer job ids
    private[Engine] val group = s"graft-job-$jobId-${JobHandle.seq.incrementAndGet()}"
    private[Engine] def transition(s: String): Unit = { state.set(s); transitionLog.add(s) }
    private[Engine] def complete(r: JobResult): Unit = {
      terminal = r; transition(r.status)
      if (r.status == "COMPLETED") advanceProgress(1.0)
      done.countDown()
    }
    /** Monotone CAS update: listener events race (and can trail the
      * terminal transition), but observed progress must never decrease. */
    private[Engine] def advanceProgress(p: Double): Unit = {
      val clamped = math.min(p, 1.0)
      var cur = prog.get
      while (java.lang.Double.longBitsToDouble(cur) < clamped &&
        !prog.compareAndSet(cur, java.lang.Double.doubleToLongBits(clamped))) {
        cur = prog.get
      }
    }

    /** Current lifecycle state (poll-safe, like the reference's status znode). */
    def status: String = state.get
    /** Stage-level progress fraction in [0, 1] — the engine-side
      * equivalent of the reference's per-task state map that a polling
      * client reduced to "how far along is my job"
      * (`src/master/master.cpp:300-336`). Stages completed / stages
      * submitted under this job's group (capped below 1 until terminal:
      * the denominator grows as the job's later Spark actions submit their
      * stages, and a capped monotone fraction can't overpromise); pinned
      * to exactly 1.0 when the job COMPLETEs.
      *
      * The fraction is per-stages-SUBMITTED, not per-job-work: between two
      * actions of a multi-action job (all submitted stages done, the next
      * action not yet planned) it reads the 0.95 cap even though later
      * work remains — an inherent property of stage-count progress, since
      * Spark only learns a job's total work as each action plans. Polling
      * clients that need work-weighted progress should track action count
      * in their JobSpec and scale externally. */
    def progress: Double = java.lang.Double.longBitsToDouble(prog.get)
    /** Every state this job has passed through, in order. */
    def transitions: Seq[String] = { import scala.jdk.CollectionConverters._; transitionLog.asScala.toSeq }
    /** Block until the job reaches a terminal state. */
    def await(): JobResult = { done.await(); terminal }
    @volatile private var cancelRequested = false
    /** True once [[cancel]] was called — the runner uses it to classify
      * the resulting stage abort as CANCELLED rather than FAILED. */
    def cancelled: Boolean = cancelRequested
    /** Cancel: aborts the job group's running Spark stages AND fails any
      * action the job submits afterwards (`cancelJobGroupAndFutureJobs` —
      * plain `cancelJobGroup` would no-op in the window BETWEEN a
      * multi-action job's actions and let the rest of the job run). The
      * engine-side analogue of the reference master dropping a queued job
      * znode, plus the running-stage abort the reference lacks. The runner
      * thread observes the abort and completes terminal-state CANCELLED. */
    def cancel(): Unit = {
      cancelRequested = true
      spark.sparkContext.cancelJobGroupAndFutureJobs(group, s"job $jobId cancelled")
    }
  }

  /** Submit a word-count job without blocking: returns immediately with a
    * pollable [[JobHandle]] (reference C2's async contract — submit returns
    * a job id, status is observed by polling). The job runs on a daemon
    * thread under its own Spark job group, so [[JobHandle.cancel]] maps to
    * `cancelJobGroup` — Spark's native stage abort. */
  def submitAsync(spark: SparkSession, spec: JobSpec, outDir: String, jobId: Int = 0,
      onTerminal: JobResult => Unit = _ => ()): JobHandle = {
    val handle = new JobHandle(jobId, spec, spark)
    // Stage-level progress: a SparkListener keyed on this job's group
    // counts stages submitted vs completed. The 0.95 cap leaves terminal
    // 1.0 to complete() — the denominator only grows as later actions of
    // the same job submit more stages, so an uncapped ratio would read
    // 1.0 mid-job between actions.
    val listener = new org.apache.spark.scheduler.SparkListener {
      private val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      private val completed = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val grp = Option(js.properties).map(_.getProperty("spark.jobGroup.id")).orNull
        if (handle.group == grp) js.stageIds.foreach(id => stages.add(id))
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (stages.contains(sc.stageInfo.stageId)) {
          // a completed-ID SET, not a counter: SparkListenerStageCompleted
          // fires once per stage ATTEMPT, so a fetch-failure retry would
          // double-count and let the ratio clamp to 1.0 mid-run
          completed.add(sc.stageInfo.stageId)
          handle.advanceProgress(
            0.95 * completed.size / math.max(stages.size, 1))
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val runner = new Thread(() => {
      // the ENTIRE runner body sits inside try/catch: if transition or
      // setJobGroup ever threw outside it, the handle would never reach a
      // terminal state and runQueueConcurrent would deadlock on both the
      // semaphore slot and await() (ADVICE r4)
      try {
        handle.transition("RUNNING")
        // setJobGroup is thread-local: it must run on the thread that fires
        // the Spark actions, making every stage of this job cancellable as a
        // group (interruptOnCancel stops straggling tasks too)
        spark.sparkContext.setJobGroup(handle.group, s"graft job $jobId", interruptOnCancel = true)
        // own SQL-conf scope: concurrent jobs must not race on the session's
        // maxPartitionBytes (withShardSize mutates it for the job's duration)
        val jobSession = spark.newSession()
        val counts = submitWordCount(jobSession, spec, outDir)
        handle.complete(JobResult(jobId, spec, "COMPLETED", counts.count(), outDir))
      } catch {
        case e: Throwable =>
          // a cancel()-induced stage abort surfaces here as an exception;
          // classify it by the requested-cancel flag so a deliberate stop
          // is not recorded as a failure
          val status = if (handle.cancelled) "CANCELLED" else "FAILED"
          handle.complete(JobResult(jobId, spec, status, -1L, outDir, Some(String.valueOf(e.getMessage))))
      } finally {
        spark.sparkContext.clearJobGroup()
        // safe while events are still in flight: advanceProgress is
        // monotone and the terminal 1.0 is already pinned
        spark.sparkContext.removeSparkListener(listener)
        try onTerminal(handle.await()) catch { case _: Throwable => () }
      }
    }, s"graft-job-runner-$jobId")
    runner.setDaemon(true)
    runner.start()
    handle
  }

  /** Sequential job queue: run each submitted word-count job in order,
    * recording per-job status — the reference's master poll loop collapsed
    * to a driver loop (its 5 s ZooKeeper poll and leader election are
    * control-plane concerns Spark's driver already owns). A failed job
    * does not block the queue, matching the reference's per-job isolation. */
  def runQueue(spark: SparkSession, jobs: Seq[(JobSpec, String)]): Seq[JobResult] =
    jobs.zipWithIndex.map { case ((spec, outDir), id) =>
      try {
        val counts = submitWordCount(spark, spec, outDir)
        JobResult(id, spec, "COMPLETED", counts.count(), outDir)
      } catch {
        case e: Exception =>
          JobResult(id, spec, "FAILED", -1L, outDir, Some(e.getMessage))
      }
    }

  /** Bounded-parallel job queue: up to `maxParallel` jobs run
    * concurrently (each via [[submitAsync]], so each has its own SQL-conf
    * scope and cancellable job group), results return in submission order
    * with the same per-job failure isolation as [[runQueue]]. This is the
    * reference's multi-worker job throughput story on one Spark cluster —
    * the scheduler interleaves the jobs' stages across executors.
    *
    * Admission is a sliding window (semaphore released as each job reaches
    * a terminal state), not waves: a straggler holds one slot, and the
    * queue keeps `maxParallel` jobs in flight behind it (ADVICE r3 — a
    * `grouped` barrier would idle all slots on the slowest job per wave). */
  def runQueueConcurrent(spark: SparkSession, jobs: Seq[(JobSpec, String)],
      maxParallel: Int = 4): Seq[JobResult] = {
    val slots = new java.util.concurrent.Semaphore(maxParallel)
    jobs.zipWithIndex.map { case ((spec, outDir), id) =>
      slots.acquire()
      submitAsync(spark, spec, outDir, id, _ => slots.release())
    }.map(_.await())
  }

  /** Run `body` with the job's shard size as Spark's input-split target.
    * Spark reads `spark.sql.files.maxPartitionBytes` when the scan is
    * *planned* (at action time), not when `spark.read` is called — so the
    * conf must stay set for the duration of the job's actions. */
  def withShardSize[T](spark: SparkSession, shardSize: Long)(body: => T): T = {
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    spark.conf.set(key, shardSize.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** Read the job's text files: one `value: string` row per line. */
  def readText(spark: SparkSession, spec: JobSpec): DataFrame =
    spark.read.text(spec.files: _*)

  /** The reference's canonical job: word count over text files, written as
    * `reducerCount` key-sorted `word count` text files (no global merge —
    * per-partition sort, exactly the reference's output contract). Returns the
    * counted DataFrame for further composition; it is persisted and
    * materialized inside the shard-size scope, so later caller actions reuse
    * the cached result instead of re-planning the scan with the restored
    * default split size (ADVICE r1). The cached counts stay resident until
    * LRU eviction; callers running many jobs in one session can
    * `spark.catalog.clearCache()` between them (same lifecycle contract as
    * the Dedup pair miners). */
  def submitWordCount(spark: SparkSession, spec: JobSpec, outDir: String): DataFrame =
    withShardSize(spark, spec.shardSize) {
      val counts = TextOps.wordCount(readText(spark, spec).withColumnRenamed("value", "text"))
        .persist()
      counts
        .repartition(spec.reducerCount, col("word"))
        .sortWithinPartitions("word")
        .select(concat_ws(" ", col("word"), col("cnt")))
        .write.mode(SaveMode.Overwrite).text(outDir)
      counts
    }
}
