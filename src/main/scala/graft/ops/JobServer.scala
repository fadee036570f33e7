package graft.ops

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** Thin HTTP submit facade over [[Engine]] — the reference's ONE
  * user-facing network entry point, re-expressed at the API level
  * (srics96/SDC_Mapreduce `src/webclient/webclient.cpp:17-55` accepts
  * `{reducer_count, shard_size, files[]}` and enqueues a `/jobs/job_<seq>`
  * znode; `clientsdk/submit_map_reduce.py:13-34` is the client). Here the
  * queue + status store is in-process around [[Engine.submitAsync]] —
  * Spark's driver IS the master, so no ZooKeeper — and the HTTP surface
  * only translates:
  *
  *  - `POST /jobs` with `{"reducer_count": R, "shard_size": S,
  *    "files": [...]}` → `{"job_id": n, "status": "CREATED"}` (the
  *    reference returns the created job id the same way);
  *  - `GET /jobs/<id>` → `{"job_id", "status", "progress",
  *    "transitions", ...}` — the poll-while-running surface (reference
  *    clients poll `/jobs/job_<seq>/status`); terminal jobs add
  *    `distinct_keys` / `error`;
  *  - `GET /jobs` → summary list of every submitted job;
  *  - `DELETE /jobs/<id>` → cancel: a queued job is dropped before it
  *    ever takes a slot, a running one gets its Spark job group aborted
  *    (the reference master's queued-znode removal,
  *    `src/master/master.cpp:300-336`, plus a running-stage abort the
  *    reference lacks). Terminal jobs are left untouched.
  *
  * Built on the JDK's `com.sun.net.httpserver` (no extra dependency) with
  * Jackson (already on Spark's classpath) for JSON. Admission is bounded
  * exactly like [[Engine.runQueueConcurrent]]: at most `maxParallel` jobs
  * run concurrently; a POST beyond that still returns immediately with a
  * pollable CREATED job that waits for a slot — the reference's jobs
  * likewise sit `CREATED` in the ZooKeeper queue until the master frees up
  * (`src/master/master.cpp:300-336`). This facade binds loopback only: it
  * is a library/test surface, not a hardened public endpoint. */
final class JobServer(spark: SparkSession, outRoot: String, maxParallel: Int = 4) {

  /** Registry slot: CREATED-and-queued until the admission thread wins a
    * slot and swaps in the live [[Engine.JobHandle]]. */
  private final class Entry(val spec: Engine.JobSpec) {
    @volatile var handle: Option[Engine.JobHandle] = None
    /** Cancel requested while still queued: the admission thread skips
      * launching (releasing its slot), and status reads CANCELLED. */
    @volatile var cancelled = false
  }

  private val om = new ObjectMapper()
  private val ids = new java.util.concurrent.atomic.AtomicInteger(0)
  private val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Entry]()
  private val slots = new java.util.concurrent.Semaphore(maxParallel)
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4, r => {
    val t = new Thread(r, "graft-jobserver"); t.setDaemon(true); t
  }))
  server.createContext("/jobs", (ex: HttpExchange) => handle(ex))

  /** Start listening; returns the bound (ephemeral) port. */
  def start(): Int = { server.start(); server.getAddress.getPort }

  def stop(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, code: Int, json: String): Unit = {
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  private def statusJson(id: Int, e: Entry): String = {
    val node = om.createObjectNode()
    node.put("job_id", id)
    e.handle match {
      case None if e.cancelled => // dropped from the queue before a slot
        node.put("status", "CANCELLED")
        node.put("progress", 0.0)
        val tr = node.putArray("transitions")
        tr.add("CREATED"); tr.add("CANCELLED")
      case None => // admitted, waiting for a slot — the reference's queued znode
        node.put("status", "CREATED")
        node.put("progress", 0.0)
        node.putArray("transitions").add("CREATED")
      case Some(h) =>
        node.put("status", h.status)
        node.put("progress", h.progress)
        val tr = node.putArray("transitions")
        h.transitions.foreach(tr.add)
        if (h.status == "COMPLETED" || h.status == "FAILED" || h.status == "CANCELLED") {
          val r = h.await()
          node.put("distinct_keys", r.distinctKeys)
          node.put("out_dir", r.outDir)
          r.error.foreach(er => node.put("error", er))
        }
    }
    om.writeValueAsString(node)
  }

  private def err(msg: String): String = {
    val node = om.createObjectNode()
    node.put("error", msg)
    om.writeValueAsString(node)
  }

  private def handle(ex: HttpExchange): Unit =
    try {
      val path = ex.getRequestURI.getPath.stripSuffix("/")
      (ex.getRequestMethod, path) match {
        case ("POST", "/jobs") => submit(ex)
        case ("GET", "/jobs") =>
          val arr = om.createArrayNode()
          jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, e) =>
            val n = arr.addObject()
            n.put("job_id", id)
            n.put("status", e.handle.map(_.status).getOrElse("CREATED"))
          }
          respond(ex, 200, om.writeValueAsString(arr))
        case ("GET", p) if p.startsWith("/jobs/") =>
          p.stripPrefix("/jobs/").toIntOption.flatMap(id =>
            Option(jobs.get(id)).map(id -> _)) match {
            case Some((id, e)) => respond(ex, 200, statusJson(id, e))
            case None          => respond(ex, 404, err("no such job"))
          }
        case ("DELETE", p) if p.startsWith("/jobs/") =>
          p.stripPrefix("/jobs/").toIntOption.flatMap(id =>
            Option(jobs.get(id)).map(id -> _)) match {
            case Some((id, e)) =>
              // queued-or-running either way: flag first, then abort any
              // live handle. The admission thread re-checks the flag after
              // setting the handle, so whichever write lands second still
              // observes the other — no uncancellable window.
              e.cancelled = true
              e.handle.foreach(_.cancel())
              respond(ex, 200, statusJson(id, e))
            case None => respond(ex, 404, err("no such job"))
          }
        case ("POST" | "GET" | "DELETE", _) => respond(ex, 404, err("unknown path"))
        case _                   => respond(ex, 405, err("method not allowed"))
      }
    } catch {
      // a handler throw must answer the client, not kill the executor thread
      case t: Throwable =>
        try respond(ex, 500, err(String.valueOf(t.getMessage)))
        catch { case _: Throwable => () }
    }

  private def submit(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val parsed =
      try {
        val node = om.readTree(body)
        val filesNode = node.get("files")
        if (filesNode == null || !filesNode.isArray || filesNode.isEmpty) None
        else Some(Engine.JobSpec(
          files = filesNode.elements().asScala.map(_.asText).toSeq,
          reducerCount = Option(node.get("reducer_count")).map(_.asInt).getOrElse(3),
          shardSize = Option(node.get("shard_size")).map(_.asLong).getOrElse(50000L)))
      } catch { case _: Exception => None }
    parsed match {
      case None => respond(ex, 400, err("body must be {reducer_count?, shard_size?, files[]}"))
      case Some(spec) =>
        val id = ids.getAndIncrement()
        val entry = new Entry(spec)
        jobs.put(id, entry)
        // slot wait happens OFF the HTTP thread so the POST returns
        // immediately with the pollable CREATED job
        val admit = new Thread(() => {
          slots.acquire()
          if (entry.cancelled) slots.release() // dropped while queued
          else {
            entry.handle = Some(Engine.submitAsync(spark, spec, s"$outRoot/job_$id", id,
              _ => slots.release()))
            // close the race with a DELETE that set the flag between the
            // check above and the handle write: one side's write is always
            // visible to the other's re-check
            if (entry.cancelled) entry.handle.foreach(_.cancel())
          }
        }, s"graft-jobserver-admit-$id")
        admit.setDaemon(true)
        admit.start()
        val node = om.createObjectNode()
        node.put("job_id", id)
        node.put("status", "CREATED")
        respond(ex, 200, om.writeValueAsString(node))
    }
  }
}
