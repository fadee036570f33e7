package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.ops.JobServer

/** Drives the HTTP submit facade end to end through a real HTTP client —
  * the reference's webclient/clientsdk workflow (POST a job spec, poll the
  * job id to COMPLETED, read the output files). */
class JobServerSpec extends SparkTestBase {

  private def get(client: HttpClient, url: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(client: HttpClient, url: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /jobs then poll GET /jobs/<id> to COMPLETED (webclient parity)") {
    val in = Files.createTempDirectory("graft_http_in")
    Files.writeString(in.resolve("a.txt"), "alpha beta alpha\nbeta beta gamma")
    val outRoot = Files.createTempDirectory("graft_http_out").toString
    val srv = new JobServer(spark, outRoot)
    val port = srv.start()
    val base = s"http://127.0.0.1:$port"
    try {
      val client = HttpClient.newHttpClient()
      val spec =
        s"""{"reducer_count": 2, "shard_size": 1024,
           | "files": ["${in.resolve("a.txt")}"]}""".stripMargin
      val created = post(client, s"$base/jobs", spec)
      assert(created.statusCode() === 200)
      assert(created.body().contains("\"job_id\":0"))
      assert(created.body().contains("\"status\":\"CREATED\""))
      // poll the status surface until terminal, like the reference client
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var status = ""
      while (!Set("COMPLETED", "FAILED").contains(status) && System.nanoTime() < deadline) {
        val r = get(client, s"$base/jobs/0")
        assert(r.statusCode() === 200)
        status = "\"status\":\"(\\w+)\"".r.findFirstMatchIn(r.body()).map(_.group(1)).getOrElse("")
        Thread.sleep(20)
      }
      assert(status === "COMPLETED")
      val fin = get(client, s"$base/jobs/0").body()
      // alpha, beta, gamma
      assert(fin.contains("\"distinct_keys\":3"))
      assert(fin.contains("\"progress\":1.0"))
      assert("\"transitions\":\\[\"CREATED\",\"RUNNING\",\"COMPLETED\"\\]".r
        .findFirstIn(fin).isDefined, s"lifecycle must be observable: $fin")
      // the job really ran: reducerCount sorted text files with the counts
      val outDf = spark.read.text(s"$outRoot/job_0")
      val counts = outDf.collect().map(_.getString(0)).sorted
      assert(counts.toSeq === Seq("alpha 2", "beta 3", "gamma 1"))
      // list surface sees the job as terminal
      assert(get(client, s"$base/jobs").body().contains("\"status\":\"COMPLETED\""))
    } finally srv.stop()
  }

  test("facade rejects malformed submissions and unknown ids") {
    val outRoot = Files.createTempDirectory("graft_http_out2").toString
    val srv = new JobServer(spark, outRoot)
    val port = srv.start()
    val base = s"http://127.0.0.1:$port"
    try {
      val client = HttpClient.newHttpClient()
      assert(post(client, s"$base/jobs", "{not json").statusCode() === 400)
      assert(post(client, s"$base/jobs", """{"files": []}""").statusCode() === 400)
      assert(get(client, s"$base/jobs/99").statusCode() === 404)
      assert(get(client, s"$base/nope").statusCode() === 404)
      // a FAILED job is isolated and reported, not thrown (missing input)
      val bad = post(client, s"$base/jobs", """{"files": ["/nonexistent/x.txt"]}""")
      assert(bad.statusCode() === 200)
      val id = "\"job_id\":(\\d+)".r.findFirstMatchIn(bad.body()).get.group(1)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var status = ""
      while (!Set("COMPLETED", "FAILED").contains(status) && System.nanoTime() < deadline) {
        status = "\"status\":\"(\\w+)\"".r
          .findFirstMatchIn(get(client, s"$base/jobs/$id").body()).map(_.group(1)).getOrElse("")
        Thread.sleep(20)
      }
      assert(status === "FAILED")
      assert(get(client, s"$base/jobs/$id").body().contains("\"error\""))
    } finally srv.stop()
  }
}
