package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.config.Topology

/** The `http_server` source (reference src/sources/http_server.rs)
  * against REAL localhost requests: body framing, request-envelope
  * stamps (path_key / headers / query_parameters), method and path
  * guards, and the loud refusals (auth, wildcard capture, batch form).
  */
class HttpServerIOSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def post(url: String, body: String,
                   hdrs: Map[String, String] = Map.empty): Int = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    hdrs.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.discarding()).statusCode()
  }

  test("http_server: newline-framed bodies become events with envelope stamps") {
    val topo = Topology.load(
      """
        |[sources.push]
        |  type = "http_server"
        |  address = "127.0.0.1:0"
        |  path = "/ingest"
        |  headers = ["X-Tenant"]
        |  query_parameters = ["region"]
        |""".stripMargin)
    try {
      val src = topo.loadStreamingSources(spark)
      val port = topo.ingestListeners.head.boundPort
      val qn = s"http_src_${System.nanoTime()}"
      val q = src("push").df.drop(Topology.SeqCol).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        assert(post(s"http://127.0.0.1:$port/ingest?region=eu",
          "line one\nline two\n", Map("X-Tenant" -> "acme")) == 200)
        // wrong path → 404, no events; wrong method → 405
        assert(post(s"http://127.0.0.1:$port/other", "nope\n") == 404)
        val get = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/ingest")).GET().build()
        assert(client.send(get,
          HttpResponse.BodyHandlers.discarding()).statusCode() == 405)

        val t0 = System.currentTimeMillis()
        while (spark.table(qn).count() < 2 && System.currentTimeMillis() - t0 < 30000) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        val rows = spark.table(qn)
          .select("message", "path", "X-Tenant", "region", "source_type")
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getString(2),
            r.getString(3), r.getString(4))).sortBy(_._1)
        assert(rows.toSeq == Seq(
          ("line one", "/ingest", "acme", "eu", "http_server"),
          ("line two", "/ingest", "acme", "eu", "http_server")))
      } finally q.stop()
    } finally topo.closeIngest()
  }

  test("http_server: syslog decoding composes with the envelope stamps") {
    val topo = Topology.load(
      """
        |[sources.push]
        |  type = "http_server"
        |  address = "127.0.0.1:0"
        |  strict_path = false
        |  path = ""
        |  [sources.push.decoding]
        |    codec = "syslog"
        |""".stripMargin)
    try {
      val src = topo.loadStreamingSources(spark)
      val port = topo.ingestListeners.head.boundPort
      val qn = s"http_syslog_${System.nanoTime()}"
      val q = src("push").df.drop(Topology.SeqCol).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        assert(post(s"http://127.0.0.1:$port/any/route",
          "<13>1 2024-03-01T00:00:00Z web-1 nginx 77 ID9 - request ok\n") == 200)
        val t0 = System.currentTimeMillis()
        while (spark.table(qn).count() < 1 && System.currentTimeMillis() - t0 < 30000) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        val r = spark.table(qn)
          .select("appname", "hostname", "severity", "path", "source_type")
          .collect().head
        assert((r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getString(4)) ==
          ("nginx", "web-1", "notice", "/any/route", "http_server"))
      } finally q.stop()
    } finally topo.closeIngest()
  }

  test("http_server: refusals — auth, wildcard capture, batch form") {
    def load(body: String) = Topology.load(
      s"""
         |[sources.push]
         |  type = "http_server"
         |  address = "127.0.0.1:0"
         |$body
         |""".stripMargin)
    val e1 = intercept[Exception](
      load("[sources.push.auth]\nstrategy = \"basic\"").loadStreamingSources(spark))
    assert(e1.getMessage.contains("auth"))
    val e2 = intercept[Exception](
      load("headers = [\"*\"]").loadStreamingSources(spark))
    assert(e2.getMessage.contains("wildcard"))
    val e3 = intercept[Exception](load("").loadSources(spark))
    assert(e3.getMessage.contains("streaming-only"))
  }
}
