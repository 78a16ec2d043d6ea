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

  test("aws_kinesis_firehose: base64 gzip records, protocol responses") {
    val topo = graft.config.Topology.load(
      """
        |[sources.fh]
        |  type = "aws_kinesis_firehose"
        |  address = "127.0.0.1:0"
        |""".stripMargin)
    try {
      val src = topo.loadStreamingSources(spark)
      val port = topo.ingestListeners.head.boundPort
      val qn = s"firehose_src_${System.nanoTime()}"
      val q = src("fh").df.drop(graft.config.Topology.SeqCol).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        def b64(s: String, gz: Boolean): String = {
          val raw = s.getBytes("UTF-8")
          val bytes = if (gz) {
            val o = new java.io.ByteArrayOutputStream()
            val g = new java.util.zip.GZIPOutputStream(o)
            g.write(raw); g.close(); o.toByteArray
          } else raw
          java.util.Base64.getEncoder.encodeToString(bytes)
        }
        def post(body: String, hdrs: Map[String, String]): (Int, String) = {
          val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/"))
            .POST(HttpRequest.BodyPublishers.ofString(body))
          hdrs.foreach { case (k, v) => b.header(k, v) }
          val r = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
          (r.statusCode(), r.body())
        }
        // one gzipped multi-line record (the CloudWatch Logs shape) and
        // one plain record — compression=auto sniffs per record
        val payload =
          s"""{"requestId":"req-1","timestamp":1612325106000,
             |"records":[{"data":"${b64("line a\nline b\n", gz = true)}"},
             |{"data":"${b64("line c", gz = false)}"}]}"""
            .stripMargin.replaceAll("\n", "")
        val (c1, body1) = post(payload, Map(
          "X-Amz-Firehose-Request-Id" -> "req-1",
          "X-Amz-Firehose-Source-Arn" ->
            "arn:aws:firehose:us-east-1:111:deliverystream/s",
          "X-Amz-Firehose-Access-Key" -> "ignored"))
        assert(c1 == 200 &&
          body1 == """{"requestId":"req-1","timestamp":1612325106000}""")
        // protocol errors answer 400 with errorMessage
        val (c2, body2) = post("""{"requestId":"r2"}""",
          Map("X-Amz-Firehose-Request-Id" -> "r2"))
        assert(c2 == 400 && body2.contains("errorMessage"), body2)
        assert(post("""{"requestId":"r3","timestamp":1,"records":[{"data":"!!"}]}""",
          Map.empty)._1 == 400)

        val t0 = System.currentTimeMillis()
        while (spark.table(qn).count() < 3 &&
          System.currentTimeMillis() - t0 < 30000) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        val rows = spark.table(qn)
          .selectExpr("message", "request_id", "source_arn",
            "CAST(unix_millis(timestamp) AS BIGINT)", "source_type")
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
            r.getLong(3), r.getString(4))).sortBy(_._1).toSeq
        assert(rows == Seq(
          ("line a", "req-1", "arn:aws:firehose:us-east-1:111:deliverystream/s",
            1612325106000L, "aws_kinesis_firehose"),
          ("line b", "req-1", "arn:aws:firehose:us-east-1:111:deliverystream/s",
            1612325106000L, "aws_kinesis_firehose"),
          ("line c", "req-1", "arn:aws:firehose:us-east-1:111:deliverystream/s",
            1612325106000L, "aws_kinesis_firehose")))
      } finally q.stop()
    } finally topo.closeIngest()

    // access-key validation refused loudly; batch refused
    val e1 = intercept[Exception](graft.config.Topology.load(
      """
        |[sources.fh]
        |  type = "aws_kinesis_firehose"
        |  address = "127.0.0.1:0"
        |  access_key = "secret"
        |""".stripMargin).loadStreamingSources(spark))
    assert(e1.getMessage.contains("credential"), e1.getMessage)
    val e2 = intercept[Exception](graft.config.Topology.load(
      """
        |[sources.fh]
        |  type = "aws_kinesis_firehose"
        |  address = "127.0.0.1:0"
        |""".stripMargin).loadSources(spark))
    assert(e2.getMessage.contains("streaming-only"))
  }

  test("heroku_logs: logplex drain lines with the Msg-Count contract") {
    val topo = graft.config.Topology.load(
      """
        |[sources.drain]
        |  type = "heroku_logs"
        |  address = "127.0.0.1:0"
        |  query_parameters = ["app_id"]
        |""".stripMargin)
    try {
      val src = topo.loadStreamingSources(spark)
      val port = topo.ingestListeners.head.boundPort
      val qn = s"heroku_src_${System.nanoTime()}"
      val q = src("drain").df.drop(graft.config.Topology.SeqCol).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        def postN(body: String, count: Int, hdr: Boolean = true): Int = {
          val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:$port/events?app_id=a42"))
            .POST(HttpRequest.BodyPublishers.ofString(body))
          if (hdr) b.header("Logplex-Msg-Count", count.toString)
          client.send(b.build(),
            HttpResponse.BodyHandlers.discarding()).statusCode()
        }
        val lines =
          "83 <40>1 2012-11-30T06:45:29+00:00 host app web.3 - State changed from starting to up\n" +
          "111 <40>1 2012-11-30T06:45:30+00:00 host app web.3 - Starting process with command bundle exec rackup config.ru\n"
        assert(postN(lines, 2) == 200)
        // count mismatch -> 400 (a malformed line yields no event)
        assert(postN("junk-not-logplex\n", 1) == 400)
        // missing header -> 400
        assert(postN(lines, 2, hdr = false) == 400)

        val t0 = System.currentTimeMillis()
        while (spark.table(qn).count() < 2 &&
          System.currentTimeMillis() - t0 < 30000) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        val rows = spark.table(qn)
          .selectExpr("message", "host", "app_name", "proc_id", "app_id",
            "CAST(unix_millis(timestamp) AS BIGINT)", "source_type")
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
            r.getString(3), r.getString(4), r.getLong(5), r.getString(6)))
          .sortBy(_._1).toSeq
        assert(rows == Seq(
          ("Starting process with command bundle exec rackup config.ru",
            "host", "app", "web.3", "a42", 1354257930000L, "heroku_logs"),
          ("State changed from starting to up",
            "host", "app", "web.3", "a42", 1354257929000L, "heroku_logs")))
      } finally q.stop()
    } finally topo.closeIngest()
  }

  test("splunk_hec: event stream, sticky time, raw service, response contract") {
    val topo = graft.config.Topology.load(
      """
        |[sources.hec]
        |  type = "splunk_hec"
        |  address = "127.0.0.1:0"
        |""".stripMargin)
    try {
      val src = topo.loadStreamingSources(spark)
      val port = topo.ingestListeners.head.boundPort
      val base = s"http://127.0.0.1:$port/services/collector"
      val qn = s"hec_src_${System.nanoTime()}"
      val q = src("hec").df.drop(graft.config.Topology.SeqCol).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        def postBody(url: String, body: String) = {
          val resp = client.send(HttpRequest.newBuilder(URI.create(url))
            .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
            HttpResponse.BodyHandlers.ofString())
          (resp.statusCode(), resp.body())
        }
        // three concatenated JSON events, no separators (the serde
        // StreamDeserializer shape): the second omits `time` and must
        // inherit the first's (request-scoped sticky time); the third
        // is an object event riding as canonical JSON. Integer time in
        // MILLIS exercises the magnitude sniff.
        val (c1, b1) = postBody(s"$base/event",
          """{"event":"one","time":1612325106,"host":"edge","fields":{"env":"prod"}}""" +
            """{"event":"two","sourcetype":"app"}""" +
            """{"event":{"k":1},"time":1612325107000}""")
        assert(c1 == 200 && b1 == """{"text":"Success","code":0}""")
        // raw service: whole body one event, envelope from the query
        val (c2, b2) = postBody(s"$base/raw?sourcetype=blob&channel=ch1",
          "raw payload bytes")
        assert(c2 == 200 && b2 == """{"text":"Success","code":0}""")
        // contract: empty body -> code 5; bad json -> code 6; health
        assert(postBody(s"$base/event", "") ==
          (400, """{"text":"No data","code":5}"""))
        assert(postBody(s"$base/event", "{nope")._1 == 400)
        val health = client.send(HttpRequest.newBuilder(
          URI.create(s"$base/health")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        assert(health.statusCode() == 200 && health.body() == "HEC is available")

        val t0 = System.currentTimeMillis()
        while (spark.table(qn).count() < 4 &&
          System.currentTimeMillis() - t0 < 30000) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        val rows = spark.table(qn)
          .selectExpr("message", "sourcetype", "channel", "host", "fields",
            "CAST(unix_millis(timestamp) AS BIGINT)", "source_type")
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
            r.getString(3), r.getString(4), r.getLong(5), r.getString(6)))
          .sortBy(_._1).toSeq
        assert(rows.map(_._7).forall(_ == "splunk_hec"))
        val byMsg = rows.map(r => r._1 -> r).toMap
        // envelope host wins; fields ride as JSON; provided time exact
        assert(byMsg("one")._4 == "edge")
        assert(byMsg("one")._5 == """{"env":"prod"}""")
        assert(byMsg("one")._6 == 1612325106000L)
        // sticky time: "two" inherits event one's time; peer host fallback
        assert(byMsg("two")._2 == "app" && byMsg("two")._6 == 1612325106000L)
        assert(byMsg("two")._4 == "127.0.0.1")
        // millis magnitude sniffed; object event is canonical JSON
        assert(byMsg("""{"k":1}""")._6 == 1612325107000L)
        // raw: query-param envelope
        assert(byMsg("raw payload bytes")._2 == "blob" &&
          byMsg("raw payload bytes")._3 == "ch1")
      } finally q.stop()
    } finally topo.closeIngest()

    // token auth refused loudly; batch refused as streaming-only
    val e1 = intercept[Exception](graft.config.Topology.load(
      """
        |[sources.hec]
        |  type = "splunk_hec"
        |  address = "127.0.0.1:0"
        |  token = "secret"
        |""".stripMargin).loadStreamingSources(spark))
    assert(e1.getMessage.contains("token"), e1.getMessage)
    val e2 = intercept[Exception](graft.config.Topology.load(
      """
        |[sources.hec]
        |  type = "splunk_hec"
        |  address = "127.0.0.1:0"
        |""".stripMargin).loadSources(spark))
    assert(e2.getMessage.contains("streaming-only"))
  }
}
