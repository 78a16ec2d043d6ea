package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.config.Topology
import graft.config.Topology.SeqCol

/** The datadog_agent source (reference src/sources/datadog_agent/):
  * the logs arm's LogMsg array, the v1 series metric arm with the
  * count/rate/gauge mapping and tag folds, gzip bodies, and the
  * refusal/guard surface.
  */
class DatadogAgentSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def post(url: String, body: Array[Byte],
                   hdrs: Map[String, String] = Map.empty): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofByteArray(body))
    hdrs.foreach { case (k, v) => b.header(k, v) }
    val r = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("datadog_agent logs arm: LogMsg array to stamped events, gzip body") {
    val topo = Topology.load(
      """
        |[sources.dd]
        |  type = "datadog_agent"
        |  address = "127.0.0.1:0"
        |""".stripMargin)
    try {
      val src = topo.loadStreamingSources(spark)
      val port = topo.ingestListeners.head.boundPort
      val base = s"http://127.0.0.1:$port"
      val qn = s"dd_logs_${System.nanoTime()}"
      val q = src("dd").df.drop(SeqCol).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        // LogMsg is strict: all seven fields, nothing else
        def logMsg(msg: String, status: String, host: String): String =
          s"""{"message":"$msg","status":"$status","timestamp":1612325106000,
             |"hostname":"$host","service":"api","ddsource":"nginx",
             |"ddtags":"env:prod,team:core"}""".stripMargin
            .replaceAll("\n", "")
        val payload = s"""[${logMsg("m1", "info", "web-1")},
          |${logMsg("m2", "error", "web-2")}]""".stripMargin
          .replaceAll("\n", "")
        // the agent gzips request bodies: decode like the reference
        val gz = new java.io.ByteArrayOutputStream()
        val gzo = new java.util.zip.GZIPOutputStream(gz)
        gzo.write(payload.getBytes("UTF-8")); gzo.close()
        assert(post(s"$base/api/v2/logs", gz.toByteArray,
          Map("Content-Encoding" -> "gzip", "DD-API-KEY" -> "abc")) ==
          (200, "{}"))
        // the /v1/input legacy path serves the same arm
        assert(post(s"$base/v1/input/abc",
          s"[${logMsg("m3", "warn", "web-3")}]".getBytes("UTF-8"))._1 == 200)
        // strictness: a partial LogMsg and an unknown field both 400
        // (deny_unknown_fields + required fields, like the reference)
        assert(post(s"$base/api/v2/logs",
          """[{"message":"partial"}]""".getBytes("UTF-8"))._1 == 400)
        assert(post(s"$base/api/v2/logs",
          (s"[${logMsg("m4", "info", "h")}]"
            .replace("\"ddtags\"", "\"extra\":1,\"ddtags\""))
            .getBytes("UTF-8"))._1 == 400)
        // guards: series on a logs-typed source 422, protobuf arm 501,
        // bad JSON 400, keep-alive empty body 200
        assert(post(s"$base/api/v1/series",
          """{"series":[]}""".getBytes("UTF-8"))._1 == 422)
        assert(post(s"$base/api/beta/sketches",
          Array[Byte](1, 2, 3))._1 == 501)
        assert(post(s"$base/api/v2/logs", "{oops".getBytes("UTF-8"))._1 == 400)
        assert(post(s"$base/api/v2/logs", Array.emptyByteArray)._1 == 200)

        val t0 = System.currentTimeMillis()
        while (spark.table(qn).count() < 3 &&
          System.currentTimeMillis() - t0 < 30000) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        val rows = spark.table(qn)
          .selectExpr("message", "status", "hostname", "service", "ddsource",
            "ddtags", "CAST(unix_millis(timestamp) AS BIGINT)", "source_type")
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
            r.getString(3), r.getString(4), r.getString(5), r.getLong(6),
            r.getString(7))).sortBy(_._1).toSeq
        assert(rows.map(_._8).forall(_ == "datadog_agent"))
        val byMsg = rows.map(r => r._1 -> r).toMap
        assert(byMsg("m1") == ("m1", "info", "web-1", "api", "nginx",
          "env:prod,team:core", 1612325106000L, "datadog_agent"))
        assert(byMsg("m2")._3 == "web-2" && byMsg("m2")._2 == "error")
        assert(byMsg("m3")._3 == "web-3" && byMsg("m3")._2 == "warn")
      } finally q.stop()
    } finally topo.closeIngest()
  }

  test("datadog_agent metrics arm: v1 series count/rate/gauge with tag folds") {
    val topo = Topology.load(
      """
        |[sources.dd]
        |  type = "datadog_agent"
        |  address = "127.0.0.1:0"
        |  disable_logs = true
        |""".stripMargin)
    try {
      val src = topo.loadStreamingSources(spark)
      assert(src("dd").metric)
      val port = topo.ingestListeners.head.boundPort
      val qn = s"dd_series_${System.nanoTime()}"
      val q = src("dd").df.drop(SeqCol).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        val payload =
          """{"series":[
            |{"metric":"req.count","type":"count","points":[[1612325106,3]],
            | "tags":["env:prod"],"host":"web-1"},
            |{"metric":"req.rate","type":"rate","interval":10,
            | "points":[[1612325106,2.5]]},
            |{"metric":"cpu","type":"gauge","points":[[1612325106,0.75],
            | [1612325116,0.5]],"tags":["core"],"device":"cpu0"}
            |]}""".stripMargin.replaceAll("\n", "")
        assert(post(s"http://127.0.0.1:$port/api/v1/series",
          payload.getBytes("UTF-8")) == (200, "{}"))
        // the logs route answers 422 on a metrics-typed source;
        // sketches stay 501 (no sketch row in the flat model)
        assert(post(s"http://127.0.0.1:$port/api/v2/logs",
          "[]".getBytes("UTF-8"))._1 == 422)
        assert(post(s"http://127.0.0.1:$port/api/beta/sketches",
          Array[Byte](1))._1 == 501)
        // v2 series: the protobuf MetricPayload — one RATE series with
        // a host resource, an extra resource, and source_type_name
        val v2 = {
          import graft.functions.ProtoWire.Writer
          def utf8(s: String) = s.getBytes("UTF-8")
          val point = new Writer
          point.writeTag(1, 1).writeFixed64(
            java.lang.Double.doubleToLongBits(1.5))
          point.writeTag(2, 0).writeVarint(1612325106L)
          val resHost = new Writer
          resHost.writeLenDelim(1, utf8("host"))
          resHost.writeLenDelim(2, utf8("web-9"))
          val resOther = new Writer
          resOther.writeLenDelim(1, utf8("cluster"))
          resOther.writeLenDelim(2, utf8("c1"))
          val serie = new Writer
          serie.writeLenDelim(1, resHost.toBytes)
          serie.writeLenDelim(1, resOther.toBytes)
          serie.writeLenDelim(2, utf8("net.rate"))
          serie.writeLenDelim(3, utf8("env:prod"))
          serie.writeLenDelim(4, point.toBytes)
          serie.writeTag(5, 0).writeVarint(2L) // RATE
          serie.writeLenDelim(7, utf8("system"))
          serie.writeTag(8, 0).writeVarint(10L) // interval
          new Writer().writeLenDelim(1, serie.toBytes).toBytes
        }
        assert(post(s"http://127.0.0.1:$port/api/v2/series", v2,
          Map("Content-Type" -> "application/x-protobuf")) == (200, "{}"))
        assert(post(s"http://127.0.0.1:$port/api/v2/series",
          "junk".getBytes("UTF-8"))._1 == 400)

        val t0 = System.currentTimeMillis()
        while (spark.table(qn).count() < 5 &&
          System.currentTimeMillis() - t0 < 30000) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        val rows = spark.table(qn)
          .selectExpr("name", "kind", "value_type", "value", "tags",
            "CAST(unix_seconds(ts) AS BIGINT)")
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
            r.getDouble(3), r.getString(4), r.getLong(5)))
          .sortBy(t => (t._1, t._6)).toSeq
        assert(rows == Seq(
          // gauge points each emit; bare tag + device fold in
          ("cpu", "absolute", "gauge", 0.75, "core=,device=cpu0", 1612325106L),
          ("cpu", "absolute", "gauge", 0.5, "core=,device=cpu0", 1612325116L),
          // v2 protobuf: rate x interval, host resource + resource.* +
          // source_type_name folds
          ("net.rate", "incremental", "counter", 15.0,
            "env=prod,host=web-9,resource.cluster=c1,source_type_name=system",
            1612325106L),
          // count incremental; host folds into tags
          ("req.count", "incremental", "counter", 3.0,
            "env=prod,host=web-1", 1612325106L),
          // rate x interval back into a counter
          ("req.rate", "incremental", "counter", 25.0, null, 1612325106L)))
      } finally q.stop()
    } finally topo.closeIngest()

    // both arms on one source: loud multiple_outputs refusal; batch form
    val e1 = intercept[Exception](Topology.load(
      """
        |[sources.dd]
        |  type = "datadog_agent"
        |  address = "127.0.0.1:0"
        |  multiple_outputs = true
        |""".stripMargin).loadStreamingSources(spark))
    assert(e1.getMessage.contains("multiple_outputs"), e1.getMessage)
    val e2 = intercept[Exception](Topology.load(
      """
        |[sources.dd]
        |  type = "datadog_agent"
        |  address = "127.0.0.1:0"
        |""".stripMargin).loadSources(spark))
    assert(e2.getMessage.contains("streaming-only"))
  }
}
