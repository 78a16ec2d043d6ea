package graft.streaming

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

object DatadogIngest {
  /** One agent log event (src/sources/datadog_agent/logs.rs LogMsg):
    * the seven reserved attributes, timestamp in epoch millis.
    */
  final case class Log(message: String, status: String, tsms: Option[Long],
                       hostname: String, service: String, ddsource: String,
                       ddtags: String, peer: String)

  /** One flat metric sample decoded from a v1 series point
    * (metrics.rs into_vector_metric): count/rate → incremental
    * counter (rate × interval), gauge → absolute gauge; host /
    * source_type_name / device fold into the tag set.
    */
  final case class Metric(name: String, kind: String, valueType: String,
                          value: Double, tsec: Option[Long], tags: String,
                          peer: String)
}

/** The reference's `datadog_agent` source
  * (src/sources/datadog_agent/): the agent-facing HTTP endpoint.
  * Implemented arms:
  *   - logs: POST `/v1/input/...` | `/api/v2/logs...` — a JSON array
  *     of LogMsg envelopes;
  *   - metrics: POST `/api/v1/series...` (the JSON series payload)
  *     and `/api/v2/series...` (the protobuf MetricPayload, decoded
  *     over the ProtoWire kernel).
  * Sketches (`/api/beta/sketches`) answer 501 — DDSketch values have
  * no single-value row in the flat metric model; gzip/deflate
  * content-encoding is decompressed like the reference's decode step;
  * `dd-api-key` (header or query) is accepted and DISCARDED — no
  * credential handling in this engine, and unlike the reference there
  * is no store_api_key passthrough.
  *
  * One listener serves ONE typed frame (this engine's frames are
  * log- or metric-typed): construct with exactly one of the arms
  * enabled; the other route answers 422 "disabled by configuration"
  * (the reference's disable_logs / disable_metrics knobs).
  */
final class DatadogIngest(spark: SparkSession, bindHost: String, port: Int,
                          wantLogs: Boolean) extends IngestListener {

  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val logStream =
    if (wantLogs) Some(MemoryStream[DatadogIngest.Log](spark)) else None
  private val metricStream =
    if (!wantLogs) Some(MemoryStream[DatadogIngest.Metric](spark)) else None
  private val pushLock = new Object

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, b.length.toLong)
    ex.getResponseBody.write(b)
  }

  private def decompress(enc: String, body: Array[Byte]): Array[Byte] = {
    // inflate bound: a few-KB bomb must answer 400, not balloon the heap
    def capped(in: java.io.InputStream): Array[Byte] =
      try {
        val out = in.readNBytes(HttpIngest.MaxBody + 1)
        if (out.length > HttpIngest.MaxBody)
          throw new IllegalArgumentException(
            s"payload inflates past ${HttpIngest.MaxBody} bytes")
        out
      } finally in.close()
    enc match {
      case "" | "identity" => body
      case "gzip" | "x-gzip" =>
        capped(new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(body)))
      case "deflate" | "x-deflate" =>
        capped(new java.util.zip.InflaterInputStream(
          new java.io.ByteArrayInputStream(body)))
      case other =>
        throw new IllegalArgumentException(s"unsupported content-encoding $other")
    }
  }

  private def sOf(n: com.fasterxml.jackson.databind.JsonNode,
                  k: String): String = {
    val v = n.get(k)
    if (v == null || v.isNull) null else v.asText()
  }

  /** v2 series: the protobuf `MetricPayload` (agent-payload
    * agent_payload.proto, mirrored at reference proto/vector/
    * dd_metric.proto), decoded over the ProtoWire kernel —
    * metrics.rs decode_ddseries_v2 semantics: COUNT → incremental
    * counter, RATE → incremental counter × interval (0 → 1),
    * GAUGE/UNSPECIFIED → absolute gauge; a `host`-typed resource
    * folds into the host tag, any other resource into
    * `resource.<type>`, plus source_type_name.
    */
  private def decodeSeriesV2(body: Array[Byte],
                             peer: String): Seq[DatadogIngest.Metric] = {
    import graft.functions.ProtoWire.{Reader, WField}
    def fields(b: Array[Byte]) = new Reader(b).readAll()
    def str(b: Array[Byte]) = new String(b, "UTF-8")
    val out = Seq.newBuilder[DatadogIngest.Metric]
    fields(body).foreach {
      case WField(1, 2, _, seriesBytes) =>
        var name = ""; var mtype = 0L; var interval = 1L
        var sourceTypeName = ""
        val tagMap = scala.collection.mutable.LinkedHashMap[String, String]()
        val resources = Seq.newBuilder[(String, String)]
        val points = Seq.newBuilder[(Option[Long], Double)]
        fields(seriesBytes).foreach {
          case WField(1, 2, _, rb) =>
            var rt = ""; var rn = ""
            fields(rb).foreach {
              case WField(1, 2, _, v) => rt = str(v)
              case WField(2, 2, _, v) => rn = str(v)
              case _ => ()
            }
            resources += ((rt, rn))
          case WField(2, 2, _, v) => name = str(v)
          case WField(3, 2, _, v) =>
            val s = str(v); val i = s.indexOf(':')
            if (i >= 0) tagMap(s.take(i)) = s.drop(i + 1) else tagMap(s) = ""
          case WField(4, 2, _, pb) =>
            var value = 0.0; var ts = Option.empty[Long]
            fields(pb).foreach {
              case WField(1, 1, bits, _) =>
                value = java.lang.Double.longBitsToDouble(bits)
              case WField(2, 0, t, _) => ts = Some(t)
              case _ => ()
            }
            points += ((ts, value))
          case WField(5, 0, t, _) => mtype = t
          case WField(7, 2, _, v) => sourceTypeName = str(v)
          case WField(8, 0, t, _) => if (t > 0) interval = t
          case _ => ()
        }
        resources.result().foreach { case (rt, rn) =>
          if (rt == "host") tagMap("host") = rn
          else tagMap(s"resource.$rt") = rn
        }
        if (sourceTypeName.nonEmpty) tagMap("source_type_name") = sourceTypeName
        val tagStr =
          if (tagMap.isEmpty) null
          else tagMap.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString(",")
        points.result().foreach { case (ts, v) =>
          val (kind, vt, value) = mtype match {
            case 1L => ("incremental", "counter", v)
            case 2L => ("incremental", "counter", v * interval)
            case _ => ("absolute", "gauge", v)
          }
          out += DatadogIngest.Metric(name, kind, vt, value, ts, tagStr, peer)
        }
      case _ => ()
    }
    out.result()
  }

  private val server = HttpServer.create(new InetSocketAddress(bindHost, port), 0)
  server.createContext("/", (ex: HttpExchange) => {
    try {
      val path = ex.getRequestURI.getPath
      val peer = ex.getRemoteAddress.getAddress.getHostAddress
      val isLogs = path.startsWith("/v1/input") || path.startsWith("/api/v2/logs")
      val isSeriesV1 = path.startsWith("/api/v1/series")
      val isSeriesV2 = path.startsWith("/api/v2/series")
      if (!ex.getRequestMethod.equalsIgnoreCase("POST")) {
        ex.sendResponseHeaders(405, -1)
      } else if (path.startsWith("/api/beta/sketches")) {
        // DDSketch values have no single-value row in the flat metric
        // model (documented narrowing — the engine's own sketch lives
        // in SketchExpressions); refuse rather than decode wrong
        respond(ex, 501,
          """{"error":"sketches not representable in the flat metric model — use series"}""")
      } else if (!isLogs && !isSeriesV1 && !isSeriesV2) {
        ex.sendResponseHeaders(404, -1)
      } else if (isLogs && logStream.isEmpty) {
        respond(ex, 422, """{"error":"logs disabled by configuration"}""")
      } else if ((isSeriesV1 || isSeriesV2) && metricStream.isEmpty) {
        respond(ex, 422, """{"error":"metrics disabled by configuration"}""")
      } else {
        val enc = Option(ex.getRequestHeaders.getFirst("Content-Encoding"))
          .getOrElse("").toLowerCase
        val rawOpt = HttpIngest.readBodyLimited(ex)
        if (rawOpt.isEmpty) { HttpIngest.tooLarge(ex) }
        else try {
          val body = decompress(enc, rawOpt.get)
          if (body.isEmpty) {
            respond(ex, 200, "{}") // agent keep-alive: empty payload ok
          } else if (isLogs) {
            val root = mapper.readTree(body)
            if (root == null || !root.isArray)
              throw new IllegalArgumentException("logs payload is not an array")
            // LogMsg is STRICT in the reference (mod.rs:585
            // deny_unknown_fields, every field required): a partial or
            // extended envelope is a 400, not a silently-lax accept
            val required = Seq("message", "status", "timestamp",
              "hostname", "service", "ddsource", "ddtags")
            val out = Seq.newBuilder[DatadogIngest.Log]
            root.forEach { n =>
              if (!n.isObject)
                throw new IllegalArgumentException("log entry is not an object")
              val names = {
                val b = Set.newBuilder[String]
                n.fieldNames().forEachRemaining(f => b += f)
                b.result()
              }
              val unknown = names -- required.toSet
              if (unknown.nonEmpty) throw new IllegalArgumentException(
                s"unknown LogMsg field ${unknown.head}")
              required.foreach(f => if (!names(f))
                throw new IllegalArgumentException(s"missing LogMsg field $f"))
              val ts = n.get("timestamp")
              if (!ts.isNumber) throw new IllegalArgumentException(
                "LogMsg timestamp must be epoch millis")
              out += DatadogIngest.Log(
                message = sOf(n, "message"), status = sOf(n, "status"),
                tsms = Some(ts.asLong()),
                hostname = sOf(n, "hostname"), service = sOf(n, "service"),
                ddsource = sOf(n, "ddsource"), ddtags = sOf(n, "ddtags"),
                peer = peer)
            }
            val reqs = out.result()
            if (reqs.nonEmpty) pushLock.synchronized {
              logStream.get.addData(reqs)
            }
            respond(ex, 200, "{}")
          } else if (isSeriesV2) {
            val reqs =
              try decodeSeriesV2(body, peer)
              catch { case scala.util.control.NonFatal(e) =>
                throw new IllegalArgumentException(
                  s"bad MetricPayload protobuf: ${e.getMessage}") }
            if (reqs.nonEmpty) pushLock.synchronized {
              metricStream.get.addData(reqs)
            }
            respond(ex, 200, "{}")
          } else {
            val root = mapper.readTree(body)
            val series = if (root == null) null else root.get("series")
            if (series == null || !series.isArray)
              throw new IllegalArgumentException("series payload missing 'series' array")
            val out = Seq.newBuilder[DatadogIngest.Metric]
            series.forEach { m =>
              val name = sOf(m, "metric")
              val mtype = Option(sOf(m, "type")).getOrElse("gauge")
              val interval = Option(m.get("interval")).filter(_.isNumber)
                .map(_.asLong()).filter(_ != 0L).getOrElse(1L)
              // tags [..] plus host/source_type_name/device REPLACE
              // into the set (into_vector_metric)
              val tagMap = scala.collection.mutable.LinkedHashMap[String, String]()
              Option(m.get("tags")).filter(_.isArray).foreach(_.forEach { t =>
                val s = t.asText()
                val i = s.indexOf(':')
                if (i >= 0) tagMap(s.take(i)) = s.drop(i + 1)
                else tagMap(s) = ""
              })
              Option(sOf(m, "host")).foreach(h => tagMap("host") = h)
              Option(sOf(m, "source_type_name"))
                .foreach(v => tagMap("source_type_name") = v)
              Option(sOf(m, "device")).foreach(v => tagMap("device") = v)
              val tagStr =
                if (tagMap.isEmpty) null
                else tagMap.toSeq.sortBy(_._1)
                  .map { case (k, v) => s"$k=$v" }.mkString(",")
              Option(m.get("points")).filter(_.isArray).foreach(_.forEach { p =>
                if (p.isArray && p.size() >= 2) {
                  val tsec = Option(p.get(0)).filter(_.isNumber).map(_.asLong())
                  val v = p.get(1).asDouble()
                  val (kind, value) = mtype match {
                    case "count" => ("incremental", v)
                    // agent rates are dogstatsd counters over the
                    // flush interval — turned back into counters
                    case "rate" => ("incremental", v * interval)
                    case _ => ("absolute", v)
                  }
                  val vt = if (mtype == "gauge") "gauge" else "counter"
                  out += DatadogIngest.Metric(
                    name, kind, vt, value, tsec, tagStr, peer)
                }
              })
            }
            val reqs = out.result()
            if (reqs.nonEmpty) pushLock.synchronized {
              metricStream.get.addData(reqs)
            }
            respond(ex, 200, "{}")
          }
        } catch {
          case e: IllegalArgumentException =>
            respond(ex, 400, s"""{"error":"${e.getMessage}"}""")
          case _: java.io.IOException |
               _: com.fasterxml.jackson.core.JacksonException =>
            respond(ex, 400, """{"error":"invalid payload"}""")
        }
      }
    } finally ex.close()
  })
  server.start()

  def boundPort: Int = server.getAddress.getPort

  /** The active arm's raw feed (log or metric columns). */
  def df: DataFrame =
    logStream.map(_.toDF()).getOrElse(metricStream.get.toDF())

  def close(): Unit = server.stop(0)
}
