package graft.streaming

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

object OtlpIngest {
  /** One decoded export request: which signal route it hit, the
    * decoded tree as a canonical JSON line, and the peer address.
    */
  final case class Req(signal: String, message: String, peer: String)

  /** route path → signal name (reference http.rs build_ingest_filter:
    * POST /v1/{logs,metrics,traces}).
    */
  val Routes: Map[String, String] = Map(
    "/v1/logs" -> "logs", "/v1/metrics" -> "metrics", "/v1/traces" -> "traces")
}

/** The reference's `opentelemetry` source, OTLP/HTTP transport
  * (src/sources/opentelemetry/{config,http}.rs): listen on the
  * `:4318`-style HTTP endpoint, accept protobuf-encoded
  * `Export{Logs,Metrics,Trace}ServiceRequest` POSTs on `/v1/logs`,
  * `/v1/metrics`, `/v1/traces`, decode each with the signal pinned by
  * its route, and emit the decoded tree.
  *
  * Wire contract mirrored from http.rs: POST only (else 405), the
  * three `/v1/<signal>` paths exactly (else 404), `content-type:
  * application/x-protobuf` required (else 415 — warp's
  * exact_ignore_case header filter), invalid protobuf answers 400, a
  * decoded request answers 200 with an empty `Export*ServiceResponse`
  * (zero protobuf bytes). Each accepted request queues ONE event per
  * export request whose `message` is the canonical OTLP/JSON of the
  * whole signal tree — a streaming schema is static, so the
  * data-shaped tree rides as JSON (parse_json downstream structures
  * it; the batch capture-replay arm of the source infers the real
  * schema).
  *
  * Scale stance: a push listener is a per-process ingress (the
  * reference's own deployment shape); the 100 TB path is capture
  * files / Kafka. This is the protocol-compatibility surface.
  */
final class OtlpIngest(spark: SparkSession, bindHost: String, port: Int)
    extends IngestListener {

  import spark.implicits._

  private val stream = MemoryStream[OtlpIngest.Req](spark)
  private val pushLock = new Object

  private val server = HttpServer.create(new InetSocketAddress(bindHost, port), 0)
  server.createContext("/", (ex: HttpExchange) => {
    try {
      val bodyOpt = HttpIngest.readBodyLimited(ex)
      val body = bodyOpt.getOrElse(Array.emptyByteArray)
      val signal = OtlpIngest.Routes.get(ex.getRequestURI.getPath).orNull
      val ctype = Option(ex.getRequestHeaders.getFirst("Content-Type"))
        .getOrElse("")
      if (bodyOpt.isEmpty) {
        HttpIngest.tooLarge(ex)
      } else if (!ex.getRequestMethod.equalsIgnoreCase("POST")) {
        ex.sendResponseHeaders(405, -1)
      } else if (signal == null) {
        ex.sendResponseHeaders(404, -1)
      } else if (!ctype.toLowerCase.startsWith("application/x-protobuf")) {
        ex.sendResponseHeaders(415, -1)
      } else {
        scala.util.Try(
          graft.functions.OtlpCodec.decodeSignalJson(signal, body)) match {
          case scala.util.Success(json) =>
            pushLock.synchronized {
              stream.addData(OtlpIngest.Req(
                signal, json, ex.getRemoteAddress.getAddress.getHostAddress))
            }
            // empty Export*ServiceResponse: a zero-byte protobuf body
            ex.getResponseHeaders.set("Content-Type", "application/x-protobuf")
            ex.sendResponseHeaders(200, -1)
          case scala.util.Failure(e) =>
            val msg = ("Invalid OTLP payload: " +
              Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
              .getBytes("UTF-8")
            ex.sendResponseHeaders(400, msg.length.toLong)
            ex.getResponseBody.write(msg)
        }
      }
    } finally ex.close()
  })
  server.start()

  def boundPort: Int = server.getAddress.getPort

  /** Raw feed: signal, message (canonical OTLP/JSON line), peer. */
  def df: DataFrame = stream.toDF()

  def close(): Unit = server.stop(0)
}
