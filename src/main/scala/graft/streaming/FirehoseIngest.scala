package graft.streaming

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.config.Framing

object FirehoseIngest {
  /** One framed record line with its delivery envelope. */
  final case class Req(message: String, requestId: String, sourceArn: String,
                       tsms: Long, peer: String)
}

/** The reference's `aws_kinesis_firehose` source
  * (src/sources/aws_kinesis_firehose/): the HTTP endpoint Firehose
  * delivery streams POST to (protocol 1.0). Body:
  * `{requestId, timestamp (ms), records: [{data: base64}]}`; each
  * record's bytes optionally gzip-compressed — `compression = auto`
  * (default) sniffs the magic and falls back to the raw bytes on a
  * failed inflate exactly like the reference's Auto arm; `gzip`
  * requires it; `none` never inflates. Decoded record bytes are cut
  * by the configured framing (newline by default) into `message`
  * events stamped with request_id, the X-Amz-Firehose-Source-Arn
  * header, and the request timestamp.
  *
  * Responses follow the protocol: 200 `{"requestId": ..,
  * "timestamp": ..}` on success, 400 with `errorMessage` on a
  * malformed body/record. Access-key VALIDATION is a credential
  * surface this engine refuses at config level; the
  * X-Amz-Firehose-Access-Key header is accepted and discarded.
  */
final class FirehoseIngest(spark: SparkSession, bindHost: String, port: Int,
                           compression: String,
                           framerB: () => Framing.Framer)
    extends IngestListener {

  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val stream = MemoryStream[FirehoseIngest.Req](spark)
  private val pushLock = new Object

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, b.length.toLong)
    ex.getResponseBody.write(b)
  }

  private def jstr(s: String): String =
    if (s == null) "null"
    else "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def gunzipCapped(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val out = in.readNBytes(HttpIngest.MaxBody + 1)
      if (out.length > HttpIngest.MaxBody)
        throw new IllegalArgumentException(
          s"record inflates past ${HttpIngest.MaxBody} bytes")
      out
    } finally in.close()
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  private val server = HttpServer.create(new InetSocketAddress(bindHost, port), 0)
  server.createContext("/", (ex: HttpExchange) => {
    try {
      if (!ex.getRequestMethod.equalsIgnoreCase("POST")) {
        ex.sendResponseHeaders(405, -1)
      } else HttpIngest.readBodyLimited(ex) match {
        case None => HttpIngest.tooLarge(ex)
        case Some(body) =>
          val hdrReqId = Option(
            ex.getRequestHeaders.getFirst("X-Amz-Firehose-Request-Id"))
          val sourceArn = Option(
            ex.getRequestHeaders.getFirst("X-Amz-Firehose-Source-Arn")).orNull
          val peer = ex.getRemoteAddress.getAddress.getHostAddress
          try {
            val root = mapper.readTree(body)
            if (root == null || !root.isObject)
              throw new IllegalArgumentException("body is not a JSON object")
            val requestId = Option(root.get("requestId")).filter(_.isTextual)
              .map(_.asText()).orElse(hdrReqId).getOrElse(
                throw new IllegalArgumentException("missing requestId"))
            val tsms = Option(root.get("timestamp")).filter(_.isNumber)
              .map(_.asLong()).getOrElse(
                throw new IllegalArgumentException("missing timestamp"))
            val records = Option(root.get("records")).filter(_.isArray)
              .getOrElse(throw new IllegalArgumentException("missing records"))
            val out = Seq.newBuilder[FirehoseIngest.Req]
            records.forEach { r =>
              val dataNode = Option(r.get("data")).filter(_.isTextual)
                .getOrElse(throw new IllegalArgumentException(
                  "record without base64 data"))
              val raw =
                try java.util.Base64.getDecoder.decode(dataNode.asText())
                catch { case e: IllegalArgumentException =>
                  throw new IllegalArgumentException(
                    s"record data is not base64: ${e.getMessage}") }
              if (raw.nonEmpty) {
                val bytes = compression match {
                  case "none" => raw
                  case "gzip" => gunzipCapped(raw)
                  case _ => // auto: sniff, fall back to raw on failure
                    if (isGzip(raw))
                      scala.util.Try(gunzipCapped(raw)).getOrElse(raw)
                    else raw
                }
                framerB().frameAll(bytes).foreach { f =>
                  out += FirehoseIngest.Req(new String(f, "UTF-8"),
                    requestId, sourceArn, tsms, peer)
                }
              }
            }
            val reqs = out.result()
            if (reqs.nonEmpty) pushLock.synchronized { stream.addData(reqs) }
            respond(ex, 200,
              s"""{"requestId":${jstr(requestId)},"timestamp":$tsms}""")
          } catch {
            case scala.util.control.NonFatal(e) =>
              val reqId = hdrReqId.getOrElse("unknown")
              respond(ex, 400,
                s"""{"requestId":${jstr(reqId)},"timestamp":0,""" +
                  s""""errorMessage":${jstr(
                    Option(e.getMessage).getOrElse("invalid request"))}}""")
          }
      }
    } finally ex.close()
  })
  server.start()

  def boundPort: Int = server.getAddress.getPort

  /** Raw feed: message, requestId, sourceArn, tsms, peer. */
  def df: DataFrame = stream.toDF()

  def close(): Unit = server.stop(0)
}
