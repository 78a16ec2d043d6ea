package graft.streaming

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

object HecIngest {
  /** One HEC event with its envelope. `message` is the event payload —
    * the raw string for string events, canonical JSON for object
    * events (a streaming schema is static; parse_json downstream
    * structures objects). `tsecs` is the resolved epoch time in
    * seconds (null = the request carried none).
    */
  final case class Req(message: String, channel: String, source: String,
                       sourcetype: String, index: String, host: String,
                       fields: String, tsecs: Option[Double], peer: String)

  /** The reference's integer-timestamp magnitude sniff
    * (splunk_hec/mod.rs:965: seconds below year-2400, then millis
    * below year-10000, then micros). Negative times are invalid.
    */
  def epochSecondsOf(t: Long): Option[Double] =
    if (t < 0) None
    else if (t < 13569465600L) Some(t.toDouble)
    else if (t < 253402300800000L) Some(t / 1e3)
    else Some(t / 1e6)
}

/** The reference's `splunk_hec` source (src/sources/splunk_hec/mod.rs):
  * a Splunk HTTP Event Collector endpoint. Routes under
  * `/services/collector`:
  *   - `event` / `event/1.0` / bare: a STREAM of concatenated JSON
  *     objects (serde StreamDeserializer — no separators required),
  *     each `{event, fields, time, channel, host, source, sourcetype,
  *     index}`;
  *   - `raw`: the whole body is one event, envelope from query
  *     parameters;
  *   - `health` / `health/1.0`: 200 "HEC is available".
  * Splunk's response contract: 200 `{"text":"Success","code":0}`,
  * 400 `{"text":"Invalid data format","code":6}` on bad JSON/time,
  * 400 `{"text":"No data","code":5}` on an empty event body.
  *
  * Envelope semantics mirrored from build_event: `fields` objects ride
  * as a canonical JSON string; a provided `time` (number, or string
  * number; integer magnitudes sniffed seconds/millis/micros, floats =
  * seconds) STICKS for later events in the same request that omit it
  * — the reference's request-scoped `self.time`.
  *
  * Auth (`token`/`valid_tokens`) is refused loudly at config level
  * like every credential surface in this engine; the listener itself
  * never inspects Authorization.
  */
final class HecIngest(spark: SparkSession, bindHost: String, port: Int)
    extends IngestListener {

  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val stream = MemoryStream[HecIngest.Req](spark)
  private val pushLock = new Object

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, b.length.toLong)
    ex.getResponseBody.write(b)
  }

  private def strOf(n: com.fasterxml.jackson.databind.JsonNode,
                    key: String): String = {
    val v = n.get(key)
    if (v == null || v.isNull) null
    else if (v.isTextual) v.asText()
    else v.toString
  }

  private val server = HttpServer.create(new InetSocketAddress(bindHost, port), 0)
  server.createContext("/services/collector", (ex: HttpExchange) => {
    try {
      val path = ex.getRequestURI.getPath.stripSuffix("/")
      val sub = path.stripPrefix("/services/collector").stripPrefix("/")
      val peer = ex.getRemoteAddress.getAddress.getHostAddress
      val method = ex.getRequestMethod.toUpperCase
      sub match {
        case "health" | "health/1.0" =>
          respond(ex, 200, "HEC is available")
        case "" | "event" | "event/1.0" if method == "POST" =>
          val bodyOpt = HttpIngest.readBodyLimited(ex)
          val body = bodyOpt.getOrElse(Array.emptyByteArray)
          if (bodyOpt.isEmpty) {
            HttpIngest.tooLarge(ex)
          } else if (body.isEmpty || new String(body, "UTF-8").trim.isEmpty) {
            respond(ex, 400, """{"text":"No data","code":5}""")
          } else {
            // a stream of concatenated JSON values, like serde's
            // StreamDeserializer: MappingIterator over the raw bytes
            val out = Seq.newBuilder[HecIngest.Req]
            var sticky: Option[Double] = None
            var err: Option[Int] = None
            var idx = 0
            try {
              val it = mapper.readerFor(
                classOf[com.fasterxml.jackson.databind.JsonNode])
                .readValues[com.fasterxml.jackson.databind.JsonNode](body)
              while (err.isEmpty && it.hasNext) {
                val n = it.next()
                val ev = n.get("event")
                if (ev == null || ev.isNull) err = Some(idx)
                else {
                  val timeNode = n.get("time")
                  val parsed: Either[Unit, Option[Double]] =
                    if (timeNode == null || timeNode.isNull) Right(None)
                    else {
                      val num: Option[java.math.BigDecimal] =
                        if (timeNode.isNumber) Some(timeNode.decimalValue())
                        else if (timeNode.isTextual)
                          scala.util.Try(
                            new java.math.BigDecimal(timeNode.asText())).toOption
                        else None
                      num match {
                        case None => Left(())
                        case Some(d) =>
                          val isInt = d.stripTrailingZeros.scale <= 0
                          // an integer past Long.MaxValue would WRAP
                          // through longValue(); the reference's
                          // as_u64 fails it -> InvalidDataFormat
                          val fitsLong = d.abs.compareTo(
                            java.math.BigDecimal.valueOf(Long.MaxValue)) <= 0
                          val r =
                            if (isInt && !fitsLong) None
                            else if (isInt) HecIngest.epochSecondsOf(d.longValue())
                            else if (d.signum() < 0) None
                            else Some(d.doubleValue())
                          r.map(v => Right(Some(v))).getOrElse(Left(()))
                      }
                    }
                  parsed match {
                    case Left(()) => err = Some(idx)
                    case Right(t) =>
                      if (t.isDefined) sticky = t
                      val fieldsNode = n.get("fields")
                      out += HecIngest.Req(
                        message =
                          if (ev.isTextual) ev.asText() else ev.toString,
                        channel = strOf(n, "channel"),
                        source = strOf(n, "source"),
                        sourcetype = strOf(n, "sourcetype"),
                        index = strOf(n, "index"),
                        host = strOf(n, "host"),
                        fields =
                          if (fieldsNode != null && fieldsNode.isObject)
                            fieldsNode.toString
                          else null,
                        tsecs = sticky,
                        peer = peer)
                  }
                }
                idx += 1
              }
            } catch {
              // MappingIterator surfaces malformed JSON as IOExceptions
              // OR RuntimeJsonMappingException (a bare RuntimeException)
              case scala.util.control.NonFatal(_) => err = Some(idx)
            }
            err match {
              case Some(i) => respond(ex, 400,
                s"""{"text":"Invalid data format","code":6,"invalid-event-number":$i}""")
              case None =>
                val reqs = out.result()
                if (reqs.nonEmpty)
                  pushLock.synchronized { stream.addData(reqs) }
                respond(ex, 200, """{"text":"Success","code":0}""")
            }
          }
        case "raw" | "raw/1.0" if method == "POST" =>
          val rawOpt = HttpIngest.readBodyLimited(ex)
          val body = new String(rawOpt.getOrElse(Array.emptyByteArray), "UTF-8")
          if (rawOpt.isEmpty) HttpIngest.tooLarge(ex)
          else if (body.isEmpty) respond(ex, 400, """{"text":"No data","code":5}""")
          else {
            val q = HttpIngest.parseQuery(ex.getRequestURI.getRawQuery)
            pushLock.synchronized {
              stream.addData(HecIngest.Req(
                message = body,
                channel = q.getOrElse("channel", null),
                source = q.getOrElse("source", null),
                sourcetype = q.getOrElse("sourcetype", null),
                index = q.getOrElse("index", null),
                host = q.getOrElse("host", null),
                fields = null, tsecs = None, peer = peer))
            }
            respond(ex, 200, """{"text":"Success","code":0}""")
          }
        case "" | "event" | "event/1.0" | "raw" | "raw/1.0" =>
          ex.sendResponseHeaders(405, -1)
        case _ =>
          ex.sendResponseHeaders(404, -1)
      }
    } finally ex.close()
  })
  server.start()

  def boundPort: Int = server.getAddress.getPort

  /** Raw feed: message, channel, source, sourcetype, index, host,
    * fields (JSON string), tsecs, peer.
    */
  def df: DataFrame = stream.toDF()

  def close(): Unit = server.stop(0)
}
