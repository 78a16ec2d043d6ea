package graft.streaming

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

object HerokuIngest {
  /** One logplex line's fields plus the request envelope. `tsIso` is
    * the line's RFC3339 timestamp text (parsed downstream; null when
    * unparseable — the reference only stamps on successful parse).
    */
  final case class Req(message: String, tsIso: String, host: String,
                       appName: String, procId: String,
                       query: Map[String, String], peer: String)

  /** One logplex drain line → fields (heroku_logs.rs line_to_events):
    * `<len> <pri>ver timestamp host app proc - message` — split into
    * at most 8 space-parts; anything else is malformed and yields no
    * event (which then fails the Logplex-Msg-Count check).
    */
  def parseLine(line: String): Option[(String, String, String, String, String)] = {
    val parts = line.split(" ", 8)
    if (parts.length == 8)
      Some((parts(7), parts(2), parts(3), parts(4), parts(5)))
    else None
  }
}

/** The reference's `heroku_logs` source (src/sources/heroku_logs.rs):
  * Heroku's Logplex HTTPS drain. Each POST body is newline-separated
  * logplex lines; the `Logplex-Msg-Count` header MUST equal the
  * number of decoded events or the request answers 400 (the
  * reference's count check — a malformed line drops and therefore
  * fails the count). Fields per line: message, parsed timestamp,
  * host, app_name, proc_id; listed query parameters ride as envelope
  * fields. `auth` refused loudly at config level.
  */
final class HerokuIngest(spark: SparkSession, bindHost: String, port: Int)
    extends IngestListener {

  import spark.implicits._

  private val stream = MemoryStream[HerokuIngest.Req](spark)
  private val pushLock = new Object

  private val server = HttpServer.create(new InetSocketAddress(bindHost, port), 0)
  server.createContext("/", (ex: HttpExchange) => {
    try {
      if (!ex.getRequestMethod.equalsIgnoreCase("POST")) {
        ex.sendResponseHeaders(405, -1)
      } else HttpIngest.readBodyLimited(ex) match {
        case None => HttpIngest.tooLarge(ex)
        case Some(bodyBytes) =>
        val body = new String(bodyBytes, "UTF-8")
        val countHdr = Option(ex.getRequestHeaders.getFirst("Logplex-Msg-Count"))
          .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
        countHdr match {
          case None =>
            val msg = "missing or malformed Logplex-Msg-Count header"
              .getBytes("UTF-8")
            ex.sendResponseHeaders(400, msg.length.toLong)
            ex.getResponseBody.write(msg)
          case Some(expected) =>
            val query = HttpIngest.parseQuery(ex.getRequestURI.getRawQuery)
            val peer = ex.getRemoteAddress.getAddress.getHostAddress
            val events = body.split("\n").iterator.map(_.stripSuffix("\r"))
              .filter(_.nonEmpty)
              .flatMap(HerokuIngest.parseLine)
              .map { case (msg, ts, host, app, proc) =>
                HerokuIngest.Req(msg, ts, host, app, proc, query, peer)
              }.toSeq
            if (events.length != expected) {
              val msg = (s"Parsed ${events.length} events, but " +
                s"Logplex-Msg-Count header claimed $expected")
                .getBytes("UTF-8")
              ex.sendResponseHeaders(400, msg.length.toLong)
              ex.getResponseBody.write(msg)
            } else {
              if (events.nonEmpty)
                pushLock.synchronized { stream.addData(events) }
              ex.sendResponseHeaders(200, -1)
            }
        }
      }
    } finally ex.close()
  })
  server.start()

  def boundPort: Int = server.getAddress.getPort

  /** Raw feed: message, tsIso, host, appName, procId, query, peer. */
  def df: DataFrame = stream.toDF()

  def close(): Unit = server.stop(0)
}
