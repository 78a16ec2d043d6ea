package graft.streaming

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.config.Framing

/** A listening ingest endpoint: the common face of [[TcpIngest]] and
  * [[HttpIngest]] so a topology can track and close every listener it
  * opened (the reference's source shutdown).
  */
trait IngestListener {
  def boundPort: Int
  def close(): Unit
  /** The listener's raw streaming feed (columns vary per protocol). */
  def df: org.apache.spark.sql.DataFrame
}

object HttpIngest {
  /** One decoded frame plus its request envelope. */
  final case class Req(peer: String, rpath: String, message: String,
                       headers: Map[String, String],
                       query: Map[String, String])

  /** Request-body ceiling shared by every HTTP push listener: the JDK
    * server has no built-in limit, so an unbounded `readAllBytes`
    * would let one hostile request balloon the heap. 64 MB is far
    * above any agent batch; `None` = too large, answer 413.
    */
  val MaxBody: Int = 64 * 1024 * 1024
  def readBodyLimited(ex: HttpExchange): Option[Array[Byte]] = {
    val b = ex.getRequestBody.readNBytes(MaxBody + 1)
    if (b.length > MaxBody) None else Some(b)
  }
  def tooLarge(ex: HttpExchange): Unit =
    ex.sendResponseHeaders(413, -1)

  /** `k1=v1&k2=v2` → map (first value wins, like the reference's
    * add_query_parameters over warp's query string).
    */
  def parseQuery(raw: String): Map[String, String] =
    if (raw == null || raw.isEmpty) Map.empty
    else raw.split("&").iterator.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(
          java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8"))
        case Array(k) if k.nonEmpty =>
          Some(java.net.URLDecoder.decode(k, "UTF-8") -> "")
        case _ => None
      }
    }.foldLeft(Map.empty[String, String]) { case (m, (k, v)) =>
      if (m.contains(k)) m else m + (k -> v)
    }
}

/** The reference's `http_server` source (src/sources/http_server.rs):
  * receive HTTP request bodies on a bound listener, cut each body into
  * frames with the configured framing (newline by default), decode
  * frames as events carrying the request envelope (path under
  * `path_key`, selected headers and query parameters as fields).
  *
  * JDK `com.sun.net.httpserver` carries the protocol; every accepted
  * body lands in a MemoryStream the topology reads as a streaming
  * DataFrame. Method/path mismatches answer 405/404 without emitting
  * events (http_server.rs strict_path handling); a matching request
  * answers `responseCode` (default 200) after its frames are queued —
  * the reference's ack-on-receipt contract.
  *
  * Scale stance: like [[TcpIngest]], a push listener is a per-process
  * ingress (the reference's own deployment shape). The 100 TB path is
  * files/Kafka; this is the protocol-compatibility surface.
  */
final class HttpIngest(spark: SparkSession, bindHost: String, port: Int,
                       path: String, strictPath: Boolean, method: String,
                       responseCode: Int,
                       framerB: () => Framing.Framer) extends IngestListener {

  import spark.implicits._

  private val stream = MemoryStream[HttpIngest.Req](spark)
  private val pushLock = new Object

  private val server = HttpServer.create(new InetSocketAddress(bindHost, port), 0)
  server.createContext("/", (ex: HttpExchange) => {
    try {
      val bodyOpt = HttpIngest.readBodyLimited(ex)
      if (bodyOpt.isEmpty) { HttpIngest.tooLarge(ex) }
      else {
      val body = bodyOpt.get
      val reqPath = ex.getRequestURI.getPath
      val pathOk =
        if (strictPath) reqPath == path
        else reqPath.startsWith(path)
      if (!ex.getRequestMethod.equalsIgnoreCase(method)) {
        ex.sendResponseHeaders(405, -1)
      } else if (!pathOk) {
        ex.sendResponseHeaders(404, -1)
      } else {
        // one framer per request: an HTTP body is a complete stream
        val framer = framerB()
        val frames = framer.frameAll(body)
        val hdrs = {
          val h = ex.getRequestHeaders
          val b = Map.newBuilder[String, String]
          h.keySet().forEach { k =>
            val vs = h.get(k)
            if (!vs.isEmpty) b += (k.toLowerCase -> vs.get(0))
          }
          b.result()
        }
        val query = HttpIngest.parseQuery(ex.getRequestURI.getRawQuery)
        val peer = ex.getRemoteAddress.getAddress.getHostAddress
        if (frames.nonEmpty) pushLock.synchronized {
          stream.addData(frames.map(f => HttpIngest.Req(
            peer, reqPath, new String(f, "UTF-8"), hdrs, query)))
        }
        ex.sendResponseHeaders(responseCode, -1)
      }
      }
    } finally ex.close()
  })
  server.start()

  def boundPort: Int = server.getAddress.getPort

  /** Raw feed: peer, rpath, message, headers (lowercased names), query. */
  def df: DataFrame = stream.toDF()

  def close(): Unit = server.stop(0)
}
