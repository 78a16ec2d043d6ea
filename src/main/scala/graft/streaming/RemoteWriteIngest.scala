package graft.streaming

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

object RemoteWriteIngest {
  /** One flat metric sample: canonical tag string, epoch millis. */
  final case class Req(name: String, valueType: String, value: Double,
                       tsms: Option[Long], tags: String, peer: String)

  /** prompb MetricMetadata.MetricType → the family kind the text
    * parser uses (lib.rs From<proto::MetricType>): COUNTER→counter,
    * GAUGE→gauge, HISTOGRAM/GAUGEHISTOGRAM→histogram, SUMMARY→summary,
    * everything else untyped.
    */
  def kindOf(t: Long): String = t match {
    case 1L => "counter"
    case 2L => "gauge"
    case 3L | 4L => "histogram"
    case 5L => "summary"
    case _ => "untyped"
  }

  /** The text parser's suffix-admission group match
    * (GroupKind::try_push): does `name` belong to metadata family
    * (`family`, `kind`)?
    */
  def inFamily(name: String, family: String, kind: String): Boolean =
    name.startsWith(family) && {
      val suffix = name.drop(family.length)
      kind match {
        case "histogram" => Set("_bucket", "_sum", "_count")(suffix)
        case "summary" => Set("", "_sum", "_count")(suffix)
        case _ => suffix.isEmpty
      }
    }

  /** Decode one (already-decompressed) prompb WriteRequest into flat
    * samples. Throws IllegalArgumentException on malformed protobuf or
    * a series without the `__name__` label (the parser's
    * RequestNoNameLabel).
    */
  def decodeWriteRequest(body: Array[Byte], peer: String): Seq[Req] = {
    import graft.functions.ProtoWire.{Reader, WField}
    def fields(b: Array[Byte]) = new Reader(b).readAll()
    def str(b: Array[Byte]) = new String(b, "UTF-8")
    // pass 1: metadata families (WriteRequest.metadata = 3)
    val families = Seq.newBuilder[(String, String)]
    val series = Seq.newBuilder[Array[Byte]]
    fields(body).foreach {
      case WField(3, 2, _, mb) =>
        var t = 0L; var fam = ""
        fields(mb).foreach {
          case WField(1, 0, v, _) => t = v
          case WField(2, 2, _, v) => fam = str(v)
          case _ => ()
        }
        if (fam.nonEmpty) families += ((fam, kindOf(t)))
      case WField(1, 2, _, ts) => series += ts
      case _ => ()
    }
    val fams = families.result()
    val out = Seq.newBuilder[Req]
    series.result().foreach { ts =>
      var name: String = null
      val labels = Seq.newBuilder[(String, String)]
      val samples = Seq.newBuilder[(Double, Option[Long])]
      fields(ts).foreach {
        case WField(1, 2, _, lb) =>
          var ln = ""; var lv = ""
          fields(lb).foreach {
            case WField(1, 2, _, v) => ln = str(v)
            case WField(2, 2, _, v) => lv = str(v)
            case _ => ()
          }
          if (ln == "__name__") name = lv else labels += ((ln, lv))
        case WField(2, 2, _, sb) =>
          var value = 0.0; var tms = Option.empty[Long]
          fields(sb).foreach {
            case WField(1, 1, bits, _) =>
              value = java.lang.Double.longBitsToDouble(bits)
            case WField(2, 0, v, _) => tms = Some(v)
            case _ => ()
          }
          samples += ((value, tms))
        case _ => ()
      }
      if (name == null)
        throw new IllegalArgumentException("timeseries without __name__ label")
      val famKind = fams.find { case (f, k) =>
        inFamily(name, f, k)
      }.map(_._2).getOrElse("untyped")
      val vt = if (famKind == "counter") "counter" else "gauge"
      val tagStr = {
        val ls = labels.result()
        if (ls.isEmpty) null
        else ls.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(",")
      }
      samples.result().foreach { case (v, tms) =>
        out += Req(name, vt, v, tms, tagStr, peer)
      }
    }
    out.result()
  }
}

/** The reference's `prometheus_remote_write` source
  * (src/sources/prometheus/remote_write.rs): accept Prometheus
  * remote-write POSTs — a snappy-compressed (the wire default;
  * content-encoding-driven like the reference, remote_write.rs:188)
  * prompb `WriteRequest` — and decode every sample into flat-model
  * absolute metric rows. Metadata families drive the counter/gauge
  * split exactly like the text parser's group rules (counter families
  * → counters, everything else → gauges, histogram/summary component
  * samples in exposition component form — the scrape source's
  * documented narrowing).
  */
final class RemoteWriteIngest(spark: SparkSession, bindHost: String,
                              port: Int, path: String) extends IngestListener {

  import spark.implicits._

  private val stream = MemoryStream[RemoteWriteIngest.Req](spark)
  private val pushLock = new Object

  private val server = HttpServer.create(new InetSocketAddress(bindHost, port), 0)
  server.createContext("/", (ex: HttpExchange) => {
    try {
      val reqPath = ex.getRequestURI.getPath
      if (!ex.getRequestMethod.equalsIgnoreCase("POST")) {
        ex.sendResponseHeaders(405, -1)
      } else if (reqPath != path) {
        ex.sendResponseHeaders(404, -1)
      } else HttpIngest.readBodyLimited(ex) match {
        case None => HttpIngest.tooLarge(ex)
        case Some(raw) =>
        val enc = Option(ex.getRequestHeaders.getFirst("Content-Encoding"))
          .getOrElse("snappy").toLowerCase // snappy is the wire default
        try {
          val body = enc match {
            case "snappy" =>
              // the block format carries its decompressed size up
              // front — bound it before allocating (bomb guard)
              if (org.xerial.snappy.Snappy.uncompressedLength(raw) >
                HttpIngest.MaxBody)
                throw new IllegalArgumentException(
                  s"payload inflates past ${HttpIngest.MaxBody} bytes")
              org.xerial.snappy.Snappy.uncompress(raw)
            case "identity" | "" => raw
            case other => throw new IllegalArgumentException(
              s"unsupported content-encoding $other")
          }
          val reqs = RemoteWriteIngest.decodeWriteRequest(
            body, ex.getRemoteAddress.getAddress.getHostAddress)
          if (reqs.nonEmpty) pushLock.synchronized { stream.addData(reqs) }
          ex.sendResponseHeaders(200, -1)
        } catch {
          case scala.util.control.NonFatal(e) =>
            val msg = ("Invalid remote-write payload: " +
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

  /** Raw feed: name, valueType, value, tsms, tags, peer. */
  def df: DataFrame = stream.toDF()

  def close(): Unit = server.stop(0)
}
