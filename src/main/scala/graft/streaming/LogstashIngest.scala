package graft.streaming

import java.net.{InetSocketAddress, ServerSocket, SocketException}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.functions.Lumberjack

object LogstashIngest {
  /** One decoded beats event: its fields as canonical JSON + peer. */
  final case class Req(fields: String, peer: String)
}

/** The reference's `logstash` source (src/sources/logstash.rs): a TCP
  * listener speaking the beats/lumberjack protocol — v1 data frames,
  * v2 json frames, zlib compressed batches, window frames — decoded by
  * [[graft.functions.Lumberjack]]. Every decoded batch is answered
  * with `2A<max seq>` (build_ack: acking the highest sequence
  * acknowledges the batch), the handshake filebeat expects.
  *
  * Partial tails wait for more bytes ([[Lumberjack.Truncated]]); a
  * malformed stream (unknown version/type, bad JSON) drops the
  * connection — framing sync is lost, the reference's fatal decode
  * error path. Same per-process-ingress scale stance as every push
  * listener here.
  */
final class LogstashIngest(spark: SparkSession, bindHost: String, port: Int)
    extends IngestListener {

  import spark.implicits._

  private val stream = MemoryStream[LogstashIngest.Req](spark)
  private val pushLock = new Object
  private def push(reqs: Seq[LogstashIngest.Req]): Unit =
    if (reqs.nonEmpty) pushLock.synchronized { stream.addData(reqs) }

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress(bindHost, port))
  @volatile private var running = true

  def boundPort: Int = server.getLocalPort

  /** Raw feed: fields (canonical JSON object) + peer. */
  def df: DataFrame = stream.toDF()

  private val acceptor = new Thread(() => {
    try while (running) {
      val sock = server.accept()
      val peer = sock.getInetAddress.getHostAddress
      val worker = new Thread(() => {
        try {
          val in = sock.getInputStream
          val out = sock.getOutputStream
          var buf = Array.emptyByteArray
          val chunk = new Array[Byte](8192)
          var n = in.read(chunk)
          var alive = true
          while (alive && n >= 0 && running) {
            if (n > 0) {
              // a single never-completing frame must not accumulate
              // unboundedly: past the cap the connection drops
              if (buf.length + n > 64 * 1024 * 1024) alive = false
              else buf = buf ++ java.util.Arrays.copyOf(chunk, n)
              var pos = 0
              var more = true
              var maxSeq = -1L
              var got = List.newBuilder[LogstashIngest.Req]
              while (more && pos < buf.length) {
                try {
                  val (frames, next) = Lumberjack.decodeOne(buf, pos)
                  frames.foreach { f =>
                    got += LogstashIngest.Req(f.fields, peer)
                    if (f.seq > maxSeq) maxSeq = f.seq
                  }
                  pos = next
                } catch {
                  case _: Lumberjack.Truncated => more = false
                  case _: IllegalArgumentException =>
                    alive = false; more = false // sync lost: drop conn
                }
              }
              push(got.result())
              if (maxSeq >= 0) {
                out.write(Lumberjack.encodeAck(maxSeq)); out.flush()
              }
              buf = java.util.Arrays.copyOfRange(buf, pos, buf.length)
            }
            if (alive) n = in.read(chunk)
          }
        } catch { case _: java.io.IOException => () } // peer reset
        finally sock.close()
      }, s"graft-logstash-conn-$peer")
      worker.setDaemon(true)
      worker.start()
    } catch { case _: SocketException => () } // listener closed
  }, s"graft-logstash-accept-$bindHost")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = { running = false; server.close() }
}
