package graft.streaming

import java.net.{InetSocketAddress, ServerSocket, SocketException}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.functions.Fluent

object FluentIngest {
  /** One decoded forward-protocol event with its connection peer. */
  final case class Req(tag: String, tsecs: Option[Double], record: String,
                       peer: String)
}

/** The reference's `fluent` source (src/sources/fluent/mod.rs): a TCP
  * listener speaking fluentd's forward protocol — a stream of
  * top-level msgpack arrays in the Message / Forward / PackedForward
  * (+gzip) event modes, decoded by [[graft.functions.Fluent]]. A
  * message whose options carry `chunk` is acknowledged in-band with
  * msgpack `{"ack": chunk}` — the at-least-once handshake fluentd's
  * `require_ack_response` expects.
  *
  * The per-connection byte accumulator retries a partial tail on the
  * next read ([[graft.functions.MsgPack.Truncated]] = wait for more);
  * a MALFORMED stream closes the connection (framing sync is lost —
  * the reference's error path), keeping everything decoded before it.
  *
  * Scale stance: like every push listener here, a per-process ingress;
  * the 100 TB path is capture files (the batch replay arm) / Kafka.
  */
final class FluentIngest(spark: SparkSession, bindHost: String, port: Int)
    extends IngestListener {

  import spark.implicits._

  private val stream = MemoryStream[FluentIngest.Req](spark)
  private val pushLock = new Object
  private def push(reqs: Seq[FluentIngest.Req]): Unit =
    if (reqs.nonEmpty) pushLock.synchronized { stream.addData(reqs) }

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress(bindHost, port))
  @volatile private var running = true

  def boundPort: Int = server.getLocalPort

  /** Raw feed: tag, tsecs (epoch seconds, null = sender said "now"),
    * record (canonical JSON), peer.
    */
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
              // a single never-completing message must not accumulate
              // unboundedly: past the cap the connection drops (framing
              // sync with such a sender is unrecoverable anyway)
              if (buf.length + n > 64 * 1024 * 1024) alive = false
              else buf = buf ++ java.util.Arrays.copyOf(chunk, n)
              var pos = 0
              var more = true
              while (more && pos < buf.length) {
                try {
                  val (m, next) = Fluent.decodeMessage(buf, pos)
                  push(m.entries.map(e =>
                    FluentIngest.Req(e.tag, e.tsecs, e.record, peer)))
                  m.ackChunk.foreach { c =>
                    out.write(Fluent.encodeAck(c)); out.flush()
                  }
                  pos = next
                } catch {
                  case _: graft.functions.MsgPack.Truncated => more = false
                  case _: IllegalArgumentException =>
                    alive = false; more = false // sync lost: drop conn
                }
              }
              buf = java.util.Arrays.copyOfRange(buf, pos, buf.length)
            }
            if (alive) n = in.read(chunk)
          }
        } catch { case _: java.io.IOException => () } // peer reset
        finally sock.close()
      }, s"graft-fluent-conn-$peer")
      worker.setDaemon(true)
      worker.start()
    } catch { case _: SocketException => () } // listener closed
  }, s"graft-fluent-accept-$bindHost")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = { running = false; server.close() }
}
