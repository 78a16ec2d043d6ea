package graft.streaming

import java.net.{InetSocketAddress, ServerSocket, SocketException}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.config.Framing

/** A LISTENING TCP ingest endpoint for push sources (reference
  * `src/sources/syslog.rs`, `src/sources/socket/tcp.rs` — Vector's
  * sources bind and accept; the repo's `socket` source maps onto
  * Spark's connecting reader, so the listener side was missing).
  *
  * Accepted connections each run their own framing state machine
  * (RFC 6587 octet counting for syslog; any [[Framing.Framer]]), and
  * completed frames land in a `MemoryStream` the topology reads as an
  * ordinary streaming DataFrame of `(peer, message)`.
  *
  * Scale stance: a TCP listener is a single-process ingress by nature
  * — exactly the reference's deployment shape (one vector daemon per
  * box). The 100 TB path is never "one listener for the cluster"; it
  * is many edge listeners draining into files/Kafka that the
  * distributed scan sources read. This class is the
  * protocol-compatibility surface, not the bulk path.
  */
final class TcpIngest(spark: SparkSession, bindHost: String, port: Int,
                      framerB: () => Framing.Framer) extends IngestListener {

  import spark.implicits._

  private val stream = MemoryStream[(String, String)](spark)
  // MemoryStream.addData is not safe under concurrent writers (two
  // connections racing lose/duplicate batches — observed in spec);
  // all pushes serialize through this lock.
  private val pushLock = new Object
  private def pushFrames(peer: String, frames: Seq[Array[Byte]]): Unit =
    if (frames.nonEmpty) pushLock.synchronized {
      stream.addData(frames.map(f => (peer, new String(f, "UTF-8"))))
    }
  private val server = new ServerSocket()
  server.bind(new InetSocketAddress(bindHost, port))
  @volatile private var running = true

  /** The port actually bound (configure port 0 for an ephemeral one). */
  def boundPort: Int = server.getLocalPort

  /** Streaming frame feed: `peer` (remote address) + `message`. */
  def df: DataFrame = stream.toDF().toDF("peer", "message")

  private val acceptor = new Thread(() => {
    try while (running) {
      val sock = server.accept()
      val peer = sock.getInetAddress.getHostAddress
      val worker = new Thread(() => {
        val framer = framerB()
        try {
          val in = sock.getInputStream
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0 && running) {
            if (n > 0)
              pushFrames(peer, framer.push(java.util.Arrays.copyOf(buf, n)))
            n = in.read(buf)
          }
          pushFrames(peer, framer.eof())
        } catch { case _: java.io.IOException => () } // peer reset
        finally sock.close()
      }, s"graft-tcp-ingest-conn-$peer")
      worker.setDaemon(true)
      worker.start()
    } catch { case _: SocketException => () } // listener closed
  }, s"graft-tcp-ingest-accept-$bindHost")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = { running = false; server.close() }
}
