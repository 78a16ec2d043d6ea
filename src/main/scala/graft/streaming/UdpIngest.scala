package graft.streaming

import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress, SocketException}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.config.Framing

/** A LISTENING UDP datagram ingest endpoint (reference
  * `src/sources/socket/udp.rs`; the syslog and statsd sources'
  * predominant transport). Each received datagram is a COMPLETE byte
  * stream of its own — the reference decodes every datagram with
  * `decode_eof` — so each one runs a fresh framing machine
  * (`frameAll`: a bare payload flushes as the final frame, a
  * newline-packed statsd datagram splits into its lines). The one
  * deliberate exception is `chunked_gelf`, whose protocol is
  * datagram-native: chunks of one message ARRIVE in separate
  * datagrams, so the reassembly state machine persists across them
  * (`ChunkedGelf.pushDatagram`).
  *
  * Completed frames land in a `MemoryStream` of `(peer, message)`
  * exactly like [[TcpIngest]]. Same scale stance: a bound datagram
  * socket is a per-process ingress (the reference's deployment
  * shape); the 100 TB path is files/Kafka.
  */
final class UdpIngest(spark: SparkSession, bindHost: String, port: Int,
                      framerB: () => Framing.Framer) extends IngestListener {

  import spark.implicits._

  private val stream = MemoryStream[(String, String)](spark)
  private val pushLock = new Object
  private def pushFrames(peer: String, frames: Seq[Array[Byte]]): Unit =
    if (frames.nonEmpty) pushLock.synchronized {
      stream.addData(frames.map(f => (peer, new String(f, "UTF-8"))))
    }

  private val socket = new DatagramSocket(null)
  socket.bind(new InetSocketAddress(bindHost, port))
  @volatile private var running = true

  /** The port actually bound (configure port 0 for an ephemeral one). */
  def boundPort: Int = socket.getLocalPort

  /** Streaming frame feed: `peer` (datagram source address) + `message`. */
  def df: DataFrame = stream.toDF().toDF("peer", "message")

  // cross-datagram state only for the datagram-native chunked protocol
  private val chunked: Option[Framing.ChunkedGelf] = framerB() match {
    case cg: Framing.ChunkedGelf => Some(cg)
    case _ => None
  }

  private val receiver = new Thread(() => {
    // 65535 is the UDP payload ceiling; receive() truncates to the
    // buffer, so a full-size buffer never loses bytes
    val buf = new Array[Byte](65535)
    try while (running) {
      val packet = new DatagramPacket(buf, buf.length)
      socket.receive(packet)
      val data = java.util.Arrays.copyOfRange(
        packet.getData, packet.getOffset, packet.getOffset + packet.getLength)
      val peer = packet.getAddress.getHostAddress
      val frames = chunked match {
        case Some(cg) => cg.pushDatagram(data)
        case None => framerB().frameAll(data)
      }
      pushFrames(peer, frames)
    } catch { case _: SocketException => () } // listener closed
  }, s"graft-udp-ingest-$bindHost")
  receiver.setDaemon(true)
  receiver.start()

  def close(): Unit = { running = false; socket.close() }
}
