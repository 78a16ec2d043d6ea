package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** TCP socket sink — the reference's `socket` sink in stream mode
  * (src/sinks/socket.rs: connect to `address`, write newline-framed
  * encoded events). Distributed: EVERY PARTITION opens its own
  * connection and streams its rows, so sink bandwidth scales with
  * executors instead of funneling through the driver (the reference's
  * single-process writer is the funnel this avoids). Delivery is
  * at-least-once under task retry, exactly like the reference's
  * un-acked TCP stream.
  */
object SocketSink {

  /** Write the single string column of `lines` to host:port, one
    * newline-terminated line per row. Returns rows written (accumulator
    * over the write tasks — counts retried attempts too, consistent
    * with the at-least-once contract).
    */
  def writeLines(lines: DataFrame, host: String, port: Int): Long = {
    val acc = lines.sparkSession.sparkContext.longAccumulator("socket_sink_rows")
    lines.select(col(lines.columns.head).cast("string")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val sock = new java.net.Socket()
          // bounded connect: a dead endpoint should fail the task with
          // a clear error, not hang the executor slot
          sock.connect(new java.net.InetSocketAddress(host, port), 10000)
          try {
            val out = new java.io.BufferedOutputStream(sock.getOutputStream, 1 << 16)
            it.foreach { r =>
              val s = r.getString(0)
              if (s != null) {
                out.write(s.getBytes("UTF-8"))
                out.write('\n')
                acc.add(1L)
              }
            }
            out.flush()
          } finally sock.close()
        }
    }
    acc.value
  }

  /** UDP arm (src/sinks/socket.rs Mode::Udp): one datagram per encoded
    * event — the natural transport for statsd/syslog/native_json peers
    * whose sources treat every datagram as a complete frame. Same
    * distributed shape: each partition owns a socket; UDP is fire-and-
    * forget, so delivery is best-effort by protocol contract (the
    * reference's UDP sink makes the same trade).
    */
  def writeDatagrams(lines: DataFrame, host: String, port: Int): Long = {
    val acc = lines.sparkSession.sparkContext.longAccumulator("socket_sink_dgrams")
    lines.select(col(lines.columns.head).cast("string")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val sock = new java.net.DatagramSocket()
          val target = new java.net.InetSocketAddress(host, port)
          try it.foreach { r =>
            val s = r.getString(0)
            if (s != null) {
              val b = s.getBytes("UTF-8")
              sock.send(new java.net.DatagramPacket(b, b.length, target))
              acc.add(1L)
            }
          } finally sock.close()
        }
    }
    acc.value
  }
}
