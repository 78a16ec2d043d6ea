package graft

import java.net.ServerSocket

import graft.config.Topology
import graft.config.Topology.SeqCol

/** The websocket source against a REAL RFC 6455 handshake: a minimal
  * from-scratch server (Sec-WebSocket-Accept over the protocol GUID,
  * then unmasked server→client text frames) feeds the JDK-client
  * source, with the initial_message subscribe idiom and a downstream
  * transform proving codec composition.
  */
class WebsocketSpec extends SparkSpec {

  /** Serve ONE websocket connection: complete the RFC 6455 handshake,
    * optionally read (and discard) the client's masked initial frame,
    * then send each payload as its own unmasked text frame.
    */
  private def serveOnce(server: ServerSocket, expectInitial: Boolean,
                        payloads: Seq[String]): Thread = {
    val t = new Thread(() => {
      val sock = server.accept()
      try {
        val in = sock.getInputStream
        val out = sock.getOutputStream
        // read HTTP headers up to the blank line
        val head = new StringBuilder
        var prev4 = ""
        while (!prev4.endsWith("\r\n\r\n")) {
          val c = in.read()
          if (c < 0) throw new java.io.EOFException("handshake EOF")
          head.append(c.toChar)
          prev4 = head.takeRight(4).toString
        }
        val key = head.toString.linesIterator
          .find(_.toLowerCase.startsWith("sec-websocket-key:"))
          .map(_.split(":", 2)(1).trim)
          .getOrElse(throw new IllegalStateException("no ws key"))
        val accept = java.util.Base64.getEncoder.encodeToString(
          java.security.MessageDigest.getInstance("SHA-1").digest(
            (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes("UTF-8")))
        out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
          "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
          s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes("UTF-8"))
        out.flush()
        if (expectInitial) {
          // client frames are masked: 2-byte header + 4-byte mask + len
          val h0 = in.read(); val h1 = in.read()
          assert((h0 & 0x0f) == 1, "expected a text frame")
          val len = h1 & 0x7f
          assert(len < 126, "test initial message must be short")
          val mask = in.readNBytes(4)
          val masked = in.readNBytes(len)
          val txt = new String(
            masked.zipWithIndex.map { case (b, i) =>
              (b ^ mask(i % 4)).toByte }, "UTF-8")
          assert(txt == "subscribe logs", txt)
        }
        payloads.foreach { p =>
          val b = p.getBytes("UTF-8")
          assert(b.length < 126)
          out.write(0x81); out.write(b.length); out.write(b)
        }
        out.flush()
        Thread.sleep(30000) // keep the connection open; test stops first
      } catch { case _: InterruptedException | _: java.io.IOException => () }
      finally sock.close()
    })
    t.setDaemon(true)
    t.start()
    t
  }

  test("websocket source: JDK client against a real RFC 6455 server") {
    val server = new ServerSocket(0)
    val t = serveOnce(server, expectInitial = true, Seq(
      "error one", "ok two\nerror three")) // 2nd message: newline framing
    try {
      val topo = Topology.load(
        s"""
           |[sources.ws]
           |  type = "websocket"
           |  uri = "ws://127.0.0.1:${server.getLocalPort}/feed"
           |  initial_message = "subscribe logs"
           |  [sources.ws.framing]
           |    method = "newline_delimited"
           |[transforms.errors]
           |  inputs = ["ws"]
           |  type = "filter"
           |  condition = 'contains(.message, "error")'
           |""".stripMargin)
      try {
        val src = topo.loadStreamingSources(spark)
        val out = topo.run(src)("errors")
        val qn = s"ws_src_${System.nanoTime()}"
        val q = out.df.drop(SeqCol).writeStream
          .format("memory").queryName(qn).outputMode("append").start()
        try {
          val t0 = System.currentTimeMillis()
          while (spark.table(qn).count() < 2 &&
            System.currentTimeMillis() - t0 < 30000) {
            q.processAllAvailable(); Thread.sleep(100)
          }
          val rows = spark.table(qn).select("message")
            .collect().map(_.getString(0)).sorted.toSeq
          assert(rows == Seq("error one", "error three"))
        } finally q.stop()
      } finally topo.closeIngest()
    } finally { t.interrupt(); server.close() }

    // refusals: auth, batch form, non-ws uri
    val e1 = intercept[Exception](Topology.load(
      """
        |[sources.ws]
        |  type = "websocket"
        |  uri = "ws://127.0.0.1:1/x"
        |  [sources.ws.auth]
        |    user = "u"
        |""".stripMargin).loadStreamingSources(spark))
    assert(e1.getMessage.contains("auth"))
    val e2 = intercept[Exception](Topology.load(
      """
        |[sources.ws]
        |  type = "websocket"
        |  uri = "ws://127.0.0.1:1/x"
        |""".stripMargin).loadSources(spark))
    assert(e2.getMessage.contains("streaming-only"))
    val e3 = intercept[Exception](Topology.load(
      """
        |[sources.ws]
        |  type = "websocket"
        |  uri = "http://127.0.0.1:1/x"
        |""".stripMargin).loadStreamingSources(spark))
    assert(e3.getMessage.contains("ws"))
  }
}
