package graft

import java.net.ServerSocket
import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.config.{Frame, Topology}
import graft.config.Topology.SeqCol
import graft.config.VrlCompile.{EventMeta, VStr}

/** The `socket` source/sink over REAL TCP connections on localhost —
  * the reference's most basic network components (src/sources/socket,
  * src/sinks/socket.rs), exercised end-to-end rather than mocked.
  */
class SocketIOSpec extends SparkSpec {

  /** A line-collecting TCP server: accepts any number of connections,
    * gathers newline-framed lines from each. (The sink opens one
    * connection PER PARTITION, so multi-accept is part of the
    * contract under test.)
    */
  private final class LineServer {
    val server = new ServerSocket(0)
    val lines = new ConcurrentLinkedQueue[String]()
    @volatile private var running = true
    private val acceptor = new Thread(() => {
      try while (running) {
        val sock = server.accept()
        new Thread(() => {
          val rd = new java.io.BufferedReader(
            new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
          var line = rd.readLine()
          while (line != null) { lines.add(line); line = rd.readLine() }
          sock.close()
        }).start()
      } catch { case _: java.net.SocketException => () } // closed
    })
    acceptor.setDaemon(true)
    acceptor.start()
    def port: Int = server.getLocalPort
    def close(): Unit = { running = false; server.close() }
    def await(n: Int, timeoutMs: Long = 20000): Seq[String] = {
      val t0 = System.currentTimeMillis()
      while (lines.size < n && System.currentTimeMillis() - t0 < timeoutMs)
        Thread.sleep(50)
      lines.asScala.toSeq
    }
  }

  private def frame(msgs: Seq[String]): Frame = {
    val df = spark.createDataFrame(msgs.zipWithIndex.map { case (m, i) =>
      (i.toLong, m) }).toDF(SeqCol, "message")
    Frame(df, EventMeta(ListMap("message" -> VStr), None))
  }

  test("socket sink: per-partition TCP connections deliver every encoded event") {
    val srv = new LineServer
    try {
      val topo = Topology.load(
        s"""
           |[transforms.shape]
           |  inputs = []
           |  type = "remap"
           |  source = '.tagged = upcase(.message)'
           |[sinks.out]
           |  inputs = ["shape"]
           |  type = "socket"
           |  mode = "tcp"
           |  address = "127.0.0.1:${srv.port}"
           |  [sinks.out.encoding]
           |    codec = "logfmt"
           |""".stripMargin)
      val outs = topo.run(Map("shape" -> frame(Seq("alpha", "beta", "gamma"))))
      val n = topo.writeSinks(outs)("out")
      assert(n == 3L)
      val got = srv.await(3).sorted
      assert(got == Seq(
        "message=alpha tagged=ALPHA",
        "message=beta tagged=BETA",
        "message=gamma tagged=GAMMA"))
    } finally srv.close()
  }

  test("socket sink: dry-run validates address shape without connecting") {
    val bad = Topology.load(
      """
        |[sinks.out]
        |  inputs = ["x"]
        |  type = "socket"
        |  address = "no-port-here"
        |""".stripMargin)
    val e = intercept[Exception](
      bad.dryRunSinks(Map("x" -> frame(Seq("m")))))
    assert(e.getMessage.contains("host:port"))
    // udp is a real mode now; unix sockets remain refused
    val unix = Topology.load(
      """
        |[sinks.out]
        |  inputs = ["x"]
        |  type = "socket"
        |  mode = "unix_stream"
        |  address = "127.0.0.1:9000"
        |""".stripMargin)
    val e2 = intercept[Exception](
      unix.dryRunSinks(Map("x" -> frame(Seq("m")))))
    assert(e2.getMessage.contains("tcp"))
  }

  test("http sink: per-partition batched POSTs against a live HTTP server") {
    val received = new ConcurrentLinkedQueue[String]()
    val headers = new ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ingest", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      received.add(body)
      Option(ex.getRequestHeaders.getFirst("X-Graft-Test")).foreach(headers.add)
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    server.start()
    try {
      val topo = Topology.load(
        s"""
           |[sinks.out]
           |  inputs = ["shape"]
           |  type = "http"
           |  uri = "http://127.0.0.1:${server.getAddress.getPort}/ingest"
           |  [sinks.out.batch]
           |    max_events = 2
           |  [sinks.out.request.headers]
           |    X-Graft-Test = "yes"
           |  [sinks.out.encoding]
           |    codec = "text"
           |""".stripMargin)
      val in = frame(Seq("a", "b", "c", "d", "e")).copy()
      val one = in.copy(df = in.df.coalesce(1)) // deterministic batching
      val n = topo.writeSinks(Map("shape" -> one))("out")
      assert(n == 5L)
      val t0 = System.currentTimeMillis()
      while (received.size < 3 && System.currentTimeMillis() - t0 < 10000)
        Thread.sleep(50)
      // 5 events at max_events=2 → 3 requests; newline-framed bodies
      val bodies = received.asScala.toSeq
      assert(bodies.length == 3, bodies.toString)
      assert(bodies.flatMap(_.split("\n").filter(_.nonEmpty)).sorted ==
        Seq("a", "b", "c", "d", "e"))
      assert(headers.asScala.toSet == Set("yes"))

      // a non-2xx response fails the write (at-least-once, never silent)
      val bad = Topology.load(
        s"""
           |[sinks.out]
           |  inputs = ["shape"]
           |  type = "http"
           |  uri = "http://127.0.0.1:${server.getAddress.getPort}/nope"
           |  [sinks.out.encoding]
           |    codec = "text"
           |""".stripMargin)
      val e = intercept[Exception](bad.writeSinks(Map("shape" -> one)))
      assert(e.getMessage != null)

      // auth is refused at validate, not silently dropped
      val auth = Topology.load(
        s"""
           |[sinks.out]
           |  inputs = ["shape"]
           |  type = "http"
           |  uri = "http://127.0.0.1:1/x"
           |  [sinks.out.auth]
           |    strategy = "bearer"
           |""".stripMargin)
      val e2 = intercept[Exception](auth.dryRunSinks(Map("shape" -> one)))
      assert(e2.getMessage.contains("auth"))
    } finally server.stop(0)
  }

  test("socket source: streaming lines from a live TCP endpoint, decoded and transformed") {
    // a server that hands the connecting Spark reader a fixed line set
    val server = new ServerSocket(0)
    val payload = Seq("error one", "ok two", "error three")
    val feeder = new Thread(() => {
      val sock = server.accept()
      val out = new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8")
      payload.foreach { l => out.write(l); out.write('\n') }
      out.flush()
      // keep the connection open: the socket reader treats EOF as
      // stream end; the query is stopped by the test instead
      Thread.sleep(30000)
      sock.close()
    })
    feeder.setDaemon(true)
    feeder.start()
    try {
      val topo = Topology.load(
        s"""
           |[sources.tap]
           |  type = "socket"
           |  mode = "tcp"
           |  address = "127.0.0.1:${server.getLocalPort}"
           |[transforms.errors]
           |  inputs = ["tap"]
           |  type = "filter"
           |  condition = 'contains(.message, "error")'
           |""".stripMargin)
      val src = topo.loadStreamingSources(spark)
      val out = topo.run(src)("errors")
      val qn = s"socket_src_${System.nanoTime()}"
      val q = out.df.drop(SeqCol).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        val t0 = System.currentTimeMillis()
        def count() = spark.table(qn).count()
        while (count() < 2 && System.currentTimeMillis() - t0 < 30000) {
          q.processAllAvailable()
          Thread.sleep(100)
        }
        val rows = spark.table(qn).select("message").collect().map(_.getString(0)).sorted
        assert(rows.toSeq == Seq("error one", "error three"))
      } finally q.stop()
    } finally server.close()

    // and the batch path refuses the socket source with a clear error
    val batch = Topology.load(
      """
        |[sources.tap]
        |  type = "socket"
        |  address = "127.0.0.1:1"
        |""".stripMargin)
    val e = intercept[Exception](batch.loadSources(spark))
    assert(e.getMessage.contains("streaming-only"))
  }

  test("socket source udp: real datagrams through the statsd codec to metric rows") {
    val topo = Topology.load(
      """
        |[sources.stats]
        |  type = "socket"
        |  mode = "udp"
        |  address = "127.0.0.1:0"
        |  [sources.stats.decoding]
        |    codec = "statsd"
        |""".stripMargin)
    try {
      val src = topo.loadStreamingSources(spark)
      val port = topo.ingestListeners.head.boundPort
      val frame = src("stats")
      assert(frame.metric)
      val qn = s"udp_statsd_${System.nanoTime()}"
      val q = frame.df.drop(SeqCol).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        val sock = new java.net.DatagramSocket()
        def send(s: String): Unit = {
          val b = s.getBytes("UTF-8")
          sock.send(new java.net.DatagramPacket(b, b.length,
            java.net.InetAddress.getByName("127.0.0.1"), port))
        }
        // one multi-line datagram (the DogStatsD packing shape) and a
        // bare single-metric datagram without a trailing newline
        send("hits:1|c\nlat:250|ms|@0.5\n")
        send("temp:21|g|#room:a")
        sock.close()
        val t0 = System.currentTimeMillis()
        // lat's @0.5 weight-2 explode makes 2 rows -> 4 total
        while (spark.table(qn).count() < 4 &&
          System.currentTimeMillis() - t0 < 30000) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        val rows = spark.table(qn)
          .select("name", "kind", "value_type", "value", "tags")
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
            r.getDouble(3), r.getString(4))).sortBy(t => (t._1, t._4))
        assert(rows.toSeq == Seq(
          ("hits", "incremental", "counter", 1.0, null),
          ("lat", "incremental", "distribution", 0.25, null),
          ("lat", "incremental", "distribution", 0.25, null),
          ("temp", "absolute", "gauge", 21.0, "room=a")))
      } finally q.stop()
    } finally topo.closeIngest()
  }

  test("vector-to-vector transport: sink topology -> UDP -> source topology, event equality") {
    // Topology B: the RECEIVING engine — a udp socket source decoding
    // native_json metric envelopes into flat metric rows.
    val rx = Topology.load(
      """
        |[sources.peer]
        |  type = "socket"
        |  mode = "udp"
        |  address = "127.0.0.1:0"
        |  [sources.peer.decoding]
        |    codec = "native_json"
        |""".stripMargin)
    try {
      val src = rx.loadStreamingSources(spark)
      val port = rx.ingestListeners.head.boundPort
      val qn = s"v2v_${System.nanoTime()}"
      val q = src("peer").df.drop(SeqCol).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        // Topology A: the SENDING engine — statsd capture decoded to
        // metric rows, socket sink encoding native_json, one datagram
        // per event. Both ends run the same library: live interop.
        val dir = java.nio.file.Files.createTempDirectory("graft_v2v").toFile
        val f = new java.io.File(dir, "m.statsd")
        java.nio.file.Files.write(f.toPath,
          "hits:3|c\ntemp:21|g|#room:a\nusers:7|s\nlat:250|ms|@0.5\n"
            .getBytes("UTF-8"))
        val tx = Topology.load(
          s"""
             |[sources.m]
             |  type = "file"
             |  path = "${f.getAbsolutePath}"
             |  [sources.m.decoding]
             |    codec = "statsd"
             |[transforms.relay]
             |  inputs = ["m"]
             |  type = "filter"
             |  condition = 'true'
             |[sinks.peer]
             |  inputs = ["relay"]
             |  type = "socket"
             |  mode = "udp"
             |  address = "127.0.0.1:$port"
             |  [sinks.peer.encoding]
             |    codec = "native_json"
             |""".stripMargin)
        val sent = tx.writeSinks(tx.run(tx.loadSources(spark)))("peer")
        assert(sent == 5L) // lat's @0.5 weight-2 makes 5 rows of 4 lines
        val t0 = System.currentTimeMillis()
        while (spark.table(qn).count() < 5 &&
          System.currentTimeMillis() - t0 < 30000) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        val rows = spark.table(qn)
          .select("name", "kind", "value_type", "value", "tags")
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
            r.getDouble(3), r.getString(4))).sortBy(t => (t._1, t._4)).toSeq
        // event equality with the sending topology's own rows
        assert(rows == Seq(
          ("hits", "incremental", "counter", 3.0, null),
          ("lat", "incremental", "distribution", 0.25, null),
          ("lat", "incremental", "distribution", 0.25, null),
          ("temp", "absolute", "gauge", 21.0, "room=a"),
          ("users", "incremental", "set", 7.0, null)))
      } finally q.stop()
    } finally rx.closeIngest()
  }

  test("syslog source udp: one RFC 5424 message per datagram, peer as host fallback") {
    val topo = Topology.load(
      """
        |[sources.logs]
        |  type = "syslog"
        |  mode = "udp"
        |  address = "127.0.0.1:0"
        |""".stripMargin)
    try {
      val src = topo.loadStreamingSources(spark)
      val port = topo.ingestListeners.head.boundPort
      val qn = s"udp_syslog_${System.nanoTime()}"
      val q = src("logs").df.drop(SeqCol).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        val sock = new java.net.DatagramSocket()
        def send(s: String): Unit = {
          val b = s.getBytes("UTF-8")
          sock.send(new java.net.DatagramPacket(b, b.length,
            java.net.InetAddress.getByName("127.0.0.1"), port))
        }
        send("<34>1 2021-02-03T04:05:06Z edge.example app 77 ID9 - boom")
        send("<13>1 2021-02-03T04:05:07Z - cron - - - tick\n")
        sock.close()
        val t0 = System.currentTimeMillis()
        while (spark.table(qn).count() < 2 &&
          System.currentTimeMillis() - t0 < 30000) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        val rows = spark.table(qn)
          .select("appname", "hostname", "severity", "message", "host")
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
            r.getString(3), r.getString(4))).sortBy(_._1)
        assert(rows.toSeq == Seq(
          ("app", "edge.example", "crit", "boom", "edge.example"),
          // nil hostname -> the datagram peer is the host fallback
          ("cron", null, "notice", "tick", "127.0.0.1")))
      } finally q.stop()
    } finally topo.closeIngest()
  }
}
