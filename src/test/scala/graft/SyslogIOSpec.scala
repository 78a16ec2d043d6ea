package graft

import java.nio.file.Files

import graft.config.Topology

/** The `syslog` source (reference src/sources/syslog.rs) end-to-end:
  * batch capture replay through the octet-counting framer, the
  * config-selectable framing layer on the file source, and a REAL
  * listening TCP server receiving octet-counted RFC 5424 frames into
  * the streaming path.
  */
class SyslogIOSpec extends SparkSpec {

  private def msg(i: Int): String =
    s"<${8 + i % 8}>1 2024-03-01T00:00:0${i % 10}Z host-${i % 3} app$i ${i % 100} ID$i - body number $i"

  /** Mixed capture: even messages octet-counted, odd newline-framed —
    * the RFC 6587 sniff must handle both in one stream.
    */
  private def capture(n: Int): Array[Byte] = {
    val sb = new StringBuilder
    (0 until n).foreach { i =>
      val m = msg(i)
      if (i % 2 == 0) sb.append(s"${m.getBytes("UTF-8").length} $m")
      else sb.append(m).append('\n')
    }
    sb.toString.getBytes("UTF-8")
  }

  test("syslog source (batch): replays an octet-counted capture through the 5424 parse chain") {
    val dir = Files.createTempDirectory("graft_syslog").toFile
    val f = new java.io.File(dir, "capture.bin")
    Files.write(f.toPath, capture(20))
    val topo = Topology.load(
      s"""
         |[sources.logs]
         |  type = "syslog"
         |  path = "${f.getAbsolutePath}"
         |""".stripMargin)
    val out = topo.loadSources(spark)("logs")
    val rows = out.df
      .select("appname", "hostname", "severity", "message", "host", "source_type")
      .collect()
    assert(rows.length == 20)
    val byApp = rows.map(r => r.getString(0) -> r).toMap
    (0 until 20).foreach { i =>
      val r = byApp(s"app$i")
      assert(r.getString(1) == s"host-${i % 3}")
      assert(r.getString(3) == s"body number $i")
      assert(r.getString(4) == s"host-${i % 3}") // host = parsed hostname
      assert(r.getString(5) == "syslog")
    }
    // severity name mapping: pri = 8 + i%8 → facility user, severity i%8
    val sev = byApp("app0").getString(2)
    assert(sev == "emerg", sev)
    assert(byApp("app7").getString(2) == "debug")
  }

  test("syslog source (batch): listening form refuses with streaming-only guidance") {
    val topo = Topology.load(
      """
        |[sources.logs]
        |  type = "syslog"
        |  mode = "tcp"
        |  address = "127.0.0.1:0"
        |""".stripMargin)
    val e = intercept[Exception](topo.loadSources(spark))
    assert(e.getMessage.contains("streaming-only"))
  }

  test("file source: config-selectable framing (character_delimited) feeds the codec layer") {
    val dir = Files.createTempDirectory("graft_framed").toFile
    val f = new java.io.File(dir, "data.log")
    // NUL-delimited logfmt records (GELF-over-TCP's classic framing)
    val recs = (0 until 6).map(i => s"level=info id=$i")
    Files.write(f.toPath, recs.mkString("\u0000").getBytes("UTF-8"))
    val topo = Topology.load(
      s"""
         |[sources.fr]
         |  type = "file"
         |  path = "${f.getAbsolutePath}"
         |  framing.method = "character_delimited"
         |  [sources.fr.framing.character_delimited]
         |    delimiter = "\\u0000"
         |[transforms.shape]
         |  inputs = ["fr"]
         |  type = "remap"
         |  source = '''
         |    .kv = parse_key_value!(.message)
         |    .id = string!(.kv.id)
         |  '''
         |""".stripMargin)
    val out = topo.run(topo.loadSources(spark))("shape")
    val ids = out.df.select("id").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == (0 until 6).map(_.toString).sorted)
  }

  test("file source: multiline plus non-newline framing is refused loudly") {
    val topo = Topology.load(
      """
        |[sources.fr]
        |  type = "file"
        |  path = "/tmp/nope"
        |  framing.method = "octet_counting"
        |  [sources.fr.multiline]
        |    start_pattern = "^x"
        |    condition_pattern = "^ "
        |    mode = "continue_through"
        |    timeout_ms = 1000
        |""".stripMargin)
    val e = intercept[Exception](topo.loadSources(spark))
    assert(e.getMessage.contains("multiline"))
  }

  test("syslog source (streaming): a real TCP listener receives octet-counted frames") {
    val topo = Topology.load(
      """
        |[sources.logs]
        |  type = "syslog"
        |  mode = "tcp"
        |  address = "127.0.0.1:0"
        |[transforms.errors]
        |  inputs = ["logs"]
        |  type = "filter"
        |  condition = '.severity == "crit"'
        |""".stripMargin)
    try {
      val src = topo.loadStreamingSources(spark)
      val port = topo.ingestListeners.head.boundPort
      assert(port > 0)
      val out = topo.run(src)("errors")
      val qn = s"syslog_src_${System.nanoTime()}"
      val q = out.df.drop(Topology.SeqCol).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        // two clients, mixed framing; severity crit = pri 8+2
        val c1 = new java.net.Socket("127.0.0.1", port)
        val c2 = new java.net.Socket("127.0.0.1", port)
        def send(sock: java.net.Socket, wire: String): Unit = {
          sock.getOutputStream.write(wire.getBytes("UTF-8"))
          sock.getOutputStream.flush()
        }
        val m1 = "<10>1 2024-03-01T00:00:00Z edge-a app1 1 ID1 - first critical"
        val m2 = "<14>1 2024-03-01T00:00:01Z edge-a app2 2 ID2 - informational"
        val m3 = "<10>1 2024-03-01T00:00:02Z edge-b app3 3 ID3 - second critical"
        send(c1, s"${m1.getBytes("UTF-8").length} $m1")
        send(c1, s"$m2\n")
        send(c2, s"${m3.getBytes("UTF-8").length} $m3")
        c1.close(); c2.close()
        val t0 = System.currentTimeMillis()
        def count() = spark.table(qn).count()
        while (count() < 2 && System.currentTimeMillis() - t0 < 30000) {
          q.processAllAvailable()
          Thread.sleep(100)
        }
        val rows = spark.table(qn)
          .select("appname", "host", "source_type").collect()
          .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1)
        assert(rows.toSeq == Seq(
          ("app1", "edge-a", "syslog"), ("app3", "edge-b", "syslog")))
      } finally q.stop()
    } finally topo.closeIngest()
  }
}
