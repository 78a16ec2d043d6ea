package graft

import graft.config.Topology
import graft.config.Topology.SeqCol
import graft.functions.Lumberjack

/** The logstash source: lumberjack/beats frame kernel (v1 data, v2
  * json, zlib compressed, window/ack skips), the live TCP listener
  * with the `2A<seq>` batch ack, and the batch capture replay.
  */
class LogstashSpec extends SparkSpec {

  private def u32(v: Long): Array[Byte] = Array[Byte](
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def jsonFrame(seq: Long, payload: String): Array[Byte] = {
    val p = payload.getBytes("UTF-8")
    Array[Byte]('2', 'J') ++ u32(seq) ++ u32(p.length.toLong) ++ p
  }

  private def dataFrame(seq: Long, kvs: (String, String)*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('1', 'D')); out.write(u32(seq))
    out.write(u32(kvs.size.toLong))
    kvs.foreach { case (k, v) =>
      val kb = k.getBytes("UTF-8"); val vb = v.getBytes("UTF-8")
      out.write(u32(kb.length.toLong)); out.write(kb)
      out.write(u32(vb.length.toLong)); out.write(vb)
    }
    out.toByteArray
  }

  private def compressedFrame(inner: Array[Byte]): Array[Byte] = {
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(inner); deflater.finish()
    val buf = new Array[Byte](inner.length * 2 + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    Array[Byte]('2', 'C') ++ u32(n.toLong) ++ java.util.Arrays.copyOf(buf, n)
  }

  test("lumberjack kernel: frame families, truncation vs malformed") {
    // v2 json
    val (j, jn) = Lumberjack.decodeOne(jsonFrame(7, """{"msg":"a","n":1}"""), 0)
    assert(j == Seq(Lumberjack.EventFrame(7, """{"msg":"a","n":1}""")))
    assert(jn == jsonFrame(7, """{"msg":"a","n":1}""").length)
    // v1 data pairs -> all-string object
    val (d, _) = Lumberjack.decodeOne(dataFrame(3, "k" -> "v", "x" -> "1"), 0)
    assert(d == Seq(Lumberjack.EventFrame(3, """{"k":"v","x":"1"}""")))
    // window + ack skip, compressed unwraps recursively
    val win = Array[Byte]('2', 'W') ++ u32(10)
    assert(Lumberjack.decodeOne(win, 0)._1.isEmpty)
    val packed = compressedFrame(
      jsonFrame(1, """{"i":1}""") ++ dataFrame(2, "i" -> "2"))
    val (c, _) = Lumberjack.decodeOne(packed, 0)
    // v1 pairs decode as strings, v2 json keeps its types
    assert(c.map(_.fields) == Seq("""{"i":1}""", """{"i":"2"}"""))
    // truncation waits; junk is malformed
    intercept[Lumberjack.Truncated](
      Lumberjack.decodeOne(jsonFrame(7, """{"a":1}""").dropRight(3), 0))
    intercept[IllegalArgumentException](
      Lumberjack.decodeOne(Array[Byte]('9', 'J', 0, 0, 0, 0), 0))
    intercept[IllegalArgumentException](
      Lumberjack.decodeOne(Array[Byte]('2', 'Q', 0, 0, 0, 0), 0))
    // a zlib bomb must error (connection drop), not balloon the heap
    val deflater = new java.util.zip.Deflater()
    val zeros = new Array[Byte](1 << 20)
    val sink = new Array[Byte](1 << 20)
    val zout = new java.io.ByteArrayOutputStream()
    for (_ <- 1 to 80) { // 80 MB of zeros
      deflater.setInput(zeros)
      var n = deflater.deflate(sink)
      while (n > 0) { zout.write(sink, 0, n); n = deflater.deflate(sink) }
    }
    deflater.finish()
    var n = deflater.deflate(sink)
    while (n > 0) { zout.write(sink, 0, n); n = deflater.deflate(sink) }
    deflater.end()
    val bomb = Array[Byte]('2', 'C') ++ u32(zout.size().toLong) ++ zout.toByteArray
    intercept[IllegalArgumentException](Lumberjack.decodeOne(bomb, 0))
  }

  test("logstash source: live beats connection with windowed batch and 2A ack") {
    val topo = Topology.load(
      """
        |[sources.beats]
        |  type = "logstash"
        |  address = "127.0.0.1:0"
        |""".stripMargin)
    try {
      val src = topo.loadStreamingSources(spark)
      val port = topo.ingestListeners.head.boundPort
      val qn = s"logstash_src_${System.nanoTime()}"
      val q = src("beats").df.drop(SeqCol).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        val sock = new java.net.Socket("127.0.0.1", port)
        val out = sock.getOutputStream
        // the filebeat shape: window frame, then a compressed batch of
        // json frames (one with @timestamp + host of its own)
        out.write(Array[Byte]('2', 'W') ++ u32(2))
        out.write(compressedFrame(
          jsonFrame(1,
            """{"message":"one","@timestamp":"2021-02-03T04:05:06Z","host":"beat-7"}""") ++
          jsonFrame(2, """{"message":"two"}""")))
        out.flush()
        // the reader acks the batch's max sequence: 2A + u32(2)
        sock.setSoTimeout(10000)
        val ack = new Array[Byte](6)
        var read = 0
        while (read < 6) {
          val n = sock.getInputStream.read(ack, read, 6 - read)
          assert(n > 0); read += n
        }
        assert(ack.toSeq == (Array[Byte]('2', 'A') ++ u32(2)).toSeq)
        sock.close()

        val t0 = System.currentTimeMillis()
        while (spark.table(qn).count() < 2 &&
          System.currentTimeMillis() - t0 < 30000) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        val rows = spark.table(qn)
          .selectExpr("get_json_object(message, '$.message')", "host",
            "CAST(unix_millis(timestamp) AS BIGINT)", "source_type")
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
            r.getString(3))).sortBy(_._1).toSeq
        assert(rows.map(_._4).forall(_ == "logstash"))
        val byMsg = rows.map(r => r._1 -> r).toMap
        // own host + parsed @timestamp win; peer + receipt time fall back
        assert(byMsg("one")._2 == "beat-7" &&
          byMsg("one")._3 == 1612325106000L)
        assert(byMsg("two")._2 == "127.0.0.1")
      } finally q.stop()
    } finally topo.closeIngest()
  }

  test("logstash source: batch capture replay infers fields, v1+v2 mixed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_logstash").toFile
    val cap = jsonFrame(1,
      """{"msg":"a","n":5,"@timestamp":"2021-02-03T04:05:06Z"}""") ++
      dataFrame(2, "msg" -> "b")
    java.nio.file.Files.write(
      new java.io.File(dir, "cap.lumberjack").toPath, cap)
    val frame = Topology.load(
      s"""
         |[sources.beats]
         |  type = "logstash"
         |  path = "${dir.getAbsolutePath}"
         |""".stripMargin).loadSources(spark)("beats")
    val rows = frame.df
      .selectExpr("msg", "n", "CAST(unix_millis(timestamp) AS BIGINT)")
      .collect().map(r => (r.getString(0), Option(r.get(1)),
        Option(r.get(2)))).sortBy(_._1).toSeq
    assert(rows == Seq(
      ("a", Some(5L), Some(1612325106000L)),
      ("b", None, None)))
    val e = intercept[Exception](Topology.load(
      """
        |[sources.beats]
        |  type = "logstash"
        |  address = "127.0.0.1:0"
        |""".stripMargin).loadSources(spark))
    assert(e.getMessage.contains("streaming-only"))
  }
}
