package graft

import org.apache.spark.sql.functions._

import graft.config.Topology
import graft.config.Topology.SeqCol
import graft.functions.{Fluent, MsgPack}

/** The fluent source: msgpack kernel round-trips, the forward-protocol
  * event modes (reference src/sources/fluent/message.rs over the
  * public spec), the live TCP listener with in-band chunk acks, and
  * the batch capture replay with record-schema inference.
  */
class FluentSpec extends SparkSpec {

  private def recordMap(kvs: (String, Any)*): Array[Byte] = {
    val w = new MsgPack.Writer().writeMapHeader(kvs.size)
    kvs.foreach {
      case (k, v: String) => w.writeStr(k).writeStr(v)
      case (k, v: Long) => w.writeStr(k).writeLong(v)
      case (k, v: Int) => w.writeStr(k).writeLong(v.toLong)
      case (k, v: Double) => w.writeStr(k).writeDouble(v)
      case (k, v: Boolean) => w.writeStr(k).writeBool(v)
      case (k, null) => w.writeStr(k).writeNil()
      case (k, other) => fail(s"unsupported test value $k=$other")
    }
    w.toBytes
  }

  private def messageMode(tag: String, sec: Long, rec: Array[Byte]): Array[Byte] = {
    val w = new MsgPack.Writer().writeArrayHeader(3).writeStr(tag)
    w.writeEventTime(sec, 500000000L) // exercises the ext-0 arm
    new java.io.ByteArrayOutputStream() {
      write(w.toBytes); write(rec)
    }.toByteArray
  }

  test("msgpack kernel: decode round-trips the writer across the type families") {
    val w = new MsgPack.Writer().writeMapHeader(6)
    w.writeStr("s").writeStr("héllo")
    w.writeStr("neg").writeLong(-42L)
    w.writeStr("big").writeLong(1234567890123L)
    w.writeStr("f").writeDouble(2.5)
    w.writeStr("b").writeBool(true)
    w.writeStr("n").writeNil()
    val d = MsgPack.decode(w.toBytes)
    assert(d.next == w.toBytes.length)
    assert(d.node.get("s").asText == "héllo")
    assert(d.node.get("neg").asLong == -42L)
    assert(d.node.get("big").asLong == 1234567890123L)
    assert(d.node.get("f").asDouble == 2.5)
    assert(d.node.get("b").asBoolean)
    assert(d.node.get("n").isNull)
    // truncated buffers say "wait", not "malformed"
    intercept[MsgPack.Truncated](MsgPack.decode(w.toBytes.dropRight(3)))
    // a nesting bomb (one-element arrays all the way down) must be a
    // catchable decode error, not a StackOverflowError on the thread
    val bomb = Array.fill[Byte](100000)(0x91.toByte)
    intercept[IllegalArgumentException](MsgPack.decode(bomb))
    // a gzip bomb inside PackedForward must error, not balloon the heap
    val huge = new java.io.ByteArrayOutputStream()
    val hz = new java.util.zip.GZIPOutputStream(huge)
    val zeros = new Array[Byte](1 << 20)
    for (_ <- 1 to 80) hz.write(zeros) // 80 MB of zeros, ~80 KB gzipped
    hz.close()
    val pfBomb = new java.io.ByteArrayOutputStream()
    pfBomb.write(new MsgPack.Writer().writeArrayHeader(3).writeStr("b").toBytes)
    pfBomb.write(new MsgPack.Writer().writeBin(huge.toByteArray).toBytes)
    pfBomb.write(new MsgPack.Writer().writeMapHeader(1)
      .writeStr("compressed").writeStr("gzip").toBytes)
    intercept[IllegalArgumentException](
      graft.functions.Fluent.decodeMessage(pfBomb.toByteArray))
    // EventTime ext: 4+4 big-endian seconds+nanos
    val t = new MsgPack.Writer().writeEventTime(1612325106L, 789000000L).toBytes
    assert(MsgPack.decode(t).eventTimeSeconds.contains(1612325106.789))
  }

  test("fluent decode: message, forward, packed-forward (+gzip), chunk option") {
    // Message mode with EventTime
    val m1 = messageMode("app.log", 1612325106L, recordMap("msg" -> "one", "n" -> 1))
    val (msg1, n1) = Fluent.decodeMessage(m1)
    assert(n1 == m1.length && msg1.ackChunk.isEmpty)
    assert(msg1.entries == Seq(Fluent.Entry("app.log", Some(1612325106.5),
      """{"msg":"one","n":1}""")))

    // Forward mode: [tag, [[t, rec], [t, rec]], {"chunk": "c1"}]
    val fw = new MsgPack.Writer().writeArrayHeader(3).writeStr("fw")
    fw.writeArrayHeader(2)
    fw.writeArrayHeader(2).writeLong(100L)
    val fwBytes = new java.io.ByteArrayOutputStream()
    fwBytes.write(fw.toBytes); fwBytes.write(recordMap("i" -> 1))
    val e2 = new MsgPack.Writer().writeArrayHeader(2).writeLong(200L)
    fwBytes.write(e2.toBytes); fwBytes.write(recordMap("i" -> 2))
    fwBytes.write(new MsgPack.Writer().writeMapHeader(1)
      .writeStr("chunk").writeStr("c1").toBytes)
    val (msg2, _) = Fluent.decodeMessage(fwBytes.toByteArray)
    assert(msg2.ackChunk.contains("c1"))
    assert(msg2.entries.map(_.record) == Seq("""{"i":1}""", """{"i":2}"""))
    assert(msg2.entries.map(_.tsecs) == Seq(Some(100.0), Some(200.0)))

    // PackedForward + gzip (CompressedPackedForward)
    val packed = new java.io.ByteArrayOutputStream()
    for (i <- 1 to 3) {
      val e = new MsgPack.Writer().writeArrayHeader(2).writeLong(300L + i)
      packed.write(e.toBytes); packed.write(recordMap("p" -> i))
    }
    val gz = new java.io.ByteArrayOutputStream()
    val gzo = new java.util.zip.GZIPOutputStream(gz)
    gzo.write(packed.toByteArray); gzo.close()
    val pf = new java.io.ByteArrayOutputStream()
    pf.write(new MsgPack.Writer().writeArrayHeader(3).writeStr("pk").toBytes)
    pf.write(new MsgPack.Writer().writeBin(gz.toByteArray).toBytes)
    pf.write(new MsgPack.Writer().writeMapHeader(1)
      .writeStr("compressed").writeStr("gzip").toBytes)
    val (msg3, _) = Fluent.decodeMessage(pf.toByteArray)
    assert(msg3.entries.map(_.record) ==
      Seq("""{"p":1}""", """{"p":2}""", """{"p":3}"""))
  }

  test("fluent source: live TCP forward protocol with in-band chunk ack") {
    val topo = Topology.load(
      """
        |[sources.fwd]
        |  type = "fluent"
        |  address = "127.0.0.1:0"
        |""".stripMargin)
    try {
      val src = topo.loadStreamingSources(spark)
      val port = topo.ingestListeners.head.boundPort
      val qn = s"fluent_src_${System.nanoTime()}"
      val q = src("fwd").df.drop(SeqCol).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        val sock = new java.net.Socket("127.0.0.1", port)
        val out = sock.getOutputStream
        // two messages across a deliberately SPLIT write (the second
        // message's bytes arrive in two chunks — accumulator test),
        // the second with a chunk option expecting an ack
        out.write(messageMode("a.b", 1612325106L, recordMap("k" -> "v1")))
        val withChunk = new java.io.ByteArrayOutputStream()
        withChunk.write(new MsgPack.Writer().writeArrayHeader(4)
          .writeStr("a.c").writeLong(1612325200L).toBytes)
        withChunk.write(recordMap("k" -> "v2"))
        withChunk.write(new MsgPack.Writer().writeMapHeader(1)
          .writeStr("chunk").writeStr("xyz").toBytes)
        val wc = withChunk.toByteArray
        out.write(wc, 0, 5); out.flush()
        Thread.sleep(100)
        out.write(wc, 5, wc.length - 5); out.flush()
        // the ack comes back as msgpack {"ack":"xyz"}
        sock.setSoTimeout(10000)
        val ackBuf = new Array[Byte](64)
        val an = sock.getInputStream.read(ackBuf)
        val ack = MsgPack.decode(java.util.Arrays.copyOf(ackBuf, an))
        assert(ack.node.get("ack").asText == "xyz")
        sock.close()

        val t0 = System.currentTimeMillis()
        while (spark.table(qn).count() < 2 &&
          System.currentTimeMillis() - t0 < 30000) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        val rows = spark.table(qn)
          .selectExpr("tag", "message", "CAST(unix_millis(timestamp) AS BIGINT)",
            "host", "source_type")
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
            r.getString(3), r.getString(4))).sortBy(_._1).toSeq
        assert(rows == Seq(
          ("a.b", """{"k":"v1"}""", 1612325106500L, "127.0.0.1", "fluent"),
          ("a.c", """{"k":"v2"}""", 1612325200000L, "127.0.0.1", "fluent")))
      } finally q.stop()
    } finally topo.closeIngest()
  }

  test("fluent source: batch capture replay infers the record schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fluent").toFile
    val cap = new java.io.ByteArrayOutputStream()
    cap.write(messageMode("t.1", 100L, recordMap("msg" -> "a", "n" -> 1)))
    cap.write(messageMode("t.2", 200L, recordMap("msg" -> "b", "n" -> 2)))
    java.nio.file.Files.write(
      new java.io.File(dir, "cap.msgpack").toPath, cap.toByteArray)
    val frame = Topology.load(
      s"""
         |[sources.fwd]
         |  type = "fluent"
         |  path = "${dir.getAbsolutePath}"
         |""".stripMargin).loadSources(spark)("fwd")
    val rows = frame.df
      .selectExpr("tag", "msg", "n", "CAST(unix_millis(timestamp) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(rows == Seq(("t.1", "a", 1L, 100500L), ("t.2", "b", 2L, 200500L)))
    // streaming without an address / batch without a path: loud
    val e = intercept[Exception](Topology.load(
      """
        |[sources.fwd]
        |  type = "fluent"
        |  address = "127.0.0.1:0"
        |""".stripMargin).loadSources(spark))
    assert(e.getMessage.contains("streaming-only"))
  }
}
