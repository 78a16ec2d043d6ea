package graft

import java.nio.file.Files

import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._

import graft.config.{Frame, MemoryCache, Topology}
import graft.config.Topology.SeqCol
import graft.config.VrlCompile.{EventMeta, VStr}
import graft.operators.Telemetry

/** Round-4 config source surface: memory enrichment tables from
  * config, the internal_metrics self-observability source, and the
  * kafka dispatch's jar-gated refusal.
  */
class ConfigSourcesSpec extends SparkSpec {

  private def msgFrame(rows: Seq[(String, String)]): Frame = {
    val df = spark.createDataFrame(rows.zipWithIndex.map { case ((k, v), i) =>
      (i.toLong, k, v) }).toDF(SeqCol, "user", "team")
    Frame(df, EventMeta(ListMap("user" -> VStr, "team" -> VStr), None))
  }

  test("memory enrichment table: a source writes the cache, VRL reads it back") {
    MemoryCache.drop("who")
    val topo = Topology.load(
      """
        |[enrichment_tables.who]
        |  type = "memory"
        |  ttl = 60
        |  inputs = ["writes"]
        |[transforms.lookup]
        |  inputs = ["reads"]
        |  type = "remap"
        |  drop_on_error = true
        |  source = '''
        |    rec = get_enrichment_table_record!("who", {"key": .user})
        |    .team = string!(rec.value)
        |    .ttl = to_int!(string!(rec.ttl))
        |  '''
        |""".stripMargin)
    // writer events: FIELD NAMES are the cache keys (memory/table.rs
    // handle_value iterates top-level fields)
    val writes = {
      val df = spark.createDataFrame(Seq(
        (1L, "core", "infra"), (2L, "apps", "web")))
        .toDF(SeqCol, "alice", "bob")
      Frame(df, EventMeta(ListMap("alice" -> VStr, "bob" -> VStr), None))
    }
    val reads = {
      val df = spark.createDataFrame(Seq((1L, "alice"), (2L, "bob")))
        .toDF(SeqCol, "user")
      Frame(df, EventMeta(ListMap("user" -> VStr), None))
    }
    val out = topo.run(Map("writes" -> writes, "reads" -> reads))("lookup")
    val rows = out.df.select("user", "team", "ttl").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    // last write wins per key: seq 2 wrote alice=apps, bob=web
    assert(rows.toSeq == Seq(("alice", "apps"), ("bob", "web")))

    // a missed key raises (get_enrichment_table_record! error channel)
    val miss = topo.run(Map("writes" -> writes,
      "reads" -> Frame(
        spark.createDataFrame(Seq((1L, "nobody"))).toDF(SeqCol, "user"),
        EventMeta(ListMap("user" -> VStr), None))))
    assert(miss("lookup").df.count() == 0)
    MemoryCache.drop("who")
  }

  test("memory enrichment table: a STREAM fills the cache, a later run reads it") {
    MemoryCache.drop("seen")
    val dir = Files.createTempDirectory("graft_memstream").toFile
    // shaped events whose FIELD NAMES are the cache keys
    Files.write(new java.io.File(dir, "w.jsonl").toPath,
      "{\"alice\":\"infra\",\"bob\":\"web\"}\n".getBytes("UTF-8"))
    val topo = Topology.load(
      s"""
         |[enrichment_tables.seen]
         |  type = "memory"
         |  ttl = 600
         |  inputs = ["shape"]
         |[sources.tail]
         |  type = "file"
         |  path = "$dir/w.jsonl"
         |[transforms.shape]
         |  inputs = ["tail"]
         |  type = "remap"
         |  source = '''
         |    kv = parse_json!(.message)
         |    .alice = string!(kv.alice)
         |    .bob = string!(kv.bob)
         |    del(.message)
         |  '''
         |[sinks.null]
         |  inputs = ["shape"]
         |  type = "blackhole"
         |""".stripMargin)
    topo.executeStreaming(spark, s"$dir/ckpt")
    // the streamed upsert survives the run; a fresh topology reads it
    val reader = Topology.load(
      """
        |[enrichment_tables.seen]
        |  type = "memory"
        |[transforms.lookup]
        |  inputs = ["reads"]
        |  type = "remap"
        |  drop_on_error = true
        |  source = '.team = string!(get_enrichment_table_record!("seen", {"key": .user}).value)'
        |""".stripMargin)
    val reads = Frame(
      spark.createDataFrame(Seq((1L, "alice"), (2L, "bob")))
        .toDF(SeqCol, "user"),
      EventMeta(ListMap("user" -> VStr), None))
    val rows = reader.run(Map("reads" -> reads))("lookup").df
      .select("user", "team").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted
    assert(rows.toSeq == Seq(("alice", "infra"), ("bob", "web")), rows.toSeq.toString)
    MemoryCache.drop("seen")
  }

  test("memory enrichment table: a STREAMING SOURCE input fills the cache (no driver settle)") {
    // regression: the batch settle used to run on streaming frames
    // too, collect()ing a streaming DataFrame and crashing the query
    MemoryCache.drop("direct")
    val dir = Files.createTempDirectory("graft_memsrc").toFile
    Files.write(new java.io.File(dir, "w.txt").toPath,
      "hello-cache\n".getBytes("UTF-8"))
    val topo = Topology.load(
      s"""
         |[enrichment_tables.direct]
         |  type = "memory"
         |  ttl = 600
         |  inputs = ["tail"]
         |[sources.tail]
         |  type = "file"
         |  path = "$dir/w.txt"
         |[sinks.null]
         |  inputs = ["tail"]
         |  type = "blackhole"
         |""".stripMargin)
    topo.executeStreaming(spark, s"$dir/ckpt")
    // bytes codec: the event's one field is `message`, so the cache
    // key is "message" and the value the rendered line
    assert(MemoryCache.snapshot("direct").exists(r =>
      r("key") == "message" && r("value") == "hello-cache"))
    MemoryCache.drop("direct")
  }

  test("memory enrichment table: an input matching nothing fails loudly") {
    val t = Topology.load(
      """
        |[enrichment_tables.who]
        |  type = "memory"
        |  inputs = ["writs"]
        |""".stripMargin)
    val e = intercept[IllegalArgumentException](
      t.run(Map("writes" -> msgFrame(Seq(("a", "b"))))))
    assert(e.getMessage.contains("writs"))
  }

  test("memory enrichment table: transform inputs and semantic knobs are refused") {
    val t1 = Topology.load(
      """
        |[enrichment_tables.who]
        |  type = "memory"
        |  inputs = ["shaper"]
        |[transforms.shaper]
        |  inputs = ["src"]
        |  type = "remap"
        |  source = '.x = 1'
        |""".stripMargin)
    val e1 = intercept[Exception](t1.run(Map("src" -> msgFrame(Seq(("a", "b"))))))
    assert(e1.getMessage.contains("transform"))
    val e2 = intercept[Exception](Topology.load(
      """
        |[enrichment_tables.who]
        |  type = "memory"
        |  max_byte_size = 1000
        |""".stripMargin).memoryTableDefs)
    assert(e2.getMessage.contains("max_byte_size"))
  }

  test("memory enrichment table: TTL expires entries from the snapshot") {
    MemoryCache.drop("ttl_t")
    val now = System.currentTimeMillis()
    MemoryCache.upsertFields("ttl_t", Seq("fresh" -> "1"), 60, now)
    MemoryCache.upsertFields("ttl_t", Seq("stale" -> "2"), 5, now - 10000)
    val snap = MemoryCache.snapshot("ttl_t", now)
    assert(snap.map(_("key")) == Seq("fresh"))
    assert(snap.head("ttl").toLong <= 60)
    MemoryCache.drop("ttl_t")
  }

  test("internal_metrics source: sink deliveries re-enter as metric events") {
    Telemetry.Registry.reset()
    val dir = Files.createTempDirectory("graft_im").toFile
    // phase 1: a topology that delivers 3 events to a file sink
    val writer = Topology.load(
      s"""
         |[sinks.out]
         |  inputs = ["src"]
         |  type = "file"
         |  path = "$dir/out"
         |  [sinks.out.encoding]
         |    codec = "text"
         |""".stripMargin)
    val in = Frame(
      spark.createDataFrame(Seq((1L, "a"), (2L, "b"), (3L, "c")))
        .toDF(SeqCol, "message"),
      EventMeta(ListMap("message" -> VStr), None))
    assert(writer.writeSinks(Map("src" -> in))("out") == 3L)

    // phase 2: internal_metrics → aggregate chain reads the counters
    val monitor = Topology.load(
      """
        |[sources.self]
        |  type = "internal_metrics"
        |[transforms.agg]
        |  inputs = ["self"]
        |  type = "aggregate"
        |  interval_ms = 60000
        |""".stripMargin)
    val src = monitor.loadSources(spark)
    val out = monitor.run(src)("agg")
    val rows = out.df.select("name", "tags", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rows.contains(("component_sent_events_total", "component_id=out", 3.0)))
    Telemetry.Registry.reset()
  }

  test("internal_logs source: the engine's own events re-enter with host/pid stamps") {
    Telemetry.Logs.reset()
    val dir = Files.createTempDirectory("graft_il").toFile
    // phase 1: a delivery records an "Events sent." line
    val writer = Topology.load(
      s"""
         |[sinks.out]
         |  inputs = ["src"]
         |  type = "file"
         |  path = "$dir/out"
         |  [sinks.out.encoding]
         |    codec = "text"
         |""".stripMargin)
    val in = Frame(
      spark.createDataFrame(Seq((1L, "a"), (2L, "b"))).toDF(SeqCol, "message"),
      EventMeta(ListMap("message" -> VStr), None))
    assert(writer.writeSinks(Map("src" -> in))("out") == 2L)

    // phase 2: internal_logs → filter chain consumes the log events
    val monitor = Topology.load(
      """
        |[sources.self]
        |  type = "internal_logs"
        |[transforms.sent]
        |  inputs = ["self"]
        |  type = "filter"
        |  condition = 'contains!(.message, "Events sent")'
        |""".stripMargin)
    val out = monitor.run(monitor.loadSources(spark))("sent")
    val rows = out.df.select("message", "level", "target", "host", "pid")
      .collect()
    assert(rows.nonEmpty)
    val r = rows.head
    assert(r.getString(0) == "Events sent. count=2")
    assert(r.getString(1) == "INFO" && r.getString(2) == "sinks.out")
    assert(r.getString(3) == java.net.InetAddress.getLocalHost.getHostName)
    assert(r.getLong(4) == ProcessHandle.current().pid())

    // host_key/pid_key overrides and "" suppression (internal_logs.rs)
    val custom = Topology.load(
      """
        |[sources.self]
        |  type = "internal_logs"
        |  host_key = "node"
        |  pid_key = ""
        |""".stripMargin).loadSources(spark)("self")
    assert(custom.df.columns.contains("node"))
    assert(!custom.df.columns.contains("pid"))

    // source loads are themselves recorded (but not internal_logs' own)
    val msgs = Telemetry.Logs.snapshot().map(_.message)
    assert(msgs.exists(_.contains("Source loaded. type=internal_logs")) == false)
    Telemetry.Logs.reset()
  }

  test("otlp decoding codec: binary frames from config, bytes and varint framing") {
    import graft.functions.ProtoWire.Writer
    def utf8(s: String) = s.getBytes("UTF-8")
    // the reference's pinned logs frame (otlp.rs create_logs_request_bytes)
    def logsFrame(sev: Long): Array[Byte] = {
      val rec = new Writer
      rec.writeTag(1, 1).writeFixed64(1234567890L)
      rec.writeTag(2, 0).writeVarint(sev)
      rec.writeLenDelim(3, utf8("INFO"))
      val scopeLogs = new Writer; scopeLogs.writeLenDelim(2, rec.toBytes)
      val resourceLogs = new Writer
      resourceLogs.writeLenDelim(1, Array.empty[Byte])
      resourceLogs.writeLenDelim(2, scopeLogs.toBytes)
      new Writer().writeLenDelim(1, resourceLogs.toBytes).toBytes
    }
    val dir = Files.createTempDirectory("graft_otlp").toFile
    // bytes framing (the otlp default): one file = one request
    Files.write(new java.io.File(dir, "a.bin").toPath, logsFrame(9))
    Files.write(new java.io.File(dir, "b.bin").toPath, logsFrame(13))
    Files.write(new java.io.File(dir, "bad.bin").toPath, utf8("not a frame"))
    val frame = Topology.load(
      s"""
         |[sources.otel]
         |  type = "file"
         |  path = "$dir"
         |  [sources.otel.decoding]
         |    codec = "otlp"
         |""".stripMargin).loadSources(spark)("otel")
    val rows = frame.df.collect()
    assert(rows.length == 2) // the bad frame dropped, not fatal
    assert(frame.df.columns.contains("resourceLogs"))
    val sevs = frame.df.selectExpr(
        "resourceLogs[0].scopeLogs[0].logRecords[0].severityNumber")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(sevs == Seq(9L, 13L))

    // varint_length_delimited framing: many requests per file
    val multi = new java.io.ByteArrayOutputStream()
    for (sev <- Seq(1L, 2L, 3L)) {
      val f = logsFrame(sev)
      val w = new Writer; w.writeVarint(f.length.toLong)
      multi.write(w.toBytes); multi.write(f)
    }
    val dir2 = Files.createTempDirectory("graft_otlp2").toFile
    Files.write(new java.io.File(dir2, "packed.bin").toPath, multi.toByteArray)
    val n = Topology.load(
      s"""
         |[sources.otel]
         |  type = "file"
         |  path = "$dir2"
         |  [sources.otel.framing]
         |    method = "varint_length_delimited"
         |  [sources.otel.decoding]
         |    codec = "otlp"
         |""".stripMargin).loadSources(spark)("otel").df.count()
    assert(n == 3)
  }

  test("opentelemetry source: real OTLP/HTTP POSTs decode end-to-end; route guards") {
    import java.net.URI
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    import graft.functions.ProtoWire.Writer
    def utf8(s: String) = s.getBytes("UTF-8")
    def logsFrame(sev: Long): Array[Byte] = {
      val rec = new Writer
      rec.writeTag(1, 1).writeFixed64(1234567890L)
      rec.writeTag(2, 0).writeVarint(sev)
      rec.writeLenDelim(3, utf8("INFO"))
      val scopeLogs = new Writer; scopeLogs.writeLenDelim(2, rec.toBytes)
      val resourceLogs = new Writer
      resourceLogs.writeLenDelim(1, Array.empty[Byte])
      resourceLogs.writeLenDelim(2, scopeLogs.toBytes)
      new Writer().writeLenDelim(1, resourceLogs.toBytes).toBytes
    }
    val client = HttpClient.newHttpClient()
    def post(url: String, body: Array[Byte], ctype: String): Int =
      client.send(HttpRequest.newBuilder(URI.create(url))
        .header("Content-Type", ctype)
        .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
        HttpResponse.BodyHandlers.discarding()).statusCode()
    val topo = Topology.load(
      """
        |[sources.otel]
        |  type = "opentelemetry"
        |  [sources.otel.http]
        |    address = "127.0.0.1:0"
        |""".stripMargin)
    try {
      val src = topo.loadStreamingSources(spark)
      val port = topo.ingestListeners.head.boundPort
      val qn = s"otel_src_${System.nanoTime()}"
      val q = src("otel").df.drop(SeqCol).writeStream
        .format("memory").queryName(qn).outputMode("append").start()
      try {
        val base = s"http://127.0.0.1:$port"
        assert(post(s"$base/v1/logs", logsFrame(9),
          "application/x-protobuf") == 200)
        assert(post(s"$base/v1/logs", logsFrame(13),
          "application/x-protobuf") == 200)
        // a logs frame IS also a valid empty-metrics shape only if its
        // discriminator passes — it doesn't: the metrics route answers 400
        assert(post(s"$base/v1/metrics", logsFrame(9),
          "application/x-protobuf") == 400)
        // guards: unknown path 404, wrong content type 415, GET 405
        assert(post(s"$base/v1/nope", logsFrame(9),
          "application/x-protobuf") == 404)
        assert(post(s"$base/v1/logs", logsFrame(9), "application/json") == 415)
        val get = HttpRequest.newBuilder(
          URI.create(s"$base/v1/logs")).GET().build()
        assert(client.send(get,
          HttpResponse.BodyHandlers.discarding()).statusCode() == 405)

        val t0 = System.currentTimeMillis()
        while (spark.table(qn).count() < 2 &&
          System.currentTimeMillis() - t0 < 30000) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        val rows = spark.table(qn)
          .select("signal", "message", "source_type").collect()
          .map(r => (r.getString(0), r.getString(1), r.getString(2)))
        assert(rows.length == 2)
        assert(rows.forall(r => r._1 == "logs" && r._3 == "opentelemetry"))
        val sevs = rows.map { r =>
          spark.range(1).select(
            get_json_object(lit(r._2),
              "$.resourceLogs[0].scopeLogs[0].logRecords[0].severityNumber"))
            .collect()(0).getString(0)
        }.sorted.toSeq
        assert(sevs == Seq("13", "9"))
      } finally q.stop()
    } finally topo.closeIngest()
  }

  test("opentelemetry source: grpc refused loudly, batch needs a capture path") {
    val grpc = Topology.load(
      """
        |[sources.otel]
        |  type = "opentelemetry"
        |  [sources.otel.grpc]
        |    address = "127.0.0.1:4317"
        |""".stripMargin)
    val e1 = intercept[Exception](grpc.loadStreamingSources(spark))
    assert(e1.getMessage.contains("grpc"), e1.getMessage)
    val e1b = intercept[Exception](grpc.loadSources(spark))
    assert(e1b.getMessage.contains("grpc"), e1b.getMessage)
    // batch without a capture path names the streaming path
    val noPath = Topology.load(
      """
        |[sources.otel]
        |  type = "opentelemetry"
        |  [sources.otel.http]
        |    address = "127.0.0.1:0"
        |""".stripMargin)
    val e2 = intercept[Exception](noPath.loadSources(spark))
    assert(e2.getMessage.contains("streaming-only"), e2.getMessage)
    // streaming without an http address names the missing option
    val noAddr = Topology.load(
      """
        |[sources.otel]
        |  type = "opentelemetry"
        |""".stripMargin)
    val e3 = intercept[Exception](noAddr.loadStreamingSources(spark))
    assert(e3.getMessage.contains("http"), e3.getMessage)
  }

  test("kafka source: batch refused as streaming-only; streaming names the missing jar") {
    val topo = Topology.load(
      """
        |[sources.k]
        |  type = "kafka"
        |  bootstrap_servers = "localhost:9092"
        |  topics = ["turns"]
        |""".stripMargin)
    val e1 = intercept[Exception](topo.loadSources(spark))
    assert(e1.getMessage.contains("streaming-only"))
    val e2 = intercept[Exception](topo.loadStreamingSources(spark))
    assert(e2.getMessage.toLowerCase.contains("kafka"), e2.getMessage)
    // config validation still catches missing options before any jar gate
    val e3 = intercept[Exception](Topology.load(
      """
        |[sources.k]
        |  type = "kafka"
        |  topics = ["t"]
        |""".stripMargin).loadStreamingSources(spark))
    assert(e3.getMessage.contains("bootstrap_servers"))
  }
}
