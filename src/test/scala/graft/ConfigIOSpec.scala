package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.config.Topology

/** Whole-config execution: `[sources.*]` -> `[transforms.*]` ->
  * `[sinks.*]` from ONE toml — the reference's `vector run` lifecycle
  * (config compile -> topology build -> run, SURVEY §3.1) collapsed to
  * a batch evaluation. Everything below runs from the CONFIG TEXT; no
  * Scala pipeline code.
  */
class ConfigIOSpec extends SparkSpec {
  import spark.implicits._

  test("sharedRoots: fan-out transforms are cached once, linear chains are not") {
    val fanout = Topology.load(
      """
        |[transforms.shape]
        |  inputs = ["events"]
        |  type = "remap"
        |  source = ".x = 1"
        |[transforms.split]
        |  inputs = ["shape"]
        |  type = "route"
        |  [transforms.split.route]
        |    errors = '.level == "error"'
        |[sinks.a]
        |  inputs = ["split.errors"]
        |  type = "parquet"
        |  path = "unused"
        |[sinks.b]
        |  inputs = ["split._unmatched"]
        |  type = "parquet"
        |  path = "unused"
        |""".stripMargin)
    // both sinks' port references count as uses of `split`'s primary
    // (every port frame is a filter over it); `shape` has one consumer
    assert(fanout.sharedRoots == Set("split"))
    val linear = Topology.load(
      """
        |[transforms.shape]
        |  inputs = ["events"]
        |  type = "remap"
        |  source = ".x = 1"
        |[sinks.out]
        |  inputs = ["shape"]
        |  type = "parquet"
        |  path = "unused"
        |""".stripMargin)
    assert(linear.sharedRoots.isEmpty)
    // exact duplicates cache the exact frame, any transform type
    val exactDup = Topology.load(
      """
        |[transforms.shape]
        |  inputs = ["events"]
        |  type = "remap"
        |  source = ".x = 1"
        |[sinks.a]
        |  inputs = ["shape"]
        |  type = "parquet"
        |  path = "unused"
        |[sinks.b]
        |  inputs = ["shape"]
        |  type = "parquet"
        |  path = "unused"
        |""".stripMargin)
    assert(exactDup.sharedRoots == Set("shape"))
    // remap primary + dropped do NOT qualify: the dropped branch
    // filters the transform's INPUT, so caching the primary would not
    // serve it — no false one-pass promise
    val remapDrop = Topology.load(
      """
        |[transforms.shape]
        |  inputs = ["events"]
        |  type = "remap"
        |  source = ".x = 1"
        |  reroute_dropped = true
        |[sinks.a]
        |  inputs = ["shape"]
        |  type = "parquet"
        |  path = "unused"
        |[sinks.b]
        |  inputs = ["shape.dropped"]
        |  type = "parquet"
        |  path = "unused"
        |""".stripMargin)
    assert(remapDrop.sharedRoots.isEmpty)
    // source names never cache (re-scan beats materializing raw input)
    val srcFan = Topology.load(
      """
        |[sinks.a]
        |  inputs = ["events"]
        |  type = "parquet"
        |  path = "unused"
        |[sinks.b]
        |  inputs = ["events"]
        |  type = "parquet"
        |  path = "unused"
        |""".stripMargin)
    assert(srcFan.sharedRoots.isEmpty)
  }

  test("graph verb: DOT and mermaid renderings carry shapes, edges and port labels") {
    // pure config — the reference's `vector graph` (src/graph.rs): no
    // session, no data touched
    val topo = Topology.loadFile("examples/pipeline.toml")
    val dot = topo.toDot
    assert(dot.startsWith("digraph {") && dot.endsWith("}"))
    assert(dot.contains("\"events\" [shape=\"trapezium\"]"))
    assert(dot.contains("\"shape\" [shape=\"diamond\"]"))
    assert(dot.contains("\"routed\" [shape=\"invtrapezium\"]"))
    assert(dot.contains("\"events\" -> \"shape\""))
    // a ported input edge gets the port as its label
    assert(dot.contains("\"split\" -> \"errors_jsonl\" [label=\"errors\"]"))
    val mm = topo.toMermaid
    assert(mm.startsWith("flowchart TD;"))
    assert(mm.contains("  events[/events/]"))
    assert(mm.contains("  shape{shape}"))
    assert(mm.contains("  routed[\\routed\\]"))
    assert(mm.contains("  split -->|errors| errors_jsonl"))
  }

  test("parquet source -> remap/route -> parquet sink with checkpoint + json-lines file sink") {
    val dir = Files.createTempDirectory("graft-configio")
    // a small typed input table
    Seq(
      ("c1", 0, "2024-01-01T00:00:00Z info tool=search latency_ms=12 msg=\"ok\""),
      ("c1", 1, "2024-01-01T00:00:01Z error tool=search latency_ms=900 msg=\"boom\""),
      ("c2", 0, "2024-01-01T00:00:02Z warn tool=code latency_ms=850 msg=\"slow\""),
      ("c2", 1, "not a log line at all"))
      .toDF("conv_id", "turn_idx", "text")
      .write.parquet(s"$dir/in")

    val topo = Topology.load(
      s"""
        |[sources.events]
        |  type = "parquet"
        |  path = "$dir/in"
        |[transforms.parse]
        |  inputs = ["events"]
        |  type = "remap"
        |  drop_on_error = true
        |  source = '''
        |    p = parse_grok!(.text, "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} tool=%{NOTSPACE:tool} latency_ms=%{INT:lat} msg=\\"%{DATA:msg}\\"")
        |    .level = string!(p.level)
        |    .lat = to_int!(p.lat)
        |  '''
        |[transforms.split]
        |  inputs = ["parse"]
        |  type = "route"
        |  [transforms.split.route]
        |    errors = '.level == "error"'
        |    slow = '.lat >= 800'
        |[sinks.routed]
        |  inputs = ["split"]
        |  type = "parquet"
        |  path = "$dir/out"
        |  partition_by = ["port"]
        |  [sinks.routed.checkpoint]
        |    manifest = "$dir/manifest"
        |[sinks.errors_jsonl]
        |  inputs = ["split.errors"]
        |  type = "file"
        |  path = "$dir/errors"
        |  [sinks.errors_jsonl.encoding]
        |    codec = "json"
        |""".stripMargin)

    val written = topo.execute(spark)
    // parse drops the non-matching line (3 kept); route multicasts:
    // error row -> errors AND slow (lat 900), warn row -> slow,
    // info row -> _unmatched => 4 routed rows
    assert(written("routed") == 4L)
    assert(written("errors_jsonl") == 1L)

    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 4)
    val byPort = out.groupBy("port").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byPort == Map("errors" -> 1L, "slow" -> 2L, "_unmatched" -> 1L))

    // checkpoint manifest: one row per port from parquet footers
    val manifest = spark.read.parquet(s"$dir/manifest")
    assert(manifest.select("port").collect().map(_.getString(0)).toSet ==
      Set("errors", "slow", "_unmatched"))
    assert(manifest.filter(col("n_rows").isNull).count() == 0)

    // json-lines sink: parseable objects carrying the remapped fields
    val lines = spark.read.text(s"$dir/errors").collect().map(_.getString(0))
    assert(lines.length == 1)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(lines.head)
    assert(node.get("level").asText() == "error")
    assert(node.get("lat").asLong() == 900L)
    assert(node.get("conv_id").asText() == "c1")

    // re-run against the SAME dirs: the manifest dir now holds two
    // appended batches, but rows-written must report THIS run's batch
    // (the data was partition-overwritten, not duplicated) — a dir-wide
    // job_id sum would say 8
    val written2 = topo.execute(spark)
    assert(written2("routed") == 4L, s"re-run double-counted: $written2")
    assert(spark.read.parquet(s"$dir/out").count() == 4)
    assert(spark.read.parquet(s"$dir/manifest").count() == 6) // 3 ports x 2 batches

    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("file source (bytes codec): lines arrive as message, remap parses downstream") {
    val dir = Files.createTempDirectory("graft-configio-file")
    Files.write(dir.resolve("app.log"),
      "a=1\nb=2\n".getBytes("UTF-8"))
    val topo = Topology.load(
      s"""
        |[sources.logs]
        |  type = "file"
        |  path = "$dir/app.log"
        |  [sources.logs.decoding]
        |    codec = "bytes"
        |[transforms.kv]
        |  inputs = ["logs"]
        |  type = "remap"
        |  source = '''
        |    .pair = parse_key_value!(.message)
        |  '''
        |[sinks.out]
        |  inputs = ["kv"]
        |  type = "file"
        |  path = "$dir/out"
        |""".stripMargin)
    val written = topo.execute(spark)
    assert(written("out") == 2L)
    val lines = spark.read.text(s"$dir/out").collect().map(_.getString(0)).sorted
    assert(lines.head.contains("\"a\":\"1\"") || lines.head.contains("\"a\": \"1\""))
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("file source decoding codecs: json / syslog / gelf decode at the source") {
    val dir = Files.createTempDirectory("graft-configio-codec")
    Files.write(dir.resolve("j.log"),
      "{\"user\":\"ada\",\"n\":3}\n{\"user\":\"bob\",\"n\":5}\n".getBytes("UTF-8"))
    Files.write(dir.resolve("s.log"),
      ("<34>1 2023-10-11T22:14:15.003Z host1 app 4321 ID47 " +
        "[x@1 k=\"v\"] boom\n").getBytes("UTF-8"))
    Files.write(dir.resolve("g.log"),
      ("{\"version\":\"1.1\",\"host\":\"h9\",\"short_message\":\"hello\"," +
        "\"timestamp\":1704067201.25,\"level\":3}\n").getBytes("UTF-8"))
    def load(codec: String, file: String) = Topology.load(
      s"""
        |[sources.logs]
        |  type = "file"
        |  path = "$dir/$file"
        |  [sources.logs.decoding]
        |    codec = "$codec"
        |""".stripMargin).loadSources(spark)("logs")

    val j = load("json", "j.log")
    assert(j.meta.types("user") == graft.config.VrlCompile.VStr)
    assert(j.df.select(sum(col("n"))).head.getLong(0) == 8L)

    val s = load("syslog", "s.log")
    val r = s.df.head
    assert(r.getAs[String]("hostname") == "host1")
    assert(r.getAs[String]("appname") == "app")
    assert(r.getAs[String]("severity") == "crit") // 34 % 8 = 2 -> crit
    assert(r.getAs[String]("facility") == "auth") // 34 / 8 = 4 -> auth
    assert(r.getAs[String]("message") == "boom")
    assert(r.getAs[Long]("version") == 1L)
    // structured data rides as a dynamic value keyed by SD-ID
    val sd = s.df.select(
      try_variant_get(col("structured_data"), "$['x@1'].k", "string")).head
    assert(sd.getString(0) == "v")

    val g = load("gelf", "g.log")
    val gr = g.df.head
    assert(gr.getAs[String]("host") == "h9")
    assert(gr.getAs[String]("message") == "hello")
    assert(gr.getAs[Long]("level") == 3L)
    assert(gr.getAs[java.sql.Timestamp]("timestamp").getTime == 1704067201250L)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("file source influxdb codec: line protocol becomes a typed metric frame") {
    val dir = Files.createTempDirectory("graft-configio-influx")
    Files.write(dir.resolve("m.log"),
      ("cpu,host=a,region=eu usage=0.5,idle=99i 1556813561098000000\n" +
        "mem value=3.25 1556813561098000000\n").getBytes("UTF-8"))
    val topo = Topology.load(
      s"""
        |[sources.metrics]
        |  type = "file"
        |  path = "$dir/m.log"
        |  [sources.metrics.decoding]
        |    codec = "influxdb"
        |""".stripMargin)
    val f = topo.loadSources(spark)("metrics")
    assert(f.metric)
    val rows = f.df.orderBy("name").collect()
    assert(rows.map(_.getAs[String]("name")).toSeq ==
      Seq("cpu_idle", "cpu_usage", "mem_value"))
    val byName = rows.map(r => r.getAs[String]("name") -> r).toMap
    assert(byName("cpu_usage").getAs[Double]("value") == 0.5)
    assert(byName("cpu_idle").getAs[Double]("value") == 99.0)
    assert(byName("cpu_usage").getAs[String]("tags") == "host=a,region=eu")
    assert(byName("mem_value").getAs[String]("tags") == "")
    assert(byName("mem_value").getAs[String]("kind") == "absolute")
    assert(byName("mem_value").getAs[java.sql.Timestamp]("ts").getTime ==
      1556813561098L)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("streaming file source with syslog codec: decoded fields flow to the sink") {
    val dir = Files.createTempDirectory("graft-configio-streamsyslog")
    Files.createDirectory(dir.resolve("in"))
    Files.write(dir.resolve("in/s.log"),
      "<34>1 2023-10-11T22:14:15.003Z host1 app 4321 ID47 - boom\n"
        .getBytes("UTF-8"))
    val topo = Topology.load(
      s"""
        |[sources.logs]
        |  type = "file"
        |  path = "$dir/in"
        |  [sources.logs.decoding]
        |    codec = "syslog"
        |[sinks.out]
        |  inputs = ["logs"]
        |  type = "parquet"
        |  path = "$dir/out"
        |""".stripMargin)
    val counts = topo.executeStreaming(spark, s"$dir/ckpt")
    assert(counts("out") == 1L)
    val r = spark.read.parquet(s"$dir/out").head
    assert(r.getAs[String]("hostname") == "host1")
    assert(r.getAs[String]("severity") == "crit")
    assert(r.getAs[String]("message") == "boom")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("streaming execute: same topology continuously; checkpoint resume processes only new files") {
    val dir = Files.createTempDirectory("graft-configstream")
    Seq(
      ("c1", 0, "2024-01-01T00:00:00Z info tool=search latency_ms=12 msg=\"ok\""),
      ("c1", 1, "2024-01-01T00:00:01Z error tool=search latency_ms=900 msg=\"boom\""),
      ("c2", 0, "2024-01-01T00:00:02Z warn tool=code latency_ms=850 msg=\"slow\""),
      ("c2", 1, "not a log line at all"))
      .toDF("conv_id", "turn_idx", "text")
      .write.parquet(s"$dir/in")

    val topo = Topology.load(
      s"""
        |[sources.events]
        |  type = "parquet"
        |  path = "$dir/in"
        |[transforms.parse]
        |  inputs = ["events"]
        |  type = "remap"
        |  drop_on_error = true
        |  source = '''
        |    p = parse_grok!(.text, "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} tool=%{NOTSPACE:tool} latency_ms=%{INT:lat} msg=\\"%{DATA:msg}\\"")
        |    .level = string!(p.level)
        |    .lat = to_int!(p.lat)
        |  '''
        |[transforms.split]
        |  inputs = ["parse"]
        |  type = "route"
        |  [transforms.split.route]
        |    errors = '.level == "error"'
        |    slow = '.lat >= 800'
        |[sinks.routed]
        |  inputs = ["split"]
        |  type = "parquet"
        |  path = "$dir/out"
        |  partition_by = ["port"]
        |[sinks.errors_jsonl]
        |  inputs = ["split.errors"]
        |  type = "file"
        |  path = "$dir/errors"
        |  [sinks.errors_jsonl.encoding]
        |    codec = "json"
        |""".stripMargin)

    // run 1: drains the 4 available raw rows per sink query (each sink
    // is its own source scan; the counts are SOURCE rows ingested)
    val run1 = topo.executeStreaming(spark, s"$dir/ckpt")
    assert(run1 == Map("routed" -> 4L, "errors_jsonl" -> 4L), s"run1: $run1")

    // output identical to the batch run of the same topology: parse
    // drops the garbage line, route multicasts error->errors+slow
    val byPort = spark.read.parquet(s"$dir/out").groupBy("port").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byPort == Map("errors" -> 1L, "slow" -> 2L, "_unmatched" -> 1L), s"ports: $byPort")
    assert(spark.read.text(s"$dir/errors").count() == 1)

    // run 2, nothing new: caught-up checkpoint processes zero rows
    val run2 = topo.executeStreaming(spark, s"$dir/ckpt")
    assert(run2.values.forall(_ == 0L), s"caught-up run reprocessed: $run2")

    // new file lands; run 3 processes ONLY it (resume-from-checkpoint)
    Seq(("c3", 0, "2024-01-01T00:00:03Z error tool=web latency_ms=950 msg=\"again\""))
      .toDF("conv_id", "turn_idx", "text")
      .write.mode("append").parquet(s"$dir/in")
    val run3 = topo.executeStreaming(spark, s"$dir/ckpt")
    assert(run3 == Map("routed" -> 1L, "errors_jsonl" -> 1L), s"run3: $run3")
    val byPort3 = spark.read.parquet(s"$dir/out").groupBy("port").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byPort3 == Map("errors" -> 2L, "slow" -> 3L, "_unmatched" -> 1L), s"ports: $byPort3")
    assert(spark.read.text(s"$dir/errors").count() == 2)

    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("streaming execute: log_to_metric streams (narrow metric transform); aggregate refuses") {
    val dir = Files.createTempDirectory("graft-configstream3")
    Seq(("200", 12.5, "2024-01-01T00:00:01"), ("500", 80.0, "2024-01-01T00:00:02"))
      .toDF("status", "duration", "ts_str")
      .select(col("status"), col("duration"), to_timestamp(col("ts_str")).as("timestamp"))
      .write.parquet(s"$dir/in")
    val l2m =
      s"""
        |[sources.ev]
        |  type = "parquet"
        |  path = "$dir/in"
        |[transforms.m]
        |  inputs = ["ev"]
        |  type = "log_to_metric"
        |  [[transforms.m.metrics]]
        |    type = "counter"
        |    field = "status"
        |    name = "status_total"
        |    [transforms.m.metrics.tags]
        |      status = "{{status}}"
        |""".stripMargin
    Topology.load(
      l2m +
      s"""
        |[sinks.out]
        |  inputs = ["m"]
        |  type = "parquet"
        |  path = "$dir/out"
        |""".stripMargin).executeStreaming(spark, s"$dir/ckpt")
    val metrics = spark.read.parquet(s"$dir/out")
      .select("name", "tags", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(metrics == Set(("status_total", "status=200", 1.0),
      ("status_total", "status=500", 1.0)), metrics.toString)

    // aggregate needs cross-batch windowed state -> refuses on a stream
    val ex = intercept[graft.config.VrlAst.VrlUnsupported] {
      Topology.load(
        l2m +
        s"""
          |[transforms.agg]
          |  inputs = ["m"]
          |  type = "aggregate"
          |[sinks.out]
          |  inputs = ["agg"]
          |  type = "parquet"
          |  path = "$dir/out2"
          |""".stripMargin).executeStreaming(spark, s"$dir/ckpt2")
    }
    assert(ex.getMessage.contains("streaming"), ex.getMessage)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("file sink codecs from config: logfmt, csv quoting, text, gelf, native_json per event type") {
    val dir = Files.createTempDirectory("graft-sinkcodecs")
    Seq(("h1", "has \"quote\", comma", "2024-01-01T00:00:01", "3"))
      .toDF("host", "message", "ts_str", "level")
      .select(col("host"), col("message"),
        to_timestamp(col("ts_str")).as("timestamp"), col("level"))
      .write.parquet(s"$dir/in")
    def topo(codec: String) = Topology.load(
      s"""
        |[sources.ev]
        |  type = "parquet"
        |  path = "$dir/in"
        |[sinks.out]
        |  inputs = ["ev"]
        |  type = "file"
        |  path = "$dir/$codec"
        |  [sinks.out.encoding]
        |    codec = "$codec"
        |""".stripMargin)
    def line(codec: String): String = {
      topo(codec).execute(spark)
      spark.read.text(s"$dir/$codec").head.getString(0)
    }
    assert(line("logfmt") == "host=h1 message=\"has \"quote\", comma\" " +
      "timestamp=\"2024-01-01 00:00:01\" level=3")
    assert(line("csv") == "h1,\"has \"\"quote\"\", comma\",2024-01-01 00:00:01,3")
    assert(line("text") == "has \"quote\", comma")
    assert(line("gelf") == """{"version":"1.1","host":"h1","short_message":"has \"quote\", comma","timestamp":1704067201,"level":3}""")
    val nj = line("native_json")
    assert(nj.startsWith("""{"log":{"""") && nj.contains("\"host\":\"h1\""), nj)

    // cef: device_* literals from [encoding.cef], severity/name/
    // extensions read event field paths (encoding/format/cef.rs)
    Topology.load(
      s"""
        |[sources.ev]
        |  type = "parquet"
        |  path = "$dir/in"
        |[sinks.out]
        |  inputs = ["ev"]
        |  type = "file"
        |  path = "$dir/cef"
        |  [sinks.out.encoding]
        |    codec = "cef"
        |    [sinks.out.encoding.cef]
        |      device_vendor = "Graft"
        |      device_product = "Pipeline"
        |      device_version = "1.0"
        |      device_event_class_id = "e100"
        |      severity = "level"
        |      name = "message"
        |      [sinks.out.encoding.cef.extensions]
        |        shost = "host"
        |""".stripMargin).execute(spark)
    val cefLine = spark.read.text(s"$dir/cef").head.getString(0)
    assert(cefLine ==
      "CEF:0|Graft|Pipeline|1.0|e100|has \"quote\", comma|3|shost=h1", cefLine)

    // escaping + encode-failure drop: '|' in the name escapes to '\|',
    // '=' in an extension value to '\=' (cef.rs escape_header/
    // escape_extension); a severity outside 0-10 drops the event
    // instead of writing a blank line
    Seq(("a|b", "x=y", "3"), ("fine", "v", "11"))
      .toDF("message", "extv", "level")
      .write.parquet(s"$dir/in2")
    Topology.load(
      s"""
        |[sources.ev]
        |  type = "parquet"
        |  path = "$dir/in2"
        |[sinks.out]
        |  inputs = ["ev"]
        |  type = "file"
        |  path = "$dir/cef2"
        |  [sinks.out.encoding]
        |    codec = "cef"
        |    [sinks.out.encoding.cef]
        |      device_vendor = "Graft"
        |      device_product = "Pipeline"
        |      device_version = "1.0"
        |      device_event_class_id = "e100"
        |      severity = "level"
        |      name = "message"
        |      [sinks.out.encoding.cef.extensions]
        |        kv = "extv"
        |""".stripMargin).execute(spark)
    val cef2 = spark.read.text(s"$dir/cef2").collect().map(_.getString(0))
    assert(cef2.toSeq ==
      Seq("CEF:0|Graft|Pipeline|1.0|e100|a\\|b|3|kv=x\\=y"), cef2.toSeq)

    // native_json on a METRIC frame takes the metric arm
    val mTopo = Topology.load(
      s"""
        |[sources.ev]
        |  type = "parquet"
        |  path = "$dir/in"
        |[transforms.m]
        |  inputs = ["ev"]
        |  type = "log_to_metric"
        |  [[transforms.m.metrics]]
        |    type = "counter"
        |    field = "host"
        |    name = "hits"
        |[sinks.out]
        |  inputs = ["m"]
        |  type = "file"
        |  path = "$dir/native_metric"
        |  [sinks.out.encoding]
        |    codec = "native_json"
        |""".stripMargin)
    mTopo.execute(spark)
    val mj = spark.read.text(s"$dir/native_metric").head.getString(0)
    assert(mj.startsWith("""{"metric":{"name":"hits","kind":"incremental"""), mj)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("demo_logs source: deterministic fake lines that parse with the matching parsers") {
    val topo = Topology.load(
      """
        |[sources.gen]
        |  type = "demo_logs"
        |  format = "apache_common"
        |  count = 200
        |[transforms.parse]
        |  inputs = ["gen"]
        |  type = "remap"
        |  drop_on_error = true
        |  source = '''
        |    p = parse_apache_log!(.message, "common")
        |    .status = to_int!(string!(p.status))
        |  '''
        |""".stripMargin)
    val out = topo.run(topo.loadSources(spark))("parse").df
    assert(out.count() == 200, "every generated apache_common line must parse")
    val statuses = out.select("status").distinct().collect().map(_.getLong(0)).toSet
    assert(statuses.subsetOf(Set(200L, 301L, 404L, 500L)), statuses.toString)

    // same config -> same table (hash-of-index picks, no RNG)
    def lines(t: Topology) = t.loadSources(spark)("gen").df
      .orderBy(Topology.SeqCol).select("message").collect().map(_.getString(0)).toSeq
    assert(lines(topo) == lines(topo))

    // shuffle format: lines required, sequence prefixes the index
    val sh = Topology.load(
      """
        |[sources.gen]
        |  type = "demo_logs"
        |  format = "shuffle"
        |  sequence = true
        |  count = 3
        |  lines = ["alpha", "beta"]
        |""".stripMargin).loadSources(spark)("gen").df
      .orderBy(Topology.SeqCol).select("message").collect().map(_.getString(0)).toSeq
    assert(sh.zipWithIndex.forall { case (l, i) => l.startsWith(s"$i ") }, sh.toString)
    assert(sh.forall(l => l.endsWith("alpha") || l.endsWith("beta")), sh.toString)

    val noLines = intercept[IllegalArgumentException] {
      Topology.load(
        """
          |[sources.gen]
          |  type = "demo_logs"
          |  format = "shuffle"
          |""".stripMargin).loadSources(spark)
    }
    assert(noLines.getMessage.contains("lines"))
  }

  test("validate dry-runs sinks: bad partition_by and missing codec fields surface without writing") {
    val dir = Files.createTempDirectory("graft-validate")
    Seq(("a", 1L)).toDF("k", "n").write.parquet(s"$dir/in")
    def topoFor(sinkBody: String) = Topology.load(
      s"""
        |[sources.ev]
        |  type = "parquet"
        |  path = "$dir/in"
        |[sinks.out]
        |  inputs = ["ev"]
        |$sinkBody
        |""".stripMargin)
    val badPart = topoFor(
      s"""  type = "parquet"
        |  path = "$dir/out"
        |  partition_by = ["nope"]""".stripMargin)
    val e1 = intercept[IllegalArgumentException] {
      badPart.dryRunSinks(badPart.loadSources(spark))
    }
    assert(e1.getMessage.contains("partition_by column 'nope'"), e1.getMessage)
    assert(!new java.io.File(s"$dir/out").exists, "dry run must not write")

    val badGelf = topoFor(
      s"""  type = "file"
        |  path = "$dir/out2"
        |  [sinks.out.encoding]
        |    codec = "gelf"""".stripMargin)
    val e2 = intercept[IllegalArgumentException] {
      badGelf.dryRunSinks(badGelf.loadSources(spark))
    }
    assert(e2.getMessage.contains("needs"), e2.getMessage)

    val ok = topoFor(
      s"""  type = "parquet"
        |  path = "$dir/out3"
        |  partition_by = ["k"]""".stripMargin)
    assert(ok.dryRunSinks(ok.loadSources(spark)) == 1)
    assert(!new java.io.File(s"$dir/out3").exists, "dry run must not write")
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("console sink prints encoded lines to the chosen target and reports the count") {
    val dir = Files.createTempDirectory("graft-consolesink")
    Seq(("a", 1L), ("b", 2L)).toDF("k", "n").write.parquet(s"$dir/in")
    val topo = Topology.load(
      s"""
        |[sources.ev]
        |  type = "parquet"
        |  path = "$dir/in"
        |[sinks.out]
        |  inputs = ["ev"]
        |  type = "console"
        |  target = "stdout"
        |  [sinks.out.encoding]
        |    codec = "logfmt"
        |""".stripMargin)
    val baos = new java.io.ByteArrayOutputStream()
    val prev = System.out
    System.setOut(new java.io.PrintStream(baos, true, "UTF-8"))
    val counts = try topo.execute(spark) finally System.setOut(prev)
    assert(counts == Map("out" -> 2L), counts.toString)
    val lines = new String(baos.toByteArray, "UTF-8").trim.split("\n").sorted.toSeq
    assert(lines == Seq("k=a n=1", "k=b n=2"), lines.toString)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("streaming execute: watermarked aggregate flushes closed windows and resumes from checkpoint") {
    val dir = Files.createTempDirectory("graft-configstream4")
    def write(rows: Seq[(String, Double, String)], mode: String): Unit =
      rows.toDF("status", "duration", "ts_str")
        .select(col("status"), col("duration"), to_timestamp(col("ts_str")).as("timestamp"))
        .write.mode(mode).parquet(s"$dir/in")
    // window [0,10): two events; window [10,20): one event that pushes
    // the watermark past the first window's end
    write(Seq(("200", 12.5, "2024-01-01T00:00:01"),
      ("200", 3.0, "2024-01-01T00:00:02"),
      ("500", 9.0, "2024-01-01T00:00:11")), "overwrite")
    val topo = Topology.load(
      s"""
        |[sources.ev]
        |  type = "parquet"
        |  path = "$dir/in"
        |[transforms.m]
        |  inputs = ["ev"]
        |  type = "log_to_metric"
        |  [[transforms.m.metrics]]
        |    type = "counter"
        |    field = "status"
        |    name = "hits"
        |[transforms.agg]
        |  inputs = ["m"]
        |  type = "aggregate"
        |  interval_ms = 10000
        |  mode = "sum"
        |  watermark = "0 seconds"
        |[sinks.out]
        |  inputs = ["agg"]
        |  type = "parquet"
        |  path = "$dir/out"
        |""".stripMargin)
    topo.executeStreaming(spark, s"$dir/ckpt")
    def flushed(): Set[(Long, Double)] = spark.read.parquet(s"$dir/out")
      .select(unix_timestamp(col("ts")), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    // only the CLOSED window flushed (append mode): [0,10) with 2 hits
    assert(flushed() == Set((1704067200L, 2.0)), flushed().toString)

    // a later event lands -> re-run advances the checkpointed watermark
    // past [10,20), flushing its 1-hit row
    write(Seq(("200", 1.0, "2024-01-01T00:00:25")), "append")
    topo.executeStreaming(spark, s"$dir/ckpt")
    assert(flushed() == Set((1704067200L, 2.0), (1704067210L, 1.0)), flushed().toString)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("file source multiline: stack traces merge per the reference state machine") {
    val dir = Files.createTempDirectory("graft-multiline")
    Files.write(java.nio.file.Paths.get(s"$dir/app.log"),
      ("ERROR boom\n  at a\n  at b\nINFO fine\n" +
        "ERROR again\n  at c\n").getBytes("UTF-8"))
    val toml =
      s"""
        |[sources.logs]
        |  type = "file"
        |  path = "$dir/app.log"
        |  [sources.logs.multiline]
        |    start_pattern = "^[^\\\\s]"
        |    condition_pattern = "^[\\\\s]+"
        |    mode = "continue_through"
        |    timeout_ms = 1000
        |[transforms.keep]
        |  inputs = ["logs"]
        |  type = "filter"
        |  condition = 'starts_with(.message, "ERROR")'
        |[sinks.out]
        |  inputs = ["keep"]
        |  type = "parquet"
        |  path = "$dir/out"
        |""".stripMargin
    val written = Topology.load(toml).execute(spark)
    assert(written("out") == 2L)
    val msgs = spark.read.parquet(s"$dir/out").select("message")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(msgs == Seq("ERROR again\n  at c", "ERROR boom\n  at a\n  at b"), msgs)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("file source multiline: CRLF strips like the line reader; trailing blank line survives") {
    val dir = Files.createTempDirectory("graft-multiline-crlf")
    // CRLF line endings AND a final blank line: \r must not leak into
    // merged messages (the plain line reader strips it), and the blank
    // line before EOF is a real line-event — Java-regex "\n$" would
    // eat it ($ also matches before a final terminator; \z does not).
    Files.write(java.nio.file.Paths.get(s"$dir/app.log"),
      "ERROR boom\r\n  at a\r\nINFO ok\r\n\r\n".getBytes("UTF-8"))
    val toml =
      s"""
        |[sources.logs]
        |  type = "file"
        |  path = "$dir/app.log"
        |  [sources.logs.multiline]
        |    start_pattern = "^[^\\\\s]"
        |    condition_pattern = "^[\\\\s]+"
        |    mode = "continue_through"
        |    timeout_ms = 1000
        |[sinks.out]
        |  inputs = ["logs"]
        |  type = "parquet"
        |  path = "$dir/out"
        |""".stripMargin
    Topology.load(toml).execute(spark)
    val msgs = spark.read.parquet(s"$dir/out").select("message")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(msgs == Seq("", "ERROR boom\n  at a", "INFO ok"), msgs)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("dedupe [time_settings] from config: duplicates readmitted after max_age_ms") {
    val dir = Files.createTempDirectory("graft-dedupe-timed")
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // same key at t=0 (kept), t=500 (dropped: age < 1000), t=1600 (kept:
    // ages against the LAST KEPT entry, refresh_on_drop defaults false)
    Seq(("k", ts(0L), "a"), ("k", ts(500L), "b"), ("k", ts(1600L), "c"),
        ("other", ts(100L), "d"))
      .toDF("key", "timestamp", "tag").write.parquet(s"$dir/in")
    val toml =
      s"""
        |[sources.ev]
        |  type = "parquet"
        |  path = "$dir/in"
        |[transforms.d]
        |  inputs = ["ev"]
        |  type = "dedupe"
        |  [transforms.d.fields]
        |    match = ["key"]
        |  [transforms.d.time_settings]
        |    max_age_ms = 1000
        |[sinks.out]
        |  inputs = ["d"]
        |  type = "parquet"
        |  path = "$dir/out"
        |""".stripMargin
    Topology.load(toml).execute(spark)
    val tags = spark.read.parquet(s"$dir/out").select("tag")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(tags == Seq("a", "c", "d"), tags)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("streaming execute: throttle is a cross-batch token bucket; exclude bypasses quota") {
    val dir = Files.createTempDirectory("graft-configthrottle")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:01")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:02")
    Seq(("a", t0, false), ("a", t1, false), ("a", t1, true))
      .toDF("k", "timestamp", "vip").write.parquet(s"$dir/in")
    val toml =
      s"""
        |[sources.ev]
        |  type = "parquet"
        |  path = "$dir/in"
        |[transforms.t]
        |  inputs = ["ev"]
        |  type = "throttle"
        |  threshold = 1
        |  window_secs = 60
        |  key_field = "k"
        |  exclude = ".vip == true"
        |[sinks.out]
        |  inputs = ["t"]
        |  type = "parquet"
        |  path = "$dir/out"
        |""".stripMargin
    Topology.load(toml).executeStreaming(spark, s"$dir/ckpt")
    val out1 = spark.read.parquet(s"$dir/out")
    // threshold 1: one event passes the bucket; the vip row bypasses
    // without consuming quota
    assert(out1.count() == 2, s"first run kept ${out1.count()}")
    assert(out1.filter(col("vip") === true).count() == 1)
    // a later file landing in the SAME window finds the quota already
    // consumed — cross-batch state survives via the checkpoint
    Seq(("a", t1, false)).toDF("k", "timestamp", "vip")
      .write.mode("append").parquet(s"$dir/in")
    Topology.load(toml).executeStreaming(spark, s"$dir/ckpt")
    assert(spark.read.parquet(s"$dir/out").count() == 2, "quota must persist across runs")
    // a different key gets its own bucket
    Seq(("b", t1, false)).toDF("k", "timestamp", "vip")
      .write.mode("append").parquet(s"$dir/in")
    Topology.load(toml).executeStreaming(spark, s"$dir/ckpt")
    assert(spark.read.parquet(s"$dir/out").count() == 3)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("streaming execute: order-dependent transforms refuse loudly; dedupe streams first-wins") {
    val dir = Files.createTempDirectory("graft-configstream2")
    Seq(("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("k", "v").write.parquet(s"$dir/in")

    // sample depends on a global arrival order: must refuse on a stream
    val bad = Topology.load(
      s"""
        |[sources.ev]
        |  type = "parquet"
        |  path = "$dir/in"
        |[transforms.s]
        |  inputs = ["ev"]
        |  type = "sample"
        |  rate = 2
        |[sinks.out]
        |  inputs = ["s"]
        |  type = "parquet"
        |  path = "$dir/bad"
        |""".stripMargin)
    val ex = intercept[graft.config.VrlAst.VrlUnsupported] {
      bad.executeStreaming(spark, s"$dir/badckpt")
    }
    assert(ex.getMessage.contains("streaming"), ex.getMessage)

    // dedupe maps to arrival-order dropDuplicates on the match keys
    val dd = Topology.load(
      s"""
        |[sources.ev]
        |  type = "parquet"
        |  path = "$dir/in"
        |[transforms.d]
        |  inputs = ["ev"]
        |  type = "dedupe"
        |  [transforms.d.fields]
        |    match = [".k"]
        |[sinks.out]
        |  inputs = ["d"]
        |  type = "parquet"
        |  path = "$dir/out"
        |""".stripMargin)
    dd.executeStreaming(spark, s"$dir/ckpt")
    val ks = spark.read.parquet(s"$dir/out").select("k")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(ks == Seq("a", "b"), s"dedupe kept: $ks")

    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("exec source: command output decodes, exec metadata is stamped") {
    val topo = Topology.load(
      """
        |[sources.cmd]
        |  type = "exec"
        |  mode = "scheduled"
        |  command = ["/bin/sh", "-c", "echo a=1; echo a=2; echo oops >&2"]
        |""".stripMargin)
    val frame = topo.loadSources(spark)("cmd")
    val rows = frame.df.select("message", "stream", "pid", "host")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.sorted.toSeq ==
      Seq(("a=1", "stdout"), ("a=2", "stdout"), ("oops", "stderr")))
    val meta = frame.df.select("pid", "host", "command").head()
    assert(meta.getLong(0) > 0L)
    assert(meta.getString(1).nonEmpty)
    assert(meta.getSeq[String](2) == Seq("/bin/sh", "-c",
      "echo a=1; echo a=2; echo oops >&2"))

    // json codec: decoded fields become typed columns, stamps ride along
    val jtopo = Topology.load(
      """
        |[sources.cmd]
        |  type = "exec"
        |  command = ["/bin/sh", "-c", "echo '{\"user\":\"ada\",\"n\":3}'"]
        |  include_stderr = false
        |  [sources.cmd.decoding]
        |    codec = "json"
        |""".stripMargin)
    val j = jtopo.loadSources(spark)("cmd").df
      .select("user", "n", "stream").head()
    assert(j.getString(0) == "ada" && j.getLong(1) == 3L &&
      j.getString(2) == "stdout")

    // environment + clear_environment reach the child process
    val etopo = Topology.load(
      """
        |[sources.cmd]
        |  type = "exec"
        |  command = ["/bin/sh", "-c", "echo $$GRAFT_EXEC_T"]
        |  include_stderr = false
        |  [sources.cmd.environment]
        |    GRAFT_EXEC_T = "from-config"
        |""".stripMargin)
    assert(etopo.loadSources(spark)("cmd").df.select("message").head()
      .getString(0) == "from-config")

    // refusals: streaming mode; structured codec with stderr enabled
    val e1 = intercept[Exception](Topology.load(
      """
        |[sources.cmd]
        |  type = "exec"
        |  mode = "streaming"
        |  command = ["cat"]
        |""".stripMargin).loadSources(spark))
    assert(e1.getMessage.contains("streaming"))
    val e2 = intercept[Exception](Topology.load(
      """
        |[sources.cmd]
        |  type = "exec"
        |  command = ["echo", "{}"]
        |  [sources.cmd.decoding]
        |    codec = "json"
        |""".stripMargin).loadSources(spark))
    assert(e2.getMessage.contains("include_stderr"))
  }

  test("static_metrics source: configured metrics become a metric frame") {
    val topo = Topology.load(
      """
        |[sources.sm]
        |  type = "static_metrics"
        |  namespace = "infra"
        |  [[sources.sm.metrics]]
        |    name = "capacity"
        |    kind = "absolute"
        |    [sources.sm.metrics.value.gauge]
        |      value = 7.5
        |    [sources.sm.metrics.tags]
        |      zone = "b"
        |      app = "db"
        |  [[sources.sm.metrics]]
        |    name = "restarts"
        |    kind = "incremental"
        |    [sources.sm.metrics.value.counter]
        |      value = 1.0
        |""".stripMargin)
    val frame = topo.loadSources(spark)("sm")
    assert(frame.metric, "static_metrics must produce a metric frame")
    val rows = frame.df
      .select("name", "namespace", "tags", "kind", "value_type", "value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getDouble(5))).sortBy(_._1).toSeq
    assert(rows == Seq(
      ("capacity", "infra", "app=db,zone=b", "absolute", "gauge", 7.5),
      ("restarts", "infra", "", "incremental", "counter", 1.0)))
    // set/distribution arms refuse rather than coerce
    val e = intercept[Exception](Topology.load(
      """
        |[sources.sm]
        |  type = "static_metrics"
        |  [[sources.sm.metrics]]
        |    name = "users"
        |    kind = "absolute"
        |    [sources.sm.metrics.value.set]
        |      values = ["a", "b"]
        |""".stripMargin).loadSources(spark))
    assert(e.getMessage.contains("counter|gauge"))
  }

  test("http_client source: scrapes an endpoint, query/headers applied, decodes") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var seenQuery: String = null
    @volatile var seenHeader: String = null
    server.createContext("/logs", (ex: com.sun.net.httpserver.HttpExchange) => {
      seenQuery = ex.getRequestURI.getQuery
      seenHeader = ex.getRequestHeaders.getFirst("X-Scrape")
      val body = "{\"user\":\"ada\",\"n\":3}\n{\"user\":\"bob\",\"n\":5}\n"
        .getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.createContext("/boom", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(500, -1); ex.close()
    })
    server.start()
    val port = server.getAddress.getPort
    try {
      val topo = Topology.load(
        s"""
          |[sources.scrape]
          |  type = "http_client"
          |  endpoint = "http://127.0.0.1:$port/logs"
          |  [sources.scrape.query]
          |    since = ["0"]
          |    tag = ["a", "b"]
          |  [sources.scrape.headers]
          |    X-Scrape = ["graft"]
          |  [sources.scrape.decoding]
          |    codec = "json"
          |""".stripMargin)
      val rows = topo.loadSources(spark)("scrape").df
        .select("user", "n").collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(rows == Seq(("ada", 3L), ("bob", 5L)))
      assert(seenQuery == "since=0&tag=a&tag=b")
      assert(seenHeader == "graft")

      // non-2xx fails the load loudly
      val e = intercept[Exception](Topology.load(
        s"""
          |[sources.scrape]
          |  type = "http_client"
          |  endpoint = "http://127.0.0.1:$port/boom"
          |""".stripMargin).loadSources(spark))
      assert(e.getMessage.contains("HTTP 500"))

      // auth refused; streaming refused
      val e2 = intercept[Exception](Topology.load(
        s"""
          |[sources.scrape]
          |  type = "http_client"
          |  endpoint = "http://127.0.0.1:$port/logs"
          |  [sources.scrape.auth]
          |    user = "u"
          |""".stripMargin).loadSources(spark))
      assert(e2.getMessage.contains("auth"))
      val e3 = intercept[Exception](Topology.load(
        s"""
          |[sources.scrape]
          |  type = "http_client"
          |  endpoint = "http://127.0.0.1:$port/logs"
          |[sinks.out]
          |  inputs = ["scrape"]
          |  type = "blackhole"
          |""".stripMargin).executeStreaming(spark,
          Files.createTempDirectory("graft-hc-ckpt").toString))
      assert(e3.getMessage.contains("batch-only"))
    } finally server.stop(0)
  }

  test("host_metrics source: /proc collectors produce the reference shape") {
    val topo = Topology.load(
      """
        |[sources.hm]
        |  type = "host_metrics"
        |  collectors = ["cpu", "memory", "load", "host"]
        |""".stripMargin)
    val frame = topo.loadSources(spark)("hm")
    assert(frame.metric)
    val rows = frame.df
      .select("name", "namespace", "tags", "kind", "value_type", "value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 == "host"), "namespace defaults to host")
    assert(rows.forall(_._4 == "absolute"), "every host metric is absolute")
    assert(rows.forall(r => r._3.contains("collector=") && r._3.contains("host=")),
      "collector and host tags stamped on every metric")
    val byName = rows.groupBy(_._1)
    // cpu: counters tagged with the reference's five Linux modes + index
    val cpu = byName("cpu_seconds_total")
    assert(cpu.forall(_._5 == "counter"))
    val modes = cpu.flatMap(_._3.split(",").find(_.startsWith("mode="))).toSet
    assert(modes == Set("mode=idle", "mode=io_wait", "mode=nice",
      "mode=system", "mode=user"))
    assert(cpu.forall(_._3.contains("cpu=")))
    assert(byName("logical_cpus").head._6 > 0)
    // memory/load/host gauges present and sane
    assert(byName("memory_total_bytes").head._6 > 0)
    assert(byName("memory_used_bytes").head._6 > 0)
    assert(byName("load1").head._5 == "gauge")
    assert(byName("uptime").head._6 > 0)
    // filesystem collector: per-mount gauges with the reference's tags
    val fs = Topology.load(
      """
        |[sources.hm]
        |  type = "host_metrics"
        |  collectors = ["filesystem"]
        |""".stripMargin).loadSources(spark)("hm").df
      .select("name", "tags", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(fs.exists(_._1 == "filesystem_total_bytes"))
    assert(fs.filter(_._1 == "filesystem_total_bytes").forall(_._3 > 0))
    assert(fs.forall(r => r._2.contains("mountpoint=") &&
      r._2.contains("filesystem=") && r._2.contains("device=")))
    assert(fs.filter(_._1 == "filesystem_used_ratio")
      .forall(r => r._3 >= 0.0 && r._3 <= 1.0))

    // network + disk: per-device counters
    val nd = Topology.load(
      """
        |[sources.hm]
        |  type = "host_metrics"
        |  collectors = ["network", "disk"]
        |""".stripMargin).loadSources(spark)("hm").df
      .select("name", "tags", "value_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(nd.exists(_._1 == "network_receive_bytes_total"))
    assert(nd.exists(_._1 == "disk_read_bytes_total"))
    assert(nd.forall(_._3 == "counter"))
    assert(nd.forall(_._2.contains("device=")))

    // process collector: this JVM must match the 'java' include glob
    val pm = Topology.load(
      """
        |[sources.hm]
        |  type = "host_metrics"
        |  collectors = ["process"]
        |  [sources.hm.process]
        |    includes = ["java*"]
        |""".stripMargin).loadSources(spark)("hm").df
      .select("name", "tags", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(pm.exists(_._1 == "process_memory_usage"))
    assert(pm.forall(r => r._2.contains("pid=") && r._2.contains("name=")))
    assert(pm.filter(_._1 == "process_memory_usage").forall(_._3 > 0))
    assert(pm.filter(_._1 == "process_runtime").forall(_._3 >= 0))
    val names = pm.flatMap(_._2.split(",").find(_.startsWith("name="))).toSet
    assert(names.forall(_.startsWith("name=java")), names.toString)

    // cgroups: hierarchy walk with cgroup + collector tags; counters
    // in seconds (usec * 1e-6 can never exceed raw machine uptime)
    val cg = Topology.load(
      """
        |[sources.hm]
        |  type = "host_metrics"
        |  collectors = ["cgroups"]
        |""".stripMargin).loadSources(spark)("hm").df
      .select("name", "tags", "value_type", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
    if (cg.nonEmpty) { // absent cgroup mount → empty scrape, like the reference's None root
      assert(cg.forall(_._2.contains("cgroup=")))
      assert(cg.forall(_._2.contains("collector=cgroups")))
      val cgNames = cg.map(_._1).toSet
      assert(cgNames.exists(_.startsWith("cgroup_cpu_")) ||
        cgNames.exists(_.startsWith("cgroup_memory_")), cgNames.toString)
      assert(cg.filter(_._1.startsWith("cgroup_cpu_")).forall(_._3 == "counter"))
      assert(cg.filter(_._1.startsWith("cgroup_memory_")).forall(_._3 == "gauge"))
      assert(cg.forall(_._4 >= 0.0))
    }

    // tcp: per-state connection gauges + queued-bytes totals; this JVM
    // always has at least one socket state visible in /proc/net/tcp
    val tcp = Topology.load(
      """
        |[sources.hm]
        |  type = "host_metrics"
        |  collectors = ["tcp"]
        |""".stripMargin).loadSources(spark)("hm").df
      .select("name", "tags", "value_type", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
    val tcpStates = Set("established", "syn_sent", "syn_recv", "fin_wait1",
      "fin_wait2", "time_wait", "close", "close_wait", "last_ack",
      "listen", "closing")
    val conns = tcp.filter(_._1 == "tcp_connections_total")
    assert(conns.nonEmpty)
    assert(conns.forall(_._3 == "gauge"))
    assert(conns.flatMap(_._2.split(",").find(_.startsWith("state=")))
      .forall(s => tcpStates.contains(s.stripPrefix("state="))))
    assert(conns.forall(_._4 > 0)) // only observed states are emitted
    assert(tcp.count(_._1 == "tcp_tx_queued_bytes_total") == 1)
    assert(tcp.count(_._1 == "tcp_rx_queued_bytes_total") == 1)

    // unknown collector names still refuse loudly
    val e = intercept[Exception](Topology.load(
      """
        |[sources.hm]
        |  type = "host_metrics"
        |  collectors = ["gpu"]
        |""".stripMargin).loadSources(spark))
    assert(e.getMessage.contains("gpu"))
  }

  test("dynamic-root events reach sinks intact; column codecs refuse") {
    val dir = Files.createTempDirectory("graft-configio-root")
    Files.write(dir.resolve("in.txt"),
      "{\"k\": 5, \"s\": \"x\"}\n{\"k\": 7}\n".getBytes("UTF-8"))
    def topo(codec: String) = Topology.load(
      s"""
        |[sources.ev]
        |  type = "file"
        |  path = "$dir/in.txt"
        |[transforms.p]
        |  inputs = ["ev"]
        |  type = "remap"
        |  source = '. = parse_json!(.message)'
        |[sinks.out]
        |  inputs = ["p"]
        |  type = "file"
        |  path = "$dir/out"
        |  [sinks.out.encoding]
        |    codec = "$codec"
        |""".stripMargin)
    assert(topo("json").execute(spark)("out") == 2L)
    val lines = spark.read.text(s"$dir/out").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(lines == Seq("{\"k\":5,\"s\":\"x\"}", "{\"k\":7}"), lines.toString)
    // a column-shaped codec has nothing static to encode — loud refusal,
    // never silent empty lines
    val e = intercept[Exception](topo("logfmt").execute(spark))
    assert(e.getMessage.contains("dynamic-root"))
    // the vrl one-shot verb renders the root value too
    val (outs, _) = graft.config.VrlRunner.eval(spark,
      ". = parse_json!(.message)",
      Seq("{\"message\": \"{\\\"a\\\": 1}\"}"))
    assert(outs == Seq("{\"a\":1}"), outs.toString)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("blackhole sink: consumes, counts, and reports") {
    val dir = Files.createTempDirectory("graft-configio-bh")
    spark.range(5).select(col("id").cast("string").as("k"))
      .write.parquet(s"$dir/in")
    val topo = Topology.load(
      s"""
        |[sources.ev]
        |  type = "parquet"
        |  path = "$dir/in"
        |[transforms.keep]
        |  inputs = ["ev"]
        |  type = "filter"
        |  condition = '.k != "3"'
        |[sinks.devnull]
        |  inputs = ["keep"]
        |  type = "blackhole"
        |  print_interval_secs = 1
        |""".stripMargin)
    val written = topo.execute(spark)
    assert(written("devnull") == 4L)
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }
}
