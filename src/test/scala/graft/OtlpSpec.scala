package graft

import org.apache.spark.sql.functions._

import graft.functions.{OtlpCodec, ProtoWire}
import graft.functions.ProtoWire.Writer

/** OTLP decode pinned against the reference's own inline test frames
  * (lib/codecs/src/decoding/format/otlp.rs:227-315) — the three
  * Export*ServiceRequest payloads it constructs with prost, re-built
  * here byte-for-byte with the wire writer, plus its signal-priority
  * and invalid-data contracts (otlp.rs:383-438).
  */
class OtlpSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def utf8(s: String) = s.getBytes("UTF-8")

  // otlp.rs:220-225
  private val TraceId = Array.tabulate[Byte](16)(i => (i + 1).toByte)
  private val SpanId = Array.tabulate[Byte](8)(i => (i + 1).toByte)

  /** create_logs_request_bytes (otlp.rs:227-255): one empty-resource
    * ResourceLogs with one LogRecord{time=1234567890, severity=9 INFO}.
    */
  private def logsFrame: Array[Byte] = {
    val rec = new Writer
    rec.writeTag(1, 1).writeFixed64(1234567890L)
    rec.writeTag(2, 0).writeVarint(9L)
    rec.writeLenDelim(3, utf8("INFO"))
    val scopeLogs = new Writer
    scopeLogs.writeLenDelim(2, rec.toBytes)
    val resourceLogs = new Writer
    resourceLogs.writeLenDelim(1, Array.empty[Byte]) // Resource{} (defaults)
    resourceLogs.writeLenDelim(2, scopeLogs.toBytes)
    new Writer().writeLenDelim(1, resourceLogs.toBytes).toBytes
  }

  /** create_metrics_request_bytes (otlp.rs:257-281): one metric named
    * test_metric with no data arm.
    */
  private def metricsFrame: Array[Byte] = {
    val metric = new Writer
    metric.writeLenDelim(1, utf8("test_metric"))
    val scopeMetrics = new Writer
    scopeMetrics.writeLenDelim(2, metric.toBytes)
    val resourceMetrics = new Writer
    resourceMetrics.writeLenDelim(1, Array.empty[Byte])
    resourceMetrics.writeLenDelim(2, scopeMetrics.toBytes)
    new Writer().writeLenDelim(1, resourceMetrics.toBytes).toBytes
  }

  /** create_traces_request_bytes (otlp.rs:283-315): one span test_span
    * with the fixed trace/span ids and start/end times.
    */
  private def tracesFrame: Array[Byte] = {
    val span = new Writer
    span.writeLenDelim(1, TraceId)
    span.writeLenDelim(2, SpanId)
    span.writeLenDelim(5, utf8("test_span"))
    span.writeTag(7, 1).writeFixed64(1234567890L)
    span.writeTag(8, 1).writeFixed64(1234567900L)
    val scopeSpans = new Writer
    scopeSpans.writeLenDelim(2, span.toBytes)
    val resourceSpans = new Writer
    resourceSpans.writeLenDelim(1, Array.empty[Byte])
    resourceSpans.writeLenDelim(2, scopeSpans.toBytes)
    new Writer().writeLenDelim(1, resourceSpans.toBytes).toBytes
  }

  test("deserialize_otlp_logs: one event carrying resourceLogs (otlp.rs:254-257)") {
    val (signal, tree) = OtlpCodec.decode(logsFrame)
    assert(signal == "logs")
    val rec = tree.get("resourceLogs").get(0).get("scopeLogs").get(0)
      .get("logRecords").get(0)
    assert(rec.get("timeUnixNano").asLong() == 1234567890L)
    assert(rec.get("severityNumber").asInt() == 9)
    assert(rec.get("severityText").asText() == "INFO")
  }

  test("deserialize_otlp_metrics: resourceMetrics preserved in OTLP shape (otlp.rs:97-99)") {
    val (signal, tree) = OtlpCodec.decode(metricsFrame)
    assert(signal == "metrics")
    val metric = tree.get("resourceMetrics").get(0).get("scopeMetrics").get(0)
      .get("metrics").get(0)
    assert(metric.get("name").asText() == "test_metric")
  }

  test("deserialize_otlp_traces: trace/span ids survive (otlp.rs:317-366, hex in the JSON carrier)") {
    val (signal, tree) = OtlpCodec.decode(tracesFrame)
    assert(signal == "traces")
    val span = tree.get("resourceSpans").get(0).get("scopeSpans").get(0)
      .get("spans").get(0)
    assert(span.get("traceId").asText() == "0102030405060708090a0b0c0d0e0f10")
    assert(span.get("spanId").asText() == "0102030405060708")
    assert(span.get("name").asText() == "test_span")
    assert(span.get("startTimeUnixNano").asLong() == 1234567890L)
    assert(span.get("endTimeUnixNano").asLong() == 1234567900L)
  }

  test("signal disambiguation: each frame resolves its own signal under default priority") {
    // a traces frame must NOT parse as logs (Span.1 is bytes where
    // LogRecord.1 is fixed64) and vice versa — the wire-type guards
    assert(OtlpCodec.decode(tracesFrame)._1 == "traces")
    assert(OtlpCodec.decode(logsFrame)._1 == "logs")
    assert(OtlpCodec.decode(metricsFrame)._1 == "metrics")
    intercept[IllegalArgumentException] {
      OtlpCodec.decode(logsFrame, signals = Seq("traces")) // otlp.rs:423-437
    }
    assert(OtlpCodec.decode(tracesFrame, signals = Seq("traces"))._1 == "traces")
  }

  test("a nameless span frame cannot pass the metrics decoder (full field-range guard)") {
    // span fields 6 (kind, varint) / 7-8 (times, fixed64) sit beyond
    // Metric's string fields 1-3; a guard that only rejected wrong-wire
    // 1-3 let this frame decode as "metrics" with the binary trace id
    // as the metric name
    val span = new Writer
    span.writeLenDelim(1, TraceId)
    span.writeLenDelim(2, SpanId)
    span.writeTag(6, 0).writeVarint(2L)
    span.writeTag(7, 1).writeFixed64(1234567890L)
    span.writeTag(8, 1).writeFixed64(1234567900L)
    val scopeSpans = new Writer; scopeSpans.writeLenDelim(2, span.toBytes)
    val resourceSpans = new Writer
    resourceSpans.writeLenDelim(1, Array.empty[Byte])
    resourceSpans.writeLenDelim(2, scopeSpans.toBytes)
    val frame = new Writer().writeLenDelim(1, resourceSpans.toBytes).toBytes
    assert(OtlpCodec.decode(frame)._1 == "traces")
  }

  test("deserialize_invalid_otlp: garbage raises Invalid OTLP data (otlp.rs:383-395)") {
    val e = intercept[IllegalArgumentException] {
      OtlpCodec.decode("invalid protobuf data".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("Invalid OTLP data"))
  }

  test("attributes/body AnyValue tree: nested kvlist, arrays, bytes") {
    // LogRecord with body {msg: "hi", n: 7, xs: [true, 2.5], raw: bytes}
    def any(f: Writer => Unit): Array[Byte] = { val w = new Writer; f(w); w.toBytes }
    val kvs = Seq(
      ("msg", any(_.writeLenDelim(1, utf8("hi")))),
      ("n", any(_.writeTag(3, 0).writeVarint(7L))),
      ("xs", any { w =>
        val arr = new Writer
        arr.writeLenDelim(1, any(_.writeTag(2, 0).writeVarint(1L)))
        arr.writeLenDelim(1, any(_.writeTag(4, 1).writeFixed64(
          java.lang.Double.doubleToLongBits(2.5))))
        w.writeLenDelim(5, arr.toBytes); ()
      }),
      ("raw", any(_.writeLenDelim(7, Array[Byte](1, 2)))))
    val body = any { w =>
      val kvl = new Writer
      kvs.foreach { case (k, v) =>
        val kv = new Writer
        kv.writeLenDelim(1, utf8(k)); kv.writeLenDelim(2, v)
        kvl.writeLenDelim(1, kv.toBytes)
      }
      w.writeLenDelim(6, kvl.toBytes); ()
    }
    val rec = new Writer
    rec.writeTag(1, 1).writeFixed64(1L)
    rec.writeLenDelim(5, body)
    val scopeLogs = new Writer; scopeLogs.writeLenDelim(2, rec.toBytes)
    val resourceLogs = new Writer; resourceLogs.writeLenDelim(2, scopeLogs.toBytes)
    val frame = new Writer().writeLenDelim(1, resourceLogs.toBytes).toBytes

    val tree = OtlpCodec.decode(frame)._2
    val b = tree.get("resourceLogs").get(0).get("scopeLogs").get(0)
      .get("logRecords").get(0).get("body").get("kvlistValue").get("values")
    assert(b.get(0).get("key").asText() == "msg")
    assert(b.get(0).get("value").get("stringValue").asText() == "hi")
    assert(b.get(1).get("value").get("intValue").asLong() == 7L)
    val xs = b.get(2).get("value").get("arrayValue").get("values")
    assert(xs.get(0).get("boolValue").asBoolean())
    assert(xs.get(1).get("doubleValue").asDouble() == 2.5)
    assert(b.get(3).get("value").get("bytesValue").asText() == "AQI=")
  }

  // ------------------------------------------------- encode arm
  // (encoding/format/otlp.rs: the serializer is the inverse of the
  // decode, dispatching on the top-level resource* field)

  test("encode round-trips the three pinned reference frames byte-exactly") {
    for (frame <- Seq(logsFrame, metricsFrame, tracesFrame)) {
      val tree = OtlpCodec.decode(frame)._2
      assert(OtlpCodec.encode(tree).toSeq == frame.toSeq)
    }
  }

  test("encode round-trips the nested AnyValue body frame byte-exactly") {
    // rebuild the body frame from the attributes/body test above
    def any(f: Writer => Unit): Array[Byte] = { val w = new Writer; f(w); w.toBytes }
    val kvs = Seq(
      ("msg", any(_.writeLenDelim(1, utf8("hi")))),
      ("n", any(_.writeTag(3, 0).writeVarint(7L))),
      ("xs", any { w =>
        val arr = new Writer
        arr.writeLenDelim(1, any(_.writeTag(2, 0).writeVarint(1L)))
        arr.writeLenDelim(1, any(_.writeTag(4, 1).writeFixed64(
          java.lang.Double.doubleToLongBits(2.5))))
        w.writeLenDelim(5, arr.toBytes); ()
      }),
      ("raw", any(_.writeLenDelim(7, Array[Byte](1, 2)))))
    val body = any { w =>
      val kvl = new Writer
      kvs.foreach { case (k, v) =>
        val kv = new Writer
        kv.writeLenDelim(1, utf8(k)); kv.writeLenDelim(2, v)
        kvl.writeLenDelim(1, kv.toBytes)
      }
      w.writeLenDelim(6, kvl.toBytes); ()
    }
    val rec = new Writer
    rec.writeTag(1, 1).writeFixed64(1L)
    rec.writeLenDelim(5, body)
    val scopeLogs = new Writer; scopeLogs.writeLenDelim(2, rec.toBytes)
    val resourceLogs = new Writer; resourceLogs.writeLenDelim(2, scopeLogs.toBytes)
    val frame = new Writer().writeLenDelim(1, resourceLogs.toBytes).toBytes
    assert(OtlpCodec.encode(OtlpCodec.decode(frame)._2).toSeq == frame.toSeq)
  }

  test("encode round-trips every metric data arm byte-exactly") {
    def attr(k: String, s: String): Array[Byte] = {
      val v = new Writer; v.writeLenDelim(1, utf8(s))
      val kv = new Writer; kv.writeLenDelim(1, utf8(k)); kv.writeLenDelim(2, v.toBytes)
      kv.toBytes
    }
    def numPoint(d: Double): Array[Byte] = {
      val p = new Writer
      p.writeTag(2, 1).writeFixed64(10L); p.writeTag(3, 1).writeFixed64(20L)
      p.writeTag(4, 1).writeFixed64(java.lang.Double.doubleToLongBits(d))
      p.writeLenDelim(7, attr("host", "a")); p.toBytes
    }
    val gauge = new Writer; gauge.writeLenDelim(1, numPoint(1.5))
    val sum = new Writer
    sum.writeLenDelim(1, numPoint(2.5))
    sum.writeTag(2, 0).writeVarint(2L); sum.writeTag(3, 0).writeVarint(1L)
    val hdp = new Writer
    hdp.writeTag(3, 1).writeFixed64(30L)
    hdp.writeTag(4, 1).writeFixed64(7L)
    hdp.writeTag(5, 1).writeFixed64(java.lang.Double.doubleToLongBits(12.25))
    val packedCounts = new Writer; Seq(1L, 2L, 4L).foreach(packedCounts.writeFixed64)
    hdp.writeLenDelim(6, packedCounts.toBytes)
    val packedBounds = new Writer
    Seq(0.5, 1.0).foreach(b => packedBounds.writeFixed64(java.lang.Double.doubleToLongBits(b)))
    hdp.writeLenDelim(7, packedBounds.toBytes)
    hdp.writeTag(11, 1).writeFixed64(java.lang.Double.doubleToLongBits(0.25))
    hdp.writeTag(12, 1).writeFixed64(java.lang.Double.doubleToLongBits(3.75))
    val hist = new Writer
    hist.writeLenDelim(1, hdp.toBytes); hist.writeTag(2, 0).writeVarint(2L)
    val q = new Writer
    q.writeTag(1, 1).writeFixed64(java.lang.Double.doubleToLongBits(0.99))
    q.writeTag(2, 1).writeFixed64(java.lang.Double.doubleToLongBits(123.0))
    val sdp = new Writer
    sdp.writeTag(3, 1).writeFixed64(40L); sdp.writeTag(4, 1).writeFixed64(9L)
    sdp.writeTag(5, 1).writeFixed64(java.lang.Double.doubleToLongBits(500.0))
    sdp.writeLenDelim(6, q.toBytes)
    val summ = new Writer; summ.writeLenDelim(1, sdp.toBytes)

    def metric(name: String, arm: Int, body: Array[Byte]): Array[Byte] = {
      val m = new Writer
      m.writeLenDelim(1, utf8(name)); m.writeLenDelim(3, utf8("s"))
      m.writeLenDelim(arm, body); m.toBytes
    }
    val scopeMetrics = new Writer
    scopeMetrics.writeLenDelim(2, metric("g", 5, gauge.toBytes))
    scopeMetrics.writeLenDelim(2, metric("c", 7, sum.toBytes))
    scopeMetrics.writeLenDelim(2, metric("h", 9, hist.toBytes))
    scopeMetrics.writeLenDelim(2, metric("q", 11, summ.toBytes))
    val resourceMetrics = new Writer
    val res = new Writer; res.writeLenDelim(1, attr("service", "api"))
    resourceMetrics.writeLenDelim(1, res.toBytes)
    resourceMetrics.writeLenDelim(2, scopeMetrics.toBytes)
    val frame = new Writer().writeLenDelim(1, resourceMetrics.toBytes).toBytes
    assert(OtlpCodec.decode(frame)._1 == "metrics")
    assert(OtlpCodec.encode(OtlpCodec.decode(frame)._2).toSeq == frame.toSeq)
  }

  test("encode round-trips a full span (events, links, status) byte-exactly") {
    val ev = new Writer
    ev.writeTag(1, 1).writeFixed64(1234567895L); ev.writeLenDelim(2, utf8("retry"))
    val link = new Writer
    link.writeLenDelim(1, TraceId.reverse); link.writeLenDelim(2, SpanId.reverse)
    val status = new Writer
    status.writeLenDelim(2, utf8("boom")); status.writeTag(3, 0).writeVarint(2L)
    val span = new Writer
    span.writeLenDelim(1, TraceId); span.writeLenDelim(2, SpanId)
    span.writeLenDelim(4, SpanId.reverse)
    span.writeLenDelim(5, utf8("rich_span"))
    span.writeTag(6, 0).writeVarint(3L)
    span.writeTag(7, 1).writeFixed64(1234567890L)
    span.writeTag(8, 1).writeFixed64(1234567900L)
    span.writeLenDelim(11, ev.toBytes)
    span.writeLenDelim(13, link.toBytes)
    span.writeLenDelim(15, status.toBytes)
    val scopeSpans = new Writer
    val sc = new Writer; sc.writeLenDelim(1, utf8("lib")); sc.writeLenDelim(2, utf8("1.0"))
    scopeSpans.writeLenDelim(1, sc.toBytes)
    scopeSpans.writeLenDelim(2, span.toBytes)
    val resourceSpans = new Writer
    resourceSpans.writeLenDelim(1, Array.empty[Byte])
    resourceSpans.writeLenDelim(2, scopeSpans.toBytes)
    val frame = new Writer().writeLenDelim(1, resourceSpans.toBytes).toBytes
    assert(OtlpCodec.encode(OtlpCodec.decode(frame)._2).toSeq == frame.toSeq)
  }

  test("encode rejects a non-OTLP event with the reference's error text (otlp.rs:111-114)") {
    val e = intercept[IllegalArgumentException] {
      OtlpCodec.encode(mapper.readTree("""{"message":"plain log"}"""))
    }
    assert(e.getMessage.contains("does not contain OTLP top-level fields"))
  }

  test("distributed encode Column API: parse -> encode returns the original frames") {
    val df = Seq(("l", logsFrame), ("m", metricsFrame), ("t", tracesFrame),
      ("bad", Array[Byte](9, 9))).toDF("k", "frame").repartition(2)
    val out = df.select(col("k"),
        OtlpCodec.encodeOtlp(OtlpCodec.parseOtlp(col("frame"))).as("re"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("re")).toMap
    assert(out("l").toSeq == logsFrame.toSeq)
    assert(out("m").toSeq == metricsFrame.toSeq)
    assert(out("t").toSeq == tracesFrame.toSeq)
    assert(out("bad") == null)
  }

  test("distributed Column API over mixed signals") {
    val df = Seq(("l", logsFrame), ("m", metricsFrame), ("t", tracesFrame),
      ("bad", Array[Byte](1, 2, 3))).toDF("k", "frame").repartition(2)
    val out = df.select(col("k"),
        OtlpCodec.parseOtlpSignal(col("frame")).as("sig"),
        OtlpCodec.parseOtlp(col("frame")).as("line"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out("l")._1 == "logs" && out("m")._1 == "metrics" && out("t")._1 == "traces")
    assert(out("bad") == ((null, null)))
    assert(mapper.readTree(out("t")._2).has("resourceSpans"))
  }
}
