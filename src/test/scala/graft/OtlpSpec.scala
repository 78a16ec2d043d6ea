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
