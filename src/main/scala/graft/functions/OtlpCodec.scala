package graft.functions

import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.util.Try

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types.StringType

import ProtoWire.{Reader, WField}

/** OTLP protobuf decoder (reference
  * `lib/codecs/src/decoding/format/otlp.rs`): one frame = one
  * `Export{Logs,Metrics,Trace}ServiceRequest`, decoded into ONE event
  * whose single field is the whole signal tree — `resourceLogs` /
  * `resourceMetrics` / `resourceSpans` — with protobuf-JSON (camelCase)
  * field names, exactly the reference's generic
  * protobuf-descriptor-driven decode (otlp.rs:93-100: metrics
  * deliberately stay in OTLP shape rather than becoming native metrics).
  * Signal detection mirrors the reference's try-in-priority-order
  * (otlp.rs:125-135): each signal's decoder REJECTS a frame whose known
  * field numbers carry the wrong wire type (LogRecord.1 is fixed64 time,
  * Span.1 is a bytes trace id, Metric.1 is a string name — the
  * structural discriminators), so a traces frame fails the logs decoder
  * instead of mis-parsing.
  *
  * The opentelemetry-proto field numbers used here are the public,
  * frozen OTLP protocol (logs/v1, metrics/v1, trace/v1, common/v1,
  * resource/v1). Decoded over the ProtoWire kernel — no protobuf jar.
  *
  * Representation notes (this is a JSON carrier; the reference holds an
  * in-memory value tree): trace/span/parent ids render as HEX and
  * generic `bytesValue` as base64 — the official OTLP/JSON conventions —
  * because raw bytes cannot live in JSON text; enums stay numeric;
  * proto3 defaults absent from the wire stay absent from the JSON.
  */
object OtlpCodec {

  private val F = JsonNodeFactory.instance
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def fields(b: Array[Byte]): Vector[WField] = new Reader(b).readAll()
  private def str(b: Array[Byte]): String = new String(b, StandardCharsets.UTF_8)
  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
  private def u64Node(v: Long): JsonNode =
    if (v >= 0) F.numberNode(v)
    else F.numberNode(new java.math.BigInteger(java.lang.Long.toUnsignedString(v)))
  private def dbl(bits: Long): JsonNode = F.numberNode(java.lang.Double.longBitsToDouble(bits))

  private def bad(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** Enforce the wire type of a known field — the signal discriminator. */
  private def expect(w: WField, wire: Int, what: String): WField =
    if (w.wire == wire) w else bad(s"$what: field ${w.number} wire ${w.wire}, expected $wire")

  // ------------------------------------------------- common/v1

  /** AnyValue: oneof {stringValue 1, boolValue 2, intValue 3,
    * doubleValue 4, arrayValue 5, kvlistValue 6, bytesValue 7}.
    */
  private def anyValue(b: Array[Byte]): ObjectNode = {
    val o = F.objectNode()
    fields(b).foreach {
      case WField(1, 2, _, v) => o.set[JsonNode]("stringValue", F.textNode(str(v)))
      case WField(2, 0, v, _) => o.set[JsonNode]("boolValue", F.booleanNode(v != 0L))
      case WField(3, 0, v, _) => o.set[JsonNode]("intValue", F.numberNode(v))
      case WField(4, 1, v, _) => o.set[JsonNode]("doubleValue", dbl(v))
      case WField(5, 2, _, v) =>
        val arr = F.objectNode(); val items = F.arrayNode()
        fields(v).foreach {
          case WField(1, 2, _, item) => items.add(anyValue(item)): Unit
          case w => expect(w, 2, "ArrayValue"); ()
        }
        arr.set[JsonNode]("values", items)
        o.set[JsonNode]("arrayValue", arr)
      case WField(6, 2, _, v) =>
        val kvl = F.objectNode(); val items = F.arrayNode()
        fields(v).foreach {
          case WField(1, 2, _, item) => items.add(keyValue(item)): Unit
          case w => expect(w, 2, "KeyValueList"); ()
        }
        kvl.set[JsonNode]("values", items)
        o.set[JsonNode]("kvlistValue", kvl)
      case WField(7, 2, _, v) =>
        o.set[JsonNode]("bytesValue", F.textNode(Base64.getEncoder.encodeToString(v)))
      case w if w.number <= 7 => bad(s"AnyValue: field ${w.number} wire ${w.wire}")
      case _ => ()
    }
    o
  }

  private def keyValue(b: Array[Byte]): ObjectNode = {
    val o = F.objectNode()
    fields(b).foreach {
      case WField(1, 2, _, k) => o.set[JsonNode]("key", F.textNode(str(k)))
      case WField(2, 2, _, v) => o.set[JsonNode]("value", anyValue(v))
      case w if w.number <= 2 => bad(s"KeyValue: field ${w.number} wire ${w.wire}")
      case _ => ()
    }
    o
  }

  private def attrArray(items: Seq[Array[Byte]]): ArrayNode = {
    val a = F.arrayNode()
    items.foreach(i => { a.add(keyValue(i)); () })
    a
  }

  /** Resource{attributes 1, dropped_attributes_count 2}. */
  private def resource(b: Array[Byte]): ObjectNode = {
    val o = F.objectNode()
    val attrs = Seq.newBuilder[Array[Byte]]
    fields(b).foreach {
      case WField(1, 2, _, v) => attrs += v
      case WField(2, 0, v, _) => o.set[JsonNode]("droppedAttributesCount", F.numberNode(v & 0xffffffffL)): Unit
      case w if w.number <= 2 => bad(s"Resource: field ${w.number} wire ${w.wire}")
      case _ => ()
    }
    val a = attrs.result()
    if (a.nonEmpty) o.set[JsonNode]("attributes", attrArray(a)): Unit
    o
  }

  /** InstrumentationScope{name 1, version 2, attributes 3, dropped 4}. */
  private def scope(b: Array[Byte]): ObjectNode = {
    val o = F.objectNode()
    val attrs = Seq.newBuilder[Array[Byte]]
    fields(b).foreach {
      case WField(1, 2, _, v) => o.set[JsonNode]("name", F.textNode(str(v))): Unit
      case WField(2, 2, _, v) => o.set[JsonNode]("version", F.textNode(str(v))): Unit
      case WField(3, 2, _, v) => attrs += v
      case WField(4, 0, v, _) => o.set[JsonNode]("droppedAttributesCount", F.numberNode(v & 0xffffffffL)): Unit
      case w if w.number <= 4 => bad(s"Scope: field ${w.number} wire ${w.wire}")
      case _ => ()
    }
    val a = attrs.result()
    if (a.nonEmpty) o.set[JsonNode]("attributes", attrArray(a)): Unit
    o
  }

  // ------------------------------------------------- logs/v1

  /** LogRecord — field 1 MUST be fixed64 (the logs discriminator). */
  private def logRecord(b: Array[Byte]): ObjectNode = {
    val o = F.objectNode()
    val attrs = Seq.newBuilder[Array[Byte]]
    fields(b).foreach {
      case WField(1, 1, v, _) => o.set[JsonNode]("timeUnixNano", u64Node(v)): Unit
      case WField(2, 0, v, _) => o.set[JsonNode]("severityNumber", F.numberNode(v)): Unit
      case WField(3, 2, _, v) => o.set[JsonNode]("severityText", F.textNode(str(v))): Unit
      case WField(5, 2, _, v) => o.set[JsonNode]("body", anyValue(v)): Unit
      case WField(6, 2, _, v) => attrs += v
      case WField(7, 0, v, _) => o.set[JsonNode]("droppedAttributesCount", F.numberNode(v & 0xffffffffL)): Unit
      case WField(8, 5, v, _) => o.set[JsonNode]("flags", F.numberNode(v & 0xffffffffL)): Unit
      case WField(9, 2, _, v) => o.set[JsonNode]("traceId", F.textNode(hex(v))): Unit
      case WField(10, 2, _, v) => o.set[JsonNode]("spanId", F.textNode(hex(v))): Unit
      case WField(11, 1, v, _) => o.set[JsonNode]("observedTimeUnixNano", u64Node(v)): Unit
      case WField(12, 2, _, v) => o.set[JsonNode]("eventName", F.textNode(str(v))): Unit
      case w if w.number <= 12 => bad(s"LogRecord: field ${w.number} wire ${w.wire}")
      case _ => ()
    }
    val a = attrs.result()
    if (a.nonEmpty) o.set[JsonNode]("attributes", attrArray(a)): Unit
    o
  }

  private def scopedList(b: Array[Byte], listKey: String,
                         item: Array[Byte] => ObjectNode): ObjectNode = {
    val o = F.objectNode()
    val items = F.arrayNode()
    fields(b).foreach {
      case WField(1, 2, _, v) => o.set[JsonNode]("scope", scope(v)): Unit
      case WField(2, 2, _, v) => items.add(item(v)): Unit
      case WField(3, 2, _, v) => o.set[JsonNode]("schemaUrl", F.textNode(str(v))): Unit
      case w if w.number <= 3 => bad(s"Scope*: field ${w.number} wire ${w.wire}")
      case _ => ()
    }
    o.set[JsonNode](listKey, items)
    o
  }

  private def resourceBlock(b: Array[Byte], scopesKey: String, listKey: String,
                            item: Array[Byte] => ObjectNode): ObjectNode = {
    val o = F.objectNode()
    val scopes = F.arrayNode()
    fields(b).foreach {
      case WField(1, 2, _, v) => o.set[JsonNode]("resource", resource(v)): Unit
      case WField(2, 2, _, v) => scopes.add(scopedList(v, listKey, item)): Unit
      case WField(3, 2, _, v) => o.set[JsonNode]("schemaUrl", F.textNode(str(v))): Unit
      case w if w.number <= 3 => bad(s"Resource*: field ${w.number} wire ${w.wire}")
      case _ => ()
    }
    o.set[JsonNode](scopesKey, scopes)
    o
  }

  /** ExportLogsServiceRequest -> {"resourceLogs": [...]} */
  def decodeLogs(frame: Array[Byte]): ObjectNode = {
    val out = F.objectNode(); val arr = F.arrayNode()
    fields(frame).foreach {
      case WField(1, 2, _, v) => arr.add(resourceBlock(v, "scopeLogs", "logRecords", logRecord)): Unit
      case w => bad(s"LogsRequest: field ${w.number} wire ${w.wire}")
    }
    if (arr.isEmpty) bad("empty logs request")
    out.set[JsonNode]("resourceLogs", arr)
    out
  }

  // ------------------------------------------------- metrics/v1

  private def numberDataPoint(b: Array[Byte]): ObjectNode = {
    val o = F.objectNode()
    val attrs = Seq.newBuilder[Array[Byte]]
    fields(b).foreach {
      case WField(7, 2, _, v) => attrs += v
      case WField(2, 1, v, _) => o.set[JsonNode]("startTimeUnixNano", u64Node(v)): Unit
      case WField(3, 1, v, _) => o.set[JsonNode]("timeUnixNano", u64Node(v)): Unit
      case WField(4, 1, v, _) => o.set[JsonNode]("asDouble", dbl(v)): Unit
      case WField(6, 1, v, _) => o.set[JsonNode]("asInt", F.numberNode(v)): Unit // sfixed64
      case WField(8, 0, v, _) => o.set[JsonNode]("flags", F.numberNode(v & 0xffffffffL)): Unit
      case WField(5, 2, _, _) => () // exemplars: dropped (documented subset)
      case w if w.number <= 8 => bad(s"NumberDataPoint: field ${w.number} wire ${w.wire}")
      case _ => ()
    }
    val a = attrs.result()
    if (a.nonEmpty) o.set[JsonNode]("attributes", attrArray(a)): Unit
    o
  }

  private def dataPoints(b: Array[Byte], point: Array[Byte] => ObjectNode,
                         extra: PartialFunction[WField, (String, JsonNode)] = PartialFunction.empty): ObjectNode = {
    val o = F.objectNode(); val pts = F.arrayNode()
    fields(b).foreach {
      case WField(1, 2, _, v) => pts.add(point(v)): Unit
      case w if extra.isDefinedAt(w) =>
        val (k, n) = extra(w); o.set[JsonNode](k, n): Unit
      case w if w.number == 1 => bad(s"data: field 1 wire ${w.wire}")
      case _ => ()
    }
    o.set[JsonNode]("dataPoints", pts)
    o
  }

  private def histogramDataPoint(b: Array[Byte]): ObjectNode = {
    val o = F.objectNode()
    val attrs = Seq.newBuilder[Array[Byte]]
    val bucketCounts = F.arrayNode(); val bounds = F.arrayNode()
    fields(b).foreach {
      case WField(9, 2, _, v) => attrs += v
      case WField(2, 1, v, _) => o.set[JsonNode]("startTimeUnixNano", u64Node(v)): Unit
      case WField(3, 1, v, _) => o.set[JsonNode]("timeUnixNano", u64Node(v)): Unit
      case WField(4, 1, v, _) => o.set[JsonNode]("count", u64Node(v)): Unit
      case WField(5, 1, v, _) => o.set[JsonNode]("sum", dbl(v)): Unit
      case WField(6, 2, _, p) => // packed fixed64 bucket counts
        val r = new Reader(p); while (r.hasMore) bucketCounts.add(u64Node(r.readFixed64()))
      case WField(6, 1, v, _) => bucketCounts.add(u64Node(v)): Unit
      case WField(7, 2, _, p) => // packed double bounds
        val r = new Reader(p); while (r.hasMore) bounds.add(dbl(r.readFixed64()))
      case WField(7, 1, v, _) => bounds.add(dbl(v)): Unit
      case WField(10, 0, v, _) => o.set[JsonNode]("flags", F.numberNode(v & 0xffffffffL)): Unit
      case WField(11, 1, v, _) => o.set[JsonNode]("min", dbl(v)): Unit
      case WField(12, 1, v, _) => o.set[JsonNode]("max", dbl(v)): Unit
      case WField(8, 2, _, _) => () // exemplars dropped
      case w if w.number <= 12 => bad(s"HistogramDataPoint: field ${w.number} wire ${w.wire}")
      case _ => ()
    }
    if (bucketCounts.size() > 0) o.set[JsonNode]("bucketCounts", bucketCounts): Unit
    if (bounds.size() > 0) o.set[JsonNode]("explicitBounds", bounds): Unit
    val a = attrs.result()
    if (a.nonEmpty) o.set[JsonNode]("attributes", attrArray(a)): Unit
    o
  }

  private def summaryDataPoint(b: Array[Byte]): ObjectNode = {
    val o = F.objectNode()
    val attrs = Seq.newBuilder[Array[Byte]]
    val qs = F.arrayNode()
    fields(b).foreach {
      case WField(7, 2, _, v) => attrs += v
      case WField(2, 1, v, _) => o.set[JsonNode]("startTimeUnixNano", u64Node(v)): Unit
      case WField(3, 1, v, _) => o.set[JsonNode]("timeUnixNano", u64Node(v)): Unit
      case WField(4, 1, v, _) => o.set[JsonNode]("count", u64Node(v)): Unit
      case WField(5, 1, v, _) => o.set[JsonNode]("sum", dbl(v)): Unit
      case WField(6, 2, _, v) =>
        val q = F.objectNode()
        fields(v).foreach {
          case WField(1, 1, x, _) => q.set[JsonNode]("quantile", dbl(x)): Unit
          case WField(2, 1, x, _) => q.set[JsonNode]("value", dbl(x)): Unit
          case _ => ()
        }
        qs.add(q): Unit
      case WField(8, 0, v, _) => o.set[JsonNode]("flags", F.numberNode(v & 0xffffffffL)): Unit
      case w if w.number <= 8 => bad(s"SummaryDataPoint: field ${w.number} wire ${w.wire}")
      case _ => ()
    }
    if (qs.size() > 0) o.set[JsonNode]("quantileValues", qs): Unit
    val a = attrs.result()
    if (a.nonEmpty) o.set[JsonNode]("attributes", attrArray(a)): Unit
    o
  }

  /** Metric{name 1 STRING (the metrics discriminator), description 2,
    * unit 3, oneof data: gauge 5, sum 7, histogram 9,
    * exponential_histogram 10 (decoded as raw dataPoints subset),
    * summary 11}.
    */
  private def metric(b: Array[Byte]): ObjectNode = {
    val o = F.objectNode()
    fields(b).foreach {
      case WField(1, 2, _, v) => o.set[JsonNode]("name", F.textNode(str(v))): Unit
      case WField(2, 2, _, v) => o.set[JsonNode]("description", F.textNode(str(v))): Unit
      case WField(3, 2, _, v) => o.set[JsonNode]("unit", F.textNode(str(v))): Unit
      case WField(5, 2, _, v) => o.set[JsonNode]("gauge", dataPoints(v, numberDataPoint)): Unit
      case WField(7, 2, _, v) => o.set[JsonNode]("sum", dataPoints(v, numberDataPoint, {
          case WField(2, 0, x, _) => ("aggregationTemporality", F.numberNode(x))
          case WField(3, 0, x, _) => ("isMonotonic", F.booleanNode(x != 0L))
        })): Unit
      case WField(9, 2, _, v) => o.set[JsonNode]("histogram", dataPoints(v, histogramDataPoint, {
          case WField(2, 0, x, _) => ("aggregationTemporality", F.numberNode(x))
        })): Unit
      case WField(11, 2, _, v) => o.set[JsonNode]("summary", dataPoints(v, summaryDataPoint)): Unit
      case WField(10, 2, _, _) => () // exponential_histogram: out of subset
      case WField(12, 2, _, _) => () // metadata: out of subset
      // reject the FULL known field range (Metric has no fields past
      // 12), not just 1-3: a trace Span's kind(6,varint)/times(7-8,
      // fixed64) would otherwise fall through and a trace frame could
      // pass the metrics decoder, misclassifying the signal
      case w => bad(s"Metric: field ${w.number} wire ${w.wire}")
    }
    o
  }

  /** ExportMetricsServiceRequest -> {"resourceMetrics": [...]} */
  def decodeMetrics(frame: Array[Byte]): ObjectNode = {
    val out = F.objectNode(); val arr = F.arrayNode()
    fields(frame).foreach {
      case WField(1, 2, _, v) => arr.add(resourceBlock(v, "scopeMetrics", "metrics", metric)): Unit
      case w => bad(s"MetricsRequest: field ${w.number} wire ${w.wire}")
    }
    if (arr.isEmpty) bad("empty metrics request")
    out.set[JsonNode]("resourceMetrics", arr)
    out
  }

  // ------------------------------------------------- trace/v1

  /** Span — field 1 MUST be length-delimited bytes (the traces
    * discriminator vs LogRecord's fixed64 time).
    */
  private def span(b: Array[Byte]): ObjectNode = {
    val o = F.objectNode()
    val attrs = Seq.newBuilder[Array[Byte]]
    val events = F.arrayNode(); val links = F.arrayNode()
    fields(b).foreach {
      case WField(1, 2, _, v) => o.set[JsonNode]("traceId", F.textNode(hex(v))): Unit
      case WField(2, 2, _, v) => o.set[JsonNode]("spanId", F.textNode(hex(v))): Unit
      case WField(3, 2, _, v) => o.set[JsonNode]("traceState", F.textNode(str(v))): Unit
      case WField(4, 2, _, v) => o.set[JsonNode]("parentSpanId", F.textNode(hex(v))): Unit
      case WField(5, 2, _, v) => o.set[JsonNode]("name", F.textNode(str(v))): Unit
      case WField(6, 0, v, _) => o.set[JsonNode]("kind", F.numberNode(v)): Unit
      case WField(7, 1, v, _) => o.set[JsonNode]("startTimeUnixNano", u64Node(v)): Unit
      case WField(8, 1, v, _) => o.set[JsonNode]("endTimeUnixNano", u64Node(v)): Unit
      case WField(9, 2, _, v) => attrs += v
      case WField(10, 0, v, _) => o.set[JsonNode]("droppedAttributesCount", F.numberNode(v & 0xffffffffL)): Unit
      case WField(11, 2, _, v) => // Span.Event{time 1 fixed64, name 2, attributes 3}
        val e = F.objectNode(); val ea = Seq.newBuilder[Array[Byte]]
        fields(v).foreach {
          case WField(1, 1, x, _) => e.set[JsonNode]("timeUnixNano", u64Node(x)): Unit
          case WField(2, 2, _, x) => e.set[JsonNode]("name", F.textNode(str(x))): Unit
          case WField(3, 2, _, x) => ea += x
          case _ => ()
        }
        val eaa = ea.result()
        if (eaa.nonEmpty) e.set[JsonNode]("attributes", attrArray(eaa)): Unit
        events.add(e): Unit
      case WField(12, 0, v, _) => o.set[JsonNode]("droppedEventsCount", F.numberNode(v & 0xffffffffL)): Unit
      case WField(13, 2, _, v) => // Span.Link{trace_id 1, span_id 2, trace_state 3, attributes 4}
        val l = F.objectNode(); val la = Seq.newBuilder[Array[Byte]]
        fields(v).foreach {
          case WField(1, 2, _, x) => l.set[JsonNode]("traceId", F.textNode(hex(x))): Unit
          case WField(2, 2, _, x) => l.set[JsonNode]("spanId", F.textNode(hex(x))): Unit
          case WField(3, 2, _, x) => l.set[JsonNode]("traceState", F.textNode(str(x))): Unit
          case WField(4, 2, _, x) => la += x
          case _ => ()
        }
        val laa = la.result()
        if (laa.nonEmpty) l.set[JsonNode]("attributes", attrArray(laa)): Unit
        links.add(l): Unit
      case WField(14, 0, v, _) => o.set[JsonNode]("droppedLinksCount", F.numberNode(v & 0xffffffffL)): Unit
      case WField(15, 2, _, v) => // Status{message 2, code 3}
        val s = F.objectNode()
        fields(v).foreach {
          case WField(2, 2, _, x) => s.set[JsonNode]("message", F.textNode(str(x))): Unit
          case WField(3, 0, x, _) => s.set[JsonNode]("code", F.numberNode(x)): Unit
          case _ => ()
        }
        o.set[JsonNode]("status", s): Unit
      case w if w.number <= 15 => bad(s"Span: field ${w.number} wire ${w.wire}")
      case _ => ()
    }
    val a = attrs.result()
    if (a.nonEmpty) o.set[JsonNode]("attributes", attrArray(a)): Unit
    if (events.size() > 0) o.set[JsonNode]("events", events): Unit
    if (links.size() > 0) o.set[JsonNode]("links", links): Unit
    o
  }

  /** ExportTraceServiceRequest -> {"resourceSpans": [...]} */
  def decodeTraces(frame: Array[Byte]): ObjectNode = {
    val out = F.objectNode(); val arr = F.arrayNode()
    fields(frame).foreach {
      case WField(1, 2, _, v) => arr.add(resourceBlock(v, "scopeSpans", "spans", span)): Unit
      case w => bad(s"TracesRequest: field ${w.number} wire ${w.wire}")
    }
    if (arr.isEmpty) bad("empty traces request")
    out.set[JsonNode]("resourceSpans", arr)
    out
  }

  // ------------------------------------------------- signal dispatch

  /** Try logs -> metrics -> traces, like the reference's default
    * priority; returns (signal, tree) or throws "Invalid OTLP data".
    */
  def decode(frame: Array[Byte],
             signals: Seq[String] = Seq("logs", "metrics", "traces")): (String, ObjectNode) = {
    signals.iterator.flatMap { s =>
      Try(s match {
        case "logs" => ("logs", decodeLogs(frame))
        case "metrics" => ("metrics", decodeMetrics(frame))
        case "traces" => ("traces", decodeTraces(frame))
      }).toOption
    }.nextOption().getOrElse(bad("Invalid OTLP data"))
  }

  /** Column API: frame -> json line of the single-field event; null on
    * invalid frames (dropped channel). `parse_otlp_signal` names the arm.
    */
  def parseOtlp(c: Column): Column =
    udf(new UDF1[Array[Byte], String] {
      override def call(b: Array[Byte]): String =
        if (b == null) null
        else Try(mapper.writeValueAsString(decode(b)._2)).getOrElse(null)
    }, StringType).apply(c)

  /** Signal-pinned decode to the canonical JSON line — the
    * opentelemetry source's per-route arm (the HTTP path names the
    * signal, so no priority dispatch; reference
    * src/sources/opentelemetry/http.rs decode_log_body /
    * decode_metrics_body / decode_trace_body). Throws on an invalid
    * frame (the listener answers 400).
    */
  def decodeSignalJson(signal: String, frame: Array[Byte]): String =
    mapper.writeValueAsString(signal match {
      case "logs" => decodeLogs(frame)
      case "metrics" => decodeMetrics(frame)
      case "traces" => decodeTraces(frame)
      case other => bad(s"unknown OTLP signal $other")
    })

  def parseOtlpSignal(c: Column): Column =
    udf(new UDF1[Array[Byte], String] {
      override def call(b: Array[Byte]): String =
        if (b == null) null else Try(decode(b)._1).getOrElse(null)
    }, StringType).apply(c)

  // ------------------------------------------------- encode arm
  //
  // The inverse of the decode above (reference
  // `lib/codecs/src/encoding/format/otlp.rs`: the serializer is "the
  // inverse of what the opentelemetry source does when decoding,
  // ensuring round-trip compatibility", dispatching on the top-level
  // resourceLogs / resourceMetrics / resourceSpans field,
  // otlp.rs:100-126). Fields are emitted in ascending field-number
  // order — the canonical protobuf layout prost produces — so a frame
  // built by the reference's own encoder decodes and re-encodes
  // byte-exactly. Subset limits mirror the decoder: exemplars,
  // exponential_histogram and Metric.metadata were dropped on decode
  // and so cannot round-trip; everything the decoder keeps does.

  import ProtoWire.Writer

  private def encBad(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def jLong(n: JsonNode): Long =
    if (n.isBigInteger) n.bigIntegerValue().longValue() else n.asLong()
  private def unhex(s: String): Array[Byte] = {
    if (s.length % 2 != 0) encBad(s"odd-length hex id: $s")
    Array.tabulate(s.length / 2)(i => Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte)
  }
  private def wStr(w: Writer, f: Int, o: JsonNode, k: String): Unit =
    if (o.has(k)) { w.writeLenDelim(f, utf8e(o.get(k).asText())); () }
  private def wVarint(w: Writer, f: Int, o: JsonNode, k: String): Unit =
    if (o.has(k)) { w.writeTag(f, 0).writeVarint(jLong(o.get(k))); () }
  private def wFixed64(w: Writer, f: Int, o: JsonNode, k: String): Unit =
    if (o.has(k)) { w.writeTag(f, 1).writeFixed64(jLong(o.get(k))); () }
  private def wDouble(w: Writer, f: Int, o: JsonNode, k: String): Unit =
    if (o.has(k)) { w.writeTag(f, 1).writeFixed64(java.lang.Double.doubleToLongBits(o.get(k).asDouble())); () }
  private def wFixed32(w: Writer, f: Int, o: JsonNode, k: String): Unit =
    if (o.has(k)) { w.writeTag(f, 5).writeFixed32(jLong(o.get(k))); () }
  private def wHex(w: Writer, f: Int, o: JsonNode, k: String): Unit =
    if (o.has(k)) { w.writeLenDelim(f, unhex(o.get(k).asText())); () }
  private def utf8e(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
  private def each(o: JsonNode, k: String)(f: JsonNode => Unit): Unit =
    if (o.has(k)) { val it = o.get(k).elements(); while (it.hasNext) f(it.next()) }

  private def encAnyValue(o: JsonNode): Array[Byte] = {
    val w = new Writer
    if (o.has("stringValue")) w.writeLenDelim(1, utf8e(o.get("stringValue").asText()))
    else if (o.has("boolValue")) w.writeTag(2, 0).writeVarint(if (o.get("boolValue").asBoolean()) 1L else 0L)
    else if (o.has("intValue")) w.writeTag(3, 0).writeVarint(jLong(o.get("intValue")))
    else if (o.has("doubleValue")) w.writeTag(4, 1).writeFixed64(java.lang.Double.doubleToLongBits(o.get("doubleValue").asDouble()))
    else if (o.has("arrayValue")) {
      val inner = new Writer
      each(o.get("arrayValue"), "values")(v => { inner.writeLenDelim(1, encAnyValue(v)); () })
      w.writeLenDelim(5, inner.toBytes)
    } else if (o.has("kvlistValue")) {
      val inner = new Writer
      each(o.get("kvlistValue"), "values")(v => { inner.writeLenDelim(1, encKeyValue(v)); () })
      w.writeLenDelim(6, inner.toBytes)
    } else if (o.has("bytesValue"))
      w.writeLenDelim(7, Base64.getDecoder.decode(o.get("bytesValue").asText()))
    w.toBytes // empty AnyValue {} encodes to zero bytes, like proto3
  }

  private def encKeyValue(o: JsonNode): Array[Byte] = {
    val w = new Writer
    wStr(w, 1, o, "key")
    if (o.has("value")) w.writeLenDelim(2, encAnyValue(o.get("value")))
    w.toBytes
  }

  private def encResource(o: JsonNode): Array[Byte] = {
    val w = new Writer
    each(o, "attributes")(a => { w.writeLenDelim(1, encKeyValue(a)); () })
    wVarint(w, 2, o, "droppedAttributesCount")
    w.toBytes
  }

  private def encScope(o: JsonNode): Array[Byte] = {
    val w = new Writer
    wStr(w, 1, o, "name"); wStr(w, 2, o, "version")
    each(o, "attributes")(a => { w.writeLenDelim(3, encKeyValue(a)); () })
    wVarint(w, 4, o, "droppedAttributesCount")
    w.toBytes
  }

  private def encLogRecord(o: JsonNode): Array[Byte] = {
    val w = new Writer
    wFixed64(w, 1, o, "timeUnixNano")
    wVarint(w, 2, o, "severityNumber")
    wStr(w, 3, o, "severityText")
    if (o.has("body")) w.writeLenDelim(5, encAnyValue(o.get("body")))
    each(o, "attributes")(a => { w.writeLenDelim(6, encKeyValue(a)); () })
    wVarint(w, 7, o, "droppedAttributesCount")
    wFixed32(w, 8, o, "flags")
    wHex(w, 9, o, "traceId"); wHex(w, 10, o, "spanId")
    wFixed64(w, 11, o, "observedTimeUnixNano")
    wStr(w, 12, o, "eventName")
    w.toBytes
  }

  private def encScopedList(o: JsonNode, listKey: String,
                            item: JsonNode => Array[Byte]): Array[Byte] = {
    val w = new Writer
    if (o.has("scope")) w.writeLenDelim(1, encScope(o.get("scope")))
    each(o, listKey)(i => { w.writeLenDelim(2, item(i)); () })
    wStr(w, 3, o, "schemaUrl")
    w.toBytes
  }

  private def encResourceBlock(o: JsonNode, scopesKey: String, listKey: String,
                               item: JsonNode => Array[Byte]): Array[Byte] = {
    val w = new Writer
    if (o.has("resource")) w.writeLenDelim(1, encResource(o.get("resource")))
    each(o, scopesKey)(s => { w.writeLenDelim(2, encScopedList(s, listKey, item)); () })
    wStr(w, 3, o, "schemaUrl")
    w.toBytes
  }

  private def encNumberDataPoint(o: JsonNode): Array[Byte] = {
    val w = new Writer
    wFixed64(w, 2, o, "startTimeUnixNano"); wFixed64(w, 3, o, "timeUnixNano")
    wDouble(w, 4, o, "asDouble")
    wFixed64(w, 6, o, "asInt") // sfixed64
    each(o, "attributes")(a => { w.writeLenDelim(7, encKeyValue(a)); () })
    wVarint(w, 8, o, "flags")
    w.toBytes
  }

  private def encHistogramDataPoint(o: JsonNode): Array[Byte] = {
    val w = new Writer
    wFixed64(w, 2, o, "startTimeUnixNano"); wFixed64(w, 3, o, "timeUnixNano")
    wFixed64(w, 4, o, "count"); wDouble(w, 5, o, "sum")
    if (o.has("bucketCounts")) { // packed fixed64, prost's proto3 default
      val p = new Writer
      each(o, "bucketCounts")(c => { p.writeFixed64(jLong(c)); () })
      w.writeLenDelim(6, p.toBytes)
    }
    if (o.has("explicitBounds")) { // packed double
      val p = new Writer
      each(o, "explicitBounds")(c => { p.writeFixed64(java.lang.Double.doubleToLongBits(c.asDouble())); () })
      w.writeLenDelim(7, p.toBytes)
    }
    each(o, "attributes")(a => { w.writeLenDelim(9, encKeyValue(a)); () })
    wVarint(w, 10, o, "flags")
    wDouble(w, 11, o, "min"); wDouble(w, 12, o, "max")
    w.toBytes
  }

  private def encSummaryDataPoint(o: JsonNode): Array[Byte] = {
    val w = new Writer
    wFixed64(w, 2, o, "startTimeUnixNano"); wFixed64(w, 3, o, "timeUnixNano")
    wFixed64(w, 4, o, "count"); wDouble(w, 5, o, "sum")
    each(o, "quantileValues") { q =>
      val qw = new Writer
      wDouble(qw, 1, q, "quantile"); wDouble(qw, 2, q, "value")
      w.writeLenDelim(6, qw.toBytes); ()
    }
    each(o, "attributes")(a => { w.writeLenDelim(7, encKeyValue(a)); () })
    wVarint(w, 8, o, "flags")
    w.toBytes
  }

  private def encDataPoints(o: JsonNode, point: JsonNode => Array[Byte],
                            tail: Writer => Unit = _ => ()): Array[Byte] = {
    val w = new Writer
    each(o, "dataPoints")(p => { w.writeLenDelim(1, point(p)); () })
    tail(w)
    w.toBytes
  }

  private def encMetric(o: JsonNode): Array[Byte] = {
    val w = new Writer
    wStr(w, 1, o, "name"); wStr(w, 2, o, "description"); wStr(w, 3, o, "unit")
    if (o.has("gauge")) w.writeLenDelim(5, encDataPoints(o.get("gauge"), encNumberDataPoint))
    if (o.has("sum")) w.writeLenDelim(7, encDataPoints(o.get("sum"), encNumberDataPoint, { tw =>
      wVarint(tw, 2, o.get("sum"), "aggregationTemporality")
      if (o.get("sum").has("isMonotonic"))
        tw.writeTag(3, 0).writeVarint(if (o.get("sum").get("isMonotonic").asBoolean()) 1L else 0L): Unit
    }))
    if (o.has("histogram")) w.writeLenDelim(9, encDataPoints(o.get("histogram"), encHistogramDataPoint,
      tw => wVarint(tw, 2, o.get("histogram"), "aggregationTemporality")))
    if (o.has("summary")) w.writeLenDelim(11, encDataPoints(o.get("summary"), encSummaryDataPoint))
    w.toBytes
  }

  private def encSpanEvent(o: JsonNode): Array[Byte] = {
    val w = new Writer
    wFixed64(w, 1, o, "timeUnixNano"); wStr(w, 2, o, "name")
    each(o, "attributes")(a => { w.writeLenDelim(3, encKeyValue(a)); () })
    w.toBytes
  }

  private def encSpanLink(o: JsonNode): Array[Byte] = {
    val w = new Writer
    wHex(w, 1, o, "traceId"); wHex(w, 2, o, "spanId"); wStr(w, 3, o, "traceState")
    each(o, "attributes")(a => { w.writeLenDelim(4, encKeyValue(a)); () })
    w.toBytes
  }

  private def encSpan(o: JsonNode): Array[Byte] = {
    val w = new Writer
    wHex(w, 1, o, "traceId"); wHex(w, 2, o, "spanId")
    wStr(w, 3, o, "traceState"); wHex(w, 4, o, "parentSpanId")
    wStr(w, 5, o, "name"); wVarint(w, 6, o, "kind")
    wFixed64(w, 7, o, "startTimeUnixNano"); wFixed64(w, 8, o, "endTimeUnixNano")
    each(o, "attributes")(a => { w.writeLenDelim(9, encKeyValue(a)); () })
    wVarint(w, 10, o, "droppedAttributesCount")
    each(o, "events")(e => { w.writeLenDelim(11, encSpanEvent(e)); () })
    wVarint(w, 12, o, "droppedEventsCount")
    each(o, "links")(l => { w.writeLenDelim(13, encSpanLink(l)); () })
    wVarint(w, 14, o, "droppedLinksCount")
    if (o.has("status")) {
      val s = o.get("status"); val sw = new Writer
      wStr(sw, 2, s, "message"); wVarint(sw, 3, s, "code")
      w.writeLenDelim(15, sw.toBytes)
    }
    w.toBytes
  }

  /** Event tree -> Export*ServiceRequest bytes. Dispatches on the
    * top-level resourceLogs / resourceMetrics / resourceSpans field like
    * the reference serializer (otlp.rs:103-126); anything else raises
    * the reference's "does not contain OTLP top-level fields" error.
    */
  def encode(tree: JsonNode): Array[Byte] = {
    val w = new Writer
    if (tree.has("resourceLogs"))
      each(tree, "resourceLogs")(r => { w.writeLenDelim(1, encResourceBlock(r, "scopeLogs", "logRecords", encLogRecord)); () })
    else if (tree.has("resourceMetrics"))
      each(tree, "resourceMetrics")(r => { w.writeLenDelim(1, encResourceBlock(r, "scopeMetrics", "metrics", encMetric)); () })
    else if (tree.has("resourceSpans"))
      each(tree, "resourceSpans")(r => { w.writeLenDelim(1, encResourceBlock(r, "scopeSpans", "spans", encSpan)); () })
    else encBad("Log event does not contain OTLP top-level fields (resourceLogs or resourceMetrics or resourceSpans)")
    w.toBytes
  }

  /** Column API: json line of a single-field OTLP event -> frame bytes;
    * null where the event is not an OTLP tree (dropped channel).
    */
  def encodeOtlp(c: Column): Column =
    udf(new UDF1[String, Array[Byte]] {
      override def call(s: String): Array[Byte] =
        if (s == null) null
        else Try(encode(mapper.readTree(s))).getOrElse(null)
    }, org.apache.spark.sql.types.BinaryType).apply(c)
}
