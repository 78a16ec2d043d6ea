package graft.functions

import java.math.BigInteger
import java.nio.charset.StandardCharsets

import scala.util.Try

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types.{BinaryType, StringType}

import ProtoWire.{Reader, WField, Writer}

/** Vector's `native` codec — the protobuf form of the event model
  * (`lib/vector-core/proto/event.proto`, used by
  * `lib/codecs/src/{encoding,decoding}/format/native.rs`) — built on the
  * ProtoWire kernel (no protobuf jar). Decode produces the SAME
  * representation as the `native_json` codec (one-arm envelope line), so
  * the two formats are interchangeable downstream, exactly like the
  * reference where both decode into one internal event model. The spec
  * proves that equivalence over the reference's own paired fixture
  * corpus (`native_encoding/proto/NNNN.pb` vs `json/NNNN.json`).
  *
  * Model conversions mirrored from the reference's decode path
  * (event.proto + vector-core From impls):
  *   - legacy metric variants upgrade: Distribution1 zips
  *     values/sample_rates into samples; AggregatedHistogram1/2 zip into
  *     {upper_limit, count} buckets; AggregatedSummary1 zips
  *     quantiles/values — all rendered in the current (v3) json shape;
  *   - `set` values form a sorted, deduplicated set (BTreeSet) — sorted
  *     by UTF-8 bytes, not UTF-16 code units;
  *   - u32/u64 counts and rates stay unsigned (BigInteger beyond i64);
  *   - timestamps render RFC3339 with chrono AutoSi precision (none /
  *     3 / 6 / 9 fractional digits);
  *   - tags_v2 wins over tags_v1 when both are present; a bare tag
  *     (TagValue without a value) renders null;
  *   - proto3 zero-defaults (empty namespace, interval_ms 0, kind
  *     Incremental) follow the json codec's omit rules.
  * Encode emits current-version variants (Distribution2,
  * AggregatedHistogram3, AggregatedSummary3), like the reference's
  * encoder.
  */
object NativeProto {

  private val mapper = new ObjectMapper()
  private val F = JsonNodeFactory.instance

  // ============================================================ decode

  private def fields(b: Array[Byte]): Vector[WField] = new Reader(b).readAll()
  private def str(b: Array[Byte]): String = new String(b, StandardCharsets.UTF_8)

  private def tsString(sec: Long, nanos: Int): String = {
    val ldt = java.time.LocalDateTime.ofEpochSecond(sec, nanos, java.time.ZoneOffset.UTC)
    val base = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss").format(ldt)
    if (nanos == 0) s"${base}Z"
    else if (nanos % 1000000 == 0) f"$base.${nanos / 1000000}%03dZ"
    else if (nanos % 1000 == 0) f"$base.${nanos / 1000}%06dZ"
    else f"$base.$nanos%09dZ"
  }

  private def decodeTimestamp(b: Array[Byte]): String = {
    var sec = 0L; var nanos = 0
    fields(b).foreach {
      case WField(1, 0, v, _) => sec = v
      case WField(2, 0, v, _) => nanos = v.toInt
      case _ => ()
    }
    tsString(sec, nanos)
  }

  /** event.proto Value (recursive oneof) -> json node. */
  private def decodeValue(b: Array[Byte]): JsonNode = {
    var out: JsonNode = F.nullNode() // proto3: no field set = null value
    fields(b).foreach {
      case WField(1, 2, _, raw) => out = F.textNode(str(raw))
      case WField(2, 2, _, ts) => out = F.textNode(decodeTimestamp(ts))
      case WField(4, 0, v, _) => out = F.numberNode(v)
      case WField(5, 1, v, _) => out = F.numberNode(java.lang.Double.longBitsToDouble(v))
      case WField(6, 0, v, _) => out = F.booleanNode(v != 0L)
      case WField(7, 2, _, m) => // ValueMap{fields map<string,Value>}
        val o = F.objectNode()
        fields(m).foreach {
          case WField(1, 2, _, entry) =>
            var k = ""; var v: JsonNode = F.nullNode()
            fields(entry).foreach {
              case WField(1, 2, _, kb) => k = str(kb)
              case WField(2, 2, _, vb) => v = decodeValue(vb)
              case _ => ()
            }
            o.set[JsonNode](k, v): Unit
          case _ => ()
        }
        out = o
      case WField(8, 2, _, a) => // ValueArray{items}
        val arr = F.arrayNode()
        fields(a).foreach {
          case WField(1, 2, _, item) => arr.add(decodeValue(item)): Unit
          case _ => ()
        }
        out = arr
      case WField(9, 0, _, _) => out = F.nullNode()
      case _ => ()
    }
    out
  }

  private def decodeFieldsMap(entries: Seq[Array[Byte]]): ObjectNode = {
    val o = F.objectNode()
    entries.foreach { entry =>
      var k = ""; var v: JsonNode = F.nullNode()
      fields(entry).foreach {
        case WField(1, 2, _, kb) => k = str(kb)
        case WField(2, 2, _, vb) => v = decodeValue(vb)
        case _ => ()
      }
      o.set[JsonNode](k, v): Unit
    }
    o
  }

  private def u32(v: Long): Long = v & 0xffffffffL
  private def u64Node(v: Long): JsonNode =
    if (v >= 0) F.numberNode(v)
    else F.numberNode(new BigInteger(java.lang.Long.toUnsignedString(v)))

  private def bucketNode(upper: Double, count: Long): ObjectNode = {
    val o = F.objectNode()
    o.set[JsonNode]("upper_limit", F.numberNode(upper))
    o.set[JsonNode]("count", u64Node(count))
    o
  }

  private def quantileNode(q: Double, v: Double): ObjectNode = {
    val o = F.objectNode()
    o.set[JsonNode]("quantile", F.numberNode(q))
    o.set[JsonNode]("value", F.numberNode(v))
    o
  }

  private def sampleNode(v: Double, rate: Long): ObjectNode = {
    val o = F.objectNode()
    o.set[JsonNode]("value", F.numberNode(v))
    o.set[JsonNode]("rate", F.numberNode(rate)) // u32 fits in long
    o
  }

  private val utf8Order: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    var c = 0
    while (i < n && c == 0) {
      c = (x(i) & 0xff) - (y(i) & 0xff)
      i += 1
    }
    if (c != 0) c else x.length - y.length
  }

  private def decodeMetric(b: Array[Byte]): ObjectNode = {
    val m = F.objectNode()
    var kindId = 0L
    var arm: (String, JsonNode) = null
    val tagsV1 = F.objectNode(); val tagsV2 = F.objectNode()
    var interval = 0L

    def statName(id: Long): String = if (id == 1L) "summary" else "histogram"

    fields(b).foreach {
      case WField(1, 2, _, v) => m.set[JsonNode]("name", F.textNode(str(v)))
      case WField(11, 2, _, v) if v.nonEmpty => m.set[JsonNode]("namespace", F.textNode(str(v)))
      case WField(2, 2, _, v) => m.set[JsonNode]("timestamp", F.textNode(decodeTimestamp(v)))
      case WField(18, 0, v, _) => interval = u32(v)
      case WField(4, 0, v, _) => kindId = v
      case WField(3, 2, _, e) => // tags_v1 entry
        var k = ""; var v = ""
        fields(e).foreach {
          case WField(1, 2, _, kb) => k = str(kb)
          case WField(2, 2, _, vb) => v = str(vb)
          case _ => ()
        }
        tagsV1.set[JsonNode](k, F.textNode(v)): Unit
      case WField(20, 2, _, e) => // tags_v2 entry: TagValues{values: TagValue{value?}}
        var k = ""; var v: JsonNode = F.nullNode()
        fields(e).foreach {
          case WField(1, 2, _, kb) => k = str(kb)
          case WField(2, 2, _, tvs) =>
            fields(tvs).foreach {
              case WField(1, 2, _, tv) =>
                v = F.nullNode() // bare tag unless a value field appears
                fields(tv).foreach {
                  case WField(1, 2, _, s) => v = F.textNode(str(s))
                  case _ => ()
                }
              case _ => ()
            }
          case _ => ()
        }
        tagsV2.set[JsonNode](k, v): Unit
      case WField(5, 2, _, v) => // counter
        val o = F.objectNode()
        fields(v).foreach { case WField(1, 1, bits, _) =>
          o.set[JsonNode]("value", F.numberNode(java.lang.Double.longBitsToDouble(bits)))
          case _ => () }
        if (!o.has("value")) o.set[JsonNode]("value", F.numberNode(0.0))
        arm = ("counter", o)
      case WField(6, 2, _, v) => // gauge
        val o = F.objectNode()
        fields(v).foreach { case WField(1, 1, bits, _) =>
          o.set[JsonNode]("value", F.numberNode(java.lang.Double.longBitsToDouble(bits)))
          case _ => () }
        if (!o.has("value")) o.set[JsonNode]("value", F.numberNode(0.0))
        arm = ("gauge", o)
      case WField(7, 2, _, v) => // set -> sorted unique values (BTreeSet)
        val vals = fields(v).collect { case WField(1, 2, _, s) => str(s) }
        val o = F.objectNode()
        val a = F.arrayNode()
        vals.distinct.sorted(utf8Order).foreach(a.add)
        o.set[JsonNode]("values", a)
        arm = ("set", o)
      case WField(8, 2, _, v) => // Distribution1{values, sample_rates, statistic}
        val values = Vector.newBuilder[Double]; val rates = Vector.newBuilder[Long]
        var stat = 0L
        fields(v).foreach {
          case WField(1, 1, bits, _) => values += java.lang.Double.longBitsToDouble(bits)
          case WField(1, 2, _, packed) => // packed doubles
            val r = new Reader(packed)
            while (r.hasMore) values += java.lang.Double.longBitsToDouble(r.readFixed64())
          case WField(2, 0, x, _) => rates += u32(x)
          case WField(2, 2, _, packed) =>
            val r = new Reader(packed)
            while (r.hasMore) rates += u32(r.readVarint())
          case WField(3, 0, x, _) => stat = x
          case _ => ()
        }
        val o = F.objectNode(); val a = F.arrayNode()
        values.result().zip(rates.result()).foreach { case (x, rt) => a.add(sampleNode(x, rt)) }
        o.set[JsonNode]("samples", a)
        o.set[JsonNode]("statistic", F.textNode(statName(stat)))
        arm = ("distribution", o)
      case WField(12, 2, _, v) => // Distribution2{samples, statistic}
        val o = F.objectNode(); val a = F.arrayNode()
        var stat = 0L
        fields(v).foreach {
          case WField(1, 2, _, s) =>
            var value = 0.0; var rate = 0L
            fields(s).foreach {
              case WField(1, 1, bits, _) => value = java.lang.Double.longBitsToDouble(bits)
              case WField(2, 0, x, _) => rate = u32(x)
              case _ => ()
            }
            a.add(sampleNode(value, rate)): Unit
          case WField(2, 0, x, _) => stat = x
          case _ => ()
        }
        o.set[JsonNode]("samples", a)
        o.set[JsonNode]("statistic", F.textNode(statName(stat)))
        arm = ("distribution", o)
      case WField(9, 2, _, v) => // AggregatedHistogram1{buckets[], counts[], count u32, sum}
        val uppers = Vector.newBuilder[Double]; val counts = Vector.newBuilder[Long]
        var count = 0L; var sum = 0.0
        fields(v).foreach {
          case WField(1, 1, bits, _) => uppers += java.lang.Double.longBitsToDouble(bits)
          case WField(1, 2, _, p) =>
            val r = new Reader(p); while (r.hasMore) uppers += java.lang.Double.longBitsToDouble(r.readFixed64())
          case WField(2, 0, x, _) => counts += u32(x)
          case WField(2, 2, _, p) =>
            val r = new Reader(p); while (r.hasMore) counts += u32(r.readVarint())
          case WField(3, 0, x, _) => count = u32(x)
          case WField(4, 1, bits, _) => sum = java.lang.Double.longBitsToDouble(bits)
          case _ => ()
        }
        val o = F.objectNode(); val a = F.arrayNode()
        uppers.result().zip(counts.result()).foreach { case (u, c) => a.add(bucketNode(u, c)) }
        o.set[JsonNode]("buckets", a)
        o.set[JsonNode]("count", u64Node(count)); o.set[JsonNode]("sum", F.numberNode(sum))
        arm = ("aggregated_histogram", o)
      case WField(n, 2, _, v) if n == 13 || n == 16 => // AggregatedHistogram2/3
        val o = F.objectNode(); val a = F.arrayNode()
        var count = 0L; var sum = 0.0
        fields(v).foreach {
          case WField(1, 2, _, bkt) =>
            var upper = 0.0; var c = 0L
            fields(bkt).foreach {
              case WField(1, 1, bits, _) => upper = java.lang.Double.longBitsToDouble(bits)
              case WField(2, 0, x, _) => c = if (n == 13) u32(x) else x
              case _ => ()
            }
            a.add(bucketNode(upper, c)): Unit
          case WField(2, 0, x, _) => count = if (n == 13) u32(x) else x
          case WField(3, 1, bits, _) => sum = java.lang.Double.longBitsToDouble(bits)
          case _ => ()
        }
        o.set[JsonNode]("buckets", a)
        o.set[JsonNode]("count", u64Node(count)); o.set[JsonNode]("sum", F.numberNode(sum))
        arm = ("aggregated_histogram", o)
      case WField(10, 2, _, v) => // AggregatedSummary1{quantiles[], values[], count u32, sum}
        val qs = Vector.newBuilder[Double]; val vs = Vector.newBuilder[Double]
        var count = 0L; var sum = 0.0
        fields(v).foreach {
          case WField(1, 1, bits, _) => qs += java.lang.Double.longBitsToDouble(bits)
          case WField(1, 2, _, p) =>
            val r = new Reader(p); while (r.hasMore) qs += java.lang.Double.longBitsToDouble(r.readFixed64())
          case WField(2, 1, bits, _) => vs += java.lang.Double.longBitsToDouble(bits)
          case WField(2, 2, _, p) =>
            val r = new Reader(p); while (r.hasMore) vs += java.lang.Double.longBitsToDouble(r.readFixed64())
          case WField(3, 0, x, _) => count = u32(x)
          case WField(4, 1, bits, _) => sum = java.lang.Double.longBitsToDouble(bits)
          case _ => ()
        }
        val o = F.objectNode(); val a = F.arrayNode()
        qs.result().zip(vs.result()).foreach { case (q, x) => a.add(quantileNode(q, x)) }
        o.set[JsonNode]("quantiles", a)
        o.set[JsonNode]("count", u64Node(count)); o.set[JsonNode]("sum", F.numberNode(sum))
        arm = ("aggregated_summary", o)
      case WField(n, 2, _, v) if n == 14 || n == 17 => // AggregatedSummary2/3
        val o = F.objectNode(); val a = F.arrayNode()
        var count = 0L; var sum = 0.0
        fields(v).foreach {
          case WField(1, 2, _, qn) =>
            var q = 0.0; var x = 0.0
            fields(qn).foreach {
              case WField(1, 1, bits, _) => q = java.lang.Double.longBitsToDouble(bits)
              case WField(2, 1, bits, _) => x = java.lang.Double.longBitsToDouble(bits)
              case _ => ()
            }
            a.add(quantileNode(q, x)): Unit
          case WField(2, 0, x, _) => count = if (n == 14) u32(x) else x
          case WField(3, 1, bits, _) => sum = java.lang.Double.longBitsToDouble(bits)
          case _ => ()
        }
        o.set[JsonNode]("quantiles", a)
        o.set[JsonNode]("count", u64Node(count)); o.set[JsonNode]("sum", F.numberNode(sum))
        arm = ("aggregated_summary", o)
      case WField(15, 2, _, v) => // Sketch{agent_dd_sketch}
        fields(v).foreach {
          case WField(1, 2, _, dd) =>
            var count = 0L; var min = 0.0; var max = 0.0; var sum = 0.0; var avg = 0.0
            val ks = Vector.newBuilder[Long]; val ns = Vector.newBuilder[Long]
            fields(dd).foreach {
              case WField(1, 0, x, _) => count = u32(x)
              case WField(2, 1, bits, _) => min = java.lang.Double.longBitsToDouble(bits)
              case WField(3, 1, bits, _) => max = java.lang.Double.longBitsToDouble(bits)
              case WField(4, 1, bits, _) => sum = java.lang.Double.longBitsToDouble(bits)
              case WField(5, 1, bits, _) => avg = java.lang.Double.longBitsToDouble(bits)
              case WField(6, 0, x, _) => ks += ProtoWire.zigzagDecode(x)
              case WField(6, 2, _, p) =>
                val r = new Reader(p); while (r.hasMore) ks += ProtoWire.zigzagDecode(r.readVarint())
              case WField(7, 0, x, _) => ns += u32(x)
              case WField(7, 2, _, p) =>
                val r = new Reader(p); while (r.hasMore) ns += u32(r.readVarint())
              case _ => ()
            }
            val bins = F.objectNode()
            val ka = F.arrayNode(); ks.result().foreach(ka.add)
            val na = F.arrayNode(); ns.result().foreach(na.add)
            bins.set[JsonNode]("k", ka); bins.set[JsonNode]("n", na)
            val inner = F.objectNode()
            inner.set[JsonNode]("bins", bins)
            inner.set[JsonNode]("count", u64Node(count))
            inner.set[JsonNode]("min", F.numberNode(min))
            inner.set[JsonNode]("max", F.numberNode(max))
            inner.set[JsonNode]("sum", F.numberNode(sum))
            inner.set[JsonNode]("avg", F.numberNode(avg))
            val wrap = F.objectNode(); wrap.set[JsonNode]("AgentDDSketch", inner)
            val o = F.objectNode(); o.set[JsonNode]("sketch", wrap)
            arm = ("sketch", o)
          case _ => ()
        }
      case _ => () // metadata / unknown: not part of the json form
    }

    if (interval != 0) m.set[JsonNode]("interval_ms", F.numberNode(interval)): Unit
    val tags = if (tagsV2.size() > 0) tagsV2 else tagsV1
    if (tags.size() > 0) m.set[JsonNode]("tags", tags): Unit
    m.set[JsonNode]("kind", F.textNode(if (kindId == 1L) "absolute" else "incremental"))
    if (arm != null) m.set[JsonNode](arm._1, arm._2): Unit
    m
  }

  private def decodeLog(b: Array[Byte]): JsonNode = {
    // Log{fields map 1, value 2, metadata 3/4 (not part of the json form)}
    var node: JsonNode = null
    val entries = Seq.newBuilder[Array[Byte]]
    fields(b).foreach {
      case WField(1, 2, _, e) => entries += e
      case WField(2, 2, _, v) => node = decodeValue(v)
      case _ => ()
    }
    if (node != null) node else decodeFieldsMap(entries.result())
  }

  private def decodeTrace(b: Array[Byte]): ObjectNode = {
    val entries = Seq.newBuilder[Array[Byte]]
    fields(b).foreach {
      case WField(1, 2, _, e) => entries += e
      case _ => ()
    }
    decodeFieldsMap(entries.result())
  }

  private def envNode(arm: String, v: JsonNode): ObjectNode = {
    val env = F.objectNode(); env.set[JsonNode](arm, v); env
  }

  /** Decode a `native` frame — an EventArray (the form both the encoder
    * and decoder use: Log/Metric/TraceArray of events, event.proto:4-19)
    * — to one native_json envelope node per event.
    */
  def decodeAllToNodes(frame: Array[Byte]): Seq[ObjectNode] =
    fields(frame).flatMap {
      case WField(1, 2, _, arr) => // LogArray{logs 1}
        fields(arr).collect { case WField(1, 2, _, b) => envNode("log", decodeLog(b)) }
      case WField(2, 2, _, arr) => // MetricArray{metrics 1}
        fields(arr).collect { case WField(1, 2, _, b) => envNode("metric", decodeMetric(b)) }
      case WField(3, 2, _, arr) => // TraceArray{traces 1}
        fields(arr).collect { case WField(1, 2, _, b) => envNode("trace", decodeTrace(b)) }
      case _ => Vector.empty
    }

  /** Single-event frame convenience (the fixture corpus is 1:1). */
  def decodeToNode(frame: Array[Byte]): ObjectNode = {
    val all = decodeAllToNodes(frame)
    require(all.size == 1, s"frame carries ${all.size} events")
    all.head
  }

  def decodeToJson(frame: Array[Byte]): Seq[String] =
    decodeAllToNodes(frame).map(mapper.writeValueAsString(_))

  // ============================================================ encode

  private def encodeTimestamp(iso: String): Array[Byte] = {
    val inst = java.time.Instant.parse(iso)
    val w = new Writer
    if (inst.getEpochSecond != 0) w.writeTag(1, 0).writeVarint(inst.getEpochSecond)
    if (inst.getNano != 0) w.writeTag(2, 0).writeVarint(inst.getNano.toLong)
    w.toBytes
  }

  private val TsRe =
    """\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})""".r

  private def encodeValue(n: JsonNode): Array[Byte] = {
    val w = new Writer
    if (n == null || n.isNull) w.writeTag(9, 0).writeVarint(0L)
    else if (n.isTextual) {
      val s = n.asText()
      if (TsRe.pattern.matcher(s).matches() && Try(java.time.Instant.parse(s)).isSuccess)
        w.writeLenDelim(2, encodeTimestamp(s))
      else w.writeLenDelim(1, s.getBytes(StandardCharsets.UTF_8))
    }
    else if (n.isBoolean) w.writeTag(6, 0).writeVarint(if (n.asBoolean()) 1 else 0)
    else if (n.isIntegralNumber && n.canConvertToLong)
      w.writeTag(4, 0).writeVarint(n.asLong())
    else if (n.isNumber)
      w.writeTag(5, 1).writeFixed64(java.lang.Double.doubleToLongBits(n.asDouble()))
    else if (n.isArray) {
      val inner = new Writer
      n.forEach(item => { inner.writeLenDelim(1, encodeValue(item)); () })
      w.writeLenDelim(8, inner.toBytes)
    }
    else if (n.isObject) {
      val inner = new Writer
      n.properties().forEach { e =>
        val entry = new Writer
        entry.writeLenDelim(1, e.getKey.getBytes(StandardCharsets.UTF_8))
        entry.writeLenDelim(2, encodeValue(e.getValue))
        inner.writeLenDelim(1, entry.toBytes)
        ()
      }
      w.writeLenDelim(7, inner.toBytes)
    }
    else throw new IllegalArgumentException(s"unencodable value $n")
    w.toBytes
  }

  private def bigUnsigned(n: JsonNode): Long =
    if (n.canConvertToLong) n.asLong() else n.bigIntegerValue().longValue()

  private def encodeMetric(m: JsonNode): Array[Byte] = {
    val w = new Writer
    w.writeLenDelim(1, m.get("name").asText().getBytes(StandardCharsets.UTF_8))
    if (m.has("timestamp")) w.writeLenDelim(2, encodeTimestamp(m.get("timestamp").asText()))
    if (m.has("kind") && m.get("kind").asText() == "absolute") w.writeTag(4, 0).writeVarint(1L)
    if (m.has("namespace")) w.writeLenDelim(11, m.get("namespace").asText().getBytes(StandardCharsets.UTF_8))
    if (m.has("interval_ms")) w.writeTag(18, 0).writeVarint(m.get("interval_ms").asLong())
    // mirror the reference encoder: EVERY tag goes to tags_v2 (bare
    // tags as a TagValue with no value field — the tags_v1 string path
    // would stamp the literal "null"), and string-valued tags are
    // duplicated into tags_v1 for old decoders; the decode side takes
    // tags_v2 wholesale when present, so v2 must be complete
    if (m.has("tags")) m.get("tags").properties().forEach { e =>
      val tv = new Writer
      if (!e.getValue.isNull)
        tv.writeLenDelim(1, e.getValue.asText().getBytes(StandardCharsets.UTF_8))
      val tvs = new Writer; tvs.writeLenDelim(1, tv.toBytes)
      val v2 = new Writer
      v2.writeLenDelim(1, e.getKey.getBytes(StandardCharsets.UTF_8))
      v2.writeLenDelim(2, tvs.toBytes)
      w.writeLenDelim(20, v2.toBytes)
      if (!e.getValue.isNull) {
        val entry = new Writer
        entry.writeLenDelim(1, e.getKey.getBytes(StandardCharsets.UTF_8))
        entry.writeLenDelim(2, e.getValue.asText().getBytes(StandardCharsets.UTF_8))
        w.writeLenDelim(3, entry.toBytes)
      }
      ()
    }
    def dbl(field: Int, inner: Writer, v: JsonNode): Unit = {
      inner.writeTag(field, 1).writeFixed64(java.lang.Double.doubleToLongBits(v.asDouble())); ()
    }
    if (m.has("counter")) {
      val inner = new Writer; dbl(1, inner, m.get("counter").get("value"))
      w.writeLenDelim(5, inner.toBytes)
    } else if (m.has("gauge")) {
      val inner = new Writer; dbl(1, inner, m.get("gauge").get("value"))
      w.writeLenDelim(6, inner.toBytes)
    } else if (m.has("set")) {
      val inner = new Writer
      m.get("set").get("values").forEach(v =>
        { inner.writeLenDelim(1, v.asText().getBytes(StandardCharsets.UTF_8)); () })
      w.writeLenDelim(7, inner.toBytes)
    } else if (m.has("distribution")) {
      val d = m.get("distribution")
      val inner = new Writer
      d.get("samples").forEach { s =>
        val sw = new Writer
        dbl(1, sw, s.get("value"))
        sw.writeTag(2, 0).writeVarint(s.get("rate").asLong())
        inner.writeLenDelim(1, sw.toBytes)
        ()
      }
      if (d.get("statistic").asText() == "summary") inner.writeTag(2, 0).writeVarint(1L)
      w.writeLenDelim(12, inner.toBytes) // Distribution2
    } else if (m.has("aggregated_histogram")) {
      val h = m.get("aggregated_histogram")
      val inner = new Writer
      h.get("buckets").forEach { bkt =>
        val bw = new Writer
        dbl(1, bw, bkt.get("upper_limit"))
        bw.writeTag(2, 0).writeVarint(bigUnsigned(bkt.get("count")))
        inner.writeLenDelim(1, bw.toBytes)
        ()
      }
      inner.writeTag(2, 0).writeVarint(bigUnsigned(h.get("count")))
      dbl(3, inner, h.get("sum"))
      w.writeLenDelim(16, inner.toBytes) // AggregatedHistogram3
    } else if (m.has("aggregated_summary")) {
      val s = m.get("aggregated_summary")
      val inner = new Writer
      s.get("quantiles").forEach { q =>
        val qw = new Writer
        dbl(1, qw, q.get("quantile")); dbl(2, qw, q.get("value"))
        inner.writeLenDelim(1, qw.toBytes)
        ()
      }
      inner.writeTag(2, 0).writeVarint(bigUnsigned(s.get("count")))
      dbl(3, inner, s.get("sum"))
      w.writeLenDelim(17, inner.toBytes) // AggregatedSummary3
    } else if (m.has("sketch")) {
      val dd = m.get("sketch").get("sketch").get("AgentDDSketch")
      val inner = new Writer
      inner.writeTag(1, 0).writeVarint(bigUnsigned(dd.get("count")))
      dbl(2, inner, dd.get("min")); dbl(3, inner, dd.get("max"))
      dbl(4, inner, dd.get("sum")); dbl(5, inner, dd.get("avg"))
      dd.get("bins").get("k").forEach(k =>
        { inner.writeTag(6, 0).writeVarint(ProtoWire.zigzagEncode(k.asLong())); () })
      dd.get("bins").get("n").forEach(n =>
        { inner.writeTag(7, 0).writeVarint(n.asLong()); () })
      val sk = new Writer; sk.writeLenDelim(1, inner.toBytes)
      w.writeLenDelim(15, sk.toBytes)
    }
    w.toBytes
  }

  /** Encode a native_json envelope line as an EventArray frame carrying
    * one event (the encoder's framing, encoding/format/native.rs).
    */
  def encodeFromJson(line: String): Array[Byte] = {
    val env = mapper.readTree(line)
    val event = new Writer
    val arrayField =
      if (env.has("log")) {
        val log = env.get("log")
        val inner = new Writer
        if (log.isObject) {
          log.properties().forEach { e =>
            val entry = new Writer
            entry.writeLenDelim(1, e.getKey.getBytes(StandardCharsets.UTF_8))
            entry.writeLenDelim(2, encodeValue(e.getValue))
            inner.writeLenDelim(1, entry.toBytes)
            ()
          }
        } else inner.writeLenDelim(2, encodeValue(log))
        event.writeLenDelim(1, inner.toBytes) // LogArray.logs
        1
      } else if (env.has("metric")) {
        event.writeLenDelim(1, encodeMetric(env.get("metric"))) // MetricArray.metrics
        2
      } else if (env.has("trace")) {
        val inner = new Writer
        env.get("trace").properties().forEach { e =>
          val entry = new Writer
          entry.writeLenDelim(1, e.getKey.getBytes(StandardCharsets.UTF_8))
          entry.writeLenDelim(2, encodeValue(e.getValue))
          inner.writeLenDelim(1, entry.toBytes)
          ()
        }
        event.writeLenDelim(1, inner.toBytes) // TraceArray.traces
        3
      } else throw new IllegalArgumentException("not a native_json envelope")
    new Writer().writeLenDelim(arrayField, event.toBytes).toBytes
  }

  // ============================================================ Columns

  /** native (proto) frame -> native_json lines, one per carried event
    * (null on corrupt frames; explode downstream).
    */
  def decodeNative(c: Column): Column =
    udf(new UDF1[Array[Byte], Array[String]] {
      override def call(b: Array[Byte]): Array[String] =
        if (b == null) null else Try(decodeToJson(b).toArray).getOrElse(null)
    }, org.apache.spark.sql.types.ArrayType(StringType)).apply(c)

  /** native_json line -> native (proto) frame. */
  def encodeNative(c: Column): Column =
    udf(new UDF1[String, Array[Byte]] {
      override def call(s: String): Array[Byte] =
        if (s == null) null else Try(encodeFromJson(s)).getOrElse(null)
    }, BinaryType).apply(c)
}
