package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.functions.{ArrowCodec, AvroCodec}
import graft.sources.Tables

/** Oracle rows for the binary codecs (SURVEY.md §2.6 rows 43/46 —
  * avro + arrow, formerly jar-gated / missing).
  *
  * Two kinds of evidence, both portable:
  *   - q_avro pins the avro BINARY itself: for a record whose varints are
  *     all single-byte (short tag string, n < 64 so zigzag(n) < 128), the
  *     datum hex is reconstructible in DuckDB by concatenation —
  *     an independent statement of the avro spec's zigzag/length-prefix
  *     wire format, not a mirrored expression — plus a typed round-trip
  *     through encode -> parse on a second, richer record.
  *   - q_arrow proves the distributed encode -> decode identity: rows ->
  *     partition-local IPC stream blobs -> rows, hashed against the plain
  *     projection by the oracle. The IPC framing itself (stream magic,
  *     EOS, batch bounds) is pinned byte-level in CodecBinarySpec where
  *     DuckDB has no reach.
  */
object CodecQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "events")

  private def e: Column = col("event_id")

  // ------------------------------------------------------------ q_avro

  /** Single-byte-varint record: hex is oracle-reconstructible. */
  private val TagSchema =
    """{"type":"record","name":"T","fields":[
      {"name":"tag","type":"string"},
      {"name":"n","type":"long"}]}"""

  /** Richer record for the typed round-trip leg. */
  private val TurnSchema =
    """{"type":"record","name":"Turn","fields":[
      {"name":"tag","type":"string"},
      {"name":"uid","type":"long"},
      {"name":"val","type":"double"},
      {"name":"flag","type":"boolean"},
      {"name":"note","type":["null","string"],"default":null}]}"""

  private def qAvro(s: SparkSession, dir: String): DataFrame = {
    val tagDatum = AvroCodec.encodeAvro(
      struct(col("event_type").as("tag"), (e % 32).as("n")), TagSchema)
    val turnDatum = AvroCodec.encodeAvro(
      struct(
        col("event_type").as("tag"),
        col("user_id").as("uid"),
        col("value").as("val"),
        (e % 2 === 0).as("flag"),
        when(e % 5 === 0, lit(null: String)).otherwise(col("event_type")).as("note")),
      TurnSchema)
    val rt = AvroCodec.parseAvro(turnDatum, TurnSchema)
    events(s, dir).select(
        e.as("event_id"),
        lower(hex(tagDatum)).as("avro_hex"),
        rt.getField("tag").as("rt_tag"),
        rt.getField("uid").as("rt_uid"),
        rt.getField("val").as("rt_val"),
        rt.getField("flag").cast("int").as("rt_flag"),
        rt.getField("note").as("rt_note"))
      .orderBy("event_id")
  }

  // ------------------------------------------------------------ q_proto

  /** Event record for the protobuf round-trip: scalar coverage (string,
    * int64 via zigzag, double, bool, enum) + a repeated message.
    */
  private val EventDesc: Array[Byte] = {
    import graft.functions.ProtoWire.Writer
    import graft.functions.ProtoDescriptor._
    def utf8(s: String) = s.getBytes("UTF-8")
    def fdp(name: String, number: Int, label: Int, tpe: Int, typeName: String = "") = {
      val w = new Writer
      w.writeLenDelim(1, utf8(name))
      w.writeTag(3, 0).writeVarint(number.toLong)
      w.writeTag(4, 0).writeVarint(label.toLong)
      w.writeTag(5, 0).writeVarint(tpe.toLong)
      if (typeName.nonEmpty) w.writeLenDelim(6, utf8(typeName))
      w.toBytes
    }
    val tag = {
      val w = new Writer
      w.writeLenDelim(1, utf8("Tag"))
      w.writeLenDelim(2, fdp("k", 1, 1, TString))
      w.writeLenDelim(2, fdp("n", 2, 1, TSInt64))
      w.toBytes
    }
    val kind = {
      val w = new Writer
      w.writeLenDelim(1, utf8("Kind"))
      Seq(("CLICK", 0), ("VIEW", 1), ("ERROR", 2), ("PURCHASE", 3), ("SIGNUP", 4))
        .foreach { case (n, num) =>
          val ev = new Writer
          ev.writeLenDelim(1, utf8(n)); ev.writeTag(2, 0).writeVarint(num.toLong)
          w.writeLenDelim(2, ev.toBytes)
        }
      w.toBytes
    }
    val ev = {
      val w = new Writer
      w.writeLenDelim(1, utf8("Ev"))
      w.writeLenDelim(2, fdp("etype", 1, 1, TString))
      w.writeLenDelim(2, fdp("uid", 2, 1, TSInt64))
      w.writeLenDelim(2, fdp("score", 3, 1, TDouble))
      w.writeLenDelim(2, fdp("flag", 4, 1, TBool))
      w.writeLenDelim(2, fdp("kind", 5, 1, TEnum, ".g.Kind"))
      w.writeLenDelim(2, fdp("tags", 6, 3, TMessage, ".g.Ev.Tag"))
      w.writeLenDelim(3, tag)
      w.toBytes
    }
    val file = {
      val w = new Writer
      w.writeLenDelim(1, utf8("g.proto")); w.writeLenDelim(2, utf8("g"))
      w.writeLenDelim(4, ev); w.writeLenDelim(5, kind)
      w.toBytes
    }
    new Writer().writeLenDelim(1, file).toBytes
  }

  private def qProto(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ProtoCodec
    val kindName = upper(col("event_type"))
    val in = struct(
      col("event_type").as("etype"),
      col("user_id").as("uid"),
      col("value").as("score"),
      (e % 2 === 0).as("flag"),
      kindName.as("kind"),
      array(struct(lit("u").as("k"), col("user_id").as("n")),
        struct(lit("e").as("k"), (-e).as("n"))).as("tags"))
    val wire = ProtoCodec.encodeProto(in, EventDesc, "g.Ev")
    val rt = ProtoCodec.parseProto(wire, EventDesc, "g.Ev")
    events(s, dir).select(
        e.as("event_id"),
        length(wire).as("wire_len"),
        rt.getField("etype").as("rt_etype"),
        rt.getField("uid").as("rt_uid"),
        rt.getField("score").as("rt_score"),
        rt.getField("flag").cast("int").as("rt_flag"),
        rt.getField("kind").as("rt_kind"),
        element_at(rt.getField("tags"), 2).getField("n").as("rt_tag_n"))
      .orderBy("event_id")
  }

  // ------------------------------------------------------------ q_native

  /** native (protobuf) round-trip: a native_json metric line -> proto
    * EventArray frame -> back to the line. The oracle reconstructs the
    * DECODED line independently (decodeMetric's deterministic key
    * order: name, tags, kind, arm) and checks the frame length — tag
    * bytes + varint sizes + fixed64 double, like q_proto.
    */
  private def qNative(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{NativeJson, NativeProto}
    val vt = when(e % 2 === 0, "counter").otherwise("gauge")
    val kind = when(e % 2 === 0, "incremental").otherwise("absolute")
    val line = NativeJson.encodeMetric(concat(lit("m"), e % 5),
      map(lit("tool"), col("event_type")), kind, vt, e + lit(0.5))
    val frame = NativeProto.encodeNative(line)
    val rt = element_at(NativeProto.decodeNative(frame), 1)
    events(s, dir).select(
        e.as("event_id"),
        length(frame).as("frame_len"),
        rt.as("rt_line"))
      .orderBy("event_id")
  }

  // ------------------------------------------------------------ q_arrow

  private def qArrow(s: SparkSession, dir: String): DataFrame = {
    val base = events(s, dir)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val blobs = ArrowCodec.encodeStream(base, batchSize = 256)
    ArrowCodec.decodeStream(blobs, "arrow_ipc", base.schema)
      .select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("ts_iso"),
        col("event_type"),
        col("value"))
      .orderBy("event_id")
  }

  val spark: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q_avro"   -> (qAvro _),
    "q_proto"  -> (qProto _),
    "q_native" -> (qNative _),
    "q_arrow"  -> (qArrow _)
  )

  // ====================================================== DuckDB oracle

  val oracle: ListMap[String, String] = ListMap(
    "q_avro" ->
      // datum = varint(zigzag(len(tag))) + tag-bytes + varint(zigzag(n)):
      // all varints single-byte by construction (len<=8, n<32)
      """SELECT event_id,
           lower(lpad(hex(length(event_type) * 2), 2, '0')
             || hex(encode(event_type))
             || lpad(hex(2 * (event_id % 32)), 2, '0')) AS avro_hex,
           event_type AS rt_tag,
           user_id AS rt_uid,
           "value" AS rt_val,
           CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS rt_flag,
           CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_type END AS rt_note
         FROM events ORDER BY event_id""",
    "q_proto" ->
      // wire_len reconstructs the proto wire SIZE independently: per-field
      // tag bytes + varint lengths (3-tier CASE valid to 2^21, ids are
      // far below) + fixed64 double + len-delimited strings/submessages:
      //   etype (2+len) + uid (1+VL(2*uid)) + score 9 + flag 2 + kind 2
      //   + tag1 (2+3+1+VL(2*uid)) + tag2 (2+3+1+VL(zigzag(-event_id)))
      """WITH v AS (
           SELECT *,
             CASE WHEN 2*user_id < 128 THEN 1
                  WHEN 2*user_id < 16384 THEN 2 ELSE 3 END AS vl_uid,
             CASE WHEN (CASE WHEN event_id = 0 THEN 0 ELSE 2*event_id - 1 END) < 128 THEN 1
                  WHEN (CASE WHEN event_id = 0 THEN 0 ELSE 2*event_id - 1 END) < 16384 THEN 2
                  ELSE 3 END AS vl_neg
           FROM events)
         SELECT event_id,
           CAST(28 + length(event_type) + 2 * vl_uid + vl_neg AS INT) AS wire_len,
           event_type AS rt_etype,
           user_id AS rt_uid,
           "value" AS rt_score,
           CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS rt_flag,
           upper(event_type) AS rt_kind,
           -event_id AS rt_tag_n
         FROM v ORDER BY event_id""",
    "q_native" ->
      // frame_len from the wire rules: EventArray(2:len) > MetricArray
      // (1:len) > Metric{name 1 (2+2B), kind (2B, absolute only),
      // tags_v1 entry (2 + {2+4 tool, 2+len(T)}), tags_v2 entry
      // (2-byte field-20 tag + len + {2+4 tool, TagValues>TagValue>
      // value = 6+len(T)} = 15+len(T) — the reference encoder writes
      // BOTH forms), counter|gauge (2 + 9)}
      // = 44 + 2*len(event_type) + 2*odd; rt_line reconstructs the
      // decoder's deterministic rendering (name, tags, kind, arm)
      """SELECT event_id,
           CAST(44 + 2 * length(event_type)
                + CASE WHEN event_id % 2 = 1 THEN 2 ELSE 0 END AS INT) AS frame_len,
           '{"metric":{"name":"m' || (event_id % 5)
             || '","tags":{"tool":"' || event_type || '"},"kind":'
             || CASE WHEN event_id % 2 = 0 THEN '"incremental"' ELSE '"absolute"' END
             || ',"' || CASE WHEN event_id % 2 = 0 THEN 'counter' ELSE 'gauge' END
             || '":{"value":' || CAST(event_id + 0.5 AS VARCHAR) || '}}}' AS rt_line
         FROM events ORDER BY event_id""",
    "q_arrow" ->
      """SELECT event_id,
           strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_iso,
           event_type,
           "value"
         FROM events ORDER BY event_id"""
  )
}
