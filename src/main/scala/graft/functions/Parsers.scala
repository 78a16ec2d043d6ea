package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The VRL parse/encode function surface re-expressed as Catalyst
  * column expressions (reference: website/cue/reference/remap/functions/
  * parse_json.cue, parse_csv.cue, parse_key_value.cue, parse_url.cue,
  * parse_syslog.cue, parse_apache_log.cue, parse_timestamp.cue,
  * encode_logfmt.cue — 200-function stdlib, SURVEY.md §2.7).
  *
  * Everything here is a pure built-in expression (from_json/from_csv/
  * regexp/str_to_map) — codegen-friendly, no UDFs. Grok-backed parsers
  * come from Grok.compile at plan time.
  */
object Parsers {

  /** parse_json: typed extraction via from_json with an explicit schema
    * (VRL's parse_json is schemaless; Spark-first means declaring the
    * schema so Catalyst can prune and codegen).
    */
  def parseJson(c: Column, schema: StructType): Column =
    from_json(c, schema)

  /** parse_csv: one CSV line to a typed struct. */
  def parseCsv(c: Column, schema: StructType): Column =
    from_csv(c, schema, Map.empty[String, String])

  /** parse_key_value / parse_logfmt: `k=v` pairs separated by `sep`
    * into a map<string,string>. Quoted values with embedded separators
    * need parseKeyValueQuoted.
    */
  def parseKeyValue(c: Column, pairSep: String = " ", kvSep: String = "="): Column =
    str_to_map(c, lit(pairSep), lit(kvSep))

  /** parse_url: host / path / query-param extraction (Spark's built-in
    * parse_url expression).
    */
  def urlHost(c: Column): Column = parse_url(c, lit("HOST"))
  def urlPath(c: Column): Column = parse_url(c, lit("PATH"))
  def urlQueryParam(c: Column, key: String): Column =
    parse_url(c, lit("QUERY"), lit(key))

  /** parse_timestamp with an explicit pattern; null on mismatch (VRL's
    * fallibility → null column, handled by the caller's error channel).
    */
  def parseTimestamp(c: Column, fmt: String): Column = to_timestamp(c, fmt)

  /** from_unix_timestamp (seconds). */
  def fromUnixTs(c: Column): Column = timestamp_seconds(c)

  /** RFC 5424 syslog header grok (reference regression topology
    * syslog_regex_logs2metric parses exactly this shape,
    * regression/cases/syslog_regex_logs2metric_ddmetrics/vector/
    * vector.yaml:21-35).
    */
  val Syslog5424Grok: String =
    "<%{INT:pri}>%{INT:syslog_version} %{TIMESTAMP_ISO8601:sts} %{NOTSPACE:hostname}" +
      " %{NOTSPACE:appname} %{NOTSPACE:procid} %{NOTSPACE:msgid} - %{GREEDYDATA:message}"

  lazy val syslog5424: Grok.Compiled = Grok.compile(Syslog5424Grok)

  /** Apache COMMON log format grok (reference parse_apache_log.cue
    * `format: "common"` — which is also exactly what
    * parse_common_log.cue parses, so `commonLog` aliases it).
    */
  val ApacheCommonGrok: String =
    "%{NOTSPACE:client} %{NOTSPACE:ident} %{NOTSPACE:auth} [%{DATA:atime}]" +
      " \"%{WORD:method} %{NOTSPACE:apath} HTTP/%{NUMBER:http_version}\"" +
      " %{INT:status} %{CLFSIZE:bytes}"

  lazy val apacheCommon: Grok.Compiled = Grok.compile(ApacheCommonGrok)
  /** parse_common_log — same format, reference parse_common_log.cue. */
  def commonLog: Grok.Compiled = apacheCommon

  /** Nginx/Apache COMBINED access-log grok (reference
    * parse_nginx_log.cue `format: "combined"` / parse_apache_log.cue
    * `format: "combined"` — the common-log prefix plus quoted referer
    * and user-agent).
    */
  val NginxCombinedGrok: String =
    "%{NOTSPACE:remote_addr} - %{NOTSPACE:remote_user} [%{DATA:time_local}]" +
      " \"%{WORD:method} %{NOTSPACE:request_path} HTTP/%{NUMBER}\"" +
      " %{INT:status} %{CLFSIZE:body_bytes} \"%{DATA:referer}\" \"%{DATA:agent}\""
  // http_version is matched but uncaptured: the oracle engine's
  // regexp_extract only addresses groups 1-9, and 9 named fields is the
  // budget (version is recoverable from the matched text if needed)

  lazy val nginxCombined: Grok.Compiled = Grok.compile(NginxCombinedGrok)

  /** Nginx ERROR-log grok (reference parse_nginx_log.cue
    * `format: "error"`): `2021/04/01 13:02:31 [error] 31#31: *1 msg`.
    */
  val NginxErrorGrok: String =
    "%{DATESTAMP_SLASH:etime} [%{LOGLEVEL:elevel}] %{INT:pid}#%{INT:tid}:" +
      " *%{INT:cid} %{GREEDYDATA:emsg}"

  lazy val nginxError: Grok.Compiled = Grok.compile(NginxErrorGrok)

  /** glog / klog line grok (reference parse_glog.cue, parse_klog.cue —
    * klog is the Kubernetes variant of the same format):
    * `I0817 02:34:56.789012 408 reactor.cc:123] message`.
    */
  val GlogGrok: String =
    "%{GLOGLEVEL:glevel}%{MONTHDAY4:gdate} %{TIME:gtime} %{INT:threadid}" +
      " %{DATA:gfile}:%{INT:gline}] %{GREEDYDATA:gmsg}"

  lazy val glog: Grok.Compiled = Grok.compile(GlogGrok)

  /** GELF (Graylog Extended Log Format) — JSON with well-known keys
    * (reference `lib/codecs/src/decoding/format/gelf.rs`). Parse = typed
    * from_json over the standard fields; extra `_`-prefixed fields stay
    * available via a second map-typed parse if needed.
    */
  def parseGelf(c: Column): Column =
    from_json(c, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("version", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("host", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("short_message", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("timestamp", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("level", org.apache.spark.sql.types.IntegerType))))

  /** JSON string-body escaping: backslash first, then quote, the short
    * escapes (\n \r \t \b \f), then EVERY remaining C0 control character
    * as \u00XX — so the encoder output is valid JSON for any input
    * value, including hostile ones. The rare-control tail is a folded
    * chain of single-char replaces; each is a cheap literal scan and the
    * whole chain stays inside whole-stage codegen.
    */
  private def jsonEscape(c: Column): Column = {
    val common =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(c, "\\\\", "\\\\\\\\"),
                  "\"", "\\\\\""),
                "\n", "\\\\n"),
              "\r", "\\\\r"),
            "\t", "\\\\t"),
          "\b", "\\\\b"),
        "\f", "\\\\f")
    val rest = (0 until 32).filterNot(Set(8, 9, 10, 12, 13))
    rest.foldLeft(common) { (acc, code) =>
      // replacement backslashes halve through Java Matcher processing:
      // 2 runtime backslashes → 1 in output, i.e. the JSON escape \u00XX
      // (4 would emit a literal \\u00XX — corrupted round-trip)
      regexp_replace(acc, f"\\x$code%02x", f"\\\\u$code%04x")
    }
  }

  /** encode_gelf: render the standard GELF fields as JSON (field order
    * fixed for cross-engine determinism). String fields are
    * JSON-escaped so the output is valid JSON for any input value.
    * Timestamp is emitted at WHOLE-SECOND precision (GELF allows
    * fractional seconds; a decimal render is not portably identical
    * across engines, so this encoder restricts to integer seconds).
    */
  def encodeGelf(host: Column, shortMessage: Column, timestamp: Column,
                 level: Column): Column =
    concat(
      lit("""{"version":"1.1","host":""""), jsonEscape(host),
      lit("""","short_message":""""), jsonEscape(shortMessage),
      lit("""","timestamp":"""), timestamp.cast("long"),
      lit(""","level":"""), level, lit("}"))

  /** CEF (Common Event Format, reference
    * `lib/codecs/src/encoding/format/cef.rs`):
    * `CEF:0|vendor|product|version|signatureId|name|severity|k=v k=v...`.
    */
  def encodeCef(vendor: String, product: String, version: String,
                sigId: Column, name: Column, severity: Column,
                extension: Seq[(String, Column)]): Column = {
    val ext = extension.map { case (k, v) => concat(lit(k + "="), v) }
    concat(
      concat_ws("|", lit("CEF:0"), lit(vendor), lit(product), lit(version),
        sigId, name, severity),
      lit("|"), concat_ws(" ", ext: _*))
  }

  /** parse_cef: header fields by position + extension as a map.
    * try_element_at: a truncated CEF line (fewer than 8 header
    * sections) yields null fields — the caller's raise channel —
    * instead of an ANSI-mode array-index job abort.
    */
  def cefHeader(c: Column, idx: Int): Column =
    try_element_at(split(c, "\\|"), lit(idx + 1))
  def cefExtension(c: Column): Column =
    // a pair ends only where the NEXT `key=` token begins — CEF
    // extension values may contain spaces ("c6a1Label=Device IPv6
    // Address", parse_cef.cue)
    str_to_map(try_element_at(split(c, "\\|"), lit(8)),
      lit(" (?=[^\\s=]+=)"), lit("="))

  /** encode_logfmt: render (key, value-column) pairs as `k=v` logfmt,
    * quoting values containing spaces (reference encode_logfmt.cue).
    */
  def encodeLogfmt(pairs: Seq[(String, Column)]): Column =
    concat_ws(" ", pairs.map { case (k, v) =>
      val s = v.cast("string")
      val quoted = when(s.contains(" "),
        concat(lit("\""), s, lit("\""))).otherwise(s)
      concat(lit(k + "="), quoted)
    }: _*)

  /** encode_json for a fixed set of fields (deterministic key order —
    * to_json of a struct).
    */
  def encodeJson(fields: Seq[(String, Column)]): Column =
    to_json(struct(fields.map { case (n, c) => c.as(n) }: _*))

  /** parse_xml (reference parse_xml.cue): field extraction by XPath —
    * Spark's native xpath_* expressions (VRL returns a dynamic object;
    * Spark-first is declaring the paths you want so the plan stays
    * typed and prunable). Spec-verified only: the oracle engine has no
    * XPath scalar, the documented reason this carries no oracle row.
    */
  def xmlString(c: Column, path: String): Column = xpath_string(c, lit(path))
  def xmlLong(c: Column, path: String): Column = xpath_long(c, lit(path))
  def xmlList(c: Column, path: String): Column = xpath(c, lit(path))

  /** InfluxDB line protocol (reference lib/codecs decoding/format/
    * influxdb.rs): `measurement,tag=v,... field=v,... <ts-nanos>`.
    * Unescaped subset (no embedded commas/spaces/quotes in names or
    * values — the common telemetry shape); integer fields carry the
    * protocol's `i` suffix. Pure regexp/str_to_map expressions.
    */
  // tag set is OPTIONAL in the line protocol (`cpu usage=0.5 <ts>` is
  // valid); measurement then ends at the first space
  private val InfluxRe = "^([^, ]+)(?:,([^ ]+))? ([^ ]+) ([0-9]+)$"

  def encodeInflux(measurement: Column, tags: Seq[(String, Column)],
                   fields: Seq[(String, Column)], tsNanos: Column): Column =
    concat(
      measurement, lit(","),
      concat_ws(",", tags.map { case (k, v) => concat(lit(k + "="), v) }: _*),
      lit(" "),
      concat_ws(",", fields.map { case (k, v) => concat(lit(k + "="), v) }: _*),
      lit(" "), tsNanos.cast("string"))

  def influxMeasurement(c: Column): Column = regexp_extract(c, InfluxRe, 1)
  def influxTags(c: Column): Column =
    str_to_map(regexp_extract(c, InfluxRe, 2), lit(","), lit("="))
  def influxFields(c: Column): Column =
    str_to_map(regexp_extract(c, InfluxRe, 3), lit(","), lit("="))
  def influxTsNanos(c: Column): Column =
    regexp_extract(c, InfluxRe, 4).cast("long")
  /** Integer field value: strip the protocol's `i` suffix. */
  def influxInt(fieldValue: Column): Column =
    regexp_replace(fieldValue, "i$", "").cast("long")

  /** parse_avro / encode_avro via Spark's sql-api binding: Spark 4 ships
    * from_avro/to_avro in sql-api but gates evaluation on the spark-avro
    * module jar — absent (as in this sandbox) any use raises
    * AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE at analysis time (spec pins
    * the error class). The EXERCISABLE codec is [[AvroCodec]], built
    * directly on avro-java (which IS on the Spark classpath) with the
    * same datum semantics — oracle-gated by q_avro.
    */
  def fromAvro(c: Column, jsonSchema: String): Column =
    org.apache.spark.sql.avro.functions.from_avro(c, jsonSchema)
  def toAvro(c: Column): Column =
    org.apache.spark.sql.avro.functions.to_avro(c)

  /** parse_protobuf / encode_protobuf via Spark's sql-api binding — the
    * binding is always present, evaluation requires the spark-protobuf
    * module (PROTOBUF_NOT_LOADED error otherwise). `descFilePath` is
    * the compiled descriptor set, the analog of the reference's
    * `desc_file` config. The EXERCISABLE codec is [[ProtoCodec]] — a
    * self-contained wire-format + descriptor-set kernel (no protobuf
    * jar), spec-pinned to the parse_proto.cue example.
    */
  def fromProtobuf(c: Column, messageName: String, descFilePath: String): Column =
    org.apache.spark.sql.protobuf.functions.from_protobuf(c, messageName, descFilePath)
  def toProtobuf(c: Column, messageName: String, descFilePath: String): Column =
    org.apache.spark.sql.protobuf.functions.to_protobuf(c, messageName, descFilePath)
}
