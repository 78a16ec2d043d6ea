package graft.functions

import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.util.Try

import org.apache.spark.sql.Column
import org.apache.spark.sql.Row
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

import ProtoWire.{Reader, WField}

/** parse_dnstap (cue `parse_dnstap.cue`; reference
  * `lib/dnstap-parser/src/parser.rs` + `vrl_functions/parse_dnstap.rs`).
  *
  * The payload is a dnstap protobuf frame (dnstap.proto — public
  * protocol, vendored by the reference at
  * `lib/dnstap-parser/proto/dnstap.proto`): a Dnstap envelope
  * {identity 1, version 2, extra 3, type 15, message 14} whose Message
  * carries {type 1, socket_family 2, socket_protocol 3, query_address 4,
  * response_address 5, query_port 6, response_port 7, query_time_sec 8,
  * query_time_nsec 9 (fixed32), query_message 10, query_zone 11,
  * response_time_sec 12, response_time_nsec 13 (fixed32),
  * response_message 14}. Decoded with the ProtoWire kernel; the embedded
  * DNS messages with DnsWire.
  *
  * Output field names follow the reference's schema exactly
  * (`schema.rs:293-369` DNSTAP_VALUE_PATHS): serverId, serverVersion,
  * extraInfo, dataType(Id), messageType(Id), socketFamily/Protocol,
  * sourceAddress/Port (the QUERY address), responseAddress/Port,
  * queryZone, time (ns) + timePrecision "ns" + timestamp — taken from
  * query_time for *Query message types and response_time for *Response
  * types (parser.rs:222-244,385-396) — and requestData/responseData
  * parsed DNS objects. A frame that fails DNS-level parsing keeps the
  * envelope and carries `error` + base64 `rawData` (parser.rs:154-172);
  * a frame that fails protobuf-level parsing is a null result (VRL
  * internal_failure channel).
  */
object Dnstap {

  private val MessageTypes = Map(
    1 -> "AuthQuery", 2 -> "AuthResponse", 3 -> "ResolverQuery",
    4 -> "ResolverResponse", 5 -> "ClientQuery", 6 -> "ClientResponse",
    7 -> "ForwarderQuery", 8 -> "ForwarderResponse", 9 -> "StubQuery",
    10 -> "StubResponse", 11 -> "ToolQuery", 12 -> "ToolResponse",
    13 -> "UpdateQuery", 14 -> "UpdateResponse")
  private val RequestTypeIds = Set(1, 3, 5, 7, 9, 11, 13)
  private val SocketFamilies = Map(1 -> "INET", 2 -> "INET6")
  private val SocketProtocols = Map(1 -> "UDP", 2 -> "TCP", 3 -> "DOT",
    4 -> "DOH", 5 -> "DNSCryptUDP", 6 -> "DNSCryptTCP", 7 -> "DOQ")

  // ------------------------------------------------------------ schema

  private val headerT = StructType(Seq(
    StructField("id", IntegerType), StructField("opcode", IntegerType),
    StructField("rcode", IntegerType), StructField("qr", IntegerType),
    StructField("aa", BooleanType), StructField("tc", BooleanType),
    StructField("rd", BooleanType), StructField("ra", BooleanType),
    StructField("ad", BooleanType), StructField("cd", BooleanType),
    StructField("qdCount", IntegerType), StructField("anCount", IntegerType),
    StructField("nsCount", IntegerType), StructField("arCount", IntegerType)))

  private val questionT = StructType(Seq(
    StructField("domainName", StringType), StructField("class", StringType),
    StructField("questionType", StringType), StructField("questionTypeId", IntegerType)))

  private val recordT = StructType(Seq(
    StructField("domainName", StringType), StructField("class", StringType),
    StructField("recordType", StringType), StructField("recordTypeId", IntegerType),
    StructField("ttl", LongType), StructField("rData", StringType),
    StructField("rDataBytes", StringType)))

  private val edeT = StructType(Seq(
    StructField("infoCode", IntegerType), StructField("purpose", StringType),
    StructField("extraText", StringType)))

  private val optEntryT = StructType(Seq(
    StructField("optCode", IntegerType), StructField("optName", StringType),
    StructField("optValue", StringType)))

  private val optT = StructType(Seq(
    StructField("extendedRcode", IntegerType), StructField("ednsVersion", IntegerType),
    StructField("do", BooleanType), StructField("udpPayloadSize", IntegerType),
    StructField("ede", ArrayType(edeT)), StructField("options", ArrayType(optEntryT))))

  private val msgT = StructType(Seq(
    StructField("fullRcode", IntegerType), StructField("rcodeName", StringType),
    StructField("header", headerT),
    StructField("question", ArrayType(questionT)),
    StructField("answers", ArrayType(recordT)),
    StructField("authority", ArrayType(recordT)),
    StructField("additional", ArrayType(recordT)),
    StructField("opt", optT)))

  val schema: StructType = StructType(Seq(
    StructField("serverId", StringType), StructField("serverVersion", StringType),
    StructField("extraInfo", StringType),
    StructField("dataType", StringType), StructField("dataTypeId", IntegerType),
    StructField("messageType", StringType), StructField("messageTypeId", IntegerType),
    StructField("socketFamily", StringType), StructField("socketProtocol", StringType),
    StructField("sourceAddress", StringType), StructField("sourcePort", LongType),
    StructField("responseAddress", StringType), StructField("responsePort", LongType),
    StructField("queryZone", StringType),
    StructField("time", LongType), StructField("timePrecision", StringType),
    StructField("timestamp", StringType),
    StructField("requestData", msgT), StructField("responseData", msgT),
    StructField("error", StringType), StructField("rawData", StringType)))

  // ------------------------------------------------------------ rows

  private def r(st: StructType, vals: Any*): Row =
    new GenericRowWithSchema(vals.toArray, st)

  private def msgRow(m: DnsWire.Msg): Row = {
    val h = m.header
    r(msgT,
      m.fullRcode, m.rcodeName.orNull,
      r(headerT, h.id, h.opcode, h.rcode, h.qr, h.aa, h.tc, h.rd, h.ra,
        h.ad, h.cd, h.qd, h.an, h.ns, h.ar),
      m.question.map(q => r(questionT, q.name, q.clazz, q.typeName.orNull, q.typeId)),
      // empty sections are OMITTED in the reference's output
      // (parse_dnstap.cue ResolverQuery example has no answers/
      // authority/additional keys) — null, not []
      if (m.answers.isEmpty) null else m.answers.map(recRow),
      if (m.authority.isEmpty) null else m.authority.map(recRow),
      if (m.additional.isEmpty) null else m.additional.map(recRow),
      m.opt.map(o => r(optT, o.extendedRcode, o.version, o.doFlag, o.udpPayload,
        // empty sections are OMITTED (the cue's requestData.opt has no
        // `ede` key, its responseData.opt no `options` key); ede is an
        // ARRAY in the reference's shape
        if (o.ede.isEmpty) null
        else o.ede.map(e => r(edeT, e.infoCode, e.purpose.orNull,
          e.extraText.getOrElse(""))),
        if (o.options.isEmpty) null
        else o.options.map(e => r(optEntryT, e.code, e.name, e.valueB64)))).orNull)
  }

  private def recRow(x: DnsWire.Rec): Row =
    r(recordT, x.name, x.clazz, x.typeName.orNull, x.typeId, x.ttl,
      x.rdata.orNull, x.rdataBytes.map(Base64.getEncoder.encodeToString).orNull)

  private def addr(bytes: Array[Byte], family: Int): String =
    if (family == 1) bytes.take(4).map(_ & 0xff).mkString(".")
    else com.google.common.net.InetAddresses.toAddrString(
      java.net.InetAddress.getByAddress(bytes.take(16)))

  private def isoNanos(sec: Long, nsec: Long): String =
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.nnnnnnnnn'Z'")
      .format(java.time.LocalDateTime.ofEpochSecond(sec, nsec.toInt, java.time.ZoneOffset.UTC))

  // ------------------------------------------------------------ decode

  /** Decode one dnstap frame; throws on protobuf-level corruption. */
  def decode(frame: Array[Byte], lowercaseHostnames: Boolean = false): Row = {
    var identity: String = null; var version: String = null; var extra: String = null
    var dataTypeId = 0
    var msgBytes: Array[Byte] = null
    new Reader(frame).readAll().foreach {
      case WField(1, 2, _, b) => identity = new String(b, StandardCharsets.UTF_8)
      case WField(2, 2, _, b) => version = new String(b, StandardCharsets.UTF_8)
      case WField(3, 2, _, b) => extra = new String(b, StandardCharsets.UTF_8)
      case WField(15, 0, v, _) => dataTypeId = v.toInt
      case WField(14, 2, _, b) => msgBytes = b
      case _ => ()
    }
    val dataType = if (dataTypeId == 1) "Message" else null

    var mTypeId = 0
    var family = 0; var proto = 0
    var qAddr: Array[Byte] = null; var rAddr: Array[Byte] = null
    var qPort = -1L; var rPort = -1L
    var qSec = -1L; var qNsec = -1L; var rSec = -1L; var rNsec = -1L
    var qMsg: Array[Byte] = null; var rMsg: Array[Byte] = null
    var qZone: Array[Byte] = null
    if (msgBytes != null && dataType != null) {
      new Reader(msgBytes).readAll().foreach {
        case WField(1, 0, v, _) => mTypeId = v.toInt
        case WField(2, 0, v, _) => family = v.toInt
        case WField(3, 0, v, _) => proto = v.toInt
        case WField(4, 2, _, b) => qAddr = b
        case WField(5, 2, _, b) => rAddr = b
        case WField(6, 0, v, _) => qPort = v
        case WField(7, 0, v, _) => rPort = v
        case WField(8, 0, v, _) => qSec = v
        case WField(9, 5, v, _) => qNsec = v
        case WField(10, 2, _, b) => qMsg = b
        case WField(11, 2, _, b) => qZone = b
        case WField(12, 0, v, _) => rSec = v
        case WField(13, 5, v, _) => rNsec = v
        case WField(14, 2, _, b) => rMsg = b
        case _ => ()
      }
    }

    // time comes from query_time for *Query types, response_time for
    // *Response types (parser.rs:222-244 with the request/response id sets)
    val isRequest = RequestTypeIds.contains(mTypeId)
    val (tSec, tNsec) =
      if (isRequest && qSec >= 0) (qSec, math.max(qNsec, 0L))
      else if (!isRequest && rSec >= 0) (rSec, math.max(rNsec, 0L))
      else (-1L, 0L)

    var error: String = null
    // EVERY DNS-level decode (message bodies, addresses, query_zone,
    // timestamp rendering) goes through this channel: the contract is
    // that only protobuf-level failures null the frame, while DNS-level
    // failures keep the envelope with error + rawData — a throw here
    // would escape to the UDF's Try and lose the whole row
    def dnsLevel[A](what: String)(f: => A): A =
      try f catch { case e: Exception =>
        if (error == null) error = s"$what failed: ${e.getMessage}"
        null.asInstanceOf[A] // reference types only; erased to null
      }
    def parseDns(bytes: Array[Byte]): Row =
      if (bytes == null) null
      else dnsLevel("DNS parse")(msgRow(DnsWire.parse(bytes, lowercaseHostnames)))

    val request = parseDns(qMsg)
    val response = parseDns(rMsg)
    val qAddrStr =
      if (qAddr != null && family != 0) dnsLevel("source address")(addr(qAddr, family)) else null
    val rAddrStr =
      if (rAddr != null && family != 0) dnsLevel("response address")(addr(rAddr, family)) else null
    val zoneStr =
      if (qZone != null) dnsLevel("query_zone")(DnsWire.readBareName(qZone, lowercaseHostnames)) else null
    val tsIso =
      if (tSec >= 0) dnsLevel("timestamp")(isoNanos(tSec, tNsec)) else null

    r(schema,
      identity, version, extra, dataType,
      if (dataTypeId != 0) dataTypeId else null,
      if (mTypeId != 0) MessageTypes.getOrElse(mTypeId, s"Unknown dnstap message type: $mTypeId") else null,
      if (mTypeId != 0) mTypeId else null,
      if (family != 0) SocketFamilies.getOrElse(family, null) else null,
      if (proto != 0) SocketProtocols.getOrElse(proto, null) else null,
      qAddrStr,
      if (qPort >= 0) qPort else null,
      rAddrStr,
      if (rPort >= 0) rPort else null,
      zoneStr,
      if (tSec >= 0) tSec * 1000000000L + tNsec else null,
      if (tSec >= 0) "ns" else null,
      tsIso,
      request, response, error,
      if (error != null) Base64.getEncoder.encodeToString(frame) else null)
  }

  // ------------------------------------------------------------ Column API

  /** parse_dnstap: base64-transported frame -> typed struct (null on a
    * protobuf-level parse failure).
    */
  def parseDnstap(c: Column, lowercaseHostnames: Boolean = false): Column =
    udf(new UDF1[Array[Byte], Row] {
      override def call(b: Array[Byte]): Row =
        if (b == null) null else Try(decode(b, lowercaseHostnames)).getOrElse(null)
    }, schema).apply(c)
}
