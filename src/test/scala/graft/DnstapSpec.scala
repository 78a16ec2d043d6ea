package graft

import java.util.Base64

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{Dnstap, DnsWire}

/** parse_dnstap pinned against the reference's OWN cue example
  * (parse_dnstap.cue) — a real BIND-produced ResolverQuery frame with
  * EDNS cookie options on the query and an EDE (DNSKEY Missing) on the
  * response. Every leaf the cue return lists is asserted. One shape
  * divergence, by design: the typed struct carries empty arrays where
  * the dynamic VRL object omits the key entirely.
  */
class DnstapSpec extends SparkSpec {
  import spark.implicits._

  private val frameB64 =
    "ChVqYW1lcy1WaXJ0dWFsLU1hY2hpbmUSC0JJTkQgOS4xNi4zGgBy5wEIAxACGAEiEAAAAAAAAAAAAAAAAAAAAAAqECABBQJwlAAAAAAAAAAAADAw8+0CODVA7+zq9wVNMU3WNlI2kwIAAAABAAAAAAABCWZhY2Vib29rMQNjb20AAAEAAQAAKQIAAACAAAAMAAoACOxjCAG9zVgzWgUDY29tAGAAbQAAAAByZLM4AAAAAQAAAAAAAQJoNQdleGFtcGxlA2NvbQAABgABAAApBNABAUAAADkADwA1AAlubyBTRVAgbWF0Y2hpbmcgdGhlIERTIGZvdW5kIGZvciBkbnNzZWMtZmFpbGVkLm9yZy54AQ=="

  private lazy val row: Row = Dnstap.decode(Base64.getDecoder.decode(frameB64))

  test("envelope: identity, version, types, sockets, addresses, zone (parse_dnstap.cue)") {
    assert(row.getAs[String]("serverId") == "james-Virtual-Machine")
    assert(row.getAs[String]("serverVersion") == "BIND 9.16.3")
    assert(row.getAs[String]("extraInfo") == "")
    assert(row.getAs[String]("dataType") == "Message")
    assert(row.getAs[Int]("dataTypeId") == 1)
    assert(row.getAs[String]("messageType") == "ResolverQuery")
    assert(row.getAs[Int]("messageTypeId") == 3)
    assert(row.getAs[String]("socketFamily") == "INET6")
    assert(row.getAs[String]("socketProtocol") == "UDP")
    assert(row.getAs[String]("sourceAddress") == "::")
    assert(row.getAs[Long]("sourcePort") == 46835L)
    assert(row.getAs[String]("responseAddress") == "2001:502:7094::30")
    assert(row.getAs[Long]("responsePort") == 53L)
    assert(row.getAs[String]("queryZone") == "com.")
    assert(row.getAs[String]("error") == null)
  }

  test("time: ns epoch + precision + 9-digit timestamp from query_time (request type)") {
    assert(row.getAs[Long]("time") == 1593489007920014129L)
    assert(row.getAs[String]("timePrecision") == "ns")
    assert(row.getAs[String]("timestamp") == "2020-06-30T03:50:07.920014129Z")
  }

  test("requestData: header, question, EDNS cookie option, NoError") {
    val req = row.getAs[Row]("requestData")
    assert(req.getAs[Int]("fullRcode") == 0)
    assert(req.getAs[String]("rcodeName") == "NoError")
    val h = req.getAs[Row]("header")
    assert(h.getAs[Int]("id") == 37634)
    assert(h.getAs[Int]("opcode") == 0)
    assert(h.getAs[Int]("rcode") == 0)
    assert(h.getAs[Int]("qr") == 0)
    assert(!h.getAs[Boolean]("aa") && !h.getAs[Boolean]("ad") && !h.getAs[Boolean]("cd"))
    assert(!h.getAs[Boolean]("rd") && !h.getAs[Boolean]("ra") && !h.getAs[Boolean]("tc"))
    assert(h.getAs[Int]("qdCount") == 1 && h.getAs[Int]("anCount") == 0)
    assert(h.getAs[Int]("nsCount") == 0 && h.getAs[Int]("arCount") == 1)
    val q = req.getAs[Seq[Row]]("question")
    assert(q.size == 1)
    assert(q.head.getAs[String]("domainName") == "facebook1.com.")
    assert(q.head.getAs[String]("class") == "IN")
    assert(q.head.getAs[String]("questionType") == "A")
    assert(q.head.getAs[Int]("questionTypeId") == 1)
    val opt = req.getAs[Row]("opt")
    assert(opt.getAs[Boolean]("do"))
    assert(opt.getAs[Int]("ednsVersion") == 0)
    assert(opt.getAs[Int]("extendedRcode") == 0)
    assert(opt.getAs[Int]("udpPayloadSize") == 512)
    val opts = opt.getAs[Seq[Row]]("options")
    assert(opts.size == 1)
    assert(opts.head.getAs[Int]("optCode") == 10)
    assert(opts.head.getAs[String]("optName") == "Cookie")
    assert(opts.head.getAs[String]("optValue") == "7GMIAb3NWDM=")
    // empty ede renders as an ABSENT key in the reference (null here,
    // dropped by the ignore-null JSON encode), not an empty array
    // empty sections render as an ABSENT key in the reference (null
    // here, dropped by the ignore-null JSON encode), not an empty array
    assert(opt.getAs[Seq[Row]]("ede") == null)
    assert(req.getAs[Seq[Row]]("answers") == null)
  }

  test("responseData: extended rcode 16 BADVERS, EDE DNSKEY Missing, SOA question") {
    val res = row.getAs[Row]("responseData")
    assert(res.getAs[Int]("fullRcode") == 16)
    assert(res.getAs[String]("rcodeName") == "BADVERS")
    val h = res.getAs[Row]("header")
    assert(h.getAs[Int]("id") == 45880)
    assert(h.getAs[Int]("rcode") == 16) // merged with the EDNS high bits
    assert(h.getAs[Int]("arCount") == 1 && h.getAs[Int]("qdCount") == 1)
    val q = res.getAs[Seq[Row]]("question")
    assert(q.head.getAs[String]("domainName") == "h5.example.com.")
    assert(q.head.getAs[String]("questionType") == "SOA")
    assert(q.head.getAs[Int]("questionTypeId") == 6)
    val opt = res.getAs[Row]("opt")
    assert(!opt.getAs[Boolean]("do"))
    assert(opt.getAs[Int]("ednsVersion") == 1)
    assert(opt.getAs[Int]("extendedRcode") == 1)
    assert(opt.getAs[Int]("udpPayloadSize") == 1232)
    val ede = opt.getAs[Seq[Row]]("ede")
    assert(ede.size == 1)
    assert(ede.head.getAs[Int]("infoCode") == 9)
    assert(ede.head.getAs[String]("purpose") == "DNSKEY Missing")
    assert(ede.head.getAs[String]("extraText") ==
      "no SEP matching the DS found for dnssec-failed.org.")
  }

  test("lowercase_hostnames lowers names; distributed Column API; malformed -> null") {
    val lowered = Dnstap.decode(Base64.getDecoder.decode(frameB64), lowercaseHostnames = true)
    assert(lowered.getAs[String]("serverId") == "james-Virtual-Machine") // identity untouched
    assert(lowered.getAs[Row]("requestData").getAs[Seq[Row]]("question")
      .head.getAs[String]("domainName") == "facebook1.com.")

    val df = Seq(("ok", Base64.getDecoder.decode(frameB64)),
      ("bad", Array[Byte](0x22, 0x7f))).toDF("k", "b").repartition(2)
    val out = df.select(col("k"), Dnstap.parseDnstap(col("b")).as("d"))
      .select(col("k"), col("d.messageType"), col("d.requestData.header.id"))
      .collect().map(x => x.getString(0) -> (x.get(1), x.get(2))).toMap
    assert(out("ok") == (("ResolverQuery", 37634)))
    assert(out("bad") == ((null, null)))
  }

  test("parse_dnstap callable from a config-source VRL program") {
    val topo = graft.config.Topology.load(
      s"""
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .d = parse_dnstap!(.frame)
        |  '''
        |[[tests]]
        |  name = "dnstap"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      frame = "$frameB64"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert_eq!(.d.messageType, "ResolverQuery")
        |        assert_eq!(.d.queryZone, "com.")
        |        assert_eq!(.d.requestData.rcodeName, "NoError")
        |        assert_eq!(.d.responseData.fullRcode, 16)
        |        assert_eq!(.d.time, 1593489007920014129)
        |      '''
        |""".stripMargin)
    val rs = graft.config.UnitTestHarness.run(spark, topo)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
  }

  test("dns wire parser: records with rdata formats (A, TXT, MX) and name compression") {
    // hand-built response: query example.com A; answer A 93.184.216.34 with
    // a compression pointer back to the question name
    val b = Array[Int](
      0x12, 0x34, 0x81, 0x80, 0, 1, 0, 1, 0, 0, 0, 0,
      7, 'e', 'x', 'a', 'm', 'p', 'l', 'e', 3, 'c', 'o', 'm', 0, 0, 1, 0, 1,
      0xc0, 12, 0, 1, 0, 1, 0, 0, 0, 60, 0, 4, 93, 184, 216, 34
    ).map(_.toByte)
    val m = DnsWire.parse(b)
    assert(m.header.qr == 1 && m.header.rd && m.header.ra)
    assert(m.question.head.name == "example.com.")
    val a = m.answers.head
    assert(a.name == "example.com." && a.typeName.contains("A") && a.ttl == 60L)
    assert(a.rdata.contains("93.184.216.34"))

    // TXT + MX formatting conventions (format_rdata)
    val txt = Array[Int](0, 1, 0x84, 0x00, 0, 0, 0, 2, 0, 0, 0, 0,
      3, 'f', 'o', 'o', 0, 0, 16, 0, 1, 0, 0, 0, 30, 0, 4, 3, 'h', 'e', 'y',
      0xc0, 12, 0, 15, 0, 1, 0, 0, 0, 30, 0, 9, 0, 10, 4, 'm', 'a', 'i', 'l', 0xc0, 12
    ).map(_.toByte)
    val m2 = DnsWire.parse(txt)
    assert(m2.answers(0).rdata.contains("\"hey\""))
    assert(m2.answers(1).rdata.contains("10 mail.foo."))
  }

  test("DNS-level failures outside the message bodies keep the envelope (error + rawData)") {
    // corrupt query_zone (label length pointing past the buffer) and a
    // truncated INET6 address: both are DNS-LEVEL failures and must ride
    // the error channel with the envelope intact, not null the frame
    import graft.functions.ProtoWire.Writer
    val msg = new Writer
    msg.writeTag(1, 0).writeVarint(3L)  // ResolverQuery
    msg.writeTag(2, 0).writeVarint(2L)  // INET6
    msg.writeLenDelim(4, Array[Byte](1, 2, 3)) // 3-byte "INET6" address
    msg.writeLenDelim(11, Array[Byte](63.toByte, 'x'.toByte)) // zone: label len 63, 1 byte present
    val frame = new Writer
    frame.writeLenDelim(1, "srv".getBytes("UTF-8"))
    frame.writeTag(15, 0).writeVarint(1L) // Message
    frame.writeLenDelim(14, msg.toBytes)
    val row = Dnstap.decode(frame.toBytes)
    assert(row != null, "protobuf level is fine - frame must survive")
    assert(row.getAs[String]("serverId") == "srv")
    assert(row.getAs[String]("messageType") == "ResolverQuery")
    assert(row.getAs[String]("error") != null)
    assert(row.getAs[String]("rawData") != null)
    assert(row.isNullAt(row.fieldIndex("queryZone")))
  }
}
