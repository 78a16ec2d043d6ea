package graft

import org.apache.spark.sql.functions._

import graft.functions.{Etld, Vrl, VrlParsers}

/** Specs for the VRL long-tail batch (SURVEY.md §2.7 row 58): every
  * non-obvious function is pinned against the reference's OWN cue
  * example vectors (website/cue/reference/remap/functions/), so a
  * matching value here is cross-implementation evidence, not a
  * round-trip tautology.
  */
class Stdlib2Spec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).head.get(0)

  // ------------------------------------------------------------ parsers

  test("parse_tokens: quoted/escaped/bracketed tokens (parse_tokens.cue example)") {
    val in = "A sentence \"with \\\"a\\\" sentence inside\" and [some brackets]"
    val out = one(VrlParsers.parseTokens(lit(in)))
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(out == Seq("A", "sentence", "with \"a\" sentence inside", "and",
      "some brackets"))
  }

  test("parse_linux_authorization (parse_linux_authorization.cue example)") {
    val in = "Mar 23 01:49:58 localhost sshd[1111]: Accepted publickey for eng from 10.1.1.1 port 8888 ssh2: RSA SHA256:foobar"
    val r = Seq(in).toDF("l")
      .select(VrlParsers.parseLinuxAuthorization(col("l"), year = 2025).as("p"))
      .select("p.*").head
    assert(r.getAs[String]("appname") == "sshd")
    assert(r.getAs[String]("hostname") == "localhost")
    assert(r.getAs[Long]("procid") == 1111L)
    assert(r.getAs[String]("message") ==
      "Accepted publickey for eng from 10.1.1.1 port 8888 ssh2: RSA SHA256:foobar")
    assert(r.getAs[String]("timestamp") == "2025-03-23T01:49:58Z")
    // no-pid form
    val r2 = Seq("Mar  1 09:05:00 host1 CRON: session opened").toDF("l")
      .select(VrlParsers.parseLinuxAuthorization(col("l")).as("p")).select("p.*").head
    assert(r2.getAs[String]("appname") == "CRON")
    assert(r2.getAs[Any]("procid") == null)
    assert(r2.getAs[String]("timestamp") == "2024-03-01T09:05:00Z")
  }

  test("parse_aws_alb_log (parse_aws_alb_log.cue example)") {
    val in = "http 2018-11-30T22:23:00.186641Z app/my-loadbalancer/50dc6c495c0c9188 192.168.131.39:2817 - 0.000 0.001 0.000 200 200 34 366 \"GET http://www.example.com:80/ HTTP/1.1\" \"curl/7.46.0\" - - arn:aws:elasticloadbalancing:us-east-2:123456789012:targetgroup/my-targets/73e2d6bc24d8a067 \"Root=1-58337364-23a8c76965a2ef7629b185e3\" \"-\" \"-\" 0 2018-11-30T22:22:48.364000Z \"forward\" \"-\" \"-\" \"-\" \"-\" \"-\" \"-\""
    val r = Seq(in).toDF("l")
      .select(VrlParsers.parseAwsAlbLog(col("l")).as("p")).select("p.*").head
    assert(r.getAs[String]("type") == "http")
    assert(r.getAs[String]("timestamp") == "2018-11-30T22:23:00.186641Z")
    assert(r.getAs[String]("elb") == "app/my-loadbalancer/50dc6c495c0c9188")
    assert(r.getAs[String]("client_host") == "192.168.131.39:2817")
    assert(r.getAs[Any]("target_host") == null)
    assert(r.getAs[Double]("target_processing_time") == 0.001)
    assert(r.getAs[String]("elb_status_code") == "200")
    assert(r.getAs[Long]("received_bytes") == 34L)
    assert(r.getAs[Long]("sent_bytes") == 366L)
    assert(r.getAs[String]("request_method") == "GET")
    assert(r.getAs[String]("request_url") == "http://www.example.com:80/")
    assert(r.getAs[String]("request_protocol") == "HTTP/1.1")
    assert(r.getAs[String]("user_agent") == "curl/7.46.0")
    assert(r.getAs[Any]("ssl_cipher") == null)
    assert(r.getAs[String]("trace_id") == "Root=1-58337364-23a8c76965a2ef7629b185e3")
    assert(r.getAs[String]("matched_rule_priority") == "0")
    assert(r.getAs[String]("actions_executed") == "forward")
    assert(r.getAs[scala.collection.Seq[String]]("target_port_list").isEmpty)
    assert(r.getAs[Any]("classification") == null)
  }

  test("parse_aws_vpc_flow_log default + custom format (parse_aws_vpc_flow_log.cue)") {
    val r = Seq("2 123456789010 eni-1235b8ca123456789 - - - - - - - 1431280876 1431280934 - NODATA")
      .toDF("l").select(VrlParsers.parseAwsVpcFlowLog(col("l")).as("p"))
      .select("p.*").head
    assert(r.getAs[Long]("version") == 2L)
    assert(r.getAs[String]("account_id") == "123456789010")
    assert(r.getAs[String]("interface_id") == "eni-1235b8ca123456789")
    assert(r.getAs[Any]("srcaddr") == null)
    assert(r.getAs[Any]("protocol") == null)
    assert(r.getAs[Long]("start") == 1431280876L)
    assert(r.getAs[Long]("end") == 1431280934L)
    assert(r.getAs[String]("log_status") == "NODATA")
    val r2 = Seq("- eni-1235b8ca123456789 10.0.1.5 10.0.0.220 10.0.1.5 203.0.113.5")
      .toDF("l").select(VrlParsers.parseAwsVpcFlowLog(col("l"),
        "instance_id interface_id srcaddr dstaddr pkt_srcaddr pkt_dstaddr").as("p"))
      .select("p.*").head
    assert(r2.getAs[Any]("instance_id") == null)
    assert(r2.getAs[String]("srcaddr") == "10.0.1.5")
    assert(r2.getAs[String]("pkt_dstaddr") == "203.0.113.5")
  }

  test("parse_aws_cloudwatch_log_subscription_message envelope") {
    val in = """{"messageType":"DATA_MESSAGE","owner":"111111111111","logGroup":"test","logStream":"test-stream","subscriptionFilters":["Destination"],"logEvents":[{"id":"35683658089614582423604394983260738922885519999578275840","timestamp":1600110569039,"message":"hello"},{"id":"35683658089659183914001456229543810359430816722590236673","timestamp":1600110569041,"message":"world"}]}"""
    val r = Seq(in).toDF("l")
      .select(VrlParsers.parseAwsCloudwatchLogSubscriptionMessage(col("l")).as("p"))
      .select("p.*").head
    assert(r.getAs[String]("owner") == "111111111111")
    assert(r.getAs[String]("message_type") == "DATA_MESSAGE")
    assert(r.getAs[String]("log_group") == "test")
    assert(r.getAs[scala.collection.Seq[String]]("subscription_filters") == Seq("Destination"))
    val events = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("log_events")
    assert(events.length == 2)
    // epoch-millis in the envelope surface as real timestamps (the
    // reference's DateTime<Utc>)
    assert(events(0).getAs[java.sql.Timestamp]("timestamp").getTime == 1600110569039L)
    assert(events(1).getAs[String]("message") == "world")
  }

  test("parse_bytes units and bases (parse_bytes.cue examples)") {
    assert(one(VrlParsers.parseBytes(lit("1024KiB"), unit = "MiB")) == 1.0)
    assert(one(VrlParsers.parseBytes(lit("4TB"), unit = "MB", base = "10")) == 4000000.0)
    assert(one(VrlParsers.parseBytes(lit("1GB"), unit = "B", base = "2")) == 1073741824.0)
    assert(one(VrlParsers.parseBytes(lit("512"), unit = "B")) == 512.0)
    assert(one(VrlParsers.parseBytes(lit("junk"))) == null)
  }

  test("parse_etld: PSL algorithm incl. wildcard + exception rules (parse_etld.cue)") {
    def etld(host: String, plus: Int = 0) = {
      val r = Seq(host).toDF("h").select(Etld.parseEtld(col("h"), plus).as("p"))
        .select("p.*").head
      (r.getString(0), r.getString(1), r.getBoolean(2))
    }
    assert(etld("sub.sussex.ac.uk") == ("ac.uk", "ac.uk", true))
    assert(etld("sub.sussex.ac.uk", 1) == ("ac.uk", "sussex.ac.uk", true))
    assert(etld("vector.dev", 1) == ("dev", "vector.dev", true))
    assert(etld("usense.internallan", 1) == ("internallan", "usense.internallan", false))
    // PSL wildcard: *.ck makes any <label>.ck a suffix...
    assert(etld("foo.bar.ck") == ("bar.ck", "bar.ck", true))
    // ...EXCEPT the !www.ck exception, whose suffix is just "ck"
    assert(etld("www.ck", 1) == ("ck", "www.ck", true))
    // github.io-style private-domain suffix
    assert(etld("user.github.io", 1) == ("github.io", "user.github.io", true))
  }

  // ------------------------------------------------------------ codecs

  test("base16 / percent / punycode / mime_q (cue examples)") {
    assert(one(Vrl.decodeBase16(lit("796f752068617665207375636365737366756c6c79206465636f646564206d65")))
      == "you have successfully decoded me")
    assert(one(Vrl.encodeBase16(lit("some+=string/value"))) ==
      "736f6d652b3d737472696e672f76616c7565")
    assert(one(Vrl.encodePercent(lit("foo bar?"))) == "foo%20bar%3F")
    assert(one(Vrl.decodePercent(lit("foo%20bar%3F"))) == "foo bar?")
    assert(one(Vrl.encodePunycode(lit("www.CAFé.com"))) == "www.xn--caf-dma.com")
    assert(one(Vrl.decodePunycode(lit("www.xn--caf-dma.com"))) == "www.café.com")
    assert(one(Vrl.decodeMimeQ(lit("=?utf-8?b?SGVsbG8sIFdvcmxkIQ==?="))) == "Hello, World!")
    assert(one(Vrl.decodeMimeQ(lit(
      "From: =?utf-8?b?SGVsbG8sIFdvcmxkIQ==?= <=?utf-8?q?hello=5Fworld=40example=2ecom?=>")))
      == "From: Hello, World! <hello_world@example.com>")
    // malformed Q escape at end of word: passes through, no crash
    assert(one(Vrl.decodeMimeQ(lit("=?utf-8?q?ab=4?="))) == "ab=4")
  }

  test("lz4/snappy: round-trip + decode the reference's own lz4 frame (encode_lz4.cue)") {
    val msg = "The quick brown fox jumps over 13 lazy dogs."
    // the cue example's exact encoded bytes, produced by the Rust
    // lz4_flex encoder — cross-implementation decode evidence
    val refFrame = "LAAAAPAdVGhlIHF1aWNrIGJyb3duIGZveCBqdW1wcyBvdmVyIDEzIGxhenkgZG9ncy4="
    assert(one(Vrl.decodeLz4(unbase64(lit(refFrame))).cast("string")) == msg)
    assert(one(Vrl.decodeLz4(Vrl.encodeLz4(lit(msg).cast("binary"))).cast("string")) == msg)
    val sn = "snappy snappy snappy compress me"
    assert(one(Vrl.decodeSnappy(Vrl.encodeSnappy(lit(sn).cast("binary"))).cast("string")) == sn)
  }

  test("parse_cbor: cue example + scalars, nesting, floats, indefinite lengths") {
    // a1 65 66 69 65 6c 64 65 76 61 6c 75 65 = {"field": "value"}
    assert(one(Vrl.parseCbor(unbase64(lit("oWVmaWVsZGV2YWx1ZQ=="))))
      == """{"field":"value"}""")
    def cbor(hexStr: String) = one(Vrl.parseCbor(unhex(lit(hexStr))))
    assert(cbor("83010203") == "[1,2,3]")                  // [1,2,3]
    assert(cbor("f5") == "true" && cbor("f6") == "null")
    assert(cbor("20") == "-1")                             // neg int
    assert(cbor("fb3fc999999999999a") == "0.2")            // float64 0.2
    assert(cbor("f93c00") == "1")                          // half-float 1.0
    assert(cbor("a201020304") == """{"1":2,"3":4}""")      // int keys → strings
    assert(cbor("a1f93e0001") == """{"1.5":1}""")          // float key → quoted
    assert(cbor("9f0102ff") == "[1,2]")                    // indefinite array
    assert(cbor("5f42010243030405ff") == "\"" +
      java.util.Base64.getEncoder.encodeToString(Array[Byte](1,2,3,4,5)) + "\"")
    assert(cbor("c074323031332d30332d32315432303a30343a30305a") ==
      "\"2013-03-21T20:04:00Z\"")                          // tag 0 ignored
  }

  test("parse_ruby_hash: cue example incl. symbols, strings with => inside") {
    val in = """{ "test" => "value", "testNum" => 0.2, "testObj" => { "testBool" => true, "testNull" => nil } }"""
    assert(one(Vrl.parseRubyHash(lit(in))) ==
      """{"test":"value","testNum":0.2,"testObj":{"testBool":true,"testNull":null}}""")
    assert(one(Vrl.parseRubyHash(lit("""{:sym => 'single', "arrow" => "a => b", "arr" => [1, nil]}"""))) ==
      """{"sym":"single","arrow":"a => b","arr":[1,null]}""")
  }

  // ------------------------------------------------------------ hashes

  test("seahash matches the reference vectors (seahash.cue)") {
    assert(one(Vrl.seahash(lit("foobar"))) == 5348458858952426560L)
    assert(one(Vrl.seahash(lit("bar"))) == -2796170501982571315L)
  }

  test("shannon_entropy matches the reference vectors (shannon_entropy.cue)") {
    assert(math.floor(one(Vrl.shannonEntropy(lit("vector.dev"))).asInstanceOf[Double] * 1e4) / 1e4 == 2.9219)
    assert(math.floor(one(Vrl.shannonEntropy(lit("test123%456.فوائد.net."))).asInstanceOf[Double] * 1e4) / 1e4 == 4.0784)
  }

  test("hmac + sha1 + sha3 (hmac.cue example vector)") {
    assert(one(Vrl.hmacBase64(lit("Hello there"), lit("super-secret-key"))) ==
      "eLGE8YMviv85NPXgISRUZxstBNSU47JQdcXkUWcClmI=")
    assert(one(Vrl.sha1Hex(lit("foo"))) == "0beec7b5ea3f0fdbc95d0dd47f3c5bc275da8a33")
    // SHA3-512("foo") — public NIST test value
    assert(one(Vrl.sha3(lit("foo"))).asInstanceOf[String].startsWith("4bca2b13"))
    assert(one(Vrl.sha3(lit("foo"), "SHA3-256")) ==
      "76d3bc41c9f588f7fcd0d5bf4718f8f84b1c41b20882703100b9eb9413807c01")
  }

  test("community_id matches the reference vector (community_id.cue)") {
    assert(one(Vrl.communityId(lit("1.2.3.4"), lit("5.6.7.8"), lit(1122),
      lit(3344), lit(6))) == "1:wCb3OG7yAFWelaUydu0D+125CLM=")
    // symmetry: reversed flow direction gives the same id
    assert(one(Vrl.communityId(lit("5.6.7.8"), lit("1.2.3.4"), lit(3344),
      lit(1122), lit(6))) == "1:wCb3OG7yAFWelaUydu0D+125CLM=")
    // malformed address → null (fallible analog), not an exception
    assert(one(Vrl.communityId(lit("999.1.2.3"), lit("5.6.7.8"), lit(1),
      lit(2), lit(6))) == null)
    assert(one(Vrl.communityId(lit("not-an-ip"), lit("5.6.7.8"), lit(1),
      lit(2), lit(6))) == null)
  }

  test("community_id: ICMP type/code mapping, one-way flows, port-less protocols (spec)") {
    // vectors from an independent implementation of the Community ID
    // v1 spec (corelight) — the same replica reproduces the cue's TCP
    // vector, so these are authoritative
    def cid(s: String, d: String, sp: org.apache.spark.sql.Column,
            dp: org.apache.spark.sql.Column, proto: Int) =
      one(Vrl.communityId(lit(s), lit(d), sp, dp, lit(proto)))
    // ICMP echo request (8,0) and its reply (0,0) are the SAME flow
    assert(cid("1.2.3.4", "5.6.7.8", lit(8), lit(0), 1) ==
      "1:crodRHL2FEsHjbv3UkRrfbs4bZ0=")
    assert(cid("5.6.7.8", "1.2.3.4", lit(0), lit(0), 1) ==
      "1:crodRHL2FEsHjbv3UkRrfbs4bZ0=")
    // unmapped ICMP type (11 = time exceeded) is one-way: direction preserved
    assert(cid("1.2.3.4", "5.6.7.8", lit(11), lit(0), 1) ==
      "1:f/YiSyWqczrTgfUCZlBUnvHRcPk=")
    assert(cid("5.6.7.8", "1.2.3.4", lit(11), lit(0), 1) ==
      "1:1Vae9INpTJ+fZaSmjhtK/hyOPac=")
    // ICMPv6 MLD listener query (130) and report (131) are a mapped
    // bidirectional pair in the spec table — same flow both directions
    assert(cid("1.2.3.4", "5.6.7.8", lit(130), lit(0), 58) ==
      "1:hISfHX7FaxMZ+OqY8oRBouiIAGc=")
    assert(cid("5.6.7.8", "1.2.3.4", lit(131), lit(0), 58) ==
      "1:hISfHX7FaxMZ+OqY8oRBouiIAGc=")
    // port-less protocol (47 = GRE): no port segment, symmetric by
    // address — ports ABSENT is a plan-time fact (portsProvided=false)
    val nullPort = lit(null).cast("int")
    def cidNoPorts(s: String, d: String, proto: Int) =
      one(Vrl.communityId(lit(s), lit(d), nullPort, nullPort, lit(proto),
        portsProvided = false))
    assert(cidNoPorts("1.2.3.4", "5.6.7.8", 47) ==
      "1:+mluqz76jObh6dJLwnhX08n5St4=")
    assert(cidNoPorts("5.6.7.8", "1.2.3.4", 47) ==
      "1:+mluqz76jObh6dJLwnhX08n5St4=")
    // ports PROVIDED but null at runtime (malformed cast upstream):
    // null result — never a silent fall-back to the port-less layout,
    // which would mint a valid-looking ID for a different flow key
    assert(cid("1.2.3.4", "5.6.7.8", nullPort, lit(3344), 6) == null)
    // non-zero seed changes the hash (replica-verified vector)
    assert(one(Vrl.communityId(lit("1.2.3.4"), lit("5.6.7.8"), lit(1122),
      lit(3344), lit(6), seed = 1)) == "1:HhA1B+6CoLbiKPEs5nhNYN4XWfk=")
  }

  test("encrypt_ip/decrypt_ip aes128 matches the reference vectors (encrypt_ip.cue)") {
    val key = lit("sixteen byte key")
    assert(one(Vrl.encryptIp(lit("192.168.1.1"), key)) ==
      "72b9:a747:f2e9:72af:76ca:5866:6dcf:c3b0")
    // the cue's IPv6 example value does NOT equal AES-128-ECB of the
    // address's canonical 16 bytes under the stated key (checked
    // independently against a second AES implementation), while its
    // IPv4 example does — so we pin the published ipcrypt-deterministic
    // ALGORITHM (which the IPv4 vector confirms) and hold IPv6 to the
    // algebraic contracts: determinism, format preservation, inversion.
    val v6 = one(Vrl.encryptIp(lit("2001:db8::1"), key)).asInstanceOf[String]
    assert(v6.matches("[0-9a-f:]+") && v6.contains(":"))
    assert(one(Vrl.encryptIp(lit("2001:db8::1"), key)) == v6) // deterministic
    assert(one(Vrl.decryptIp(lit(v6), key)) == "2001:db8:0:0:0:0:0:1")
    // decrypt inverts, restoring the IPv4 form for mapped addresses
    assert(one(Vrl.decryptIp(lit("72b9:a747:f2e9:72af:76ca:5866:6dcf:c3b0"), key))
      == "192.168.1.1")
  }

  test("uuid_from_friendly_id (uuid_from_friendly_id.cue example)") {
    assert(one(Vrl.uuidFromFriendlyId(lit("3s87yEvnmkiPBMHsj8bwwc"))) ==
      "7f41deed-d5e2-8b5e-7a13-ab4ff93cfad2")
  }

  // ------------------------------------------------------------ misc

  test("format_int / format_number (cue examples)") {
    assert(one(Vrl.formatInt(lit(42L), 16)) == "2a")
    assert(one(Vrl.formatInt(lit(-42L), 16)) == "-2a")
    assert(one(Vrl.formatNumber(lit(1234567.89), 3)) == "1,234,567.890")
    assert(one(Vrl.formatNumber(lit(1234567.89), 3, ",", " ")) == "1 234 567,890")
  }

  test("strip_ansi_escape_codes (strip_ansi_escape_codes.cue)") {
    assert(one(Vrl.stripAnsiEscapeCodes(lit("\u001b[46mfoo\u001b[0m bar"))) == "foo bar")
    assert(one(Vrl.stripAnsiEscapeCodes(lit("plain"))) == "plain")
  }

  test("haversine distance + bearing (haversine.cue example)") {
    val r = Seq(1).toDF("x")
      .select(Vrl.haversine(lit(0.0), lit(0.0), lit(10.0), lit(10.0)).as("h"))
      .select("h.*").head
    assert(math.abs(r.getDouble(0) - 1568.5227233) < 0.05)
    assert(math.abs(r.getDouble(1) - 44.561) < 0.01)
  }

  test("syslog level/severity/facility maps (cue examples)") {
    assert(one(Vrl.toSyslogLevel(lit(5))) == "notice")
    assert(one(Vrl.toSyslogSeverity(lit("alert"))) == 1)
    assert(one(Vrl.toSyslogFacility(lit(4))) == "auth")
    assert(one(Vrl.toSyslogFacilityCode(lit("local7"))) == 23)
    assert(one(Vrl.toSyslogLevel(lit(99))) == null)
  }

  test("from/to_unix_timestamp units round-trip") {
    val ts = java.sql.Timestamp.valueOf("2024-01-02 03:04:05")
    assert(one(Vrl.toUnixTimestamp(Vrl.fromUnixTimestamp(lit(1704164645L)))) == 1704164645L)
    assert(one(Vrl.toUnixTimestamp(lit(ts), "milliseconds")) == 1704164645000L)
    assert(one(Vrl.fromUnixTimestamp(lit(1704164645123L), "milliseconds")
      .cast("string")).toString.startsWith("2024-01-02 03:04:05.123"))
  }

  test("uuid_v7 layout: version/variant bits, time-sortable, deterministic") {
    val ts1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    def u(ts: java.sql.Timestamp, e: Long) =
      one(Vrl.uuidV7(lit(ts), lit(e), lit(e * 31 + 7))).asInstanceOf[String]
    val a = u(ts1, 12345L); val b = u(ts2, 12345L)
    assert(a.matches("[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"))
    assert(a < b) // time-ordered
    assert(u(ts1, 12345L) == a) // deterministic
    val v4 = one(Vrl.uuidV4(lit(987654321L), lit(123456789L))).asInstanceOf[String]
    assert(v4.matches("[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"))
  }

  test("user agent: uap-style ruleset, first match wins (parse_user_agent.cue)") {
    import graft.functions.UserAgent
    def parse(ua: String) = {
      val r = Seq(ua).toDF("ua").select(UserAgent.parse(col("ua")).as("p"))
        .select("p.*").head
      (r.getString(0), r.getString(1), r.getString(2))
    }
    val chrome = "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.109 Safari/537.36"
    assert(parse(chrome) == ("Chrome", "120", "0"))
    assert(parse(chrome + " Edg/120.0.2210.91") == ("Edge", "120", "0"))
    assert(parse(chrome + " OPR/92.0.4561.33") == ("Opera", "92", "0"))
    assert(parse("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Safari/605.1.15")
      == ("Safari", "17", "1"))
    assert(parse("Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 Mobile/15E148 Safari/604.1")
      == ("Mobile Safari", "17", "0"))
    assert(parse("Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/119.0.6045.109 Mobile/15E148 Safari/604.1")
      == ("Chrome Mobile iOS", "119", "0"))
    assert(parse("Mozilla/5.0 (Windows NT 6.1; rv:102.0) Gecko/20100101 Firefox/102.0")
      == ("Firefox", "102", "0"))
    assert(parse("Mozilla/5.0 (compatible; MSIE 9.0; Windows NT 6.1; Trident/5.0)")
      == ("IE", "9", "0"))
    assert(parse("Mozilla/5.0 (Windows NT 10.0; Trident/7.0; rv:11.0) like Gecko")
      == ("IE", "11", "0"))
    assert(parse("curl/8.4.0") == ("curl", "8", "4"))
    assert(parse("python-requests/2.31.0") == ("python-requests", "2", "31"))
    assert(parse("Go-http-client/2.0") == ("Go-http-client", "2", "0"))
    assert(parse("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)")
      == ("Googlebot", "2", "1"))
    assert(parse("weirdclient") == ("Other", null, null))
    // ruleset-as-data: a table-loaded rule overrides/extends the default
    val custom = Seq((0, "MyAgent/(\\d+)\\.(\\d+)", "MyAgent", 1, 2))
      .toDF("priority", "regex", "family", "v1_group", "v2_group")
    val rules = UserAgent.fromTable(custom) ++ UserAgent.DefaultRules
    val got = Seq("MyAgent/3.7").toDF("ua")
      .select(UserAgent.parse(col("ua"), rules).as("p")).select("p.*").head
    assert((got.getString(0), got.getString(1), got.getString(2)) == ("MyAgent", "3", "7"))
    // uap-core rules routinely have family-only entries (null version
    // groups) — absent groups coalesce to 0, never NPE
    val familyOnly = Seq((0, "SpecialBot", "SpecialBot",
        null.asInstanceOf[Integer], null.asInstanceOf[Integer]))
      .toDF("priority", "regex", "family", "v1_group", "v2_group")
    val r2 = UserAgent.fromTable(familyOnly)
    val g2 = Seq("SpecialBot/9.9").toDF("ua")
      .select(UserAgent.parse(col("ua"), r2).as("p")).select("p.*").head
    assert(g2.getString(0) == "SpecialBot" && g2.isNullAt(1) && g2.isNullAt(2))
  }

  test("native_json: decodes the reference's full 1027-event encoding corpus") {
    import graft.functions.NativeJson
    val dir = new java.io.File(
      "/root/reference/lib/codecs/tests/data/native_encoding/json")
    assume(dir.exists, "reference corpus not present")
    val raw = spark.read.text(dir.getAbsolutePath + "/*.json")
      .filter(length(trim($"value")) > 0)
    val total = raw.count()
    assert(total >= 1000)
    // every line classifies into exactly one envelope arm
    assert(raw.filter(NativeJson.eventKind($"value").isNull).count() == 0)
    val dec = raw.select($"value", NativeJson.decode($"value").as("e"))
    val m = dec.filter(NativeJson.eventKind($"value") === "metric")
      .select("e.metric.*")
    val nMetrics = m.count()
    assert(nMetrics > 400)
    assert(m.filter($"name".isNull || $"kind".isNull).count() == 0)
    // exactly one value arm per metric, and every arm type occurs
    val arms = Seq("counter", "gauge", "set", "distribution",
      "aggregated_histogram", "aggregated_summary", "sketch")
    val armCnt = arms.map(a => when(col(a).isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    assert(m.filter(armCnt =!= 1).count() == 0,
      "every corpus metric must decode exactly one value variant")
    arms.foreach { a =>
      assert(m.filter(col(a).isNotNull).count() > 0, s"no $a in corpus?")
    }
    // u64 counts survive beyond Long range (DECIMAL(20,0))
    val maxCount = m.filter($"aggregated_histogram".isNotNull)
      .select(max($"aggregated_histogram.count".cast("decimal(20,0)"))).head.getDecimal(0)
    assert(maxCount.unscaledValue().bitLength() > 63,
      s"corpus contains >Long u64 counts; got max $maxCount")
  }

  test("native_json: round-trips our own log and metric rows") {
    import graft.functions.NativeJson
    val logs = Seq(("c1", 3, "hello \"quoted\"")).toDF("conv_id", "turn_idx", "text")
    val enc = logs.select(NativeJson.encodeLog(Seq(
      "conv_id" -> $"conv_id", "turn_idx" -> $"turn_idx", "text" -> $"text")).as("l"))
    val logSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("conv_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("turn_idx",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val back = enc.select(NativeJson.decode($"l", logSchema).as("e"))
      .select("e.log.*").head
    assert(back.getString(0) == "c1" && back.getInt(1) == 3 &&
      back.getString(2) == "hello \"quoted\"")

    val metrics = Seq(
      ("turns_total", Map("level" -> "err"), "incremental", "counter", 2.0),
      ("latency_last", Map("role" -> "user"), "absolute", "gauge", 17.5),
      ("users", Map.empty[String, String], "incremental", "set", 42.0)
    ).toDF("name", "tags", "kind", "value_type", "value")
    val encM = metrics.select(NativeJson.encodeMetric($"name", $"tags",
      $"kind", $"value_type", $"value").as("l"))
    assert(encM.filter(NativeJson.eventKind($"l") =!= "metric").count() == 0)
    val backM = encM.select(NativeJson.decode($"l").as("e")).select("e.metric.*")
      .orderBy("name").collect()
    assert(backM(0).getAs[org.apache.spark.sql.Row]("gauge").getDouble(0) == 17.5)
    assert(backM(1).getAs[org.apache.spark.sql.Row]("counter").getDouble(0) == 2.0)
    assert(backM(1).getAs[Map[String, String]]("tags") == Map("level" -> "err"))
    assert(backM(2).getAs[org.apache.spark.sql.Row]("set").getAs[scala.collection.Seq[String]]("values")
      == Seq("42.0"))
  }

  // ------------------------------------------------- tier-3 + mappings

  test("flatten/unflatten objects (flatten.cue, unflatten.cue examples)") {
    assert(one(Vrl.flattenObject(lit(
      """{"parent1":{"child1":1,"child2":2},"parent2":{"child3":3}}"""))) ==
      """{"parent1.child1":1,"parent1.child2":2,"parent2.child3":3}""")
    assert(one(Vrl.unflattenObject(lit(
      """{"foo.bar.baz":true,"foo.bar.qux":false,"foo.quux":42}"""))) ==
      """{"foo":{"bar":{"baz":true,"qux":false},"quux":42}}""")
    // round-trip
    val nested = """{"a":{"b":{"c":"x"},"d":1}}"""
    assert(one(Vrl.unflattenObject(Vrl.flattenObject(lit(nested)))) == nested)
  }

  test("chunks / screamingsnakecase / basename / dirname (cue examples)") {
    assert(one(Vrl.chunks(lit("abcdefgh"), 4))
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("abcd", "efgh"))
    assert(one(Vrl.chunks(lit("abcdefghi"), 4))
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("abcd", "efgh", "i"))
    assert(one(Vrl.screamingsnakecase(lit("fooBarBaz"))) == "FOO_BAR_BAZ")
    assert(one(Vrl.basename(lit("/usr/local/bin/spark"))) == "spark")
    assert(one(Vrl.dirname(lit("/usr/local/bin/spark"))) == "/usr/local/bin")
    assert(one(Vrl.dirname(lit("/spark"))) == "/")
    assert(one(Vrl.dirname(lit("spark"))) == ".")
  }

  test("is_nullish / is_json / is_ipv4 / is_ipv6 / tag_types_externally") {
    assert(one(Vrl.isNullish(lit("   "))) == true)
    assert(one(Vrl.isNullish(lit("-"))) == true)
    assert(one(Vrl.isNullish(lit("x"))) == false)
    assert(one(Vrl.isJson(lit("""{"a":1}"""))) == true)
    assert(one(Vrl.isJson(lit("{nope"))) == false)
    assert(one(Vrl.isIpv4(lit("10.2.3.255"))) == true)
    assert(one(Vrl.isIpv4(lit("10.2.3.256"))) == false)
    assert(one(Vrl.isIpv6(lit("2001:db8::1"))) == true)
    assert(one(Vrl.isIpv6(lit("10.0.0.1"))) == false)
    assert(one(Vrl.tagTypesExternally(lit(123L), "integer")) == """{"integer":123}""")
    assert(one(Vrl.tagTypesExternally(lit("message"), "string")) == """{"string":"message"}""")
  }

  test("random_bool/int/float: deterministic per seed, correct ranges") {
    val df = (1 to 500).toDF("seed")
    val r = df.select(Vrl.randomInt($"seed", 10, 20).as("i"),
      Vrl.randomFloat($"seed").as("f"), Vrl.randomBool($"seed").as("b"))
    assert(r.filter($"i" < 10 || $"i" >= 20).count() == 0)
    assert(r.filter($"f" < 0.0 || $"f" >= 1.0).count() == 0)
    val bools = r.select("b").collect().map(_.getBoolean(0))
    assert(bools.count(identity) > 150 && bools.count(identity) < 350)
    // determinism: same seed, same values
    assert(one(Vrl.randomInt(lit(7), 0, 100)) == one(Vrl.randomInt(lit(7), 0, 100)))
    // charset round-trip
    assert(one(Vrl.decodeCharset(Vrl.encodeCharset(lit("héllo"), "utf-16"), "utf-16"))
      == "héllo")
  }

  /** The rest of the VRL collection/object/type surface maps 1:1 onto
    * Spark builtins — asserted here so SURVEY §2.7 can claim each cue
    * file with evidence (append, push, flatten-array, unique, zip,
    * includes, contains_all, join, keys, values, map_keys, map_values,
    * object_from_array, slice, strlen, get/set/del/exists, match_array,
    * merge, compact, abs/ceil/floor/round/mod, upcase/downcase,
    * starts_with/ends_with, split, replace, format_timestamp, to_*).
    */
  test("VRL collection/object/type functions: 1:1 Spark builtin mapping") {
    val a = array(lit(1), lit(2))
    assert(one(concat(a, array(lit(3)))).asInstanceOf[scala.collection.Seq[Int]]
      == Seq(1, 2, 3))                                     // append
    assert(one(array_append(a, lit(9))).asInstanceOf[scala.collection.Seq[Int]]
      == Seq(1, 2, 9))                                     // push
    assert(one(flatten(array(a, array(lit(3))))).asInstanceOf[scala.collection.Seq[Int]]
      == Seq(1, 2, 3))                                     // flatten (array form)
    assert(one(array_distinct(array(lit(1), lit(1), lit(2))))
      .asInstanceOf[scala.collection.Seq[Int]] == Seq(1, 2)) // unique
    assert(one(array_contains(a, lit(2))) == true)          // includes
    assert(one(forall(a, x => array_contains(array(lit(1), lit(2), lit(3)), x)))
      == true)                                              // contains_all
    assert(one(array_join(array(lit("a"), lit("b")), "-")) == "a-b") // join
    val m = map(lit("k1"), lit("v1"), lit("k2"), lit("v2"))
    assert(one(map_keys(m)).asInstanceOf[scala.collection.Seq[String]].sorted
      == Seq("k1", "k2"))                                   // keys
    assert(one(map_values(m)).asInstanceOf[scala.collection.Seq[String]].sorted
      == Seq("v1", "v2"))                                   // values
    assert(one(element_at(transform_keys(m, (k, _) => upper(k)), "K1"))
      == "v1")                                              // map_keys
    assert(one(element_at(transform_values(m, (_, v) => upper(v)), "k1"))
      == "V1")                                              // map_values
    assert(one(element_at(map_from_entries(array(struct(lit("a"), lit(1)))), "a"))
      == 1)                                                 // object_from_array
    assert(one(slice(array(lit(1), lit(2), lit(3), lit(4)), 2, 2))
      .asInstanceOf[scala.collection.Seq[Int]] == Seq(2, 3)) // slice
    assert(one(length(lit("héllo"))) == 5)                  // strlen (codepoints)
    assert(one(element_at(m, "k1")) == "v1")                // get
    assert(one(map_contains_key(m, "k2")) == true)          // exists
    assert(one(map_keys(map_filter(m, (k, _) => k =!= "k1")))
      .asInstanceOf[scala.collection.Seq[String]] == Seq("k2")) // del/remove
    assert(one(exists(array(lit("abc"), lit("xyz")), _.rlike("^x")))
      == true)                                              // match_array
    // merge (right wins): map_zip_with + coalesce
    val merged = map_zip_with(m, map(lit("k2"), lit("OVER")), (_, v1, v2) =>
      coalesce(v2, v1))
    assert(one(element_at(merged, "k2")) == "OVER")
    assert(one(filter(array(lit("a"), lit(null).cast("string")), _.isNotNull))
      .asInstanceOf[scala.collection.Seq[String]] == Seq("a")) // compact
    assert(one(abs(lit(-3))) == 3 && one(ceil(lit(1.1))) == 2 &&
      one(floor(lit(1.9))) == 1 && one(round(lit(1.55), 1)) == 1.6 &&
      one(pmod(lit(7), lit(3))) == 1)                       // abs/ceil/floor/round/mod
    assert(one(upper(lit("a"))) == "A" && one(lower(lit("A"))) == "a")
    assert(one(lit("abc").startsWith("a")) == true)
    assert(one(lit("abc").endsWith("c")) == true)
    assert(one(split(lit("a,b"), ",")).asInstanceOf[scala.collection.Seq[String]]
      == Seq("a", "b"))
    assert(one(regexp_replace(lit("aaa"), "a", "b")) == "bbb") // replace
    assert(one(date_format(lit(java.sql.Timestamp.valueOf("2024-01-02 03:04:05")),
      "yyyy/MM/dd")) == "2024/01/02")                       // format_timestamp
    assert(one(try_element_at(a, lit(5))) == null)          // fallible get
    assert(one(lit("12").cast("long")) == 12L)              // to_int
    assert(one(lit("x").try_cast("long")) == null)          // to_int fallible
    assert(one(lit("1.5").cast("double")) == 1.5)           // to_float
    assert(one(lit(1).cast("boolean")) == true)             // to_bool
  }

  test("ip subnet / v6 mapping extras") {
    assert(one(Vrl.ipSubnet(lit("10.1.2.3"), lit("/24"))) == "10.1.2.0")
    assert(one(Vrl.ipSubnet(lit("10.1.2.3"), lit("255.255.0.0"))) == "10.1.0.0")
    assert(one(Vrl.ipToIpv6(lit("1.2.3.4"))) == "::ffff:1.2.3.4")
    assert(one(Vrl.ipv6ToIpv4(lit("::ffff:1.2.3.4"))) == "1.2.3.4")
    assert(one(Vrl.ipv6ToIpv4(lit("2001:db8::1"))) == null)
  }

  // ------------------------------------------ hostile-input hardening

  test("stdlib scalars degrade per-row on hostile input (no ANSI job aborts)") {
    // duplicate query-string keys: str_to_map would abort the JOB under
    // mapKeyDedupPolicy=EXCEPTION; last value wins (documented
    // divergence: VRL returns an array for repeats)
    assert(one(element_at(Vrl.parseQueryString(lit("tag=a&tag=b&x=1")), "tag")) == "b")
    assert(one(element_at(Vrl.parseQueryString(lit("a=1&b=two")), "b")) == "two")
    assert(one(element_at(Vrl.parseQueryString(lit("flag&b=2")), "flag")) == "")
    // malformed percent escapes / base64: url_decode and unbase64 throw
    assert(one(Vrl.decodePercent(lit("%zz"))) == null)
    assert(one(Vrl.decodePercent(lit("trailing%"))) == null)
    assert(one(Vrl.decodeBase64(lit("!!not base64!!"))) == null)
    assert(one(Vrl.decodeBase64(Vrl.encodeBase64(lit("round trip")))) == "round trip")
    // parse_int: garbage must RAISE (null), not parse as 0; u64-range
    // hex must not ANSI-abort the cast
    assert(one(Vrl.parseInt(lit("zz"), 16)) == null)
    assert(one(Vrl.parseInt(lit("ffffffffffffffff"), 16)) == null)
    assert(one(Vrl.parseInt(lit("ff"), 16)) == 255L)
    assert(one(Vrl.parseInt(lit("-ff"), 16)) == -255L)
    // ip_subnet: garbage or out-of-range masks null, never abort or
    // silently truncate '/123' to '/12'
    assert(one(Vrl.ipSubnet(lit("10.1.2.3"), lit("/ab"))) == null)
    assert(one(Vrl.ipSubnet(lit("10.1.2.3"), lit("/123"))) == null)
  }

  test("epoch-nanosecond conversion is exact (double division loses 256ns at 1.7e18)") {
    assert(one(unix_micros(Vrl.fromUnixTimestamp(lit(1700000000123472000L), "nanoseconds")))
      == 1700000000123472L)
  }

  test("is_ipv4 and ip_aton agree: no leading-zero octets (Rust std parser semantics)") {
    assert(one(Vrl.isIpv4(lit("011.1.1.1"))) == false)
    assert(one(Vrl.isIpv4(lit("01.2.3.4"))) == false)
    assert(one(Vrl.isIpv4(lit("255.0.10.99"))) == true)
    assert(one(Vrl.ipAton(lit("01.2.3.4"))) == null)
    assert(one(Vrl.ipAton(lit("1.2.3.4"))) == 16909060L)
    // the guard invariant: is_ipv4 true implies ip_aton parses
    for (s <- Seq("0.0.0.0", "255.255.255.255", "10.0.0.1", "192.168.100.200"))
      assert(one(Vrl.isIpv4(lit(s))) == true && one(Vrl.ipAton(lit(s))) != null, s)
  }

  test("ip kernels admit only strict literals: no resolver, no classful shorthand") {
    import graft.config.VrlKernels
    // hostname-shaped hex values ("cafe.babe") passed the old charset
    // guard and went to InetAddress.getByName -> a per-row DNS lookup;
    // classful shorthand ("123" -> 0.0.0.123, "1.2.3" -> 1.2.0.3) is
    // Java leniency the reference's Rust parser rejects
    for (bad <- Seq("cafe.babe", "abc.def", "123", "1.2.3", "1.2.3.4.5",
                    "01.2.3.4", "999.1.1.1", "1::2::3", ":", "12345::1"))
      assert(one(VrlKernels.ipPtonHex(lit(bad))) == null, bad)
    assert(one(VrlKernels.ipPtonHex(lit("1.2.3.4"))) == "01020304")
    assert(one(VrlKernels.ipPtonHex(lit("::1"))) ==
      "00000000000000000000000000000001")
    assert(one(VrlKernels.ipPtonHex(lit("::ffff:1.2.3.4"))) ==
      "00000000000000000000ffff01020304")
    assert(one(VrlKernels.ipSubnet(lit("2001:db8::8:1"), lit("/32"))) == "2001:db8::")
    assert(one(VrlKernels.ipSubnet(lit("1.2.3"), lit("/24"))) == null)
    assert(one(VrlKernels.cidrContains(lit("2001:db8::/32"), lit("2001:db8::99"))) == true)
    assert(one(VrlKernels.cidrContains(lit("2001:db8::/32"), lit("cafe.babe"))) == null)
  }

  test("encrypt_ip: malformed address or key nulls the row, never resolves or throws") {
    val key = lit("sixteen byte key")
    // a hostname-shaped value must NOT reach a resolver (per-row DNS +
    // data leak) — literal-or-null only
    assert(one(Vrl.encryptIp(lit("not-an-ip"), key)) == null)
    assert(one(Vrl.encryptIp(lit("999.1.1.1"), key)) == null)
    assert(one(Vrl.encryptIp(lit("1.2.3.4.5"), key)) == null)
    assert(one(Vrl.encryptIp(lit(""), key)) == null)
    assert(one(Vrl.encryptIp(lit("1.2.3.4"), lit("short key"))) == null)
    assert(one(Vrl.decryptIp(lit("zzzz::1"), key)) == null)
    // the mapped-v6 spelling of a v4 address hits the same block as the
    // dotted quad (the JDK collapses it to an Inet4Address)
    assert(one(Vrl.encryptIp(lit("::ffff:192.168.1.1"), key)) ==
      one(Vrl.encryptIp(lit("192.168.1.1"), key)))
  }

  test("uuid_from_friendly_id: non-base62 or >128-bit input nulls the row") {
    assert(one(Vrl.uuidFromFriendlyId(lit("3s87y-vnmkiPBMHsj8bwwc"))) == null)
    assert(one(Vrl.uuidFromFriendlyId(lit("z" * 22))) == null) // 62^22 > 2^128
    assert(one(Vrl.uuidFromFriendlyId(lit("3" + "z" * 21))) != null) // 4*62^21-1 < 2^128
  }

  test("encode_punycode: RFC-3490-invalid labels null the row (raise channel)") {
    assert(one(Vrl.encodePunycode(lit("a..b"))) == null)     // empty label
    assert(one(Vrl.encodePunycode(lit("a" * 64 + ".com"))) == null) // >63-char label
    assert(one(Vrl.encodePunycode(lit("ok.example.com"))) == "ok.example.com")
  }

  test("decode_snappy: hostile length preamble nulls the row (no up-front allocation)") {
    // varint preamble claiming ~2GB on a 6-byte blob
    val bomb = Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x07, 0x00)
    assert(one(Vrl.decodeSnappy(lit(bomb))) == null)
    assert(one(Vrl.decodeSnappy(lit(Array[Byte](1, 2, 3)))) == null) // garbage
  }

  test("parse_etld is locale-independent: uppercase hosts match ASCII suffixes") {
    // tr_TR default-locale lowercase would map 'I' to dotless 'ı' and
    // un-match the suffix — Locale.ROOT pins the result
    val r = Seq("WWW.EXAMPLE.AC.UK").toDF("h")
      .select(Etld.parseEtld(col("h"), 1).as("p")).select("p.*").head
    assert((r.getString(0), r.getString(1), r.getBoolean(2)) ==
      ("ac.uk", "example.ac.uk", true))
  }

  test("parse_ruby_hash: scientific/hex/underscore numbers and control chars stay valid JSON") {
    assert(one(Vrl.parseRubyHash(lit("""{"a" => 1.5e3}"""))) == """{"a":1.5e3}""")
    assert(one(Vrl.parseRubyHash(lit("""{"a" => 1.0e+20, "b" => -2.5E-3}"""))) ==
      """{"a":1.0e+20,"b":-2.5E-3}""")
    assert(one(Vrl.parseRubyHash(lit("""{"a" => 0x1f, "b" => 1_000}"""))) ==
      """{"a":31,"b":1000}""")
    assert(one(Vrl.parseRubyHash(lit("{\"a\" => \"x\ny\"}"))) ==
      """{"a":"x\ny"}""")
    // expected built without \uXXXX in the literal: the Scala lexer
    // translates unicode escapes even inside triple quotes
    assert(one(Vrl.parseRubyHash(lit("{\"a\" => \"\\e[0m\u0001\"}"))) ==
      "{\"a\":\"\\u001b[0m\\u0001\"}")
    // every emitted value above must round-trip through a strict parser
    for (rb <- Seq("""{"a" => 1.5e3}""", """{"a" => 0x1f}""", "{\"a\" => \"x\ny\"}")) {
      val js = one(Vrl.parseRubyHash(lit(rb))).asInstanceOf[String]
      assert(one(from_json(lit(js), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))) != null, s"unparseable: $js")
    }
  }
}
