package graft

import org.apache.spark.sql.functions._

import graft.config.{Topology, UnitTestHarness}
import graft.functions.{Parsers, Vrl, VrlParsers => FnParsers}

/** Regression specs for malformed-input hardening (third review sweep).
  *
  * Spark 4 runs with `spark.sql.ansi.enabled=true` by default, so an
  * unguarded `cast` / `element_at` / `getItem` on a hostile log line
  * aborts the whole job. A log pipeline must instead degrade per-row:
  * null fields / the VRL raise channel (reference semantics: every
  * fallible VRL function raises, it never kills the topology —
  * src/transforms/remap.rs drop/error routing). Each test here feeds
  * an input that previously threw under ANSI mode.
  */
class MalformedInputSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).head.get(0)

  // ------------------------------------------------ direct column fns

  test("ip_aton: malformed address is null, not an ANSI cast abort") {
    assert(one(Vrl.ipAton(lit("1.2.3.4"))) == 16909060L)
    for (bad <- Seq("not-an-ip", "1.2.3", "1.2.3.4.5", "1.2.3.999", "1.2.x.4", ""))
      assert(one(Vrl.ipAton(lit(bad))) == null, s"ip_aton($bad)")
  }

  test("ip_cidr_contains: slash-less or garbage CIDR is null, not an abort") {
    assert(one(Vrl.ipCidrContains(lit("10.0.0.0/8"), lit("10.1.2.3"))) == true)
    assert(one(Vrl.ipCidrContains(lit("10.0.0.0"), lit("10.1.2.3"))) == null)
    assert(one(Vrl.ipCidrContains(lit("10.0.0.0/xx"), lit("10.1.2.3"))) == null)
    assert(one(Vrl.ipCidrContains(lit("10.0.0.0/8"), lit("garbage"))) == null)
  }

  test("chunks: dotall — newlines are kept, chunks re-concatenate to the input") {
    val s = "ab\ncd\nef"
    val got = one(Vrl.chunks(lit(s), 3)).asInstanceOf[scala.collection.Seq[String]]
    assert(got == Seq("ab\n", "cd\n", "ef"))
    assert(got.mkString == s)
  }

  test("parse_float (column form): unparsable is null, not an ANSI abort") {
    assert(one(FnParsers.parseFloat(lit("-1.5"))) == -1.5)
    assert(one(FnParsers.parseFloat(lit("zzz"))) == null)
  }

  test("parse_cef: truncated header yields null fields, not an index abort") {
    val line = "CEF:0|Vendor|Product" // 3 of 8 sections
    assert(one(Parsers.cefHeader(lit(line), 1)) == "Vendor")
    assert(one(Parsers.cefHeader(lit(line), 7)) == null)
    assert(one(Parsers.cefExtension(lit(line))) == null)
  }

  test("encode_gelf: control characters escape to \\u00XX — output stays valid JSON") {
    val msg = "a\u0001b\u000bc"
    val json = one(Parsers.encodeGelf(lit("h"), lit(msg),
      lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), lit(1)))
      .asInstanceOf[String]
    assert(json.contains("\\u0001") && json.contains("\\u000b"))
    // round-trip through a JSON parser proves validity AND that the
    // escape is the 2-backslash-at-runtime form (not a literal \\u00XX)
    assert(one(get_json_object(lit(json), "$.short_message")) == msg)
  }

  test("parse_aws_alb_log: truncated line yields null fields, not an abort") {
    val r = Seq("https 2024-01-01T00:00:00.000000Z app/x/1 1.2.3.4:5").toDF("l")
      .select(FnParsers.parseAwsAlbLog(col("l")).as("a")).head.getStruct(0)
    assert(r.getAs[Any]("elb_status_code") == null)
    assert(r.getAs[Any]("request_processing_time") == null)
  }

  test("parse_aws_vpc_flow_log: short or non-numeric line yields nulls, not an abort") {
    val r = Seq("2 123456789 eni-1 garbage").toDF("l")
      .select(FnParsers.parseAwsVpcFlowLog(col("l")).as("v")).head.getStruct(0)
    assert(r.getAs[Any]("version") == 2L)
    assert(r.getAs[Any]("bytes") == null)
    // 4th slot is srcaddr (string) — present; numeric slots past the end null
    assert(r.getAs[Any]("packets") == null)
  }

  test("decoders: hostile compressed blobs degrade to null — no abort, no hang") {
    // zlib header with FDICT set (CMF=0x78, FLG=0x20: check bits valid,
    // preset-dictionary flag on) — previously an infinite inflate loop
    assert(one(Vrl.decodeZlib(unhex(lit("782000000001")))) == null)
    assert(one(Vrl.decodeGzip(unhex(lit("deadbeef")))) == null)
    assert(one(Vrl.decodeZstd(unhex(lit("00112233445566")))) == null)
    // lz4: truncated (no 4-byte prefix) and decompression-bomb prefix
    assert(one(Vrl.decodeLz4(unhex(lit("0102")))) == null)
    assert(one(Vrl.decodeLz4(unhex(lit("ffffff7f0102030405")))) == null)
    assert(one(Vrl.decodeSnappy(unhex(lit("ff00ff00ff")))) == null)
    // valid round-trips still work after the guards
    assert(one(Vrl.decodeZlib(Vrl.encodeZlib(lit("ok").cast("binary"))).cast("string")) == "ok")
    assert(one(Vrl.decodeLz4(Vrl.encodeLz4(lit("ok").cast("binary"))).cast("string")) == "ok")
  }

  test("parse_cbor: hostile bytes degrade to null — truncation, bad info, deep nesting") {
    // array header claiming 2 items, body truncated (BufferUnderflow)
    assert(one(Vrl.parseCbor(unhex(lit("82")))) == null)
    // major 0 with indefinite info byte (illegal for ints)
    assert(one(Vrl.parseCbor(unhex(lit("1f")))) == null)
    // declared byte-string length far beyond the buffer
    assert(one(Vrl.parseCbor(unhex(lit("5bffffffffffffffff00")))) == null)
    // 10k nested single-element arrays: depth cap, not StackOverflowError
    assert(one(Vrl.parseCbor(unhex(lit("81" * 10000)))) == null)
    // a valid document still parses after the guards
    assert(one(Vrl.parseCbor(unbase64(lit("oWVmaWVsZGV2YWx1ZQ=="))))
      == """{"field":"value"}""")
  }

  test("decoders: decompression bombs hit the output cap and null out, not OOM") {
    // 300 MiB of zeros compresses to ~300 KB; inflating it would cross
    // the 256 MiB output cap — the row must degrade, never OOM the
    // executor (an Error the per-row guard cannot catch)
    val big = new Array[Byte](300 * 1024 * 1024)
    def deflate(wrap: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(6, !wrap)
      d.setInput(big); d.finish()
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end(); bos.toByteArray
    }
    val zbomb = deflate(wrap = true)
    val gbomb = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(big); g.close(); bos.toByteArray
    }
    val sbomb = com.github.luben.zstd.Zstd.compress(big, 3)
    val df = Seq((zbomb, gbomb, sbomb)).toDF("z", "g", "s")
    val r = df.select(Vrl.decodeZlib(col("z")).as("z"),
      Vrl.decodeGzip(col("g")).as("g"), Vrl.decodeZstd(col("s")).as("s")).head()
    assert(r.get(0) == null && r.get(1) == null && r.get(2) == null)
  }

  test("decode_mime_q: malformed encoded-words stay verbatim, never throw") {
    assert(one(Vrl.decodeMimeQ(lit("x =?UTF-8?Q?=ZZ?= y"))) == "x =?UTF-8?Q?=ZZ?= y")
    assert(one(Vrl.decodeMimeQ(lit("=?bogus-charset?B?Zm9v?="))) ==
      "=?bogus-charset?B?Zm9v?=")
    assert(one(Vrl.decodeMimeQ(lit("=?UTF-8?B?!!!notbase64?="))) ==
      "=?UTF-8?B?!!!notbase64?=")
    // a valid word still decodes
    assert(one(Vrl.decodeMimeQ(lit("=?UTF-8?Q?hello_world?="))) == "hello world")
  }

  // ------------------------------------------- config-dispatch raises

  test("fallible stdlib calls raise (error channel) on malformed input instead of aborting") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .i1, .e1 = parse_int("0xffffffffffffffff")
        |    .i2, .e2 = parse_int("99999999999999999999999")
        |    .f1, .e3 = parse_float("zzz")
        |    .f2, .e4 = to_float("zzz")
        |    .s1, .e5 = to_syslog_facility(99)
        |    .dz, .e6 = decode_zlib("anVuaw==")
        |    .c1, .e7 = community_id("1.2.3.4", "5.6.7.8", "junk")
        |    .ok = parse_int!("0x2a")
        |    .sl = parse_syslog!("<200>1 2024-01-01T00:00:00Z host app proc-x mid - hello")
        |  '''
        |[[tests]]
        |  name = "malformed_raises"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      x = 1
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert!(.e1 != null)
        |        assert!(.e2 != null)
        |        assert!(.e3 != null)
        |        assert!(.e4 != null)
        |        assert!(.e5 != null)
        |        assert!(.e6 != null)
        |        assert!(.e7 != null)
        |        assert_eq!(.ok, 42)
        |        assert!(is_null(.sl.facility))
        |        assert_eq!(.sl.severity, "emerg")
        |        assert!(is_null(.sl.procid))
        |        assert_eq!(.sl.message, "hello")
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.length == 1)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
  }
}
