package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Parsers

/** Codec surface specs (reference lib/codecs + VRL parse_* functions). */
class ParserSpec extends SparkSpec {
  import spark.implicits._

  test("parse_json extracts typed fields") {
    val df = Seq("""{"k": 7}""", """{"k": null}""", "not json").toDF("j")
    val out = df.select(Parsers.parseJson($"j",
        StructType(Seq(StructField("k", IntegerType)))).getField("k").as("k"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(out.toSeq == Seq(Some(7), None, None))
  }

  test("parse_key_value round-trips logfmt pairs") {
    val df = Seq("a=1 b=x").toDF("l")
    val m = Parsers.parseKeyValue($"l")
    val r = df.select(m.getItem("a").as("a"), m.getItem("b").as("b")).collect()(0)
    assert(r.getString(0) == "1" && r.getString(1) == "x")
  }

  test("syslog5424 grok parses a constructed line") {
    val line = "<13>1 2024-01-01T10:00:00Z host-1 app 42 ID7 - event 99"
    val m = java.util.regex.Pattern.compile(Parsers.syslog5424.regex).matcher(line)
    assert(m.matches())
    val f = Parsers.syslog5424.fields
    assert(m.group(f.indexOf("pri") + 1) == "13")
    assert(m.group(f.indexOf("hostname") + 1) == "host-1")
    assert(m.group(f.indexOf("message") + 1) == "event 99")
  }

  test("apache common log grok parses a constructed line") {
    val line = """10.0.3.1 - frank [01/Jan/2024:10:00:00 +0000] "GET /view HTTP/1.1" 200 512"""
    val m = java.util.regex.Pattern.compile(Parsers.apacheCommon.regex).matcher(line)
    assert(m.matches())
    val f = Parsers.apacheCommon.fields
    assert(m.group(f.indexOf("status") + 1) == "200")
    assert(m.group(f.indexOf("apath") + 1) == "/view")
  }

  test("encode_logfmt quotes values with spaces") {
    val df = Seq(("x", "a b")).toDF("k1", "k2")
    val out = df.select(Parsers.encodeLogfmt(Seq(
      "k1" -> $"k1", "k2" -> $"k2")).as("l")).collect()(0).getString(0)
    assert(out == "k1=x k2=\"a b\"")
  }

  test("encode_json emits deterministic field order") {
    val df = Seq((1L, "x")).toDF("id", "s")
    val out = df.select(Parsers.encodeJson(Seq(
      "id" -> $"id", "s" -> $"s")).as("j")).collect()(0).getString(0)
    assert(out == """{"id":1,"s":"x"}""")
  }

  test("avro codec is jar-gated with Spark's named analysis error") {
    // the sandbox ships no spark-avro module jar; Spark must gate the
    // codec with its named error (with the jar present, the same calls
    // are the real binary codec — probed via graft.tools.AvroProbe)
    val df = Seq("x").toDF("s")
    val e = intercept[Exception] {
      df.select(Parsers.toAvro($"s")).collect()
    }
    assert(e.getMessage.contains("AVRO_NOT_LOADED"))
    val p = intercept[Exception] {
      df.select(Parsers.fromProtobuf($"s".cast("binary"), "Msg", "/tmp/none.desc"))
        .collect()
    }
    assert(p.getMessage.contains("PROTOBUF_NOT_LOADED")
      || p.getMessage.toLowerCase.contains("protobuf"))
  }

  test("parse_xml extracts typed fields by xpath") {
    val xml = "<event><id>42</id><user name=\"ada\"/><tags><t>a</t><t>b</t></tags></event>"
    val df = Seq(xml).toDF("x")
    val row = df.select(
      Parsers.xmlLong($"x", "/event/id").as("id"),
      Parsers.xmlString($"x", "/event/user/@name").as("name"),
      Parsers.xmlList($"x", "/event/tags/t/text()").as("tags")).head
    assert(row.getLong(0) == 42L)
    assert(row.getString(1) == "ada")
    assert(row.getSeq[String](2) == Seq("a", "b"))
  }

  test("encode_gelf escapes quotes/backslashes so hostile values round-trip") {
    val df = Seq(("h\"o\\st", "say \"hi\"\nnow", 1700000000.0, 3))
      .toDF("host", "msg", "ts", "lvl")
    val enc = Parsers.encodeGelf($"host", $"msg", $"ts", $"lvl")
    val p = Parsers.parseGelf(enc)
    val row = df.select(
      p.getField("host").as("h"), p.getField("short_message").as("m"),
      p.getField("timestamp").as("t"), p.getField("level").as("l")).head
    assert(row.getString(0) == "h\"o\\st")
    assert(row.getString(1) == "say \"hi\"\nnow")
    assert(row.getDouble(2) == 1700000000.0)
    assert(row.getInt(3) == 3)
  }
}
