package graft

import org.apache.spark.sql.functions._

import graft.functions.{SearchSyntax, Template, Vrl}
import graft.operators.LineAgg

/** Specs for the VRL-stdlib extensions, line_agg modes, templates and
  * the search-syntax condition compiler.
  */
class StdlibSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).head.get(0)

  // ------------------------------------------------------------ Vrl

  test("parseDuration units and fallibility") {
    assert(one(Vrl.parseDuration(lit("250ms"))) == 0.25)
    assert(one(Vrl.parseDuration(lit("1.5s"))) == 1.5)
    assert(one(Vrl.parseDuration(lit("2m"))) == 120.0)
    assert(one(Vrl.parseDuration(lit("1h"), "m")) == 60.0)
    assert(one(Vrl.parseDuration(lit("not a duration"))) == null)
  }

  test("ip aton/ntoa round-trip and cidr membership") {
    assert(one(Vrl.ipAton(lit("1.2.3.4"))) == 16909060L)
    assert(one(Vrl.ipNtoa(lit(16909060L))) == "1.2.3.4")
    assert(one(Vrl.ipCidrContains(lit("10.64.0.0/10"), lit("10.100.3.4"))) == true)
    assert(one(Vrl.ipCidrContains(lit("10.64.0.0/10"), lit("10.200.3.4"))) == false)
    assert(one(Vrl.ipCidrContains(lit("0.0.0.0/0"), lit("200.1.2.3"))) == true)
    assert(one(Vrl.ipCidrContains(lit("10.64.0.1/32"), lit("10.64.0.1"))) == true)
    assert(one(Vrl.ipCidrContains(lit("10.64.0.1/32"), lit("10.64.0.2"))) == false)
  }

  test("case conversions") {
    assert(one(Vrl.camelcase(lit("foo_bar_baz"))) == "fooBarBaz")
    assert(one(Vrl.pascalcase(lit("foo_bar"))) == "FooBar")
    assert(one(Vrl.snakecase(lit("fooBarBaz"))) == "foo_bar_baz")
    assert(one(Vrl.kebabcase(lit("fooBarBaz"))) == "foo-bar-baz")
    assert(one(Vrl.camelcase(lit("single"))) == "single")
  }

  test("redact and sieve") {
    assert(one(Vrl.redact(lit("card 1234-5678 end"), "[0-9]{4}-[0-9]{4}"))
      == "card [REDACTED] end")
    assert(one(Vrl.sieve(lit("a1b2 c3!d"), "[a-z]+", "-")) == "a-b-c-d")
  }

  test("base64 and parse_int round-trips") {
    assert(one(Vrl.decodeBase64(Vrl.encodeBase64(lit("hello, world")))) == "hello, world")
    assert(one(Vrl.parseInt(lit("ff"), 16)) == 255L)
    assert(one(Vrl.parseInt(lit("777"), 8)) == 511L)
  }

  test("parse_query_string") {
    assert(one(element_at(Vrl.parseQueryString(lit("?a=1&b=two")), "b")) == "two")
  }

  // ------------------------------------------------------------ Template

  test("template compiles fields and strftime") {
    val df = Seq(("click", 7, java.sql.Timestamp.valueOf("2026-03-05 10:20:30")))
      .toDF("event_type", "user_id", "ts")
    val out = df.select(Template.compile(
      "logs/{{ event_type }}/%Y-%m-%d/p-{{ user_id }}", col("ts"))).head.getString(0)
    assert(out == "logs/click/2026-03-05/p-7")
    assert(Template.fields("x{{ a }}y{{ b.c }}{{ a }}") == Seq("a", "b.c"))
  }

  test("template: %s/%b render; an unsupported specifier fails at compile, not silently") {
    val df = Seq(Tuple1(java.sql.Timestamp.valueOf("2026-03-05 10:20:30"))).toDF("ts")
    val out = df.select(Template.compile("t-%s-%b.log", col("ts"))).head.getString(0)
    assert(out.matches("t-\\d{9,}-Mar\\.log"), out)
    // %Q is not a supported specifier: plan-time error, never a literal
    // "%Q" leaking into partition keys
    intercept[IllegalArgumentException] {
      Template.compile("x-%Q", col("ts"))
    }
    // a bare % before a non-letter is still literal text
    val pct = df.select(Template.compile("50% done", col("ts"))).head.getString(0)
    assert(pct == "50% done")
    // chrono flag/padding forms (%-d, %_H, %03S) are valid in the
    // reference but unsupported here: plan-time error, never a literal
    // '%-d' sliding into partition keys
    intercept[IllegalArgumentException] {
      Template.compile("x-%Y-%-d", col("ts"))
    }
    intercept[IllegalArgumentException] {
      Template.compile("x-%03S", col("ts"))
    }
  }

  test("grok applySet: a field named like the source column doesn't corrupt later fields") {
    import graft.functions.Grok
    val df = Seq("1.2.3.4 hello the rest of it").toDF("message")
    val set = Grok.compileSet(Seq(
      "%{IP:client} %{WORD:message} %{GREEDYDATA:detail}"))
    val r = Grok.applySet(df, col("message"), set).head
    // the 'message' FIELD overwrites the source column mid-fold; 'detail'
    // (extracted after it) must still come from the ORIGINAL text
    assert(r.getAs[String]("client") == "1.2.3.4")
    assert(r.getAs[String]("message") == "hello")
    assert(r.getAs[String]("detail") == "the rest of it")
    assert(r.getAs[Int]("_matched") == 0)
  }

  // ------------------------------------------------------------ LineAgg

  private val stack = Seq(
    ("f", 1, "ERROR first"), ("f", 2, "  at a"), ("f", 3, "  at b"),
    ("f", 4, "INFO ok"), ("f", 5, "ERROR second"), ("f", 6, "  at c")
  ).toDF("key", "line_no", "line")

  test("line_agg continue_through merges stack traces") {
    val got = LineAgg.merge(stack, col("key"), col("line_no"), col("line"),
        "^\\s", LineAgg.ContinueThrough)
      .orderBy("grp").select("text").as[String].collect()
    assert(got === Array(
      "ERROR first\n  at a\n  at b", "INFO ok", "ERROR second\n  at c"))
  }

  test("line_agg continue_past joins on trailing backslash") {
    val lines = Seq(("f", 1, "cmd a \\"), ("f", 2, "cont b \\"),
      ("f", 3, "end c"), ("f", 4, "solo")).toDF("key", "line_no", "line")
    val got = LineAgg.merge(lines, col("key"), col("line_no"), col("line"),
        "\\\\$", LineAgg.ContinuePast)
      .orderBy("grp").select("text").as[String].collect()
    assert(got === Array("cmd a \\\ncont b \\\nend c", "solo"))
  }

  test("line_agg halt_before starts groups at matches") {
    val got = LineAgg.merge(stack, col("key"), col("line_no"), col("line"),
        "^(ERROR|INFO)", LineAgg.HaltBefore)
      .orderBy("grp").select("text").as[String].collect()
    assert(got === Array(
      "ERROR first\n  at a\n  at b", "INFO ok", "ERROR second\n  at c"))
  }

  test("line_agg halt_with ends groups at matches") {
    val lines = Seq(("f", 1, "a"), ("f", 2, "END"), ("f", 3, "b"),
      ("f", 4, "c"), ("f", 5, "END")).toDF("key", "line_no", "line")
    val got = LineAgg.merge(lines, col("key"), col("line_no"), col("line"),
        "^END$", LineAgg.HaltWith)
      .orderBy("grp").select("text").as[String].collect()
    assert(got === Array("a\nEND", "b\nc\nEND"))
  }

  test("line_agg mergeWithStart pins the reference's four mode fixtures exactly") {
    // src/line_agg.rs inline tests mode_{continue_through,continue_past,
    // halt_before,halt_with}_1 — same lines, same config, same expected
    // merged records (first_line_no, last_line_no pin the contexts)
    def run(lines: Seq[String], start: String, cond: String,
            mode: LineAgg.Mode): Seq[(String, Long, Long)] = {
      val ds = lines.zipWithIndex
        .map { case (l, i) => LineAgg.InLine("f", i.toLong, l) }.toDS()
      LineAgg.mergeWithStart(ds, start, cond, mode)
        .orderBy("first_line_no").collect()
        .map(r => (r.text, r.first_line_no, r.last_line_no)).toSeq
    }
    assert(run(Seq(
      "some usual line", "some other usual line", "first part",
      " second part", " last part", "another normal message",
      "finishing message", " last part of the incomplete finishing message"),
      "^[^\\s]", "^[\\s]+", LineAgg.ContinueThrough) == Seq(
      ("some usual line", 0L, 0L),
      ("some other usual line", 1L, 1L),
      ("first part\n second part\n last part", 2L, 4L),
      ("another normal message", 5L, 5L),
      ("finishing message\n last part of the incomplete finishing message", 6L, 7L)))
    assert(run(Seq(
      "some usual line", "some other usual line", "first part \\",
      "second part \\", "last part", "another normal message",
      "finishing message \\", "last part of the incomplete finishing message \\"),
      "\\\\$", "\\\\$", LineAgg.ContinuePast) == Seq(
      ("some usual line", 0L, 0L),
      ("some other usual line", 1L, 1L),
      ("first part \\\nsecond part \\\nlast part", 2L, 4L),
      ("another normal message", 5L, 5L),
      ("finishing message \\\nlast part of the incomplete finishing message \\", 6L, 7L)))
    assert(run(Seq(
      "INFO some usual line", "INFO some other usual line",
      "INFO first part", "second part", "last part",
      "ERROR another normal message", "ERROR finishing message",
      "last part of the incomplete finishing message"),
      "", "^(INFO|ERROR) ", LineAgg.HaltBefore) == Seq(
      ("INFO some usual line", 0L, 0L),
      ("INFO some other usual line", 1L, 1L),
      ("INFO first part\nsecond part\nlast part", 2L, 4L),
      ("ERROR another normal message", 5L, 5L),
      ("ERROR finishing message\nlast part of the incomplete finishing message", 6L, 7L)))
    assert(run(Seq(
      "some usual line;", "some other usual line;", "first part",
      "second part", "last part;", "another normal message;",
      "finishing message", "last part of the incomplete finishing message"),
      "[^;]$", ";$", LineAgg.HaltWith) == Seq(
      ("some usual line;", 0L, 0L),
      ("some other usual line;", 1L, 1L),
      ("first part\nsecond part\nlast part;", 2L, 4L),
      ("another normal message;", 5L, 5L),
      ("finishing message\nlast part of the incomplete finishing message", 6L, 7L)))
  }

  test("line_agg mergeWithStart: non-start lines pass through while no buffer is open") {
    // the start_pattern semantics the windowed merge can't express:
    // "second"/"third" match neither start nor (as openers) exist —
    // each passes through alone (line_agg.rs:353-366)
    val ds = Seq("INFO a", " in1", "plain b", " in2")
      .zipWithIndex.map { case (l, i) => LineAgg.InLine("f", i.toLong, l) }.toDS()
    val got = LineAgg.mergeWithStart(ds, "^INFO", "^\\s", LineAgg.ContinueThrough)
      .orderBy("first_line_no").collect().map(_.text).toSeq
    assert(got == Seq("INFO a\n in1", "plain b", " in2"))
  }

  test("line_agg keeps keys independent and counts lines") {
    val lines = Seq(("a", 1, "X h"), ("b", 1, "  cont"), ("a", 2, "  t")).toDF("key", "line_no", "line")
    val got = LineAgg.merge(lines, col("key"), col("line_no"), col("line"),
        "^\\s", LineAgg.ContinueThrough)
      .orderBy("key").collect()
    assert(got.map(_.getString(0)) === Array("a", "b"))
    assert(got.map(_.getLong(3)) === Array(2L, 1L)) // n_lines
  }

  // ------------------------------------------------------------ SearchSyntax

  private val docs = Seq(
    (1L, "nginx error timeout", "error", 120.0, "web"),
    (2L, "ok fast", "info", 10.0, "web"),
    (3L, "apache error", "error", 80.0, "infra"),
    (4L, "slow warn", "warn", 250.0, "db")
  ).toDF("id", "message", "level", "latency", "team")

  private def search(q: String): Set[Long] =
    docs.filter(SearchSyntax.compile(q, col("message")))
      .select("id").as[Long].collect().toSet

  test("search: bare term, field, implicit AND") {
    assert(search("error") == Set(1L, 3L))
    assert(search("level:error") == Set(1L, 3L))
    assert(search("level:error team:web") == Set(1L))
  }

  test("search: OR, NOT, parens, quoted phrase") {
    assert(search("level:warn OR team:infra") == Set(3L, 4L))
    assert(search("level:error -team:infra") == Set(1L))
    assert(search("NOT (level:error OR level:warn)") == Set(2L))
    assert(search("\"ok fast\"") == Set(2L))
  }

  test("search: NOT matches events missing the facet; numeric compares tolerate garbage (ANSI)") {
    val mixed = Seq(
      (1L, "a", Some("error"), "120"),
      (2L, "b", None, "abc"),
      (3L, "c", Some("info"), "80")
    ).toDF("id", "message", "level", "latency")
    def s(q: String): Set[Long] =
      mixed.filter(SearchSyntax.compile(q, col("message")))
        .select("id").as[Long].collect().toSet
    // Datadog semantics: `-level:error` includes events with no level
    assert(s("-level:error") == Set(2L, 3L))
    assert(s("NOT level:error") == Set(2L, 3L))
    // a non-numeric value in a numeric compare: not a match, not a job abort
    assert(s("latency:>100") == Set(1L))
    assert(s("latency:[100 TO 200]") == Set(1L))
  }

  test("search: wildcards, comparisons, ranges") {
    assert(search("team:w*") == Set(1L, 2L))
    assert(search("latency:>100") == Set(1L, 4L))
    assert(search("latency:<=80") == Set(2L, 3L))
    assert(search("latency:[80 TO 150]") == Set(1L, 3L))
    assert(search("latency:[200 TO *]") == Set(4L))
  }

  test("compression codecs round-trip and compress repetitive payloads") {
    val payload = ("log line with repetition " * 40).trim
    val df = Seq(payload).toDF("s").select(col("s").cast("binary").as("b"))
    def len(c: org.apache.spark.sql.Column) = octet_length(c).cast("long")
    val row = df.select(
      decode(Vrl.decodeGzip(Vrl.encodeGzip(col("b"))), "UTF-8").as("gz"),
      decode(Vrl.decodeZlib(Vrl.encodeZlib(col("b"))), "UTF-8").as("zl"),
      decode(Vrl.decodeZstd(Vrl.encodeZstd(col("b"))), "UTF-8").as("zs"),
      len(Vrl.encodeGzip(col("b"))).as("gzn"),
      len(Vrl.encodeZlib(col("b"))).as("zln"),
      len(Vrl.encodeZstd(col("b"))).as("zsn"),
      len(col("b")).as("n")).head
    assert(row.getString(0) == payload)
    assert(row.getString(1) == payload)
    assert(row.getString(2) == payload)
    // repetitive input must actually shrink
    assert(row.getLong(3) < row.getLong(6))
    assert(row.getLong(4) < row.getLong(6))
    assert(row.getLong(5) < row.getLong(6))
  }

  test("compression codecs are deterministic (stable bytes across calls)") {
    val df = Seq("abc123").toDF("s").select(col("s").cast("binary").as("b"))
    def hex(c: org.apache.spark.sql.Column) = org.apache.spark.sql.functions.hex(c)
    val r1 = df.select(hex(Vrl.encodeGzip(col("b"))), hex(Vrl.encodeZstd(col("b")))).head
    val r2 = df.select(hex(Vrl.encodeGzip(col("b"))), hex(Vrl.encodeZstd(col("b")))).head
    assert(r1 == r2)
  }

  test("encrypt/decrypt round-trip (AES-GCM, fixed IV is deterministic)") {
    val key = lit("0123456789abcdef") // AES-128
    val iv = unhex(lit("000102030405060708090a0b")) // 12-byte GCM IV
    val df = Seq("secret payload").toDF("s")
    val enc = Vrl.encrypt(col("s").cast("binary"), key, iv)
    val row = df.select(
      decode(Vrl.decrypt(enc, key), "UTF-8").as("rt"),
      hex(enc).as("h1")).head
    assert(row.getString(0) == "secret payload")
    val row2 = df.select(hex(Vrl.encrypt(col("s").cast("binary"), key, iv))).head
    assert(row.getString(1) == row2.getString(0))
  }
}
