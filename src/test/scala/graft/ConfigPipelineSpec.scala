package graft

import org.apache.spark.sql.functions._

import graft.config._
import graft.config.VrlCompile.{EventMeta, VInt, VStr}

import scala.collection.immutable.ListMap

/** Config front-end: TOML topology + VRL-subset programs driving the
  * behavior-test corpus from the CONFIG FILES (not hand-ported Scala) —
  * the `vector test` contract (src/config/unit_test/mod.rs) over Spark.
  */
class ConfigPipelineSpec extends SparkSpec {

  private val corpusDir = "src/test/resources/behavior"
  private val corpus =
    Seq("remap.toml", "route.toml", "filter.toml", "dedupe.toml", "reduce.toml",
      "log_to_metric.toml", "sample.toml", "throttle.toml", "metric_input.toml")

  for (file <- corpus) test(s"behavior corpus: $file") {
    val results = UnitTestHarness.runFile(spark, s"$corpusDir/$file")
    assert(results.nonEmpty, s"$file declares no [[tests]]")
    val bad = results.filterNot(_.passed)
    assert(bad.isEmpty, bad.map { r =>
      val why = (r.errors ++ r.skipped.map("unsupported: " + _)).mkString("; ")
      s"${r.name}: $why"
    }.mkString("\n"))
  }

  test("toml parser: headers, arrays of tables, inline tables, strings") {
    val t = Toml.parse(
      """
        |top = "v"
        |n = 42
        |f = 2.5
        |flag = true
        |arr = [1, 2, 3]
        |ml = """.stripMargin + "\"\"\"line1\nline2\"\"\"" +
      """
        |[a.b]
        |  key = 'literal "quoted"'
        |  inline = { x = 1, y = "z" }
        |[[items]]
        |  name = "first"
        |[[items]]
        |  name = "second"
        |  [items.sub]
        |    deep = "yes"
        |""".stripMargin)
    assert(t.str("top").contains("v"))
    assert(t.long("n").contains(42L))
    assert(t.arr("arr").length == 3)
    assert(t.tab("a").flatMap(_.tab("b")).flatMap(_.str("key")).contains("literal \"quoted\""))
    assert(t.tab("a").flatMap(_.tab("b")).flatMap(_.tab("inline")).flatMap(_.long("x")).contains(1L))
    val items = t.tabs("items")
    assert(items.map(_.str("name").get) == Vector("first", "second"))
    assert(items(1).tab("sub").flatMap(_.str("deep")).contains("yes"))
    assert(t.str("ml").contains("line1\nline2"))
  }

  test("sample transform from config: ratio mode + exactly-one-of rate/ratio (sample/config.rs:31-35)") {
    val topo = Topology.load(
      """
        |[transforms.keep_some]
        |  inputs = ["src"]
        |  type = "sample"
        |  ratio = 0.5
        |""".stripMargin)
    val df = spark.range(20).select(
      col("id").as(Topology.SeqCol), col("id").as("n"))
    val in = Frame(df, EventMeta(ListMap("n" -> VInt), None))
    val out = topo.run(Map("src" -> in))("keep_some").df
    val kept = out.select("n").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 2L, 4L, 6L, 8L, 10L, 12L, 14L, 16L, 18L)) // every 2nd, first kept
    assert(out.columns.contains("sample_rate"))
    assert(out.select("sample_rate").head.getDouble(0) == 0.5)

    val err = intercept[IllegalArgumentException] {
      Topology.load(
        """
          |[transforms.bad]
          |  inputs = ["src"]
          |  type = "sample"
          |  rate = 10
          |  ratio = 0.5
          |""".stripMargin).run(Map("src" -> in))
    }
    assert(err.getMessage.contains("not both"))
  }

  // ------------------------------------------------ fifth review pass

  test("modulo by zero raises per row, never an ANSI job abort") {
    import spark.implicits._
    val df = Seq((7L, 2L, 1L), (7L, 0L, 2L)).toDF("a", "b", Topology.SeqCol)
    val r = VrlCompile.remap(df, VrlCompile.EventMeta.fromSchema(df.schema),
      VrlAst.parse(".r, .err = .a % .b\n"))
    val rows = r.df.orderBy(Topology.SeqCol).collect()
    assert(rows(0).getLong(rows(0).fieldIndex("r")) == 1L)
    assert(rows(0).isNullAt(rows(0).fieldIndex("err")))
    // VRL capture convention: on error the target gets the type's zero
    // value and err carries the message (the job must NOT abort)
    assert(rows(1).getLong(rows(1).fieldIndex("r")) == 0L)
    assert(rows(1).getString(rows(1).fieldIndex("err")).contains("modulo"))
  }

  test("harness isolates a broken test: bad VRL fails that test, the rest run") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = ".y = 1"
        |[[tests]]
        |  name = "broken"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      x = 1
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = ".y =="
        |[[tests]]
        |  name = "good"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      x = 1
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = "assert_eq!(.y, 1)"
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.length == 2)
    assert(!rs(0).passed && rs(0).errors.nonEmpty) // broken reports, doesn't crash the harness
    assert(rs(1).passed, (rs(1).errors ++ rs(1).skipped).mkString("; "))
  }

  test("parse_common_log: CLF '-' size placeholder parses with size null") {
    import spark.implicits._
    val df = Seq(
      ("""127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0" 304 -""", 1L),
      ("""127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0" 200 2326""", 2L))
      .toDF("line", Topology.SeqCol)
    val r = VrlCompile.remap(df, VrlCompile.EventMeta.fromSchema(df.schema),
      VrlAst.parse(".p = parse_common_log!(.line)\n"))
    val rows = r.df.orderBy(Topology.SeqCol).select("p.host", "p.status", "p.size").collect()
    assert(rows(0).getString(0) == "127.0.0.1")
    assert(rows(0).getLong(1) == 304L)
    assert(rows(0).isNullAt(2)) // '-' reads as omitted size
    assert(rows(1).getLong(2) == 2326L)
  }

  test("dedupe with no [fields] table defaults to message/host/timestamp (dedupe/common.rs:106-118)") {
    val rs = UnitTestHarness.run(spark, Topology.load(
      """
        |[transforms.d]
        |  inputs = []
        |  type = "dedupe"
        |[[tests]]
        |  name = "default_triple"
        |  [[tests.inputs]]
        |    insert_at = "d"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      message = "m"
        |      host = "h"
        |      timestamp = "2024-01-01T00:00:00Z"
        |      request_id = "r1"
        |  [[tests.inputs]]
        |    insert_at = "d"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      message = "m"
        |      host = "h"
        |      timestamp = "2024-01-01T00:00:00Z"
        |      request_id = "r2"
        |  [[tests.outputs]]
        |    extract_from = "d"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = 'assert_eq!(.request_id, "r1")'
        |""".stripMargin))
    assert(rs.head.passed && rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
  }

  test("dedupe with an explicit [cache] refuses loudly instead of degrading to the fixpoint") {
    // the LRU replay needs a unique arrival order; config frames' __seq
    // is a content hash (identical duplicates share it), so honoring
    // [cache] num_events here would silently be wrong — refuse instead
    // (the harness surfaces the VrlUnsupported as a loud skip, not a pass)
    val rs = UnitTestHarness.run(spark, Topology.load(
        """
          |[transforms.d]
          |  inputs = []
          |  type = "dedupe"
          |  [transforms.d.cache]
          |    num_events = 100
          |[[tests]]
          |  name = "lru"
          |  [[tests.inputs]]
          |    insert_at = "d"
          |    type = "log"
          |    [tests.inputs.log_fields]
          |      message = "m"
          |  [[tests.outputs]]
          |    extract_from = "d"
          |    [[tests.outputs.conditions]]
          |      type = "vrl"
          |      source = 'assert_eq!(.message, "m")'
          |""".stripMargin))
    assert(rs.head.skipped.exists(_.contains("keepFirstLru")), rs.head.toString)
  }

  test("merge deep: true recurses into object-valued keys (merge.cue deep arg)") {
    import spark.implicits._
    val df = Seq(Tuple1(1L)).toDF(Topology.SeqCol)
    val r = VrlCompile.remap(df, VrlCompile.EventMeta.fromSchema(df.schema),
      VrlAst.parse(
        """.deep = merge({"a": {"x": 1, "y": 2}, "k": 1}, {"a": {"y": 3}}, deep: true)
          |.shallow = merge({"a": {"x": 1, "y": 2}, "k": 1}, {"a": {"y": 3}})
          |""".stripMargin))
    val row = r.df.select("deep.a.x", "deep.a.y", "deep.k", "shallow.a.y").head
    assert(row.getLong(0) == 1L)  // left-only nested key survives
    assert(row.getLong(1) == 3L)  // right wins on conflict
    assert(row.getLong(2) == 1L)
    assert(row.getLong(3) == 3L)
    // shallow replaced .a wholesale: x is gone from the struct
    assert(!r.df.select("shallow.a.*").columns.contains("x"))
  }

  test("|= merge-assign desugars to merge(target, rhs)") {
    import spark.implicits._
    val df = Seq((1L, "m")).toDF(Topology.SeqCol, "msg")
    val r = VrlCompile.remap(df, VrlCompile.EventMeta.fromSchema(df.schema),
      VrlAst.parse(
        """.obj = {"a": 1, "b": 2}
          |.obj |= {"b": 9, "c": 3}
          |. |= {"extra": "x"}
          |tmp = {"t": 1}
          |tmp |= {"u": 2}
          |.u = tmp.u
          |""".stripMargin))
    val row = r.df.select("obj.a", "obj.b", "obj.c", "extra", "u", "msg").head
    assert(row.getLong(0) == 1L)
    assert(row.getLong(1) == 9L) // right side wins
    assert(row.getLong(2) == 3L)
    assert(row.getString(3) == "x") // whole-event merge adds the column
    assert(row.getLong(4) == 2L) // local-variable merge-assign
    assert(row.getString(5) == "m") // untouched columns survive
  }

  test("invalid string escape is a program error, not silent corruption") {
    val err = intercept[VrlAst.VrlParseError] { VrlAst.parse(""".x = "C:\dir"""") }
    assert(err.getMessage.contains("\\d"))
    // the supported set still round-trips
    VrlAst.parse(""".x = "a\nb\tc\0d\\e\"f"""")
  }

  test("ip_cidr_contains (config kernel): malformed mask degrades per row") {
    import spark.implicits._
    val df = Seq(("10.0.0.0/xy", "10.1.2.3", 1L), ("10.0.0.0/8", "10.1.2.3", 2L),
        ("10.0.0.0/999999999999", "10.1.2.3", 3L))
      .toDF("cidr", "ip", Topology.SeqCol)
    val r = VrlCompile.remap(df, VrlCompile.EventMeta.fromSchema(df.schema),
      VrlAst.parse(".c, .err = ip_cidr_contains(.cidr, .ip)\n"))
    val rows = r.df.orderBy(Topology.SeqCol).collect()
    // error rows: captured zero value (false) + err set; the valid row
    // is a real true — and no row kills the task with a
    // NumberFormatException from the mask parse
    assert(!rows(0).getBoolean(rows(0).fieldIndex("c")))
    assert(!rows(0).isNullAt(rows(0).fieldIndex("err")))
    assert(rows(1).getBoolean(rows(1).fieldIndex("c")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("err")))
    assert(!rows(2).getBoolean(rows(2).fieldIndex("c")))
    assert(!rows(2).isNullAt(rows(2).fieldIndex("err")))
  }

  test("topology DAG wires transform chains and skips unknown sources") {
    val topo = Topology.load(
      """
        |[transforms.only_big]
        |  inputs = ["external_source"]
        |  type = "filter"
        |  condition = ".n >= 10"
        |[transforms.double]
        |  inputs = ["only_big"]
        |  type = "remap"
        |  source = ".n = .n * 2"
        |""".stripMargin)
    val df = spark.range(4).select(
      col("id").as(Topology.SeqCol), (col("id") * 7).as("n"))
    val in = Frame(df, EventMeta(ListMap("n" -> VInt), None))
    val out = topo.run(Map("external_source" -> in))
    val ns = out("double").df.select("n").collect().map(_.getLong(0)).sorted
    assert(ns.toSeq == Seq(28L, 42L)) // 14,21 pass the filter, then double
  }

  test("vrl condition: error in one branch does not poison the other") {
    val df = spark.range(1).select(
      lit(0L).as(Topology.SeqCol), lit("error").as("level"))
    val in = Frame(df, EventMeta(ListMap("level" -> VStr), None))
    val c = Conditions.vrl(
      """
        |lvl = if exists(.tags) { string!(.tags.level) } else { string!(.level) }
        |lvl == "error"
        |""".stripMargin, in)
    assert(in.df.filter(c).count() == 1)
  }

  test("flagship.toml grok pattern stays in sync with Pipeline.logLineGrok") {
    val toml = graft.queries.ConfigQueries.resourceText(
      graft.queries.ConfigQueries.FlagshipResource)
    // the oracle reuses Pipeline's compiled regex, so the config file's
    // pattern must be the same string
    assert(toml.contains(graft.plans.Pipeline.logLineGrok.replace("\"", "\\\"")),
      "flagship.toml parse_grok pattern drifted from Pipeline.logLineGrok")
  }

  test("round-3 stdlib wires are callable from config-source VRL programs") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .mib = parse_bytes!(.sz, unit: "B")
        |    .etld = parse_etld!(.host, plus_parts: 1)
        |    .clean = strip_ansi_escape_codes(.txt)
        |    .ent = shannon_entropy(.txt)
        |    .hash = seahash(.txt)
        |    .hex = encode_base16(.txt)
        |    .pct = decode_percent(.enc)
        |    .mac = hmac(.txt, "super-secret-key")
        |    .lvl = to_syslog_level!(5)
        |    .fh = format_int!(255, 16)
        |    .cid = community_id!(source_ip: .sip, destination_ip: .dip, source_port: 1122, destination_port: 3344, protocol: 6)
        |    .cid2 = community_id!(.sip, .dip, 6, 1122, 3344)
        |  '''
        |[[tests]]
        |  name = "stdlib_round3"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      sz = "2MiB"
        |      host = "sub.sussex.ac.uk"
        |      txt = "foobar"
        |      enc = "foo%20bar%3F"
        |      sip = "1.2.3.4"
        |      dip = "5.6.7.8"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert_eq!(.mib, 2097152.0)
        |        assert_eq!(.etld, "{\"etld\":\"ac.uk\",\"etld_plus\":\"sussex.ac.uk\",\"known_suffix\":true}")
        |        assert_eq!(.clean, "foobar")
        |        assert_eq!(.hash, 5348458858952426560)
        |        assert_eq!(.hex, "666f6f626172")
        |        assert_eq!(.pct, "foo bar?")
        |        assert_eq!(.lvl, "notice")
        |        assert_eq!(.fh, "ff")
        |        assert_eq!(.cid, "1:wCb3OG7yAFWelaUydu0D+125CLM=")
        |        assert_eq!(.cid2, "1:wCb3OG7yAFWelaUydu0D+125CLM=")
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.length == 1)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("scalar stdlib wires: case/path/number/codec/crypto/type-check fns from config") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .snake = snakecase("fooBarBaz")
        |    .pascal = pascalcase("foo_bar")
        |    .kebab = kebabcase("fooBar")
        |    .scream = screamingsnakecase("fooBar")
        |    .camel = camelcase("foo_bar_baz")
        |    .n = strlen!(.txt)
        |    .sieved = sieve(.host, r'[a-z0-9.]')
        |    .base = basename(.path)
        |    .dir = dirname(.path)
        |    .m = mod(5, 2)
        |    .crc = crc(.txt)
        |    .gz = decode_gzip!(encode_gzip(.txt))
        |    .ct = decrypt!(encrypt(.txt, "AES-128-CBC", .key, iv: .iv), "AES-128-CBC", .key)
        |    .ipn = ip_aton!(.ip)
        |    .ips = ip_ntoa!(.ipn)
        |    .ri = random_int(0, 10, seed: .txt)
        |    .s_ok = is_string(.txt)
        |    .i_ok = is_integer(.num)
        |    .e_ok = is_empty("")
        |    .ip4 = is_ipv4(.ip)
        |    .tagged = tag_types_externally(.num)
        |    .pi = parse_int!("0x2a")
        |    .pib = parse_int!("0b1001")
        |    .pf = parse_float!("-1.5")
        |    .g = get!({"foo": {"bar": "baz"}}, ["foo", "bar"])
        |    .s2 = set!(value: {"foo": "bar"}, path: ["foo"], data: "baz")
        |    .r2 = remove!({"foo": "bar", "qux": 1}, ["foo"])
        |  '''
        |[[tests]]
        |  name = "stdlib_scalar"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      txt = "foobar"
        |      num = 7
        |      host = "test123%456.net."
        |      path = "/var/log/app/x.log"
        |      key = "sixteen-byte-key"
        |      iv = "0000000000000000"
        |      ip = "1.2.3.4"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert_eq!(.snake, "foo_bar_baz")
        |        assert_eq!(.pascal, "FooBar")
        |        assert_eq!(.kebab, "foo-bar")
        |        assert_eq!(.scream, "FOO_BAR")
        |        assert_eq!(.camel, "fooBarBaz")
        |        assert_eq!(.n, 6)
        |        assert_eq!(.sieved, "test123456.net.")
        |        assert_eq!(.base, "x.log")
        |        assert_eq!(.dir, "/var/log/app")
        |        assert_eq!(.m, 1)
        |        assert_eq!(.crc, "2666930069")
        |        assert_eq!(.gz, "foobar")
        |        assert_eq!(.ct, "foobar")
        |        assert_eq!(.ipn, 16909060)
        |        assert_eq!(.ips, "1.2.3.4")
        |        assert!(.ri >= 0 && .ri < 10)
        |        assert!(.s_ok && .i_ok && .e_ok && .ip4)
        |        assert_eq!(.tagged, {"integer": 7})
        |        assert_eq!(.pi, 42)
        |        assert_eq!(.pib, 9)
        |        assert_eq!(.pf, -1.5)
        |        assert_eq!(.g, "baz")
        |        assert_eq!(.s2.foo, "baz")
        |        assert_eq!(.r2.qux, 1)
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.length == 1)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("collection + parser stdlib wires from config") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .csv = parse_csv!(.csvline)
        |    .lf = parse_logfmt!("lvl=info msg=hello")
        |    .qs = parse_query_string!("foo=bar&baz=qux")
        |    .cef = parse_cef!(.cefline)
        |    .ifx = parse_influxdb!(.influx)
        |    .ap = parse_apache_log!(.apache, format: "common")
        |    .kl = parse_klog!(.klog)
        |    .gk = parse_groks!(.txt, patterns: ["%{INT:num}", "%{WORD:w}"])
        |    .vpc = parse_aws_vpc_flow_log!(.flow, format: "srcaddr dstaddr")
        |    .uniq = unique(["a", "b", "a", "c"])
        |    .inc = includes(["a", "b"], "b")
        |    .ca = contains_all("The Needle In The Haystack", ["Needle", "Haystack"])
        |    .ma = match_any("I'm a little teapot", [r'frying pan', r'teapot'])
        |    .mr = match_array(["foobar", "bazqux"], r'foo')
        |    .mall = match_array(["foo", "foobar", "barfoo"], r'foo', all: true)
        |    .ks = keys({"key1": "val1", "key2": "val2"})
        |    .vs = values({"key1": "val1", "key2": "val2"})
        |    .z = zip([1, 2, 3], [4, 5, 6, 7])
        |    .ofa = object_from_array([["one", "1"], ["two", "3"]])
        |    .popped = pop(["a", "b", "c"])
        |    .flat = flatten([[1, 2], [3, 4]])
        |    .elf = encode_logfmt!({"msg": "hello world", "lvl": "info"})
        |    .dd = match_datadog_query({"message": "timeout error", "status": "500"}, "status:500 timeout")
        |  '''
        |[[tests]]
        |  name = "stdlib_collections"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      txt = "hello"
        |      csvline = "foo,bar,\"foo \"\", bar\""
        |      cefline = "Sep 29 08:26:10 host CEF:1|Security|threatmanager|1.0|100|worm stopped|10|src=10.0.0.1 dst=2.1.2.2 spt=1232"
        |      influx = "cpu,host=a usage=0.5 1556813561098000000"
        |      apache = "127.0.0.1 bob frank [10/Oct/2000:13:55:36 -0700] \"GET /apache_pb.gif HTTP/1.0\" 200 2326"
        |      klog = "I0817 02:34:56.789012 408 reactor.cc:123] event handled"
        |      flow = "10.0.0.1 10.0.0.2"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert_eq!(.csv, ["foo", "bar", "foo \", bar"])
        |        assert_eq!(.lf.lvl, "info")
        |        assert_eq!(.qs.baz, "qux")
        |        assert_eq!(.cef.cefVersion, "1")
        |        assert_eq!(.cef.deviceVendor, "Security")
        |        assert_eq!(.cef.src, "10.0.0.1")
        |        assert_eq!(.ifx[0].name, "cpu_usage")
        |        assert_eq!(.ifx[0].tags.host, "a")
        |        assert_eq!(.ifx[0].kind, "absolute")
        |        assert_eq!(.ifx[0].gauge.value, 0.5)
        |        assert_eq!(.ifx[0].timestamp, "2019-05-02T16:12:41.098000Z")
        |        assert_eq!(.ap.host, "127.0.0.1")
        |        assert_eq!(.ap.status, "200")
        |        assert_eq!(.kl.message, "event handled")
        |        assert_eq!(.kl.level, "info")
        |        assert_eq!(.gk.w, "hello")
        |        assert_eq!(.vpc.srcaddr, "10.0.0.1")
        |        assert_eq!(.uniq, ["a", "b", "c"])
        |        assert!(.inc && .ca && .ma && .mr && .mall)
        |        assert_eq!(.ks, ["key1", "key2"])
        |        assert_eq!(.vs, ["val1", "val2"])
        |        assert_eq!(.z, [[1, 4], [2, 5], [3, 6]])
        |        assert_eq!(.ofa.two, "3")
        |        assert_eq!(.popped, ["a", "b"])
        |        assert_eq!(.flat, [1, 2, 3, 4])
        |        assert_eq!(.elf, "lvl=info msg=\"hello world\"")
        |        assert!(.dd)
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.length == 1)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("if-branch effects are row-conditional: del scrubs, error capture binds, metadata merges") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    if (.level == "debug") {
        |        del(.password)
        |    }
        |    v, err = if (.level == "debug") { to_int(.n) } else { 0 }
        |    .v = v
        |    .has_err = err != null
        |    if (.level == "debug") { % = "yes" }
        |    .scrubbed = %
        |  '''
        |[[tests]]
        |  name = "dbg_row"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      level = "debug"
        |      password = "hunter2"
        |      n = "not-a-number"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert!(!exists(.password) || .password == null)
        |        assert_eq!(.has_err, true)
        |        assert_eq!(.scrubbed, "yes")
        |      '''
        |[[tests]]
        |  name = "info_row"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      level = "info"
        |      password = "hunter2"
        |      n = "7"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert_eq!(.password, "hunter2")
        |        assert_eq!(.v, 0)
        |        assert_eq!(.has_err, false)
        |        assert_eq!(.scrubbed, null)
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.length == 2)
    rs.foreach { r =>
      assert(r.errors.isEmpty && r.skipped.isEmpty,
        s"${r.name}: " + (r.errors ++ r.skipped).mkString("; "))
      assert(r.passed, r.name)
    }
  }

  test("replace named groups with underscores, map_keys collisions, closure param scoping") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .r = replace("level=error up", r'level=(?P<status_code>\w+)', "[$$status_code]")
        |    .mk = map_keys(parse_json!(s'{"A":1,"a":2}')) -> |key| { downcase(key) }
        |    value = "outer"
        |    for_each(["x", "y"]) -> |_index, value| {
        |        noop = value
        |    }
        |    .keep = value
        |  '''
        |[[tests]]
        |  name = "fixes"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      ignored = "x"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert_eq!(.r, "[error] up")
        |        assert_eq!(.mk.a, 2)
        |        assert_eq!(.keep, "outer")
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("for_each over a RUNTIME array folds: index param, multiple locals, tally pattern") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    total = 0
        |    idxsum = 0
        |    for_each([10, 20, 30]) -> |i, v| {
        |        total = total + v
        |        idxsum = idxsum + i
        |    }
        |    .total = total
        |    .idxsum = idxsum
        |    joined = ""
        |    for_each(split!(.csv, ",")) -> |_i, part| {
        |        joined = joined + part + "."
        |    }
        |    .joined = joined
        |    tally = {}
        |    for_each(split!(.csv, ",")) -> |_i, value| {
        |        count = int(get!(tally, [value])) ?? 0
        |        tally = set!(tally, [value], count + 1)
        |    }
        |    .tally = tally
        |  '''
        |[[tests]]
        |  name = "fold"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      csv = "a,b,a,c,b,a"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert_eq!(.total, 60)
        |        assert_eq!(.idxsum, 3)
        |        assert_eq!(.joined, "a.b.a.c.b.a.")
        |        assert_eq!(.tally.a, 3)
        |        assert_eq!(.tally.b, 2)
        |        assert_eq!(.tally.c, 1)
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("enumeration closures: filter/map_keys/map_values/for_each (cue examples)") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .kept = filter(["foo", "bar", "baz"]) -> |_index, value| { value != "foo" }
        |    .tags = map_keys(parse_key_value!("env=prod app=api")) -> |key| { upcase(key) }
        |    .vals = map_values(.tags) -> |value| { upcase(value) }
        |    .nums = map_values([1, 2, 3]) -> |value| { value * 2 }
        |    count = 0
        |    for_each({"a": 1, "b": 2, "c": 3}) -> |_key, value| { count = count + value }
        |    .count = count
        |    .names = ""
        |    for_each({"x": "u", "y": "v"}) -> |key, _value| { .names = .names + key }
        |    .dyn = filter(parse_json!(.arr)) -> |_index, value| { to_int!(value) > 1 }
        |    .evens = filter([5, 10, 15, 20]) -> |index, _value| { mod(index, 2) == 0 }
        |  '''
        |[[tests]]
        |  name = "closures"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      arr = "[1, 2, 3]"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert_eq!(.kept, ["bar", "baz"])
        |        assert_eq!(.tags.ENV, "prod")
        |        assert_eq!(.vals.ENV, "PROD")
        |        assert_eq!(.nums, [2, 4, 6])
        |        assert_eq!(.count, 6)
        |        assert_eq!(.names, "xy")
        |        assert_eq!(length(.dyn), 2)
        |        assert_eq!(.evens, [5, 15])
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.length == 1)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("enrichment tables from config: get/find_enrichment_table_records") {
    val dir = java.nio.file.Files.createTempDirectory("enrich").toFile
    dir.deleteOnExit()
    val csv = new java.io.File(dir, "users.csv")
    val w = new java.io.PrintWriter(csv)
    w.println("firstname,surname,id")
    w.println("Bob,Smith,1")
    w.println("Fred,Smith,2")
    w.println("Ann,\"Jones, Jr\",3")
    w.close()
    val topo = Topology.load(
      s"""
        |[enrichment_tables.users]
        |  type = "file"
        |  [enrichment_tables.users.file]
        |    path = "${csv.getAbsolutePath}"
        |    [enrichment_tables.users.file.encoding]
        |      type = "csv"
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .rec = get_enrichment_table_record!("users", {"firstname": .fn}, case_sensitive: false)
        |    .all = find_enrichment_table_records!("users", {"surname": "Smith"})
        |    .quoted = get_enrichment_table_record!("users", {"firstname": "Ann"})
        |    .miss, .err = get_enrichment_table_record("users", {"firstname": "Zed"})
        |  '''
        |[[tests]]
        |  name = "enrich_lookup"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      fn = "bob"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert_eq!(.rec.surname, "Smith")
        |        assert_eq!(.rec.id, "1")
        |        assert_eq!(length(.all), 2)
        |        assert_eq!(.all[0].firstname, "Bob")
        |        assert_eq!(.quoted.surname, "Jones, Jr")
        |        assert!(.err != null)
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.length == 1)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("enrichment wildcard + select (find_enrichment_table_records.cue Wildcard match)") {
    val dir = java.nio.file.Files.createTempDirectory("enrichwc").toFile
    dir.deleteOnExit()
    val csv = new java.io.File(dir, "test.csv")
    val w = new java.io.PrintWriter(csv)
    w.println("id,firstname,surname")
    w.println("1,Bob,Smith")
    w.println("2,Fred,Smith")
    w.close()
    val topo = Topology.load(
      s"""
        |[enrichment_tables.test]
        |  type = "file"
        |  [enrichment_tables.test.file]
        |    path = "${csv.getAbsolutePath}"
        |    [enrichment_tables.test.file.encoding]
        |      type = "csv"
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .wc = find_enrichment_table_records!("test", {"firstname": .fn}, wildcard: "fred", case_sensitive: false)
        |    .one = get_enrichment_table_record!("test", {"firstname": "Fred"}, wildcard: "zed")
        |    .multi, .err = get_enrichment_table_record("test", {"firstname": "Bob"}, wildcard: "fred", case_sensitive: false)
        |    .sel = get_enrichment_table_record!("test", {"firstname": "Bob"}, ["surname"])
        |  '''
        |[[tests]]
        |  name = "wildcard_lookup"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      fn = "Bob"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert_eq!(length(.wc), 2)
        |        assert_eq!(.wc[0].firstname, "Bob")
        |        assert_eq!(.wc[1].firstname, "Fred")
        |        assert_eq!(.one.id, "2")
        |        assert!(.err != null)
        |        assert_eq!(.sel, {"surname": "Smith"})
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.length == 1)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("enrichment date-range conditions: BetweenDates / FromDate / ToDate") {
    val dir = java.nio.file.Files.createTempDirectory("enrichdt").toFile
    dir.deleteOnExit()
    val csv = new java.io.File(dir, "rates.csv")
    val w = new java.io.PrintWriter(csv)
    w.println("plan,valid,rate")
    w.println("basic,2020-03-01T00:00:00Z,10")
    w.println("basic,2020-06-01T00:00:00Z,20")
    w.println("pro,2020-03-01T00:00:00Z,99")
    w.close()
    val topo = Topology.load(
      s"""
        |[enrichment_tables.rates]
        |  type = "file"
        |  [enrichment_tables.rates.file]
        |    path = "${csv.getAbsolutePath}"
        |    [enrichment_tables.rates.file.encoding]
        |      type = "csv"
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .between = get_enrichment_table_record!("rates", {"plan": .plan, "valid": {"from": t'2020-02-01T00:00:00Z', "to": t'2020-04-01T00:00:00Z'}})
        |    .from_only = find_enrichment_table_records!("rates", {"plan": .plan, "valid": {"from": t'2020-05-01T00:00:00Z'}})
        |    .to_only = find_enrichment_table_records!("rates", {"plan": .plan, "valid": {"to": t'2020-12-31T00:00:00Z'}})
        |    .inclusive = get_enrichment_table_record!("rates", {"plan": "pro", "valid": {"from": t'2020-03-01T00:00:00Z', "to": t'2020-03-01T00:00:00Z'}})
        |    .nomatch, .err = get_enrichment_table_record("rates", {"plan": .plan, "valid": {"from": t'2021-01-01T00:00:00Z'}})
        |  '''
        |[[tests]]
        |  name = "date_range_lookup"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      plan = "basic"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert_eq!(.between.rate, "10")
        |        assert_eq!(length(.from_only), 1)
        |        assert_eq!(.from_only[0].rate, "20")
        |        assert_eq!(length(.to_only), 2)
        |        assert_eq!(.inclusive.rate, "99")
        |        assert!(.err != null)
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.length == 1)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("unnest fan-out, find, parse_regex_all, ip_pton/ip_ntop") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .f0 = find(.txt, "foo")
        |    .f3 = find(.txt, r'b.r')
        |    .fm = find(.txt, "baz")
        |    .fo = find("foobarfoobarfoo", "bar", 4)
        |    .pr = parse_regex_all!("apples and carrots, peaches and peas", r'(?P<fruit>[a-z]+) and (?P<veg>[a-z]+)')
        |    .p4 = ip_pton!("192.168.0.1")
        |    .r4 = ip_ntop!(.p4)
        |    .r6 = ip_ntop!(ip_pton!("2001:db8::1"))
        |    .xml = parse_xml!(.doc, text_key: "value", parse_number: false)
        |    .cap = replace_with("apples and bananas", r'\b(\w)(\w*)') -> |match| { upcase!(match.captures[0]) + string!(match.captures[1]) }
        |    .pine = replace_with("Apples and Apples", r'(?i)apples|cones', count: 1) -> |match| { "Pine" + downcase(match.string) }
        |    .named = replace_with(.lvl, r'level=(?P<level>[a-z]+)') -> |match| { upcase!(match.level) }
        |    .messages = parse_json!(.raw)
        |    . = unnest!(.messages)
        |  '''
        |[[tests]]
        |  name = "tail_fns"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      txt = "foobar"
        |      raw = "[\"m1\", \"m2\"]"
        |      lvl = "level=error A message"
        |      doc = "<book category=\"CHILDREN\"><title lang=\"en\">Harry Potter</title><author>J K. Rowling</author><year>2005</year></book>"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert_eq!(.f0, 0)
        |        assert_eq!(.f3, 3)
        |        assert_eq!(.fm, -1)
        |        assert_eq!(.fo, 9)
        |        assert_eq!(length(.pr), 2)
        |        assert_eq!(.pr[0].fruit, "apples")
        |        assert_eq!(.pr[1].veg, "peas")
        |        assert_eq!(encode_base64(.p4), "wKgAAQ==")
        |        assert_eq!(.r4, "192.168.0.1")
        |        assert_eq!(.r6, "2001:db8::1")
        |        assert_eq!(.xml.book."@category", "CHILDREN")
        |        assert_eq!(.xml.book.title.value, "Harry Potter")
        |        assert_eq!(.xml.book.author, "J K. Rowling")
        |        assert_eq!(.xml.book.year, "2005")
        |        assert_eq!(.cap, "Apples And Bananas")
        |        assert_eq!(.pine, "Pineapples and Apples")
        |        assert_eq!(.named, "ERROR A message")
        |        .messages == "m1"
        |      '''
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '.messages == "m2"'
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.length == 1)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("unsupported VRL features surface as documented skips") {
    // dynamic (non-literal) paths are a per-row interpreter feature with
    // no plan-time column equivalent — the canonical documented skip now
    // that every stdlib FUNCTION is wired (parse_dnstap was the previous
    // canary here until it landed)
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = ".x = get!(., .payload)"
        |[[tests]]
        |  name = "skip_me"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      payload = "00"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.length == 1 && rs.head.skipped.isDefined && rs.head.errors.isEmpty)
  }

  test("validate_json_schema: core keywords + email format (cue example)") {
    val dir = java.nio.file.Files.createTempDirectory("schema").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "schema.json")
    val w = new java.io.PrintWriter(f)
    w.println(
      """{"type": "object",
        | "properties": {
        |   "productUser": {"type": "string", "format": "email"},
        |   "qty": {"type": "integer", "minimum": 0}
        | },
        | "required": ["productUser"]}""".stripMargin)
    w.close()
    val topo = Topology.load(
      s"""
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .ok = validate_json_schema!(.good, "${f.getAbsolutePath}", false)
        |    .bad_email = validate_json_schema!(.bad, "${f.getAbsolutePath}", false)
        |    .bad_qty = validate_json_schema!(.badq, "${f.getAbsolutePath}", false)
        |  '''
        |[[tests]]
        |  name = "schema"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      good = "{\\"productUser\\": \\"valid@email.com\\", \\"qty\\": 2}"
        |      bad = "{\\"productUser\\": \\"invalidEmail\\"}"
        |      badq = "{\\"productUser\\": \\"valid@email.com\\", \\"qty\\": -1}"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert!(.ok)
        |        assert!(!.bad_email)
        |        assert!(!.bad_qty)
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.length == 1)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  final case class CfgEv(seq: Long, level: String, n: Long)

  test("config topology runs unchanged over Structured Streaming (stateless subset)") {
    // the compiled topology is ordinary Catalyst columns, so the same
    // Topology.run applies to a readStream frame — the reference's
    // stream-native execution with zero engine changes (stateful
    // transforms go through StreamOps' watermarked/GroupState paths)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val topo = Topology.load(
      """
        |[transforms.shape]
        |  inputs = ["events"]
        |  type = "remap"
        |  source = '''
        |    .lvl = upcase!(.level)
        |    .big = .n * 10
        |  '''
        |[transforms.split]
        |  inputs = ["shape"]
        |  type = "route"
        |  [transforms.split.route]
        |    errors = '.lvl == "ERROR"'
        |""".stripMargin)
    val input = MemoryStream[CfgEv](spark)
    val df = input.toDF().withColumnRenamed("seq", Topology.SeqCol)
    val frame = Frame(df,
      EventMeta(ListMap("level" -> VStr, "n" -> VInt), None))
    val out = topo.run(Map("events" -> frame))
    assert(out("shape").df.isStreaming && out("split.errors").df.isStreaming)
    val qe = out("split.errors").df.writeStream.format("memory")
      .queryName("cfg_stream_err").outputMode("append").start()
    val qu = out("split._unmatched").df.writeStream.format("memory")
      .queryName("cfg_stream_rest").outputMode("append").start()
    try {
      input.addData(CfgEv(0, "error", 1), CfgEv(1, "info", 2), CfgEv(2, "error", 3))
      qe.processAllAvailable(); qu.processAllAvailable()
      val errs = spark.table("cfg_stream_err")
        .select("lvl", "big").collect().map(r => (r.getString(0), r.getLong(1))).sorted
      assert(errs.toSeq == Seq(("ERROR", 10L), ("ERROR", 30L)))
      assert(spark.table("cfg_stream_rest").count() == 1)
    } finally { qe.stop(); qu.stop() }
  }

  test("path assignment preserves siblings in map and native-array bases") {
    // reference VRL path insertion keeps the container's other
    // entries/elements; the compiled form must too (a rebuilt-empty
    // base silently loses data). Also: VRL's null-padding up to an
    // out-of-range index.
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .m = parse_key_value!(.kv)
        |    .m.c = "3"
        |    .arr = split!(.csv, ",")
        |    .arr[0] = "X"
        |    .pad = split!(.csv, ",")
        |    .pad[4] = "z"
        |  '''
        |[[tests]]
        |  name = "container_set"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      kv = "a=1 b=2"
        |      csv = "a,b,c"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert_eq!(.m.a, "1")
        |        assert_eq!(.m.b, "2")
        |        assert_eq!(.m.c, "3")
        |        assert_eq!(join!(.arr, ","), "X,b,c")
        |        assert_eq!(length!(.pad), 5)
        |        assert_eq!(.pad[4], "z")
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("slice: arrays slice as arrays; out-of-range indexes clamp (slice.cue)") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .s1 = slice!("Supercalifragilisticexpialidocious", start: 5, end: 13)
        |    .s2 = slice!("Supercalifragilisticexpialidocious", start: 5, end: -14)
        |    .s3 = slice!("abc", start: -100)
        |    .s4 = slice!("abc", start: 1, end: 100)
        |    .arr = slice!(split!("1,2,3,4,5", ","), start: 1, end: 3)
        |    .arr2 = slice!(split!("a,b,c", ","), start: -2)
        |  '''
        |[[tests]]
        |  name = "slice"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      x = "1"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert_eq!(.s1, "califrag")
        |        assert_eq!(.s2, "califragilistic")
        |        assert_eq!(.s3, "abc")
        |        assert_eq!(.s4, "bc")
        |        assert_eq!(join!(.arr, "|"), "2|3")
        |        assert_eq!(join!(.arr2, "|"), "b|c")
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("replace: bounded counts, literal $ in with, runtime string pattern (replace.cue)") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .r1 = replace!("Bananas and Bananas", "Bananas", "Pineapples", count: 1)
        |    .r2 = replace!("a-b-c-d", "-", "+", count: 2)
        |    .r3 = replace!("a-b-c", "-", "+", count: 0)
        |    .r4 = replace!("cost", "o", "$$5")
        |    .r5 = replace!("foo123bar foo456bar", r'foo(\d+)bar', "<$$1>", count: 1)
        |    .r6 = replace!(.x, .sep, "_")
        |  '''
        |[[tests]]
        |  name = "replace"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      x = "p|q|r"
        |      sep = "|"
        |[[tests.outputs]]
        |  extract_from = "t"
        |  [[tests.outputs.conditions]]
        |    type = "vrl"
        |    source = '''
        |      assert_eq!(.r1, "Pineapples and Bananas")
        |      assert_eq!(.r2, "a+b+c-d")
        |      assert_eq!(.r3, "a-b-c")
        |      assert_eq!(.r4, "c$$5st")
        |      assert_eq!(.r5, "<123> foo456bar")
        |      assert_eq!(.r6, "p_q_r")
        |    '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("const propagation: regex/format bound to a variable used as literal args") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    pat = r'(\d+)'
        |    fmt = "%Y-%m-%d"
        |    .m = match!(.x, pat)
        |    .r = replace!(.x, pat, "<$$1>")
        |    .y = format_timestamp!(parse_timestamp!(.d, fmt), "%Y")
        |  '''
        |[[tests]]
        |  name = "consts"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      x = "abc123def"
        |      d = "2024-03-09"
        |[[tests.outputs]]
        |  extract_from = "t"
        |  [[tests.outputs.conditions]]
        |    type = "vrl"
        |    source = '''
        |      assert_eq!(.m, true)
        |      assert_eq!(.r, "abc<123>def")
        |      assert_eq!(.y, "2024")
        |    '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("const propagation: conditional rebinding invalidates the plan-time value") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    pat = r'a'
        |    if .x == "1" {
        |      pat = r'b'
        |    }
        |    .m = match!(.x, pat)
        |  '''
        |[[tests]]
        |  name = "rebind"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      x = "1"
        |[[tests.outputs]]
        |  extract_from = "t"
        |  [[tests.outputs.conditions]]
        |    type = "vrl"
        |    source = 'assert_eq!(.m, false)'
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    // a conditionally-rebound regex var has no single plan-time value:
    // the program must be a LOUD skip, never a silently-wrong pattern
    assert(rs.head.skipped.nonEmpty || rs.head.errors.nonEmpty,
      "conditional regex rebinding must not compile silently")
  }

  test("split_path: root is its own leading component (split_path.cue examples)") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .a = split_path!("/home/user/")
        |    .b = split_path!("/home/user")
        |    .c = split_path!("/")
        |    .d = split_path!("")
        |    .e = split_path!("rel/a//b")
        |  '''
        |[[tests]]
        |  name = "split_path"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      x = "1"
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        assert_eq!(join!(.a, "|"), "/|home|user")
        |        assert_eq!(join!(.b, "|"), "/|home|user")
        |        assert_eq!(join!(.c, "|"), "/")
        |        assert_eq!(length!(.d), 0)
        |        assert_eq!(join!(.e, "|"), "rel|a|b")
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("reduce flat_unique on an array field flattens to distinct ELEMENTS") {
    // reference FlatUnique: [\"a\",\"b\"] + [\"b\",\"c\"] merge to
    // [\"a\",\"b\",\"c\"] — collect_set of the arrays themselves would
    // yield two distinct arrays (wrong shape and values)
    val topo = Topology.load(
      """
        |[transforms.prep]
        |  inputs = []
        |  type = "remap"
        |  source = '.tags = split!(.csv, ",")'
        |[transforms.agg]
        |  inputs = ["prep"]
        |  type = "reduce"
        |  group_by = ["k"]
        |  [transforms.agg.merge_strategies]
        |    tags = "flat_unique"
        |[[tests]]
        |  name = "flat_unique_array"
        |  [[tests.inputs]]
        |    insert_at = "prep"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      k = "g"
        |      csv = "a,b"
        |  [[tests.inputs]]
        |    insert_at = "prep"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      k = "g"
        |      csv = "b,c"
        |  [[tests.outputs]]
        |    extract_from = "agg"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = 'assert_eq!(join!(.tags, ","), "a,b,c")'
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("route bare-name output carries `port` in its event meta") {
    // the tagged frame physically has the port column; downstream VRL
    // over the bare route name must see it (a meta omission made
    // `.port` resolve to null and silently dropped every row)
    val topo = Topology.load(
      """
        |[transforms.r]
        |  inputs = []
        |  type = "route"
        |  [transforms.r.route]
        |    hot = '.x == 1'
        |    cold = '.x != 1'
        |[transforms.f]
        |  inputs = ["r"]
        |  type = "filter"
        |  condition = '.port == "hot"'
        |[[tests]]
        |  name = "bare_route_port"
        |  [[tests.inputs]]
        |    insert_at = "r"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      x = 1
        |  [[tests.outputs]]
        |    extract_from = "f"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = 'assert_eq!(.x, 1)'
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("whole-event replacement with error capture: infallible ok, fallible is a loud skip") {
    import spark.implicits._
    val df = Seq((7L, "x")).toDF("x", "junk")
    val ok = VrlCompile.remap(df, VrlCompile.EventMeta.fromSchema(df.schema),
      VrlAst.parse("., err = {\"a\": .x}\n.e = err\n"))
    val row = ok.df.head
    assert(row.getLong(row.fieldIndex("a")) == 7L)
    assert(row.isNullAt(row.fieldIndex("e"))) // err bound (to null), not discarded
    // fallible replacement: the capture cannot be honored row-wise
    // (schema choice isn't row-conditional) — must raise, not silently
    // drop the capture and treat the raise as unhandled
    val thrown = intercept[VrlAst.VrlUnsupported] {
      VrlCompile.remap(df, VrlCompile.EventMeta.fromSchema(df.schema),
        VrlAst.parse("., err = parse_json(.junk)\n"))
    }
    assert(thrown.getMessage.contains("whole-event"))
  }

  test("t'...' literals: RFC 3339 only, own error message, tz-exact value") {
    import spark.implicits._
    val df = Seq(1L).toDF("x")
    def compile(src: String) =
      VrlCompile.remap(df, VrlCompile.EventMeta.fromSchema(df.schema),
        VrlAst.parse(src))
    // invalid literal: a VRL-grammar error naming the literal, not a
    // misleading enrichment-table message
    val bad = intercept[VrlAst.VrlUnsupported] { compile(".ts = t'tomorrow'\n") }
    assert(bad.getMessage.contains("timestamp literal"), bad.getMessage)
    // zone-less forms are rejected like the reference grammar
    intercept[VrlAst.VrlUnsupported] { compile(".ts = t'2020-03-01'\n") }
    intercept[VrlAst.VrlUnsupported] { compile(".ts = t'2020-03-01 00:00:00'\n") }
    // the value is the exact instant regardless of session time zone
    val out = compile(".us = to_unix_timestamp(t'2020-03-01T02:30:00+02:00')\n")
    assert(out.df.select("us").as[Long].head == 1583022600L)
  }

  test("enrichment date-range: a bad date cell is a non-match, not a config error") {
    val dir = java.nio.file.Files.createTempDirectory("enrichbad").toFile
    dir.deleteOnExit()
    val csv = new java.io.File(dir, "r.csv")
    val w = new java.io.PrintWriter(csv)
    w.println("plan,valid,rate")
    w.println("basic,2020-03-01T00:00:00Z,10")
    w.println("basic,n/a,99") // unparseable date cell — must not abort load
    w.close()
    val topo = Topology.load(
      s"""
        |[enrichment_tables.r]
        |  type = "file"
        |  [enrichment_tables.r.file]
        |    path = "${csv.getAbsolutePath}"
        |    [enrichment_tables.r.file.encoding]
        |      type = "csv"
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .hit = get_enrichment_table_record!("r", {"plan": "basic", "valid": {"from": t'2020-01-01T00:00:00Z'}})
        |  '''
        |[[tests]]
        |  name = "bad_cell"
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
        |        assert_eq!(.hit.rate, "10")
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.length == 1 && rs.head.passed,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
  }

  test("remap files = [...] merges programs in order; non-UTC timezone refuses") {
    val dir = java.nio.file.Files.createTempDirectory("remapfiles").toFile
    dir.deleteOnExit()
    def write(n: String, body: String): String = {
      val f = new java.io.File(dir, n)
      val w = new java.io.PrintWriter(f); w.print(body); w.close()
      f.getAbsolutePath
    }
    val f1 = write("a.vrl", ".a = 1\n")
    val f2 = write("b.vrl", ".b = .a + 1\n")
    val topo = Topology.load(
      s"""
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  files = ["$f1", "$f2"]
        |[[tests]]
        |  name = "merged"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      x = 0
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = 'assert_eq!(.b, 2)'
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.head.passed && rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    val tz = UnitTestHarness.run(spark, Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = ".a = 1"
        |  timezone = "America/New_York"
        |[[tests]]
        |  name = "tz"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      x = 0
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = 'assert_eq!(.a, 1)'
        |""".stripMargin))
    assert(tz.head.skipped.exists(_.contains("timezone")), tz.head.toString)
  }

  test("unknown transform options fail the load (deny_unknown_fields)") {
    // a typo'd knob must never silently fall back to a default
    def runOne(body: String) = UnitTestHarness.run(spark, Topology.load(
      s"""
        |[transforms.t]
        |  inputs = []
        |$body
        |[[tests]]
        |  name = "k"
        |  [[tests.inputs]]
        |    insert_at = "t"
        |    type = "log"
        |    [tests.inputs.log_fields]
        |      x = 1
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = 'assert_eq!(.x, 1)'
        |""".stripMargin))
    val typo = intercept[IllegalArgumentException] {
      runOne("  type = \"throttle\"\n  threshold = 1\n  windows_secs = 60")
    }
    assert(typo.getMessage.contains("windows_secs"), typo.getMessage)
    // a reference option this engine would have to honor to be correct
    // (metric_to_log host_tag changes the output shape) fails too
    val hostTag = intercept[IllegalArgumentException] {
      runOne("  type = \"metric_to_log\"\n  host_tag = \"host\"")
    }
    assert(hostTag.getMessage.contains("host_tag"), hostTag.getMessage)
    // accepted-unused liveness knobs still load (reduce timers)
    val ok = runOne(
      "  type = \"reduce\"\n  group_by = [\"x\"]\n  expire_after_ms = 30000")
    assert(ok.head.passed, ok.head.toString)
  }

  test("community_id config checks: lone port and non-literal seed are plan-time errors") {
    import spark.implicits._
    val df = Seq(("1.2.3.4", "5.6.7.8", 7L)).toDF("sip", "dip", "s")
    def compile(call: String) =
      VrlCompile.remap(df, VrlCompile.EventMeta.fromSchema(df.schema),
        VrlAst.parse(s".cid = $call\n"))
    // one port without the other: a config mistake, not a row condition
    val lone = intercept[VrlAst.VrlUnsupported] {
      compile("""community_id!(.sip, .dip, 6, source_port: 80)""")
    }
    assert(lone.getMessage.contains("both ports"))
    // seed is baked into the hash layout — a non-literal silently
    // hashing as 0 would mint wrong IDs with no error
    val seed = intercept[VrlAst.VrlUnsupported] {
      compile("""community_id!(.sip, .dip, 6, 80, 443, seed: .s)""")
    }
    assert(seed.getMessage.contains("seed"))
    // the well-formed call still compiles and runs
    val ok = compile("""community_id!(.sip, .dip, 6, 1122, 3344)""")
    assert(ok.df.head.getString(ok.df.schema.fieldIndex("cid")) ==
      "1:wCb3OG7yAFWelaUydu0D+125CLM=")
  }

  test("toml parser: truncated or non-hex unicode escapes get positioned errors") {
    for (bad <- Seq("k = \"\\u12", "k = \"\\uzzzz\"")) {
      val e = intercept[IllegalArgumentException](Toml.parse(bad))
      assert(e.getMessage.toLowerCase.contains("escape"), e.getMessage)
    }
  }

  test("set_semantic_meaning stamps column metadata at compile time, no runtime effect (set_semantic_meaning.cue)") {
    import spark.implicits._
    val df = Seq(("u1", "hi")).toDF("user", "text")
    val prog = VrlAst.parse(
      """set_semantic_meaning(.user, "user_id")
        |.norm = downcase!(.text)
        |""".stripMargin)
    val r = VrlCompile.remap(df, VrlCompile.EventMeta.fromSchema(df.schema), prog)
    val userField = r.df.schema("user")
    assert(userField.metadata.getString("semantic_meaning") == "user_id")
    // no runtime behavior: values unchanged, the call contributed no column
    assert(r.df.columns.toSeq == Seq("user", "text", "norm"))
    assert(r.df.head.getString(0) == "u1")
  }
}
