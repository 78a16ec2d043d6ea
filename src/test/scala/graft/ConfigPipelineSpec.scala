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
    Seq("remap.toml", "route.toml", "filter.toml", "dedupe.toml", "reduce.toml")

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
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.length == 1)
    assert(rs.head.errors.isEmpty && rs.head.skipped.isEmpty,
      (rs.head.errors ++ rs.head.skipped).mkString("; "))
    assert(rs.head.passed)
  }

  test("unsupported VRL features surface as documented skips") {
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = ".x = parse_cbor!(.payload)"
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
}
