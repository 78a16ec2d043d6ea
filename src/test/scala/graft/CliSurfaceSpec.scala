package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.functions._

import graft.config._
import graft.config.VrlCompile.{EventMeta, VInt, VStr}

/** The config CLI surface beyond run/test: `list` registries,
  * `generate` skeletons (src/generate.rs), `graph` renderings
  * (src/graph.rs), and the one-shot `vrl` evaluator (src/cli.rs:348).
  */
class CliSurfaceSpec extends SparkSpec {

  // ---------------------------------------------------------- generate

  test("generate: every registered transform type yields a parseable skeleton") {
    for (t <- Topology.TransformTypes) {
      val toml = Generate.example(s"parquet/$t/console")
      val topo = Topology.load(toml)
      assert(topo.sources.keySet == Set("source0"), s"$t sources")
      assert(topo.transforms.get("transform0").flatMap(_.str("type")) == Some(t))
      assert(topo.sinkDefs.keySet == Set("sink0"), s"$t sinks")
      assert(topo.transforms("transform0").strArr("inputs") == Seq("source0"))
      assert(topo.sinkDefs("sink0").strArr("inputs") == Seq("transform0"))
    }
  }

  test("generate: custom names, multi-component fragments, chained inputs") {
    val toml = Generate.example(
      "logs:file/shape:remap,keep:filter/out:parquet,dbg:console")
    val topo = Topology.load(toml)
    assert(topo.sources.keySet == Set("logs"))
    assert(topo.transforms.keys.toSeq == Seq("shape", "keep"))
    assert(topo.transforms("keep").strArr("inputs") == Seq("shape"))
    assert(topo.sinkDefs("out").strArr("inputs") == Seq("keep"))
    assert(topo.sinkDefs("dbg").strArr("inputs") == Seq("keep"))
    // pipe dividers are interchangeable with slashes (generate.rs)
    val piped = Generate.example("logs:file|shape:remap|out:console")
    assert(Topology.load(piped).transforms.keySet == Set("shape"))
  }

  test("generate: unknown types and empty names are refused") {
    intercept[IllegalArgumentException](Generate.example("stdin/remap/console"))
    intercept[IllegalArgumentException](Generate.example("file/:remap/console"))
    intercept[IllegalArgumentException](Generate.example("file/socket/console"))
  }

  test("generate: duplicate and unsafe component names are refused, not emitted") {
    // duplicate headers would silently merge in any TOML parser
    val dup = intercept[IllegalArgumentException](
      Generate.example("file/x:remap,x:filter/console"))
    assert(dup.getMessage.contains("duplicate"))
    // a custom name colliding with a generated default
    intercept[IllegalArgumentException](
      Generate.example("file/transform1:remap,filter/console"))
    // names that would corrupt the emitted TOML
    intercept[IllegalArgumentException](
      Generate.example("file/bad name:remap/console"))
    intercept[IllegalArgumentException](
      Generate.example("""file/x"y:remap/console"""))
  }

  test("generate: log-side skeleton examples genuinely run, not just parse") {
    // route's generated example: inject a log frame at the transform
    // and check both ports materialize
    val toml = Generate.example("/route:route/")
    val topo = Topology.load(toml)
    val df = spark.range(2).select(
      col("id").as(Topology.SeqCol),
      when(col("id") === 0, "error").otherwise("info").as("level"))
    val in = Frame(df, EventMeta(ListMap("level" -> VStr), None))
    val out = topo.run(Map("route" -> in))
    assert(out("route.errors").df.count() == 1)
    assert(out("route._unmatched").df.count() == 1)

    // filter + remap chained skeletons
    val t2 = Topology.load(Generate.example("/shape:remap,keep:filter/"))
    val df2 = spark.range(1).select(
      col("id").as(Topology.SeqCol), lit("hello").as("message"))
    val out2 = t2.run(Map(
      "shape" -> Frame(df2, EventMeta(ListMap("message" -> VStr), None))))
    assert(out2("keep").df.count() == 1)
  }

  // ---------------------------------------------------------- registry

  test("list registries match what the topology dispatchers accept") {
    // unknown types must throw, registered log-side types must not
    // throw the "transform type" unsupported error at dispatch
    val bad = Topology.load(
      """
        |[transforms.x]
        |  inputs = []
        |  type = "nope"
        |""".stripMargin)
    val df = spark.range(1).select(
      col("id").as(Topology.SeqCol), lit("m").as("message"))
    val in = Frame(df, EventMeta(ListMap("message" -> VStr), None))
    val e = intercept[Exception](bad.run(Map("x" -> in)))
    assert(e.getMessage.contains("transform type"))
    assert(Topology.TransformTypes.size == 17) // the full reference registry
    assert(Topology.TransformTypes == Topology.TransformTypes.sorted)
  }

  // ---------------------------------------------------------- vrl verb

  test("vrl one-shot: program over JSON lines, typed in and out, input order") {
    val (out, dropped) = VrlRunner.eval(spark,
      """.next = .a + 1
        |.tag = upcase(.tag)
        |""".stripMargin,
      Seq("""{"a": 1, "tag": "x"}""", """{"a": 2, "tag": "y"}"""))
    assert(dropped.isEmpty)
    assert(out.size == 2)
    assert(out(0).contains(""""next":2""") && out(0).contains(""""tag":"X""""))
    assert(out(1).contains(""""next":3""") && out(1).contains(""""tag":"Y""""))
  }

  test("vrl one-shot: abort drops the event; nested objects survive round-trip") {
    val (out, _) = VrlRunner.eval(spark,
      """if .skip == true { abort }
        |.meta.depth = 2
        |""".stripMargin,
      Seq("""{"skip": true, "meta": {"k": "v"}}""",
          """{"skip": false, "meta": {"k": "w"}}"""))
    assert(out.size == 1)
    assert(out(0).contains(""""k":"w"""") && out(0).contains(""""depth":2"""))
  }

  test("vrl one-shot: rerouted dropped channel carries the aborted original") {
    // the Cli verb passes rerouteDropped=true so aborted events
    // surface instead of vanishing
    val (out, dropped) = VrlRunner.eval(spark,
      "if .skip == true { abort }\n.x = 1",
      Seq("""{"skip": true, "id": 7}""", """{"skip": false, "id": 8}"""),
      VrlCompile.RemapOpts(rerouteDropped = true))
    assert(out.size == 1 && out(0).contains(""""id":8"""))
    assert(dropped.size == 1 && dropped(0).contains(""""id":7"""))
  }

  test("vrl one-shot: a null array element keeps its index and counts toward length") {
    val (out, _) = VrlRunner.eval(spark,
      ".n = length(.a)\n.second = .a[1]",
      Seq("""{"a": [1, null, 3]}"""))
    assert(out(0).contains(""""n":3"""), out(0))
    // .a[1] is null → the field is absent from the JSON rendering,
    // and the array itself keeps the hole
    assert(out(0).contains(""""a":[1,null,3]"""), out(0))
    assert(!out(0).contains(""""second":3"""), out(0))
  }

  test("metric test input: tags canonicalize by key order, not joined-string order") {
    // VRL conditions see the reference metric view (.tags is a map);
    // the canonical key-ordered string lives in the flat frame
    val topo = Topology.load(
      """
        |[transforms.fwd]
        |  inputs = []
        |  type = "remap"
        |  source = '.namespace = "ns"'
        |[[tests]]
        |  name = "tags"
        |  [tests.input]
        |    insert_at = "fwd"
        |    type = "metric"
        |    [tests.input.metric]
        |      kind = "incremental"
        |      name = "m"
        |      [tests.input.metric.tags]
        |        a-b = "y"
        |        a = "x"
        |      [tests.input.metric.counter]
        |        value = 1.0
        |  [[tests.outputs]]
        |    extract_from = "fwd"
        |    conditions = ['.tags.a == "x" && .tags."a-b" == "y"']
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.forall(_.passed), rs.mkString("; "))
    // key-first canonical order: "a" < "a-b" even though the joined
    // strings would sort "a-b=y" < "a=x" ('-' < '=')
    val in = topo.testDefs.head.tab("input").get
    val frame = UnitTestHarness.buildFrame(spark, Seq((0L, in)))
    val out = topo.run(Map("fwd" -> frame))("fwd")
    assert(out.df.select("tags").head.getString(0) == "a=x,a-b=y")
  }

  test("vrl one-shot: malformed input line is named in the error") {
    val e = intercept[IllegalArgumentException](
      VrlRunner.eval(spark, ".x = 1", Seq("""{"ok": 1}""", "not json")))
    assert(e.getMessage.contains("line 2"))
  }
}
