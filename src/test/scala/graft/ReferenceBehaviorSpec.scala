package graft

import graft.config.{Toml, Topology, UnitTestHarness}

/** Run the reference's OWN `vector test` behavior corpus — the .toml
  * files under tests/behavior/transforms in the reference checkout,
  * read in place — through this engine's config front-end and
  * unit-test harness.
  *
  * This is the strongest fidelity evidence available: the inputs,
  * programs, and assertions are the reference's verbatim, not ports.
  * The contract pinned here: ALL 124 loaded tests pass — including
  * remap_infallible_assignment, whose condition compares the literal
  * Rust diagnostic `function call error for "parse_json" at (19:44):
  * unable to parse json: key must be a string at line 1 column 3`;
  * the engine reproduces it exactly (parser-recorded call spans in
  * VrlAst.Call.span + serde_json-compatible error prose in
  * functions/JsonDiag). lua_v1/lua_v2 load too — their scripts run on
  * the from-scratch Lua VM (graft.lua) behind the config `lua`
  * transform, so the WHOLE corpus directory now runs (124 tests).
  */
class ReferenceBehaviorSpec extends SparkSpec {

  private val corpus = "/root/reference/tests/behavior/transforms"

  private val files = Seq(
    "remap.toml" -> 90,
    "remap_with_drop.toml" -> 1,
    "filter.toml" -> 7,
    "route.toml" -> 2,
    "dedupe.toml" -> 3,
    "reduce.toml" -> 10,
    "task_transform.toml" -> 2,
    "vrl_test_input.toml" -> 2,
    "lua_v1.toml" -> 2,
    "lua_v2.toml" -> 5)

  private val expectedFailures = Set.empty[String]

  test("the reference's own behavior corpus passes (all 124 tests, lua and diagnostic text included)") {
    val results = files.flatMap { case (f, expectedCount) =>
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$corpus/$f")), "UTF-8")
      // reference-relative paths (remap file = "tests/data/...") resolve
      // against the reference root, as `vector test` run from repo root
      val rs = UnitTestHarness.run(spark,
        new Topology(Toml.parse(text), Some("/root/reference")))
      assert(rs.length == expectedCount, s"$f: ${rs.length} tests, expected $expectedCount")
      rs.map(r => (f, r))
    }

    val skipped = results.collect { case (f, r) if r.skipped.isDefined =>
      s"$f/${r.name}: ${r.skipped.get}" }
    assert(skipped.isEmpty, s"documented skips should be zero, got:\n${skipped.mkString("\n")}")

    val failed = results.collect { case (f, r) if r.errors.nonEmpty => (f, r) }
    val unexpected = failed.filterNot { case (_, r) => expectedFailures(r.name) }
    assert(unexpected.isEmpty, unexpected.map { case (f, r) =>
      s"$f/${r.name}: ${r.errors.mkString("; ")}" }.mkString("\n"))
    assert(failed.map(_._2.name).toSet == expectedFailures,
      s"expected exactly $expectedFailures to fail, got ${failed.map(_._2.name)}")

    val passed = results.count(_._2.passed)
    assert(passed == results.length - expectedFailures.size,
      s"$passed passed of ${results.length}")
  }

  test("infallible assignment SEMANTICS hold even where the diagnostic text differs") {
    // the pinned divergence above is message-text only: the ok target
    // must still bind null on error, the err target a non-empty string,
    // and the success pair (value, null)
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '''
        |    .nope, .err1 = parse_json("{ INVALID }")
        |    .ok, .err2 = parse_json("{ \"foo\": true }")
        |  '''
        |[[tests]]
        |  name = "semantics"
        |  [tests.input]
        |    insert_at = "t"
        |    type = "raw"
        |    value = ""
        |  [[tests.outputs]]
        |    extract_from = "t"
        |    [[tests.outputs.conditions]]
        |      type = "vrl"
        |      source = '''
        |        .nope == null && is_string(.err1) && .err1 != "" &&
        |        .ok.foo == true && .err2 == null
        |      '''
        |""".stripMargin)
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.forall(_.passed), rs.mkString("; "))
  }
}
