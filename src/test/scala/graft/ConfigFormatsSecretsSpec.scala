package graft

import java.nio.file.{Files, Paths}

import graft.config.{Topology, UnitTestHarness}

/** The reference's remaining behavior corpora:
  *
  *  - tests/behavior/formats/simple.{toml,json,yaml,yml} — the same
  *    topology in every config format the loader accepts, run verbatim
  *  - tests/behavior/config/secret.toml — `SECRET[backend.key]`
  *    interpolation across all four credential-free backends. Run with
  *    ONE substitution: the exec backend's command points at
  *    `./target/debug/secret-backend-example`, a Rust binary the
  *    checkout doesn't build in this sandbox — a python fixture
  *    speaking the same v1.0 stdin/stdout protocol (mirroring
  *    src/config/loading/secret_backend_example.rs: every key resolves
  *    to `<key>.retrieved`) stands in. Everything else is verbatim.
  */
class ConfigFormatsSecretsSpec extends SparkSpec {

  private val ref = "/root/reference"

  test("formats corpus: the same topology loads from toml, json, yaml, and yml") {
    Seq("simple.toml", "simple.json", "simple.yaml", "simple.yml").foreach { f =>
      val rs = UnitTestHarness.runFile(spark, s"$ref/tests/behavior/formats/$f")
      assert(rs.length == 1, s"$f: ${rs.length} tests")
      assert(rs.head.passed, s"$f: ${(rs.head.errors ++ rs.head.skipped).mkString("; ")}")
    }
  }

  test("secrets corpus: test/file/directory/exec backends interpolate SECRET[...] at load") {
    val backend = Files.createTempFile("secret-backend", ".py")
    Files.write(backend, (
      """import json, sys
        |q = json.load(sys.stdin)
        |assert q["version"] == "1.0", q
        |print(json.dumps({k: {"value": k + ".retrieved", "error": None}
        |                  for k in q["secrets"]}))
        |""".stripMargin).getBytes("UTF-8"))
    val text = new String(Files.readAllBytes(
      Paths.get(s"$ref/tests/behavior/config/secret.toml")), "UTF-8")
    val patched = text.replace(
      """command = ["./target/debug/secret-backend-example"]""",
      s"""command = ["python3", "$backend"]""")
    assert(patched != text, "exec command line not found to patch")
    // file/directory backend paths are reference-root-relative
    val topo = new Topology(graft.config.Toml.parse(patched), Some(ref))
    val rs = UnitTestHarness.run(spark, topo)
    assert(rs.length == 1 && rs.head.passed,
      rs.map(r => (r.name, r.errors, r.skipped)).mkString("; "))

    // the interpolated program carries the resolved values
    val src = topo.transforms("add_field_from_secret").str("source").get
    assert(src.contains("this_is_a_secret_value"), src)
    assert(src.contains("def.retrieved") && src.contains("ghi.retrieved") &&
      src.contains("jkl.retrieved"), src)
  }

  test("secrets: missing key, empty value, and unknown backend fail the load loudly") {
    def load(s: String) = Topology.load(s)
    val missing = intercept[IllegalArgumentException](load(
      """
        |[secret.b]
        |  type = "test"
        |  replacement = ""
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '.x = "SECRET[b.k]"'
        |""".stripMargin))
    assert(missing.getMessage.contains("secret was empty"), missing.getMessage)
    val unknown = intercept[IllegalArgumentException](load(
      """
        |[secret.b]
        |  type = "test"
        |  replacement = "v"
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '.x = "SECRET[nope.k]"'
        |""".stripMargin))
    assert(unknown.getMessage.contains("unknown secret backend"), unknown.getMessage)
    val badType = intercept[IllegalArgumentException](load(
      """
        |[secret.b]
        |  type = "aws_secrets_manager"
        |  secret_id = "x"
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '.x = "SECRET[b.k]"'
        |""".stripMargin))
    assert(badType.getMessage.contains("unsupported type"), badType.getMessage)
  }
}
