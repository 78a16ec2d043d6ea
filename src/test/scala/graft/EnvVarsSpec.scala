package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{EnvVars, Topology}

/** Pins the reference's own vars.rs test vectors
  * (src/config/vars.rs mod test) against [[EnvVars.interpolate]].
  */
class EnvVarsSpec extends AnyFunSuite {

  private val vars = Map(
    "FOO" -> "dogs", "FOOBAR" -> "cats", "FOO.BAR" -> "turtles",
    "EMPTY" -> "")

  private def i(s: String) = EnvVars.interpolate(s, vars)
  private def fails(s: String): String =
    intercept[IllegalArgumentException](i(s)).getMessage

  test("the reference's interpolation vectors (vars.rs)") {
    assert(i("$FOO") == "dogs")
    assert(i("${FOO}") == "dogs")
    assert(i("${FOOBAR}") == "cats")
    assert(i("x${FOOBAR}y") == "xcatsy")
    assert(fails("x$FOOBARy").contains("FOOBARy")) // longest-name match misses
    assert(i("$ x") == "$ x")
    assert(i("$$FOO") == "$FOO")
    assert(i("$FOO=bar") == "dogs=bar")
    assert(fails("$NOT_FOO").contains("Missing environment variable"))
    assert(fails("$NOT-FOO").contains("NOT")) // '-' ends the name
    assert(i("$FOO.BAR") == "turtles")
    assert(i("${FOO x") == "${FOO x") // unterminated brace: literal
    assert(i("${}") == "${}")
    assert(i("${FOO:-cats}") == "dogs")
    assert(i("${NOT:-dogcats}") == "dogcats")
    assert(i("${NOT:-dogs and cats}") == "dogs and cats")
    assert(i("${:-cats}") == "${:-cats}")
    assert(i("${NOT:-}") == "")
    assert(i("${NOT-cats}") == "cats")
    assert(i("${EMPTY-cats}") == "")
    assert(i("${FOO:?error cats}") == "dogs")
    assert(i("${FOO?error cats}") == "dogs")
    assert(i("${EMPTY?error cats}") == "")
    assert(fails("${NOT:?error cats}").contains("error cats"))
    assert(fails("${NOT?error cats}").contains("error cats"))
    assert(fails("${EMPTY:?error cats}").contains("Non-empty"))
  }

  test("multiline values are rejected (vars.rs test_multiline_expansion_prevented)") {
    val ml = Map("MULTILINE" -> "line1\nline2", "CR" -> "a\rb", "SAFE" -> "ok")
    assert(EnvVars.interpolate("$SAFE", ml) == "ok")
    Seq("$MULTILINE", "$CR").foreach { s =>
      val e = intercept[IllegalArgumentException](EnvVars.interpolate(s, ml))
      assert(e.getMessage.contains("newline"), e.getMessage)
    }
  }

  test("Topology.load interpolates the raw text before parsing") {
    // only unset-with-default forms so the test is env-independent
    val topo = Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '.x = "${GRAFT_SURELY_UNSET_VAR:-fallback}"'
        |""".stripMargin)
    assert(topo.transforms("t").str("source").get.contains("\"fallback\""))
    val missing = intercept[IllegalArgumentException](Topology.load(
      """
        |[transforms.t]
        |  inputs = []
        |  type = "remap"
        |  source = '.x = "${GRAFT_SURELY_UNSET_VAR}"'
        |""".stripMargin))
    assert(missing.getMessage.contains("Missing environment variable"))
  }
}
