package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JsonDiag
import graft.config.VrlAst

/** serde_json-compatible diagnostics (functions/JsonDiag) + the
  * parser-recorded call spans (VrlAst.Call.span) that together
  * reproduce the reference's exact error strings — the corpus pin is
  * tests/behavior/transforms/remap.toml `remap_infallible_assignment`,
  * run verbatim by ReferenceBehaviorSpec; this spec pins the pieces.
  */
class JsonDiagSpec extends AnyFunSuite {

  private def msg(s: String): String =
    JsonDiag.check(s).getOrElse(fail(s"expected invalid: $s"))

  test("the corpus-pinned vector: { INVALID }") {
    assert(msg("{ INVALID }") == "key must be a string at line 1 column 3")
  }

  test("serde_json error phrases and positions (derived vectors)") {
    // peek-positioned errors point at the offending byte, 1-based
    assert(msg("") == "EOF while parsing a value at line 1 column 0")
    assert(msg("xyz") == "expected value at line 1 column 1")
    assert(msg("{\"a\": }") == "expected value at line 1 column 7")
    assert(msg("[1,]") == "trailing comma at line 1 column 4")
    assert(msg("[1 2]") == "expected `,` or `]` at line 1 column 4")
    assert(msg("{\"a\":1 \"b\":2}") == "expected `,` or `}` at line 1 column 8")
    assert(msg("{\"a\" 1}") == "expected `:` at line 1 column 6")
    assert(msg("1 x") == "trailing characters at line 1 column 3")
    assert(msg("01") == "invalid number at line 1 column 2")
    // consumed-positioned errors point at the last consumed byte
    assert(msg("nulx") == "expected ident at line 1 column 4")
    assert(msg("\"\\q\"") == "invalid escape at line 1 column 3")
    assert(msg("\"a\u0001b\"") ==
      "control character (\\u0000-\\u001F) found while parsing a string at line 1 column 2")
    // EOF errors point at the end of input
    assert(msg("{") == "EOF while parsing an object at line 1 column 1")
    assert(msg("[") == "EOF while parsing a list at line 1 column 1")
    assert(msg("\"abc") == "EOF while parsing a string at line 1 column 4")
    assert(msg("tru") == "EOF while parsing a value at line 1 column 3")
    assert(msg("1.") == "EOF while parsing a value at line 1 column 2")
    assert(msg("-") == "EOF while parsing a value at line 1 column 1")
    assert(msg("{\"a\"") == "EOF while parsing an object at line 1 column 4")
    // newlines reset the column and bump the line
    assert(msg("{\n INVALID }") == "key must be a string at line 2 column 2")
  }

  test("valid JSON returns no diagnostic") {
    for (s <- Seq("{\"a\": 1}", "null", "  null  ", "[1, 2.5e3, \"x\\u0041\"]",
      "\"\\uD83D\\uDE00\"", "-0.5", "123456789012345678901234567890",
      "{\"nested\": {\"deep\": [true, false, null]}}", "\"\"", "0", "0.0e0"))
      assert(JsonDiag.check(s).isEmpty, s"false positive on: $s")
  }

  test("recursion limit matches serde_json's 128 (127 levels parse, the 128th fails)") {
    val deep127 = "[" * 127 + "1" + "]" * 127
    assert(JsonDiag.check(deep127).isEmpty)
    val deep128 = "[" * 128 + "1" + "]" * 128
    assert(msg(deep128) == "recursion limit exceeded at line 1 column 128")
  }

  test("call spans are the reference's (start:end) source extents") {
    val p = VrlAst.parse(""".nope, .err1 = parse_json("{ INVALID }")""")
    val span = p.stmts.head match {
      case VrlAst.Assign(_, _, c: VrlAst.Call) => c.span
      case other => fail(s"unexpected stmt $other")
    }
    // `parse_json("{ INVALID }")` is 25 chars starting at offset 15
    assert(span.contains((15, 40)))

    // the corpus program (4-space indent, as decoded from remap.toml)
    val corpus = "    .nope, .err1 = parse_json(\"{ INVALID }\")\n" +
      "    .ok, .err2 = parse_json(\"{ \\\"foo\\\": true }\")\n"
    val p2 = VrlAst.parse(corpus)
    val s2 = p2.stmts.head match {
      case VrlAst.Assign(_, _, c: VrlAst.Call) => c.span
      case other => fail(s"unexpected stmt $other")
    }
    assert(s2.contains((19, 44))) // the reference's pinned (19:44)
  }
}
