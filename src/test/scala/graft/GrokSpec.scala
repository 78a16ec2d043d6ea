package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Grok

class GrokSpec extends AnyFunSuite {

  test("compile emits numbered groups in field order") {
    val c = Grok.compile("%{WORD:a} %{INT:b}")
    assert(c.fields == Seq("a", "b"))
    val m = java.util.regex.Pattern.compile(c.regex).matcher("x 42")
    assert(m.matches() && m.group(1) == "x" && m.group(2) == "42")
  }

  test("literals are escaped") {
    val c = Grok.compile("a.b(c)=%{INT:n}")
    val m = java.util.regex.Pattern.compile(c.regex).matcher("a.b(c)=7")
    assert(m.matches() && m.group(1) == "7")
    assert(!"aXb(c)=7".matches(c.regex))
  }

  test("unnamed tokens match without capturing") {
    val c = Grok.compile("%{WORD} %{INT:n}")
    assert(c.fields == Seq("n"))
    val m = java.util.regex.Pattern.compile(c.regex).matcher("hi 9")
    assert(m.matches() && m.group(1) == "9")
  }

  test("unknown pattern fails at compile time") {
    assertThrows[IllegalArgumentException](Grok.compile("%{NOPE:x}"))
  }

  test("anchored pattern rejects a trailing newline (\\z end-of-text, RE2 parity)") {
    val c = Grok.compile("%{WORD:a}")
    val p = java.util.regex.Pattern.compile(c.regex)
    assert(p.matcher("hello").find())
    // Java $ would match before the final terminator and diverge from
    // the DuckDB/RE2 oracle running the SAME pattern; \z must not
    assert(!p.matcher("hello\n").find())
  }

  test("log-line pattern parses the transcript format") {
    val line = "1998-03-03T00:00:00Z info tool=tool_6 latency_ms=190 msg=\"turn 0 of conv-0 by assistant\""
    val c = graft.plans.Pipeline.compiledGrok
    val m = java.util.regex.Pattern.compile(c.regex).matcher(line)
    assert(m.matches())
    assert(m.group(c.fields.indexOf("level") + 1) == "info")
    assert(m.group(c.fields.indexOf("latency_ms") + 1) == "190")
    assert(m.group(c.fields.indexOf("msg") + 1) == "turn 0 of conv-0 by assistant")
    assert(!"1998-03-03T00:00:00Z BOGUS msg=\"x\"".matches(c.regex))
  }
}
