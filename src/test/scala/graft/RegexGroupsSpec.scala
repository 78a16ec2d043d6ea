package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.RegexExpressions

/** RegexGroups must be an exact drop-in for per-index regexp_extract
  * (the grok compiler's per-field contract) while running the pattern
  * once per operator.
  */
class RegexGroupsSpec extends SparkSpec {
  import spark.implicits._

  private val re = """^(\w+)-(\d+)(?::(\w+))?$"""

  test("regex_groups: element-wise equivalence with regexp_extract (match, optional group, no match, null)") {
    val df = Seq(Some("alpha-42:tail"), Some("beta-7"), Some("nomatch!"), None)
      .toDF("s")
    val g = RegexExpressions.regexGroups(col("s"), re)
    val rows = df.select(
        col("s"),
        when(col("s").isNotNull, coalesce(element_at(g, 1), lit(""))).as("g1"),
        when(col("s").isNotNull, coalesce(element_at(g, 3), lit(""))).as("g3"),
        regexp_extract(col("s"), re, 1).as("r1"),
        regexp_extract(col("s"), re, 3).as("r3"),
        g.isNotNull.as("m"),
        // rlike yields NULL on null input where isNotNull yields false;
        // every consumer coalesces the match bit, so compare post-coalesce
        coalesce(col("s").rlike(re), lit(false)).as("rl"))
      .collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(3), s"g1 vs regexp_extract(1) on ${r.get(0)}")
      assert(r.get(2) == r.get(4), s"g3 vs regexp_extract(3) on ${r.get(0)}")
      assert(r.get(5) == r.get(6), s"isNotNull vs rlike on ${r.get(0)}")
    }
  }

  test("regex_groups: all groups in one array, find() semantics (unanchored)") {
    val out = Seq("x ab-1 y").toDF("s")
      .select(RegexExpressions.regexGroups(col("s"), """(\w+)-(\d+)""").as("g"))
      .head.getSeq[String](0)
    assert(out == Seq("ab", "1"))
  }

  test("regex_groups: grok Compiled.columns round-trip equals the old regexp_extract form") {
    val compiled = graft.functions.Grok.compile(
      "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} tool=%{NOTSPACE:tool} latency_ms=%{INT:lat} msg=\"%{DATA:msg}\"")
    val df = Seq(
      "2024-01-01T00:00:00Z info tool=search latency_ms=12 msg=\"ok\"",
      "garbage line").toDF("text")
    val viaGroups = df.select(compiled.columns(col("text")).map { case (n, c) => c.as(n) }: _*)
    val viaExtract = df.select(compiled.fields.zipWithIndex.map { case (f, i) =>
      regexp_extract(col("text"), compiled.regex, i + 1).as(f) }: _*)
    assert(viaGroups.collect().toSeq == viaExtract.collect().toSeq)
  }
}
