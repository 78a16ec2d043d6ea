package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Plan-time grok → regex compiler.
  *
  * The reference's parse stage is VRL `parse_grok` / `parse_groks`
  * (reference: website/cue/reference/remap/functions/parse_grok.cue,
  * parse_groks.cue — first-matching pattern set). Grok is macro expansion
  * over regex, so we compile the grok expression to a plain regex at PLAN
  * time and emit built-in `regexp_extract` columns — everything stays
  * inside whole-stage codegen; no UDF, no custom Expression needed
  * (SURVEY.md §4 "custom pieces").
  *
  * Design constraints:
  *  - Only NUMBERED capture groups in the output regex (named-group syntax
  *    differs between Java and RE2/DuckDB; the oracle must run the same
  *    pattern). Sub-pattern bodies use (?:...) exclusively so user group
  *    indices are stable.
  *  - The pattern library is the common subset of the upstream grok
  *    patterns actually exercised by log-line parsing.
  */
object Grok {

  /** name → regex body (must contain no capturing groups). */
  val patterns: Map[String, String] = Map(
    "WORD"              -> """\w+""",
    "NOTSPACE"          -> """\S+""",
    "SPACE"             -> """\s*""",
    "DATA"              -> """.*?""",
    "GREEDYDATA"        -> """.*""",
    "INT"               -> """(?:[+-]?\d+)""",
    "POSINT"            -> """\d+""",
    "NONNEGINT"         -> """\d+""",
    "USERNAME"          -> """[a-zA-Z0-9._-]+""",
    // CLF size field: digits or the '-' placeholder Apache writes for
    // 204/304/zero-byte responses — callers nullif("-") before casting
    "CLFSIZE"           -> """(?:-|\d+)""",
    "NUMBER"            -> """(?:[+-]?\d+(?:\.\d+)?)""",
    "BASE16NUM"         -> """(?:0[xX])?[0-9a-fA-F]+""",
    "LOGLEVEL"          -> """(?:trace|debug|info|notice|warn(?:ing)?|error|err|crit(?:ical)?|fatal|severe|emerg(?:ency)?|TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|ERR|CRIT(?:ICAL)?|FATAL|SEVERE|EMERG(?:ENCY)?)""",
    "TIMESTAMP_ISO8601" -> """\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?""",
    "IP"                -> """(?:\d{1,3}\.){3}\d{1,3}""",
    "HOSTNAME"          -> """(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*""",
    "UUID"              -> """[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}""",
    "PATH"              -> """(?:/[\w.-]*)+""",
    "QS"                -> """"(?:[^"\\]|\\.)*"""",
    "HTTPMETHOD"        -> """(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH|TRACE|CONNECT)""",
    "GLOGLEVEL"         -> """[IWEF]""",
    "MONTHDAY4"         -> """\d{4}""",
    "TIME"              -> """\d{2}:\d{2}:\d{2}(?:\.\d+)?""",
    "DATESTAMP_SLASH"   -> """\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}""",
    // upstream grok-patterns: EMAILLOCALPART + EMAILADDRESS =
    // %{EMAILLOCALPART}@%{HOSTNAME} (inlined — bodies are plain regex)
    "EMAILLOCALPART"    -> """[a-zA-Z][a-zA-Z0-9_.+\-=:]+""",
    "EMAILADDRESS"      -> """[a-zA-Z][a-zA-Z0-9_.+\-=:]+@(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*"""
  )

  /** A compiled grok expression: anchored regex + ordered field names,
    * fields(i) corresponds to capture group i+1.
    *
    * Extraction is ONE `RegexGroups` run per row per operator, not k
    * `regexp_extract` runs: every field (and `matches`) references the
    * same array-valued subexpression, which codegen subexpression
    * elimination evaluates once — so Catalyst re-inlining fields into
    * filters/projections (SimplifyExtractValueOps, predicate pushdown)
    * no longer multiplies regex work. Per-field semantics are exactly
    * `regexp_extract(text, regex, i+1)`: null on null input, "" on
    * no-match or a non-participating group.
    */
  final case class Compiled(regex: String, fields: Seq[String]) {
    /** All capture groups in one pass; null when the pattern misses. */
    def groups(text: Column): Column =
      org.apache.spark.sql.graftvec.RegexExpressions.regexGroups(text, regex)

    /** Columns extracting every named field from `text` (string-typed). */
    def columns(text: Column): Seq[(String, Column)] = {
      val g = groups(text)
      fields.zipWithIndex.map { case (f, i) =>
        f -> when(text.isNotNull, coalesce(element_at(g, i + 1), lit("")))
      }
    }
    def matches(text: Column): Column = groups(text).isNotNull
  }

  private val Token = """%\{(\w+)(?::([\w.\[\]@]+))?\}""".r

  private def escapeLiteral(s: String): String =
    s.flatMap {
      case c if "\\^$.|?*+()[]{}".contains(c) => s"\\$c"
      case c => c.toString
    }

  /** Regex-mode inter-token text (the reference's grok: the whole
    * expression IS a regex, only `%{...}` gets substituted): kept as
    * regex, but bare capturing `(` becomes `(?:` — field extraction is
    * positional (fields(i) ↔ group i+1), so a user group would shift
    * every later field. Named raw captures can't be honored under the
    * positional contract and throw instead of silently mis-mapping.
    */
  private def regexLiteral(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    while (i < s.length) {
      s(i) match {
        case '\\' if i + 1 < s.length => sb += '\\' += s(i + 1); i += 1
        case '[' if !inClass => inClass = true; sb += '['
        case ']' if inClass => inClass = false; sb += ']'
        case '(' if !inClass =>
          if (i + 1 < s.length && s(i + 1) == '?') {
            if (i + 2 < s.length && s(i + 2) == '<' &&
                i + 3 < s.length && s(i + 3) != '=' && s(i + 3) != '!')
              throw new IllegalArgumentException(
                "named captures in raw grok regex are not supported; use %{PATTERN:field}")
            sb += '('
          } else sb ++= "(?:"
        case c => sb += c
      }
      i += 1
    }
    sb.result()
  }

  /** Compile one grok expression to an anchored regex. Unnamed tokens
    * (`%{INT}`) match without capturing; named tokens (`%{INT:latency}`)
    * become capture groups. Unknown pattern names throw at plan time —
    * mirroring VRL's compile-once semantics
    * (reference: src/transforms/remap.rs:451-463).
    *
    * `regexLiterals = false` (library parsers): inter-token text is
    * LITERAL (`[` matches a bracket). `regexLiterals = true` (VRL
    * parse_grok/parse_groks): inter-token text is regex, like the
    * reference's grok crate — alternations such as
    * `(%{EMAILADDRESS:email}|%{LOGLEVEL:level})` work.
    */
  def compile(grok: String, anchored: Boolean = true,
              regexLiterals: Boolean = false): Compiled = {
    val lit: String => String =
      if (regexLiterals) regexLiteral else escapeLiteral
    val sb = new StringBuilder
    val fields = Seq.newBuilder[String]
    var last = 0
    for (m <- Token.findAllMatchIn(grok)) {
      sb ++= lit(grok.substring(last, m.start))
      val name = m.group(1)
      val body = patterns.getOrElse(name,
        throw new IllegalArgumentException(s"unknown grok pattern %{$name}"))
      Option(m.group(2)) match {
        case Some(field) => fields += field; sb ++= s"($body)"
        case None        => sb ++= s"(?:$body)"
      }
      last = m.end
    }
    sb ++= lit(grok.substring(last))
    val core = sb.result()
    // \z (end of input), not $: Java's $ also matches before a final
    // line terminator, so "msg\n" would parse in Spark but not in the
    // RE2 oracle (where $ is end-of-text) — \z means end-of-text in
    // BOTH engines, keeping the shared-pattern contract exact
    Compiled(if (anchored) s"^$core\\z" else core, fields.result())
  }

  /** parse_groks: first-matching pattern wins
    * (reference: website/cue/reference/remap/functions/parse_groks.cue).
    * Emits, per field, a coalesce over per-pattern extractions gated on
    * that pattern matching — still pure built-in expressions.
    */
  def compileSet(groks: Seq[String]): Seq[Compiled] = groks.map(compile(_))

  /** Apply a compiled pattern set to `df`: adds one column per field
    * (first matching pattern's capture; null if no pattern matches) plus
    * `_matched` (the 0-based index of the matching pattern, -1 if none).
    */
  def applySet(df: DataFrame, text: Column, set: Seq[Compiled]): DataFrame = {
    val allFields = set.flatMap(_.fields).distinct
    // the source text is stashed under a private name and every group
    // expression rebinds to it: a grok FIELD named like the text column
    // (e.g. %{WORD:message} over col("message")) would otherwise
    // overwrite the column mid-fold and later fields would re-extract
    // from the overwritten value
    val tmp = "__grok_text"
    val src = df.withColumn(tmp, text)
    val gcols = set.map(_.groups(col(tmp))) // one shared run per pattern
    val matchIdx = set.indices.foldRight(lit(-1): Column) {
      case (i, acc) => when(gcols(i).isNotNull, lit(i)).otherwise(acc)
    }
    val withIdx = src.withColumn("_matched", matchIdx)
    allFields.foldLeft(withIdx) { (acc, f) =>
      val variants = set.zipWithIndex.flatMap { case (c, i) =>
        val gi = c.fields.indexOf(f)
        if (gi < 0) None
        else Some(when(col("_matched") === i,
          coalesce(element_at(gcols(i), gi + 1), lit(""))))
      }
      acc.withColumn(f, coalesce(variants: _*))
    }.drop(tmp)
  }
}
