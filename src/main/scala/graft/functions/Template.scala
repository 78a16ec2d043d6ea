package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's template strings (`src/template.rs:21,63,158-244`):
  * `"{{ field }}"` event-field interpolation plus strftime specifiers,
  * used for sink partition keys, metric names/tags, throttle/sample
  * group keys.
  *
  * Re-expression: compile the template ONCE at plan time into a
  * `concat` of column refs and `date_format` fragments — a plain
  * codegen'd expression, no per-row parsing.
  */
object Template {

  private val fieldRe = "\\{\\{\\s*([A-Za-z0-9_.]+)\\s*\\}\\}".r
  // tokenize EVERY %-specifier (not just the supported ones) so an
  // unsupported one is a plan-time error below, never silent literal
  // passthrough into partition keys / metric names. The optional
  // [-_0^#][width] part covers chrono's flag/padding forms (%-d, %_H,
  // %03S): valid in the reference, unsupported here — they must hit the
  // error path, not slide through as literals.
  private val strftimeRe = "%[-_0^#]?[0-9]*[A-Za-z%]".r

  /** strftime → java.time format pattern (the subset the reference's
    * sink paths use; extend as needed).
    */
  private val strf: Map[String, String] = Map(
    "%Y" -> "yyyy", "%y" -> "yy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%M" -> "mm", "%S" -> "ss",
    "%F" -> "yyyy-MM-dd", "%j" -> "DDD", "%T" -> "HH:mm:ss",
    "%b" -> "MMM", "%B" -> "MMMM", "%a" -> "EEE", "%A" -> "EEEE",
    "%I" -> "hh", "%p" -> "a", "%z" -> "Z")

  /** Compile `template` into a Column. `{{ field }}` → `fieldCol(field)`
    * (default `col`); strftime specifiers format `tsCol`; `%%` is a
    * literal percent. Null fields render as "" (template render in the
    * reference fails on missing fields; over a fixed schema a missing
    * column is a plan-time error instead — stricter, caught earlier).
    */
  def compile(template: String, tsCol: Column,
              fieldCol: String => Column = col): Column = {
    // split into literal / {{field}} / %X tokens, preserving order
    val tokenRe = ("(" + fieldRe.regex + ")|(" + strftimeRe.regex + ")").r
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- tokenRe.findAllMatchIn(template)) {
      if (m.start > last) parts += lit(template.substring(last, m.start))
      val tok = m.matched
      if (tok.startsWith("{{")) {
        val field = fieldRe.findFirstMatchIn(tok).get.group(1)
        parts += coalesce(fieldCol(field).cast("string"), lit(""))
      } else if (tok == "%%") parts += lit("%")
      else if (tok == "%s") parts += unix_timestamp(tsCol).cast("string")
      else parts += date_format(tsCol, strf.getOrElse(tok,
        throw new IllegalArgumentException(s"unsupported strftime: $tok")))
      last = m.end
    }
    if (last < template.length) parts += lit(template.substring(last))
    if (parts.isEmpty) lit("") else concat(parts.toSeq: _*)
  }

  /** Static render check: the set of event fields a template needs —
    * mirrors the reference's plan-time `Template::get_fields`.
    */
  def fields(template: String): Seq[String] =
    fieldRe.findAllMatchIn(template).map(_.group(1)).toSeq.distinct

  /** Does the string contain any template token (`{{field}}` or a
    * strftime specifier)? The reference's `Template::is_dynamic`
    * analog — a bare `%` that is NOT a specifier (e.g. a field path
    * literally named `disk%`) is NOT a template.
    */
  def isTemplate(s: String): Boolean =
    fieldRe.findFirstIn(s).isDefined || strftimeRe.findFirstIn(s).isDefined
}
