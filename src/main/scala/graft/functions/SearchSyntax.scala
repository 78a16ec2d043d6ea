package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Datadog-log-search-style condition syntax → Catalyst predicate
  * (the reference's `Condition::DatadogSearch`,
  * `src/conditions/datadog_search.rs`; used by filter/route/sample).
  *
  * Supported subset (the operators the reference's behavior tests
  * exercise): bare terms (match the default text column), quoted
  * phrases, `field:value`, `field:val*` wildcards, `-` / `NOT`
  * negation, `AND` / `OR` / implicit-AND, parentheses, numeric
  * comparisons `field:>n` `>=n` `<n` `<=n`, inclusive ranges
  * `field:[a TO b]`.
  *
  * Compiled ONCE at plan time into a boolean `Column` — evaluation is
  * ordinary codegen'd predicate work, usable anywhere a condition is
  * (filter, route ports, sample.exclude, window.flush_when).
  */
object SearchSyntax {

  /** @param defaultCol column bare terms search (substring match)
    * @param fieldCol   resolve `field:` names to columns
    */
  def compile(query: String, defaultCol: Column,
              fieldCol: String => Column = col): Column =
    new Parser(tokenize(query), defaultCol, fieldCol).parseOr()

  // ------------------------------------------------------------ lexer

  private sealed trait Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object AndTok extends Tok
  private case object OrTok extends Tok
  private case object NotTok extends Tok
  private final case class Term(field: Option[String], value: String,
                                quoted: Boolean) extends Tok

  private def tokenize(q: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    def readValue(): String = {
      if (i < q.length && q.charAt(i) == '"') {
        val end = q.indexOf('"', i + 1)
        require(end > 0, s"unterminated quote in: $q")
        val s = q.substring(i + 1, end); i = end + 1; s
      } else if (i < q.length && q.charAt(i) == '[') {
        val end = q.indexOf(']', i)
        require(end > 0, s"unterminated range in: $q")
        val s = q.substring(i, end + 1); i = end + 1; s
      } else {
        val start = i
        while (i < q.length && !" ()".contains(q.charAt(i))) i += 1
        q.substring(start, i)
      }
    }
    while (i < q.length) q.charAt(i) match {
      case ' ' => i += 1
      case '(' => out += LParen; i += 1
      case ')' => out += RParen; i += 1
      case '-' => out += NotTok; i += 1
      case '"' =>
        out += Term(None, readValue(), quoted = true)
      case _ =>
        val start = i
        // read up to ':' or delimiter
        while (i < q.length && !" ():".contains(q.charAt(i))) i += 1
        val word = q.substring(start, i)
        if (i < q.length && q.charAt(i) == ':') {
          i += 1
          val quoted = i < q.length && q.charAt(i) == '"'
          out += Term(Some(word), readValue(), quoted)
        } else word match {
          case "AND" => out += AndTok
          case "OR"  => out += OrTok
          case "NOT" => out += NotTok
          case w     => out += Term(None, w, quoted = false)
        }
    }
    out.toList
  }

  // ------------------------------------------------------------ parser

  private val rangeRe = """\[\s*(\S+)\s+TO\s+(\S+)\s*\]""".r
  private val cmpRe = """(>=|<=|>|<)(.+)""".r

  private final class Parser(var toks: List[Tok], defaultCol: Column,
                             fieldCol: String => Column) {
    private def peek: Option[Tok] = toks.headOption
    private def next(): Tok = { val t = toks.head; toks = toks.tail; t }

    def parseOr(): Column = {
      var left = parseAnd()
      while (peek.contains(OrTok)) { next(); left = left || parseAnd() }
      left
    }

    /** AND is explicit or implicit (adjacent terms). */
    private def parseAnd(): Column = {
      var left = parseUnary()
      var go = true
      while (go) peek match {
        case Some(AndTok) => next(); left = left && parseUnary()
        case Some(LParen) | Some(NotTok) | Some(_: Term) =>
          left = left && parseUnary()
        case _ => go = false
      }
      left
    }

    private def parseUnary(): Column = next() match {
      // null-normalize under NOT: a missing/null facet makes the inner
      // condition null, and Datadog semantics say such an event MATCHES
      // the negation (`-level:error` includes events with no level) —
      // raw !null would stay null and never match
      case NotTok => !coalesce(parseUnary(), lit(false))
      case LParen =>
        val e = parseOr()
        require(peek.contains(RParen), "expected )"); next(); e
      case Term(field, value, quoted) => leaf(field, value, quoted)
      case t => throw new IllegalArgumentException(s"unexpected token $t")
    }

    private def leaf(field: Option[String], value: String,
                     quoted: Boolean): Column = field match {
      case None =>
        // bare term / phrase: substring match on the default column
        defaultCol.contains(value)
      case Some(f) =>
        val c = fieldCol(f)
        value match {
          case _ if quoted => c === value
          case rangeRe(lo0, hi0) =>
            // bounds may be quoted: b:["x" TO "z"]
            def unq(s: String) =
              if (s.length >= 2 && s.startsWith("\"") && s.endsWith("\""))
                s.substring(1, s.length - 1) else s
            val (lo, hi) = (unq(lo0), unq(hi0))
            (if (lo == "*") lit(true) else cmp(c, lo, _ >= _)) &&
              (if (hi == "*") lit(true) else cmp(c, hi, _ <= _))
          case cmpRe(op, n) =>
            op match {
              case ">" => cmp(c, n, _ > _); case ">=" => cmp(c, n, _ >= _)
              case "<" => cmp(c, n, _ < _); case "<=" => cmp(c, n, _ <= _)
            }
          case v if v.contains("*") =>
            // wildcard → anchored regex, everything else quoted
            val rx = "^" + v.split("\\*", -1).map(java.util.regex.Pattern.quote)
              .mkString(".*") + "$"
            c.rlike(rx)
          case v => c === v
        }
    }

    /** Numeric bounds compare numerically, else lexically. The column
      * side goes through try_cast: under ANSI mode an implicit
      * string→double coercion would abort the whole job on the first
      * non-numeric row value — here such a row is simply not a match
      * (null comparison → filtered), the Datadog behavior.
      */
    private def cmp(c: Column, v: String,
                    op: (Column, Column) => Column): Column =
      if (v.matches("-?[0-9]+(\\.[0-9]+)?"))
        op(c.try_cast("double"), lit(v.toDouble))
      else op(c, lit(v))
  }
}
